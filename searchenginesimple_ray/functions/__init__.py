"""Pure (deterministic, state-free) functions shared by all stages."""
