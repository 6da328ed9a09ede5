"""Ray Data stages: batch transforms + actor-pool callable classes."""
