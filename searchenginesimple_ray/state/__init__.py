"""Checkpoint/lineage state management."""
