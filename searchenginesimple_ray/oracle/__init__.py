"""Slow, obviously-correct pure-Python oracles (FIXTURES.md F3)."""
