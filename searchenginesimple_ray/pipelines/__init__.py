"""End-to-end pipelines: index build, query serving, suggestions."""
