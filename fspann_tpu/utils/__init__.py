"""Shared utilities: profiling, paths."""
