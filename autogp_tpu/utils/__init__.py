"""Utilities: timing counters and profiling hooks."""
