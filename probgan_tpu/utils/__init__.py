"""Shared utilities: profiling hooks, structured logging."""
