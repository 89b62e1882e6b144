"""Structured-Streaming operators: stateful URL DB, stream wrappers."""
