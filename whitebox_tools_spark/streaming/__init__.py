"""Structured Streaming adapters (incremental tile assignment)."""
