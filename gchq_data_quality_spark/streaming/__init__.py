"""Structured Streaming variants of the audit aggregation (incremental runs)."""
