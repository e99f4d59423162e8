"""Structured Streaming twins of the batch operators (SURVEY §2.6)."""
