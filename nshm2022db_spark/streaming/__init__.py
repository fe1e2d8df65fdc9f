"""Structured Streaming operators over the events table (SURVEY §2.10 —
absent in the reference; part of the north-star scope)."""
