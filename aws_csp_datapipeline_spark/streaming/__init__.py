"""Structured Streaming ingest (SURVEY.md §2.9)."""
