"""Structured Streaming wrappers (SURVEY.md §2.11)."""
