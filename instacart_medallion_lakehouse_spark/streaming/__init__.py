"""Structured Streaming surface (events extension — SURVEY.md §2.9)."""
