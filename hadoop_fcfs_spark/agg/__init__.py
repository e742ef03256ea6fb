"""Aggregation library (SURVEY.md §2.4)."""
