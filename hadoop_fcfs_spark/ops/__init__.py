"""Relational operator library (SURVEY.md §2.2–§2.6)."""
