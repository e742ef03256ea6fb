"""Benchmark workloads (SURVEY.md §6)."""
