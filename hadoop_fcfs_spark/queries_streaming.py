"""Correctness-gate queries: event-time windowing (batch-checkable
equivalents of the streaming surface; SURVEY.md §2.7 — net-new)."""

from __future__ import annotations
