"""Structured Streaming surface (SURVEY.md §2.7 — net-new extension).

The reference is batch-only: no watermarks, event-time windows, or
stateful streaming anywhere in its tree. This package is the
extension surface over the `events` table shape: tumbling/sliding/
session event-time windows with watermarks, plus a custom stateful
operator via applyInPandasWithState. Batch twins of each operator live
alongside so the semantics are oracle-checkable (the driver's DuckDB
gate runs the batch twins; streaming execution is pytest-verified via
the memory sink).
"""
