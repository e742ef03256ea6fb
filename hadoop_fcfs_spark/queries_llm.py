"""Correctness-gate queries: LLM-data-pipeline extensions (dedup,
similarity, text analysis). Filled in alongside hadoop_fcfs_spark.llm."""

from __future__ import annotations
