"""Text map operators: tokenize, regex extract, grep, inverse.

Parity targets (SURVEY.md §2.2):
- ``TokenCounterMapper`` (reference
  ``mr-core/mapreduce/lib/map/TokenCounterMapper.java:35``): Java
  StringTokenizer ≈ split on whitespace runs, drop empties.
- ``RegexMapper`` (``mr-core/mapreduce/lib/map/RegexMapper.java:36``):
  emit (match_group, 1) per regex match.
- ``Grep`` example 2-job pipeline (``examples/Grep.java:59-88``):
  regex-count then sort-by-count-desc — here a single lazy DataFrame
  chain (job-boundary removal is free in Spark).
- ``InverseMapper`` (``mr-core/mapreduce/lib/map/InverseMapper.java:30``).

All pure Column expressions — codegen'd, no Python on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokenize(df: DataFrame, text_col: str, out_col: str = "token") -> DataFrame:
    """One output row per whitespace-delimited token (UDTF-shaped map)."""
    tok = F.explode(F.split(F.col(text_col), r"\s+")).alias(out_col)
    return df.select(tok).filter(F.col(out_col) != "")


def token_count(df: DataFrame, text_col: str) -> DataFrame:
    """WordCount (reference ``examples/WordCount.java:35``): map-side
    partial aggregation (the combiner) is automatic in HashAggregateExec."""
    return tokenize(df, text_col).groupBy("token").agg(F.count("*").alias("cnt"))


def regex_extract_count(df: DataFrame, text_col: str, pattern: str, group: int = 0) -> DataFrame:
    """RegexMapper + IntSumReducer: count every regex match occurrence."""
    m = F.explode(F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(group)))
    return (
        df.select(m.alias("match"))
        .filter(F.col("match") != "")
        .groupBy("match")
        .agg(F.count("*").alias("cnt"))
    )


def grep(df: DataFrame, text_col: str, pattern: str, group: int = 0) -> DataFrame:
    """The Grep example: regex-count, then order by count desc (the
    reference's second single-reducer sort job ``Grep.java:82-84`` is the
    final orderBy here — one DataFrame chain, no intermediate HDFS I/O)."""
    counted = regex_extract_count(df, text_col, pattern, group)
    return counted.orderBy(F.desc("cnt"), F.asc("match"))


def inverse(df: DataFrame, key_col: str = "key", value_col: str = "value") -> DataFrame:
    """(k, v) → (v, k)."""
    return df.select(F.col(value_col).alias(key_col), F.col(key_col).alias(value_col))
