"""Correctness-gate queries: IO-layer semantics provable over parquet
(SURVEY.md §2.1). The file-format readers themselves are exercised by
pytest round-trips (tests/test_io.py); here we gate the record-shaping
semantics (KV split, fixed-width projection) on driver tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_fcfs_spark.registry import register
from hadoop_fcfs_spark.tables import t


@register(
    "kv_split",
    oracle="""
    SELECT CASE WHEN POSITION(' ' IN text) > 0 THEN text[1:POSITION(' ' IN text) - 1] ELSE text END AS key,
           CASE WHEN POSITION(' ' IN text) > 0 THEN text[POSITION(' ' IN text) + 1:] ELSE '' END AS value
    FROM documents
    """,
    doc="KeyValueTextInputFormat (KeyValueLineRecordReader.java:39): split at first separator.",
)
def kv_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    pos = F.instr(F.col("text"), " ")
    return docs.select(
        F.when(pos > 0, F.substring_index("text", " ", 1)).otherwise(F.col("text")).alias("key"),
        F.when(pos > 0, F.expr("substring(text, instr(text, ' ') + 1)")).otherwise(F.lit("")).alias("value"),
    )
