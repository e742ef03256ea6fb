"""Word-statistics family.

Parity targets: ``examples/WordMean.java:196``, ``WordMedian.java:43``,
``WordStandardDeviation.java`` (oracle strategy mirrors the reference's
own test ``TestWordStats.java:258-286``, which recomputes the stats
independently and compares).

The reference runs three separate MR jobs; here one tokenize + one
aggregate produces mean, exact median, and stddev of word lengths in a
single pass (median() is exact — the reference's WordMedian also scans
for the exact median via sorted counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_fcfs_spark.ops.textops import tokenize


def word_stats(df: DataFrame, text_col: str) -> DataFrame:
    words = tokenize(df, text_col)
    lens = words.select(F.length("token").alias("len"))
    return lens.agg(
        F.count("*").alias("n_words"),
        F.round(F.avg("len"), 6).alias("mean_len"),
        F.expr("median(len)").alias("median_len"),
        F.round(F.coalesce(F.stddev_pop("len"), F.lit(0.0)), 6).alias("std_len"),
        F.min("len").cast("long").alias("min_len"),
        F.max("len").cast("long").alias("max_len"),
    )
