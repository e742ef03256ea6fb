"""ValueHistogram aggregator.

Parity target: ``mr-core/mapreduce/lib/aggregate/ValueHistogram.java:38``.
Per key, build the histogram of value frequencies and emit statistics of
the FREQUENCY distribution: number of distinct values, min/median/max
frequency, average and stddev of frequencies. The reference emits a
formatted string blob; we produce typed columns (SURVEY §7.3 — a
compatibility formatter can render the string).

Two-level aggregation: groupBy(key, value).count() then
groupBy(key).agg(...) — both are shuffle-partial-final HashAggregates;
no Python, scales linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def value_histogram(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    freq = df.groupBy(key_col, value_col).agg(F.count("*").alias("freq"))
    return freq.groupBy(key_col).agg(
        F.count("*").alias("n_values"),
        F.min("freq").alias("min_freq"),
        F.expr("median(freq)").alias("median_freq"),
        F.max("freq").alias("max_freq"),
        F.round(F.avg("freq"), 6).alias("avg_freq"),
        F.round(F.coalesce(F.stddev_pop("freq"), F.lit(0.0)), 6).alias("std_freq"),
    )


def format_histogram(df: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Compatibility formatter: render the stats as the reference's
    tab-separated string blob (ValueHistogram.java:38 getReport shape:
    count, min, median, max, avg, stddev). The typed columns are the
    engine-native output; this exists only for byte-shaped parity
    (SURVEY §7.3)."""
    blob = F.concat_ws(
        "\t",
        F.col("n_values").cast("string"),
        F.col("min_freq").cast("string"),
        F.col("median_freq").cast("string"),
        F.col("max_freq").cast("string"),
        F.col("avg_freq").cast("string"),
        F.col("std_freq").cast("string"),
    )
    return df.select(F.col(key_col), blob.alias("histogram_report"))
