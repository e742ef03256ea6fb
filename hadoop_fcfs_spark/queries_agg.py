"""Correctness-gate queries: aggregate family (SURVEY.md §2.4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_fcfs_spark.agg.histogram import value_histogram
from hadoop_fcfs_spark.agg.registry import uniq_value_count_capped
from hadoop_fcfs_spark.agg.wordstats import word_stats
from hadoop_fcfs_spark.ops.textops import token_count
from hadoop_fcfs_spark.registry import register
from hadoop_fcfs_spark.tables import t


@register(
    "wordcount",
    oracle="""
    SELECT w AS token, COUNT(*) AS cnt
    FROM (SELECT UNNEST(regexp_split_to_array(text, '\\s+')) AS w FROM documents)
    WHERE w <> '' GROUP BY w
    """,
    doc="WordCount (examples/WordCount.java:35): tokenize + groupBy.count; combiner automatic.",
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_count(t(spark, sf_dir, "documents"), "text")


@register(
    "word_stats",
    oracle="""
    SELECT COUNT(*) AS n_words,
           ROUND(AVG(LENGTH(w)), 6) AS mean_len,
           MEDIAN(LENGTH(w)) AS median_len,
           ROUND(COALESCE(STDDEV_POP(LENGTH(w)), 0.0), 6) AS std_len,
           MIN(LENGTH(w)) AS min_len,
           MAX(LENGTH(w)) AS max_len
    FROM (SELECT UNNEST(regexp_split_to_array(text, '\\s+')) AS w FROM documents)
    WHERE w <> ''
    """,
    doc="WordMean/WordMedian/WordStandardDeviation (examples/WordMean.java:196 …) in one pass.",
)
def word_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return word_stats(t(spark, sf_dir, "documents"), "text")


@register(
    "value_histogram",
    oracle="""
    WITH freq AS (
      SELECT event_type, user_id, COUNT(*) AS freq
      FROM events GROUP BY event_type, user_id
    )
    SELECT event_type,
           COUNT(*) AS n_values,
           MIN(freq) AS min_freq,
           MEDIAN(freq) AS median_freq,
           MAX(freq) AS max_freq,
           ROUND(AVG(freq), 6) AS avg_freq,
           ROUND(COALESCE(STDDEV_POP(freq), 0.0), 6) AS std_freq
    FROM freq GROUP BY event_type
    """,
    doc="ValueHistogram.java:38 — stats of the per-key value-frequency distribution.",
)
def value_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_histogram(t(spark, sf_dir, "events"), "event_type", "user_id")


@register(
    "quantile_summary",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS p50_qty,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 4) AS p90_price,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.99), 4) AS p99_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact interpolated quantiles per group (the WordMedian family "
    "generalized, examples/WordMedian.java:43): Spark percentile() == "
    "DuckDB quantile_cont; approx_percentile is the sketch-based scale "
    "path for 100 TB (same API shape, t-digest-style bounded state).",
)
def quantile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99_price"),
    )


@register(
    "uniq_capped",
    oracle="""
    SELECT event_type,
           CAST(LEAST(COUNT(DISTINCT user_id), 50) AS BIGINT) AS uniq_capped,
           COUNT(DISTINCT user_id) AS uniq_exact
    FROM events GROUP BY event_type
    """,
    doc="UniqValueCount.java:35 with maxNumItems cap.",
)
def uniq_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        uniq_value_count_capped(F.col("user_id"), 50).alias("uniq_capped"),
        F.countDistinct("user_id").alias("uniq_exact"),
    )


@register(
    "json_extract_agg",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    doc="Semi-structured columns: JSON path extraction + agg (net-new surface; "
    "the reference parses ad-hoc inside map()).",
)
def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.sum(k).alias("k_sum"), F.max(k).alias("k_max"), F.count("*").alias("n")
    )


@register(
    "hll_distinct_rollup",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS exact_users, TRUE AS hll_ok
    FROM events GROUP BY event_type
    """,
    doc="Re-aggregatable sketch tier (agg.sketches): per-(event_type, day) "
    "HLL sketches materialized in ONE scan, rolled up to event_type by "
    "sketch UNION (hll_union_agg) — the no-rescan distinct-count pattern "
    "for 100 TB. The oracled value is the ERROR CONTRACT: hll_ok asserts "
    "the merged estimate lands within 5% of exact (HLL lgk=12 RSE ~1.6%), "
    "so sketch degradation fails the value hash.",
)
def hll_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.agg.sketches import hll_partial, hll_rollup

    ev = t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    daily = hll_partial(ev, ["event_type", "day"], "user_id")
    merged = hll_rollup(daily, ["event_type"])
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("exact_users"))
    return exact.join(merged, "event_type").select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_distinct") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("hll_ok"),
    )


@register(
    "approx_quantile_bounds",
    oracle="""
    SELECT event_type,
           CAST(FLOOR(quantile_cont(value, 0.5) * 1000000) AS BIGINT) AS p50_e6,
           TRUE AS approx_ok
    FROM events GROUP BY event_type
    """,
    doc="Quantile sketch with an oracled error contract: exact continuous "
    "median (percentile(), floor-to-micro) next to percentile_approx "
    "(Greenwald-Khanna-style mergeable sketch); approx_ok asserts the "
    "sketch lands within 1% relative of exact. The exact median is the "
    "oracle's value; the bound catches sketch regressions.",
)
def approx_quantile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("__p50"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("__ap"),
    )
    return agg.select(
        "event_type",
        F.floor(F.col("__p50") * 1_000_000).cast("long").alias("p50_e6"),
        (
            F.abs(F.col("__ap") - F.col("__p50"))
            <= F.greatest(0.01 * F.abs(F.col("__p50")), F.lit(0.01))
        ).alias("approx_ok"),
    )
