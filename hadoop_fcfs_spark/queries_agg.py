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


@register(
    "kll_quantile_rollup",
    oracle="""
    SELECT event_type,
           CAST(FLOOR(quantile_cont(value, 0.5) * 1000000) AS BIGINT) AS p50_e6,
           TRUE AS kll_ok
    FROM events GROUP BY event_type
    """,
    doc="Mergeable quantile sketches (agg.sketches.kll_partial/"
    "kll_quantile_rollup, DataSketches KLL): per-(event_type, day) "
    "sketches materialized in ONE scan, merged to event_type — the "
    "no-rescan quantile pattern. The contract column kll_ok asserts the "
    "merged sketch's median has RANK within 2% of 0.5 (KLL guarantees "
    "~1.65% rank error at k=200) — rank, not value, because KLL's bound "
    "is distribution-free on rank only.",
)
def kll_quantile_rollup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.agg.sketches import kll_partial, kll_quantile_rollup

    ev = t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    daily = kll_partial(ev, ["event_type", "day"], "value")
    q = kll_quantile_rollup(daily, ["event_type"], [0.5])
    # rank-error contract: exact rank of the sketch's median within the group
    ranked = (
        ev.join(q, "event_type")
        .groupBy("event_type")
        .agg(
            F.avg((F.col("value") <= F.col("q_50")).cast("double")).alias("__rank"),
            F.percentile("value", F.lit(0.5)).alias("__p50"),
        )
    )
    return ranked.select(
        "event_type",
        F.floor(F.col("__p50") * 1_000_000).cast("long").alias("p50_e6"),
        (F.abs(F.col("__rank") - 0.5) <= 0.02).alias("kll_ok"),
    )


@register(
    "theta_user_overlap",
    oracle="""
    SELECT
      (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events
        WHERE event_type IN ('click', 'purchase')) AS union_exact,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM (
          SELECT user_id FROM events WHERE event_type = 'click'
          INTERSECT
          SELECT user_id FROM events WHERE event_type = 'purchase')) AS intersect_exact,
      TRUE AS union_ok, TRUE AS intersect_ok
    """,
    doc="Theta-sketch set algebra (agg.sketches.theta_partial): distinct "
    "users who clicked OR purchased (union) and clicked AND purchased "
    "(intersection), answered from per-event-type sketches — the "
    "audience-overlap question HLL cannot answer (no intersection). "
    "Contract columns assert both estimates within 5% of exact; a "
    "degraded sketch fails the value hash.",
)
def theta_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.agg.sketches import theta_partial

    ev = t(spark, sf_dir, "events")
    sk = theta_partial(
        ev.filter(F.col("event_type").isin("click", "purchase")),
        ["event_type"],
        "user_id",
    )
    ests = sk.agg(
        F.theta_sketch_estimate(F.theta_union_agg("theta_sketch")).alias("__u"),
        F.theta_sketch_estimate(F.theta_intersection_agg("theta_sketch")).alias("__i"),
    )
    exact = ev.select(
        F.countDistinct(
            F.when(F.col("event_type").isin("click", "purchase"), F.col("user_id"))
        ).alias("union_exact")
    )
    ex_i = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id")
        .intersect(ev.filter(F.col("event_type") == "purchase").select("user_id"))
        .agg(F.count("*").alias("intersect_exact"))
    )
    return (
        exact.crossJoin(ex_i)
        .crossJoin(F.broadcast(ests))
        .select(
            F.col("union_exact").cast("long"),
            F.col("intersect_exact").cast("long"),
            (F.abs(F.col("__u") - F.col("union_exact")) <= 0.05 * F.col("union_exact")).alias("union_ok"),
            (F.abs(F.col("__i") - F.col("intersect_exact")) <= 0.05 * F.col("intersect_exact")).alias("intersect_ok"),
        )
    )


@register(
    "quantile_buckets",
    oracle="""
    WITH b AS (
      SELECT o_totalprice,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    )
    SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM b GROUP BY decile
    """,
    doc="Quantile bucketing / discretization (feature engineering): exact "
    "NTILE-decile semantics (remainder front-loaded into the first n%k "
    "buckets, ops.sort.ntile_from_rank) computed over ranked_total_order's "
    "two-level decomposition — range partition + per-partition enumeration "
    "+ broadcast offsets, NO single-task global window. Cheaper approximate "
    "alternative at scale: approx_percentile cut points + a per-row bucket "
    "expression.",
)
def quantile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NTILE(k) is a pure function of (global rank, n, k), so the global
    # window becomes the scale-safe ranked_total_order decomposition
    # (range partition + per-partition enumeration + broadcast offsets) —
    # no full-table single-task WindowExec (the keyfield_sort lesson).
    from hadoop_fcfs_spark.ops.sort import ntile_from_rank, ranked_total_order

    orders = t(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    ranked = ranked_total_order(orders, [F.col("o_totalprice"), F.col("o_orderkey")])
    n = orders.count()
    b = ranked.select(
        "o_totalprice", ntile_from_rank(F.col("rank"), n, 10).alias("decile")
    )
    return b.groupBy("decile").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@register(
    "concurrent_events",
    oracle="""
    WITH pts AS (
      SELECT event_type, ts AS p, 1 AS delta FROM events
      UNION ALL
      SELECT event_type, ts + INTERVAL 5 MINUTE, -1 FROM events
    ),
    swept AS (
      SELECT event_type,
             SUM(delta) OVER (PARTITION BY event_type ORDER BY p, delta
                              ROWS UNBOUNDED PRECEDING) AS live
      FROM pts
    )
    SELECT event_type, CAST(MAX(live) AS BIGINT) AS peak_concurrency
    FROM swept GROUP BY event_type
    """,
    doc="Sweep-line concurrency: each event opens a 5-minute interval; "
    "peak overlap per event_type = max running sum over (+1 at start, -1 "
    "at end) points ordered by time. The classic interval-overlap "
    "algorithm as window algebra — partitioned by type, so no global "
    "sort; ties order ends before starts (delta asc) to not double-count "
    "a touch.",
)
def concurrent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # running sum via the two-level chunked scan (chunk = calendar day):
    # a hot event_type's whole timeline never flows through one window
    # task; offsets carry the sum across chunk boundaries exactly.
    from hadoop_fcfs_spark.ops.sort import chunked_running_sum

    ev = t(spark, sf_dir, "events").select("event_type", "ts")
    starts = ev.select("event_type", F.col("ts").alias("p"), F.lit(1).alias("delta"))
    ends = ev.select(
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("p"),
        F.lit(-1).alias("delta"),
    )
    pts = starts.unionByName(ends)
    swept = chunked_running_sum(
        pts, ["event_type"], F.to_date("p"), ["p", "delta"], "delta", out_col="live"
    )
    return swept.groupBy("event_type").agg(
        F.max("live").cast("long").alias("peak_concurrency")
    )


@register(
    "profile_orders",
    oracle="""
    SELECT col AS "column", (SELECT COUNT(*) FROM orders) AS n_rows, n_nulls, n_distinct
    FROM (
      SELECT 'o_orderstatus' AS col,
             CAST(COUNT(*) FILTER (o_orderstatus IS NULL) AS BIGINT) AS n_nulls,
             CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct FROM orders
      UNION ALL
      SELECT 'o_orderpriority',
             CAST(COUNT(*) FILTER (o_orderpriority IS NULL) AS BIGINT),
             CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) FROM orders
      UNION ALL
      SELECT 'o_custkey',
             CAST(COUNT(*) FILTER (o_custkey IS NULL) AS BIGINT),
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders
      UNION ALL
      SELECT 'o_totalprice',
             CAST(COUNT(*) FILTER (o_totalprice IS NULL) AS BIGINT),
             CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) FROM orders
      UNION ALL
      SELECT 'o_orderdate',
             CAST(COUNT(*) FILTER (o_orderdate IS NULL) AS BIGINT),
             CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) FROM orders
    )
    """,
    doc="ANALYZE-style column profiling (ops.validate.profile_table): one "
    "aggregation pass emitting (column, n_rows, n_nulls, n_distinct) long "
    "format. Gate runs exact=True for the oracle; production default is "
    "the HLL estimator (single pass, no Expand blowup).",
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.validate import profile_table

    orders = t(spark, sf_dir, "orders")
    return profile_table(
        orders,
        ["o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice", "o_orderdate"],
        exact=True,
    )


@register(
    "daily_event_anomaly",
    oracle="""
    WITH g AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS grain,
             CAST(COUNT(*) AS BIGINT) AS metric
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type, AVG(metric) AS mu, STDDEV_SAMP(metric) AS sd
      FROM g GROUP BY 1
    )
    SELECT g.event_type, grain, metric,
           CAST(FLOOR((metric - mu) / sd * 1000000) AS BIGINT) AS z_e6,
           ABS((metric - mu) / sd) > 2.0 AS is_anomaly
    FROM g JOIN s USING (event_type)
    """,
    doc="Grain-level anomaly detection (ops.stats.zscore_anomalies): "
    "events per (type, day), each day z-scored against its type's "
    "mean/stddev, |z|>2 flagged — the volume-drop/spike monitor every "
    "ingestion pipeline runs. Aggregate-first: the stats pass runs over "
    "day summaries, never raw events.",
)
def daily_event_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import zscore_anomalies

    ev = t(spark, sf_dir, "events")
    out = zscore_anomalies(
        ev, ["event_type"], F.to_date("ts"), F.count("*").cast("long"), threshold=2.0
    )
    return out.select(
        "event_type",
        F.col("grain").cast("string").alias("grain"),
        "metric",
        "z_e6",
        "is_anomaly",
    )


@register(
    "lineitem_corr",
    oracle="""
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr FROM lineitem
    UNION ALL
    SELECT 'l_quantity', 'l_discount',
           ROUND(corr(l_quantity, l_discount), 6) FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', 'l_discount',
           ROUND(corr(l_extendedprice, l_discount), 6) FROM lineitem
    """,
    doc="Pearson correlation matrix (ops.stats.column_corr): all pairwise "
    "moments in ONE scan (each corr compiles to partial co-moments, "
    "map-side combined); upper triangle emitted as rows. Quantity-price "
    "correlation is strongly positive by construction; discount is "
    "independent - the feature-redundancy screen.",
)
def lineitem_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import column_corr

    li = t(spark, sf_dir, "lineitem")
    return column_corr(li, ["l_quantity", "l_extendedprice", "l_discount"])


@register(
    "orders_mutual_info",
    oracle="""
    WITH joint AS (
      SELECT o_orderstatus AS x, o_orderpriority AS y,
             CAST(COUNT(*) AS BIGINT) AS nxy
      FROM orders GROUP BY 1, 2
    ),
    mx AS (SELECT x, SUM(nxy) AS nx FROM joint GROUP BY x),
    my AS (SELECT y, SUM(nxy) AS ny FROM joint GROUP BY y),
    tot AS (SELECT CAST(SUM(nxy) AS DOUBLE) AS n FROM joint)
    SELECT CAST(FLOOR(SUM((nxy / n) * ln((nxy * n) / (nx * ny))) * 1000000)
                AS BIGINT) AS mi_e6,
           (SELECT CAST(COUNT(DISTINCT x) AS BIGINT) FROM joint) AS n_x,
           (SELECT CAST(COUNT(DISTINCT y) AS BIGINT) FROM joint) AS n_y
    FROM joint JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot
    """,
    doc="Mutual information I(status; priority) in nats "
    "(ops.stats.mutual_information): exact contingency table in one "
    "map-side-combined aggregation, marginals re-aggregated FROM the "
    "table (no second scan), one broadcast scalar. The feature-"
    "dependence/leakage screen; status and priority are independent in "
    "the generator so MI ~ 0 - the gate pins the exact floor-micro "
    "value.",
)
def orders_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import mutual_information

    return mutual_information(
        t(spark, sf_dir, "orders"), "o_orderstatus", "o_orderpriority"
    )


@register(
    "winsorize_events",
    oracle="""
    WITH b AS (
      SELECT event_type,
             quantile_cont(value, 0.01) AS lo,
             quantile_cont(value, 0.99) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) FILTER (value < lo) AS BIGINT) AS n_clipped_lo,
           CAST(COUNT(*) FILTER (value > hi) AS BIGINT) AS n_clipped_hi,
           CAST(FLOOR(AVG(CASE WHEN value < lo THEN lo
                               WHEN value > hi THEN hi
                               ELSE value END) * 1000000) AS BIGINT) AS mean_wins_e6
    FROM events e JOIN b USING (event_type)
    GROUP BY e.event_type
    """,
    doc="Winsorization (outlier clipping at exact p1/p99 per group): the "
    "feature-engineering trim pass before training on heavy-tailed "
    "metrics. One percentile aggregation (group-cardinality rows, "
    "broadcast back) + a per-row clip expression + one stats pass; at "
    "unbounded scale swap percentile() for the KLL sketch tier (same "
    "query shape). Clipped counts + winsorized mean per type, "
    "floor-micro.",
)
def winsorize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.01)).alias("__lo"),
        F.percentile("value", F.lit(0.99)).alias("__hi"),
    )
    clipped = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "value",
        "__lo",
        "__hi",
        F.when(F.col("value") < F.col("__lo"), F.col("__lo"))
        .when(F.col("value") > F.col("__hi"), F.col("__hi"))
        .otherwise(F.col("value"))
        .alias("__w"),
    )
    return clipped.groupBy("event_type").agg(
        F.count(F.when(F.col("value") < F.col("__lo"), 1)).cast("long").alias("n_clipped_lo"),
        F.count(F.when(F.col("value") > F.col("__hi"), 1)).cast("long").alias("n_clipped_hi"),
        F.floor(F.avg("__w") * 1_000_000).cast("long").alias("mean_wins_e6"),
    )


@register(
    "gap_fill_hourly",
    oracle="""
    WITH aggd AS (
      SELECT event_type, date_trunc('hour', ts) AS grid_ts,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(FLOOR(AVG(value) * 1000000) AS BIGINT) AS avg_e6
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT k.event_type, g.grid_ts
      FROM (SELECT DISTINCT event_type FROM events) k
      CROSS JOIN bounds
      CROSS JOIN LATERAL UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS g(grid_ts)
    )
    SELECT s.event_type,
           CAST(s.grid_ts AS VARCHAR) AS grid_hour,
           COALESCE(a.n, 0) AS n,
           LAST_VALUE(a.avg_e6 IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.grid_ts
             ROWS UNBOUNDED PRECEDING) AS avg_e6_ffill
    FROM spine s LEFT JOIN aggd a USING (event_type, grid_ts)
    """,
    doc="Time-series regularization (ops.timeseries.gap_fill): hourly "
    "per-type grid over the full event range — hours with NO events "
    "materialize with n=0 and the last known mean carried forward "
    "(last ignorenulls over the key-partitioned grid). The spine is "
    "born distributed (per-key sequence + explode); the only event-"
    "sized pass is the pre-aggregation. The missing-row problem plain "
    "groupBy can't see.",
)
def gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.timeseries import gap_fill

    ev = t(spark, sf_dir, "events")
    out = gap_fill(
        ev,
        ["event_type"],
        "ts",
        "1 hour",
        [
            (F.count("*").cast("long"), "n"),
            (F.floor(F.avg("value") * 1_000_000).cast("long"), "avg_e6"),
        ],
        fill_zero=["n"],
        fill_forward=["avg_e6"],
    )
    return out.select(
        "event_type",
        F.col("grid_ts").cast("string").alias("grid_hour"),
        "n",
        F.col("avg_e6").alias("avg_e6_ffill"),
    )


@register(
    "theil_order_values",
    oracle="""
    WITH base AS (
      SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS v FROM orders
    ),
    excl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_excluded
             FROM base WHERE v IS NULL OR v <= 0),
    grain AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(FLOOR(ln(CAST(v AS DOUBLE)) * 1000000) AS BIGINT) AS q
      FROM base WHERE v > 0 GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             SUM(CAST(c AS HUGEINT) * v) AS s,
             SUM(CAST(c AS HUGEINT) * q) AS sq,
             SUM(CAST(c AS HUGEINT) * v * q) AS svq
      FROM grain
    ),
    lm AS (
      SELECT n, s, sq, svq,
             CAST(FLOOR(ln(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
               * 1000000) AS BIGINT) AS lmu
      FROM tot
    )
    SELECT n, e.n_excluded,
           CASE WHEN n > 0 AND s > 0 THEN
             CAST((svq - s * lmu) // s AS BIGINT) END AS theil_t_e6,
           CASE WHEN n > 0 THEN
             CAST((CAST(n AS HUGEINT) * lmu - sq) // n AS BIGINT)
           END AS mld_e6
    FROM lm CROSS JOIN excl e
    """,
    doc="Theil T and mean log deviation of order values in cents "
    "(ops.stats.theil_indices): the information-theoretic inequality "
    "pair completing the family on the gini_order_values slice - "
    "gini/lorenz are rank-based, Theil is the one that decomposes "
    "EXACTLY into within+between group terms (the property revenue-"
    "concentration breakdowns need). ln floor-micro quantized "
    "immediately (the zipf_slope route; ln is the one blessed "
    "bit-identical libm call, and mu enters as the identical IEEE "
    "double S/n), so both indices are divisions of exact BIGINT/"
    "DECIMAL(38,0) sums over the value grain - accumulation order "
    "cannot matter. One grain collapse + scalar reduce.",
)
def theil_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import theil_indices

    orders = t(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("vc")
    )
    return theil_indices(orders, "vc")


@register(
    "theil_decomposition_nations",
    oracle="""
    WITH base AS (
      SELECT cn.n_name AS g,
             CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS v
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      WHERE o.o_totalprice IS NOT NULL
    ),
    grain AS (
      SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(FLOOR(ln(CAST(v AS DOUBLE)) * 1000000) AS BIGINT) AS q
      FROM base WHERE g IS NOT NULL AND v > 0 GROUP BY 1, 2
    ),
    groups AS (
      SELECT g, CAST(SUM(c) AS BIGINT) AS ng,
             SUM(CAST(c AS HUGEINT) * v) AS sg,
             SUM(CAST(c AS HUGEINT) * v * q) AS svqg
      FROM grain GROUP BY 1
    ),
    g2 AS (
      SELECT g, ng, sg, svqg,
             CAST(FLOOR(ln(CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE))
               * 1000000) AS BIGINT) AS lmug
      FROM groups
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(ng) AS BIGINT) AS n,
             SUM(sg) AS s, SUM(svqg) AS svq,
             SUM(svqg - sg * lmug) AS wnum,
             SUM(sg * lmug) AS sglg
      FROM g2
    ),
    t2 AS (
      SELECT *, CAST(FLOOR(ln(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                * 1000000) AS BIGINT) AS lmu
      FROM tot
    )
    SELECT n, n_groups,
      CASE WHEN s > 0 THEN CAST((svq - s * lmu) // s AS BIGINT)
      END AS theil_t_e6,
      CASE WHEN s > 0 THEN CAST(wnum // s AS BIGINT) END AS within_e6,
      CASE WHEN s > 0 THEN CAST((sglg - s * lmu) // s AS BIGINT)
      END AS between_e6
    FROM t2
    """,
    doc="Theil-T within/between decomposition of order values across "
    "customer nations (ops.stats.theil_decomposition): is revenue "
    "inequality a few rich NATIONS or whales inside every nation - "
    "the exact split gini cannot provide, and the reason Theil is in "
    "the inequality family at all. The x*ln x form telescopes per "
    "row, so with the SHARED floor-micro quantized logs the three "
    "numerators satisfy within + between = total EXACTLY before the "
    "final divisions (pinned in pytest). Same determinism contract "
    "as theil_order_values (blessed ln, quantize immediately, means "
    "enter as identical IEEE doubles); one (group, value) grain "
    "pass, one group rollup, one scalar reduce.",
)
def theil_decomposition_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import theil_decomposition

    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    base = (
        orders.filter(F.col("o_totalprice").isNotNull())
        .join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("g"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("vc"),
        )
    )
    return theil_decomposition(base, "vc", "g")


@register(
    "ccf_click_purchase",
    oracle="""
    WITH g AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS i,
             CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS x,
             CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS y
      FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1
    ),
    fan AS (
      SELECT g.i, g.x, l.lag FROM g
      CROSS JOIN (SELECT UNNEST(range(-3, 4)) AS lag) l
    ),
    p AS (
      SELECT f.lag, f.x, b.y AS yl
      FROM fan f JOIN g b ON b.i = f.i + f.lag
    ),
    m AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_matched,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(yl) AS BIGINT) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(yl AS HUGEINT) * yl) AS syy,
             SUM(CAST(x AS HUGEINT) * yl) AS sxy
      FROM p GROUP BY 1
    )
    SELECT CAST(lag AS BIGINT) AS lag, n_matched,
      CASE WHEN (CAST(n_matched AS HUGEINT) * sxx
                 - CAST(sx AS HUGEINT) * sx) > 0
            AND (CAST(n_matched AS HUGEINT) * syy
                 - CAST(sy AS HUGEINT) * sy) > 0
      THEN ROUND(
        CAST(CAST(n_matched AS HUGEINT) * sxy
             - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        / SQRT(CAST(CAST(n_matched AS HUGEINT) * sxx
                    - CAST(sx AS HUGEINT) * sx AS DOUBLE)
               * CAST(CAST(n_matched AS HUGEINT) * syy
                      - CAST(sy AS HUGEINT) * sy AS DOUBLE)), 6)
      END AS r_r6
    FROM m
    """,
    doc="Cross-correlation function between daily click and purchase "
    "volumes at lags -3..+3 (ops.timeseries.ccf_lags): the lead/lag "
    "question acf_daily_events/pacf cannot answer - those are within-"
    "series; positive r at lag L > 0 means clicks LEAD purchases by "
    "L days, the does-traffic-predict-conversion diagnostic (lag 0 = "
    "plain contemporaneous correlation). Exact BIGINT/DECIMAL(38,0) "
    "co-moments per lag over the day grid (integer counts - nothing "
    "accumulates in float), Pearson as one flat double + single sqrt "
    "rounded @6; pairs via a 7-literal lag fan-out and a shifted-"
    "index equi-join over grid rows only.",
)
def ccf_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.timeseries import ccf_lags

    ev = t(spark, sf_dir, "events")
    g = (
        ev.filter(F.col("event_type").isin(["click", "purchase"]))
        .groupBy(F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long").alias("i"))
        .agg(
            F.sum((F.col("event_type") == "click").cast("long"))
            .cast("long").alias("x"),
            F.sum((F.col("event_type") == "purchase").cast("long"))
            .cast("long").alias("y"),
        )
    )
    return ccf_lags(g, "i", "x", "y", max_lag=3)


@register(
    "dispersion_daily_events",
    oracle="""
    WITH g AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(x) AS BIGINT) AS s, CAST(SUM(x * x) AS BIGINT) AS q
      FROM g GROUP BY 1
    )
    SELECT event_type, n_days,
           (s * 1000000) // n_days AS mean_e6,
           CASE WHEN n_days > 1 AND s > 0 THEN
             ((n_days * q - s * s) * 1000000) // ((n_days - 1) * s)
           END AS dispersion_e6
    FROM m
    """,
    doc="Variance-to-mean dispersion index of daily event counts per "
    "type: the Poisson-assumption audit under the whole anomaly tier "
    "- daily_event_anomaly / mad / rolling-z all threshold daily "
    "counts, and whether those thresholds are honest depends on "
    "D = s^2/mean (Poisson => D ~ 1; D >> 1 = bursty/overdispersed "
    "counts need negative-binomial-style wider bands, D < 1 = "
    "under-dispersed regular traffic). Entirely exact: day-grain "
    "counts, D_e6 = (n*Q - S^2)*1e6 div ((n-1)*S) - one truncating "
    "division of BIGINT moments, zero floats. One map-side-combined "
    "pass to the day grain, one per-type rollup.",
)
def dispersion_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    g = ev.groupBy(
        "event_type", F.to_date("ts").cast("string").alias("day")
    ).agg(F.count("*").cast("long").alias("x"))
    m = g.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("__s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("__q"),
    )
    return m.selectExpr(
        "event_type", "n_days",
        "(__s * 1000000) div n_days AS mean_e6",
        "CASE WHEN n_days > 1 AND __s > 0 THEN"
        " ((n_days * __q - __s * __s) * 1000000)"
        " div ((n_days - 1) * __s) END AS dispersion_e6",
    )


@register(
    "rolling_zscore_daily",
    oracle="""
    WITH g AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT event_type, day, n,
             SUM(n) OVER w AS s1, SUM(n * n) OVER w AS s2,
             COUNT(*) OVER w AS m
      FROM g
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day, n,
           CASE WHEN m > 1 AND (CAST(s2 AS DOUBLE)
                  - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE))
                  / (CAST(m AS DOUBLE) - 1) > 0
                THEN CAST(FLOOR((CAST(n AS DOUBLE)
                       - CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE))
                     / sqrt((CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE))
                       / (CAST(m AS DOUBLE) - 1)) * 1000000) AS BIGINT)
           END AS z_e6
    FROM r
    """,
    doc="Rolling 7-day z-score of daily event counts per type - the "
    "trailing-window anomaly monitor (daily_event_anomaly scores "
    "against the GLOBAL mean; this scores against the local regime, "
    "catching level shifts the global z misses). The day grain "
    "aggregates first (the only event-sized pass); the rolling window "
    "is key-bounded ROWS 6 PRECEDING. Mean/variance come from EXACT "
    "integer window sums (S1, S2, m) - never an engine stddev_samp, "
    "whose accumulation internals differ - so both engines evaluate "
    "the identical division/sqrt shape; NULL when the window variance "
    "is 0 or m=1. FLOOR-micro.",
)
def rolling_zscore_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    g = ev.groupBy(
        "event_type", F.to_date("ts").cast("string").alias("day")
    ).agg(F.count("*").cast("long").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, 0)
    )
    r = g.select(
        "event_type", "day", "n",
        F.sum("n").over(w).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("s2"),
        F.count("*").over(w).alias("m"),
    )
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    m = F.col("m").cast("double")
    var = (s2 - s1 * s1 / m) / (m - 1)
    z = (F.col("n").cast("double") - s1 / m) / F.sqrt(var)
    return r.select(
        "event_type", "day", "n",
        F.when(
            (F.col("m") > 1) & (var > 0),
            F.floor(z * 1_000_000).cast("long"),
        ).alias("z_e6"),
    )


@register(
    "interpolated_hourly_value",
    oracle="""
    WITH aggd AS (
      SELECT event_type, date_trunc('hour', ts) AS grid_ts,
             CAST(FLOOR(AVG(value) * 1000000) AS BIGINT) AS avg_e6
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT k.event_type, g.grid_ts
      FROM (SELECT DISTINCT event_type FROM events) k
      CROSS JOIN bounds
      CROSS JOIN LATERAL UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS g(grid_ts)
    ),
    j AS (
      SELECT s.event_type, s.grid_ts, a.avg_e6,
             epoch(s.grid_ts) AS tss,
             LAST_VALUE(a.avg_e6 IGNORE NULLS) OVER wb AS pv,
             LAST_VALUE(CASE WHEN a.avg_e6 IS NOT NULL
                             THEN epoch(s.grid_ts) END IGNORE NULLS)
               OVER wb AS pt,
             FIRST_VALUE(a.avg_e6 IGNORE NULLS) OVER wf AS nv,
             FIRST_VALUE(CASE WHEN a.avg_e6 IS NOT NULL
                              THEN epoch(s.grid_ts) END IGNORE NULLS)
               OVER wf AS nt
      FROM spine s LEFT JOIN aggd a USING (event_type, grid_ts)
      WINDOW wb AS (PARTITION BY s.event_type ORDER BY s.grid_ts
                    ROWS UNBOUNDED PRECEDING),
             wf AS (PARTITION BY s.event_type ORDER BY s.grid_ts
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, CAST(grid_ts AS VARCHAR) AS grid_hour,
           CAST(FLOOR(CASE WHEN avg_e6 IS NOT NULL THEN avg_e6
                           WHEN pv IS NULL THEN nv
                           WHEN nv IS NULL THEN pv
                           ELSE pv + (nv - pv) * ((tss - pt) / (nt - pt))
                      END) AS BIGINT) AS avg_e6_interp
    FROM j
    """,
    doc="Linear time-weighted interpolation over the hourly per-type "
    "grid (ops.timeseries.gap_fill fill_linear): hours with no events "
    "get pv + (nv-pv)*(t-pt)/(nt-pt) between the surrounding known "
    "means, nearest-value at the edges — the gap-filling convention "
    "feature pipelines use where forward-fill would bias trends. Two "
    "key-bounded grid windows per column; the interpolation arithmetic "
    "keeps IDENTICAL expression shape both engines (integer pv/nv, one "
    "division, same order) so the doubles agree bit-for-bit and FLOOR "
    "can't split.",
)
def interpolated_hourly_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.timeseries import gap_fill

    ev = t(spark, sf_dir, "events")
    out = gap_fill(
        ev,
        ["event_type"],
        "ts",
        "1 hour",
        [(F.floor(F.avg("value") * 1_000_000).cast("long"), "avg_e6")],
        fill_linear=["avg_e6"],
    )
    return out.select(
        "event_type",
        F.col("grid_ts").cast("string").alias("grid_hour"),
        F.floor(F.col("avg_e6")).cast("long").alias("avg_e6_interp"),
    )


@register(
    "volume_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    indexed AS (
      SELECT event_type, n,
             CAST(day - (SELECT MIN(CAST(ts AS DATE)) FROM events) AS BIGINT) AS x
      FROM daily
    )
    SELECT event_type,
           CAST(regr_count(n, x) AS BIGINT) AS n_days,
           CAST(FLOOR(regr_slope(n, x) * 1000000) AS BIGINT) AS slope_e6,
           CAST(FLOOR(regr_intercept(n, x) * 1000000) AS BIGINT) AS intercept_e6,
           CAST(FLOOR(regr_r2(n, x) * 1000000) AS BIGINT) AS r2_e6
    FROM indexed GROUP BY event_type
    """,
    doc="Volume trend via the ANSI REGR_* aggregate family: least-"
    "squares slope/intercept/R^2 of daily event counts against the day "
    "index, per type — is this source growing, shrinking, or noise? "
    "One day-grain aggregation (map-side combined) then the regression "
    "moments over ~90 summary rows per group; floor-micro values. The "
    "trend half of the anomaly monitor (daily_event_anomaly flags "
    "days; this fits the line).",
)
def volume_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    lo = ev.agg(F.min(F.to_date("ts")).alias("__lo"))
    indexed = daily.crossJoin(F.broadcast(lo)).select(
        "event_type", "n", F.datediff("day", "__lo").cast("long").alias("x")
    )
    return indexed.groupBy("event_type").agg(
        F.regr_count("n", "x").cast("long").alias("n_days"),
        F.floor(F.regr_slope("n", "x") * 1_000_000).cast("long").alias("slope_e6"),
        F.floor(F.regr_intercept("n", "x") * 1_000_000).cast("long").alias("intercept_e6"),
        F.floor(F.regr_r2("n", "x") * 1_000_000).cast("long").alias("r2_e6"),
    )


@register(
    "inverted_index",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(regexp_split_to_array(text, '\\s+')) AS term
      FROM documents
    ),
    pd AS (
      SELECT term, doc_id, COUNT(*) AS tf
      FROM toks WHERE term <> '' GROUP BY term, doc_id
    )
    SELECT term,
           COUNT(*) AS doc_freq,
           CAST(SUM(tf) AS BIGINT) AS total_tf,
           STRING_AGG(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
    FROM pd GROUP BY term
    HAVING COUNT(*) >= 5
    """,
    doc="Inverted index (ops.textops.inverted_index) — the canonical "
    "MapReduce example built on WordCount's skeleton (examples/"
    "WordCount.java:35): term -> sorted distinct posting list + doc_freq "
    "+ total_tf. Postings serialized as a comma string for the hash "
    "compare (array repr differs between pandas bridges). doc_freq >= 5 "
    "bounds the gate to reused vocabulary.",
)
def inverted_index_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.textops import inverted_index

    idx = inverted_index(t(spark, sf_dir, "documents"), "doc_id", "text")
    return idx.filter(F.col("doc_freq") >= 5).select(
        "term",
        "doc_freq",
        "total_tf",
        F.array_join(F.col("postings"), ",").alias("postings"),
    )


@register(
    "word_cooccurrence",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(arr) AS w, UNNEST(range(1, len(arr) + 1)) AS pos
      FROM (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS arr
        FROM documents
      )
    )
    SELECT LEAST(a.w, b.w) AS w1, GREATEST(a.w, b.w) AS w2, COUNT(*) AS cnt
    FROM toks a
    JOIN toks b
      ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos <= a.pos + 2
    GROUP BY 1, 2
    HAVING COUNT(*) >= 3
    """,
    doc="Windowed word co-occurrence (ops.textops.cooccurrence_pairs) — "
    "the 'pairs' pattern from Lin & Dyer's MapReduce text-processing "
    "chapter, the standard companion exercise to the reference's "
    "WordCount. Spark side generates pairs INSIDE the token array "
    "(nested transform + slice + flatten, one explode, no positions "
    "self-join); the oracle uses the naive positions self-join — same "
    "answer, independent shapes. cnt >= 3 bounds the tail.",
)
def word_cooccurrence_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.textops import cooccurrence_pairs

    pairs = cooccurrence_pairs(t(spark, sf_dir, "documents"), "text", window=2)
    return pairs.filter(F.col("cnt") >= 3)


@register(
    "cms_heavy_hitters",
    oracle="""
    SELECT user_id, cnt AS true_cnt, TRUE AS cms_ok FROM (
      SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
      ORDER BY cnt DESC, user_id LIMIT 10
    )
    """,
    doc="Count-Min heavy hitters (agg.sketches.cms_partial/cms_estimate "
    "— CMS materialized AS A DATAFRAME, depth 4 x width 2048, merge = "
    "union+sum like the HLL/KLL/Theta tiers): estimate the exact top-10 "
    "event users' counts from the sketch alone. cms_ok asserts the CMS "
    "one-sided error contract — never undercounts, overshoot <= "
    "ceil(3eN/width) — so sketch degradation fails the value hash. The "
    "oracle's values are the exact counts; deterministic xxhash64 row "
    "hashes make the estimate engine-reproducible.",
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from hadoop_fcfs_spark.agg.sketches import cms_estimate, cms_partial

    ev = t(spark, sf_dir, "events")
    exact = ev.groupBy("user_id").agg(F.count("*").alias("true_cnt"))
    top10 = exact.orderBy(F.desc("true_cnt"), F.asc("user_id")).limit(10)
    sketch = cms_partial(ev, "user_id", depth=4, width=2048)
    est = cms_estimate(sketch, top10.select("user_id"), "user_id", width=2048)
    n = ev.agg(F.count("*").alias("__n"))
    slack = F.ceil(F.lit(3.0 * math.e / 2048) * F.col("__n"))
    return (
        top10.join(est, "user_id")
        .crossJoin(F.broadcast(n))
        .select(
            "user_id",
            "true_cnt",
            (
                (F.col("est") >= F.col("true_cnt"))
                & (F.col("est") <= F.col("true_cnt") + slack)
            ).alias("cms_ok"),
        )
    )


@register(
    "merged_user_coverage",
    oracle="""
    WITH iv AS (
      SELECT user_id, ts AS s, ts + INTERVAL 30 MINUTE AS e FROM events
    ),
    m AS (
      SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      FROM iv
    ),
    isl AS (
      SELECT user_id, s, e,
             SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM m
    ),
    g AS (
      SELECT user_id, island, MIN(s) AS s0, MAX(e) AS e1
      FROM isl GROUP BY 1, 2
    )
    SELECT user_id,
           COUNT(*) AS n_intervals,
           CAST(SUM(epoch_us(e1) - epoch_us(s0)) AS BIGINT) AS covered_us,
           CAST(MAX(epoch_us(e1) - epoch_us(s0)) AS BIGINT) AS longest_us
    FROM g GROUP BY user_id
    """,
    doc="Overlapping-interval coalescing (ops.timeseries.merge_intervals "
    "— the interval flavor of gaps-and-islands): each event opens a "
    "30-minute coverage window; per user, overlapping windows merge to "
    "their union and the gate reports merged-interval count, total and "
    "longest covered microseconds. Key-partitioned bounded windows, one "
    "shuffle — the same sweep shape as sessionize, over intervals "
    "instead of gaps.",
)
def merged_user_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.timeseries import merge_intervals

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    merged = merge_intervals(ev, ["user_id"], "s", "e")
    dur = F.unix_micros(F.col("e")) - F.unix_micros(F.col("s"))
    return merged.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        F.sum(dur).cast("long").alias("covered_us"),
        F.max(dur).cast("long").alias("longest_us"),
    )


@register(
    "key_skew_report",
    oracle="""
    WITH cu AS (SELECT user_id AS k, COUNT(*) AS cnt FROM events GROUP BY user_id),
    mu AS (
      SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(SUM(cnt * cnt) AS BIGINT) AS s2, MAX(cnt) AS max_cnt
      FROM cu
    ),
    tu AS (SELECT CAST(SUM(cnt) AS BIGINT) AS top10_cnt FROM
           (SELECT cnt FROM cu ORDER BY cnt DESC, k LIMIT 10)),
    ct AS (SELECT event_type AS k, COUNT(*) AS cnt FROM events GROUP BY event_type),
    mt AS (
      SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(SUM(cnt * cnt) AS BIGINT) AS s2, MAX(cnt) AS max_cnt
      FROM ct
    ),
    tt AS (SELECT CAST(SUM(cnt) AS BIGINT) AS top10_cnt FROM
           (SELECT cnt FROM ct ORDER BY cnt DESC, k LIMIT 10))
    SELECT 'user_id' AS key_col, n_rows, n_keys, max_cnt, top10_cnt,
           CAST(FLOOR(max_cnt / CAST(n_rows AS DOUBLE) * 1000000) AS BIGINT) AS top1_share_e6,
           CAST(FLOOR(top10_cnt / CAST(n_rows AS DOUBLE) * 1000000) AS BIGINT) AS top10_share_e6,
           CAST(FLOOR(sqrt(CAST(n_keys * s2 - n_rows * n_rows AS DOUBLE)
                 / (CAST(n_keys AS DOUBLE) * CAST(n_keys AS DOUBLE)))
                 / (CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE)) * 1000000) AS BIGINT) AS cv_e6
    FROM mu CROSS JOIN tu
    UNION ALL
    SELECT 'event_type', n_rows, n_keys, max_cnt, top10_cnt,
           CAST(FLOOR(max_cnt / CAST(n_rows AS DOUBLE) * 1000000) AS BIGINT),
           CAST(FLOOR(top10_cnt / CAST(n_rows AS DOUBLE) * 1000000) AS BIGINT),
           CAST(FLOOR(sqrt(CAST(n_keys * s2 - n_rows * n_rows AS DOUBLE)
                 / (CAST(n_keys AS DOUBLE) * CAST(n_keys AS DOUBLE)))
                 / (CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE)) * 1000000) AS BIGINT)
    FROM mt CROSS JOIN tt
    """,
    doc="Key-skew diagnostic (ops.stats.key_skew_report) over the "
    "events stream's two shuffle keys: per-key-count moments (exact "
    "integer S1/S2 -> coefficient of variation), heaviest-key and "
    "top-10 concentration shares — the report that decides whether a "
    "key needs ops.skew salting before it becomes a 100 TB shuffle "
    "key. Aggregate-only over the key-count table; no sort over the "
    "key space (top-10 is TakeOrdered).",
)
def key_skew_report_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import key_skew_report

    return key_skew_report(t(spark, sf_dir, "events"), ["user_id", "event_type"])


@register(
    "mad_event_anomaly",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS grain,
             CAST(COUNT(*) AS BIGINT) AS metric
      FROM events GROUP BY 1, 2
    ),
    med AS (SELECT event_type, quantile_cont(metric, 0.5) AS m FROM daily GROUP BY 1),
    dev AS (
      SELECT d.event_type, grain, metric, m, ABS(metric - m) AS ad
      FROM daily d JOIN med USING (event_type)
    ),
    mad AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY 1)
    SELECT dev.event_type, grain, metric,
           CASE WHEN mad > 0
                THEN CAST(FLOOR((metric - m) / (1.4826 * mad) * 1000000) AS BIGINT)
           END AS rz_e6,
           (mad > 0 AND ad > 3.0 * (1.4826 * mad)) AS is_anomaly
    FROM dev JOIN mad USING (event_type)
    """,
    doc="Robust median/MAD anomaly flags per (event_type, day) "
    "(ops.stats.mad_anomalies) — the outlier-resistant twin of "
    "daily_event_anomaly's z-score: a lone massive spike can't hide "
    "itself by inflating the dispersion estimate. Exact grouped "
    "percentiles over day-grain summaries (two group-bounded "
    "aggregations), identical float shapes, floor-micro.",
)
def mad_event_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import mad_anomalies

    ev = t(spark, sf_dir, "events")
    out = mad_anomalies(
        ev, ["event_type"], F.to_date("ts"), F.count("*").cast("long")
    )
    return out.select(
        "event_type",
        F.col("grain").cast("string").alias("grain"),
        "metric",
        "rz_e6",
        "is_anomaly",
    )


@register(
    "cms_join_size",
    oracle="""
    WITH ca AS (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
    cb AS (SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1)
    SELECT CAST(SUM(ca.c * cb.c) AS BIGINT) AS exact_size, TRUE AS cms_ok
    FROM ca JOIN cb USING (k)
    """,
    doc="Join-cardinality estimation from sketches "
    "(agg.sketches.cms_join_size_estimate — the CMS inner-product "
    "estimator): |lineitem JOIN orders ON orderkey| predicted from two "
    "depth-4 x width-8192 sketches WITHOUT touching either table's "
    "rows; the oracle computes the exact join size. cms_ok asserts the "
    "one-sided contract (never under, overshoot <= 3eN_aN_b/width) — "
    "the probe a cost-based planner runs before picking a join "
    "strategy at 100 TB.",
)
def cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from hadoop_fcfs_spark.agg.sketches import cms_join_size_estimate, cms_partial

    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    width = 8192
    ska = cms_partial(li, "l_orderkey", depth=4, width=width)
    skb = cms_partial(orders.withColumnRenamed("o_orderkey", "l_orderkey"),
                      "l_orderkey", depth=4, width=width)
    est = cms_join_size_estimate(ska, skb)
    exact = (
        li.groupBy("l_orderkey").agg(F.count("*").alias("__ca"))
        .join(
            orders.groupBy(F.col("o_orderkey").alias("l_orderkey")).agg(
                F.count("*").alias("__cb")
            ),
            "l_orderkey",
        )
        .agg(F.sum(F.col("__ca") * F.col("__cb")).cast("long").alias("exact_size"))
    )
    na = li.agg(F.count("*").alias("__na"))
    nb = orders.agg(F.count("*").alias("__nb"))
    slack = F.ceil(
        F.lit(3.0 * math.e / width) * F.col("__na").cast("double") * F.col("__nb")
    )
    return (
        exact.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            "exact_size",
            (
                (F.col("join_size_est") >= F.col("exact_size"))
                & (F.col("join_size_est") <= F.col("exact_size") + slack)
            ).alias("cms_ok"),
        )
    )


@register(
    "pareto_orders",
    oracle="""
    WITH d AS (
      SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
             MAX(o_totalprice) AS best_price
      FROM orders GROUP BY 1
    )
    SELECT day, best_price FROM d p
    WHERE NOT EXISTS (
      SELECT 1 FROM d q
      WHERE q.day > p.day AND q.best_price >= p.best_price
    )
    ORDER BY day
    """,
    doc="2D Pareto frontier / skyline (ops.stats.pareto_frontier): the "
    "days whose best order price is not beaten by any later day — no "
    "all-pairs NOT EXISTS, no full-table single-task sweep; a per-day "
    "collapse then the two-level strict-prefix-max scan (chunked by "
    "year, so every window is year- or summary-bounded). Reference "
    "analog: the secondary-sort single-reducer skyline sweep idiom. "
    "Float values are compared, never accumulated — FP-exact.",
)
def pareto_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import pareto_frontier

    orders = t(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("day"),
        F.col("o_totalprice").alias("best_price"),
    )
    out = pareto_frontier(orders, "day", "best_price", chunk_of=F.year)
    return out.select(F.col("day").cast("string").alias("day"), "best_price")


@register(
    "ewma_daily_events",
    oracle="""
    WITH d AS (
      SELECT event_type,
             DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type,
           CAST(CAST(DATE '1970-01-01' + INTERVAL (a.n) DAY AS DATE) AS VARCHAR) AS day,
           a.n_events,
           SUM(b.n_events * power(0.5, a.n - b.n)) AS ewma
    FROM d a JOIN d b
      ON a.event_type = b.event_type AND b.n <= a.n AND b.n > a.n - 20
    GROUP BY a.event_type, a.n, a.n_events
    """,
    doc="Exact-dyadic EWMA smoothing of the daily event volume per type "
    "(ops.timeseries.ewma_decay, decay 1/2 per day, 20-day kernel): "
    "the smoothed-baseline feed for monitors. Decays by CALENDAR "
    "distance so silent days shrink history correctly. The alpha=1/2 "
    "kernel makes every term an exact dyadic and the sum "
    "order-independent below 2^34 — raw doubles hash-compare across "
    "engines with NO rounding, which is the point of the design.",
)
def ewma_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.timeseries import ewma_decay

    ev = t(spark, sf_dir, "events")
    grains = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("n"),
    ).agg(F.count("*").cast("long").alias("n_events"))
    out = ewma_decay(grains, ["event_type"], "n", "n_events", window=20)
    return out.select(
        "event_type",
        F.date_add(F.lit("1970-01-01").cast("date"), F.col("n"))
        .cast("string")
        .alias("day"),
        "n_events",
        "ewma",
    )


@register(
    "theil_sen_trend",
    oracle="""
    WITH g AS (
      SELECT event_type,
             DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS n,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    p AS (
      SELECT a.event_type, (b.y - a.y) * 1.0 / (b.n - a.n) AS slope
      FROM g a JOIN g b ON a.event_type = b.event_type AND b.n > a.n
    ),
    np AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_points FROM g GROUP BY 1),
    s AS (SELECT event_type, quantile_cont(slope, 0.5) AS slope FROM p GROUP BY 1),
    r AS (SELECT g.event_type, g.y - s.slope * g.n AS resid
          FROM g JOIN s USING (event_type)),
    i AS (SELECT event_type, quantile_cont(resid, 0.5) AS icpt FROM r GROUP BY 1)
    SELECT s.event_type, np.n_points,
           CAST(FLOOR(s.slope * 1000000) AS BIGINT) AS slope_e6,
           CAST(FLOOR(i.icpt * 1000000) AS BIGINT) AS intercept_e6
    FROM s JOIN i USING (event_type) JOIN np USING (event_type)
    """,
    doc="Theil–Sen robust daily-volume trend per event type "
    "(ops.stats.theil_sen_trend) — the outlier-resistant twin of "
    "volume_trend's REGR_* least squares. Pairwise slopes generated "
    "INSIDE each group's sorted grain array (quadratic bounded by the "
    "calendar grid, one explode, no self-join on the Spark side; the "
    "oracle uses the naive pair join); grouped exact medians, "
    "division-only float, floor-micro.",
)
def theil_sen_trend_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import theil_sen_trend

    ev = t(spark, sf_dir, "events")
    grains = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("n"),
    ).agg(F.count("*").cast("long").alias("y"))
    out = theil_sen_trend(grains, ["event_type"], "n", "y")
    return out.select(
        "event_type",
        F.col("n_points").cast("long").alias("n_points"),
        F.floor(F.col("slope") * 1_000_000).cast("long").alias("slope_e6"),
        F.floor(F.col("intercept") * 1_000_000).cast("long").alias("intercept_e6"),
    )


@register(
    "chi2_source_lang",
    oracle="""
    WITH j AS (
      SELECT source AS x, lang AS y, CAST(COUNT(*) AS BIGINT) AS nxy
      FROM documents GROUP BY 1, 2
    ),
    mx AS (SELECT x, SUM(nxy) AS nx FROM j GROUP BY 1),
    my AS (SELECT y, SUM(nxy) AS ny FROM j GROUP BY 1),
    tot AS (SELECT CAST(SUM(nxy) AS DOUBLE) AS n,
                   CAST(SUM(nxy) AS BIGINT) AS nb FROM j),
    card AS (SELECT CAST(COUNT(DISTINCT x) AS BIGINT) AS cx,
                    CAST(COUNT(DISTINCT y) AS BIGINT) AS cy FROM j),
    s AS (
      SELECT SUM((nxy - nx * ny / n) * (nxy - nx * ny / n) / (nx * ny / n)
                 - nx * ny / n) AS t
      FROM j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot
    )
    SELECT CAST(FLOOR((t + nb) * 1000000) AS BIGINT) AS chi2_e6,
           (cx - 1) * (cy - 1) AS dof, nb AS n
    FROM s CROSS JOIN tot CROSS JOIN card
    """,
    doc="Chi-squared independence test source x lang "
    "(ops.stats.chi_squared_independence) — the significance sibling "
    "of orders_mutual_info. Observed-cells-only formulation: a zero "
    "cell contributes exactly its expectation and Σexpected = N, so "
    "X² = Σ_obs((o−e)²/e − e) + N — no dense |X|x|Y| cross join. "
    "Integer counts, division-only float, floor-micro.",
)
def chi2_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import chi_squared_independence

    return chi_squared_independence(t(spark, sf_dir, "documents"), "source", "lang")


@register(
    "ab_test_conversion",
    oracle="""
    WITH u AS (
      SELECT user_id,
             MAX(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS v,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 15
                  THEN 1 ELSE 0 END AS s
      FROM events GROUP BY 1
    ),
    c AS (
      SELECT CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_control,
             CAST(SUM(CASE WHEN v = 0 AND s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS conv_control,
             CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
             CAST(SUM(CASE WHEN v = 1 AND s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS conv_treat
      FROM u
    )
    SELECT n_control, conv_control, n_treat, conv_treat,
           CAST(FLOOR(
             (conv_treat / n_treat - conv_control / n_control)
             / sqrt(((conv_control + conv_treat) / (n_control + n_treat))
                    * (1 - (conv_control + conv_treat) / (n_control + n_treat))
                    * (1.0 / n_control + 1.0 / n_treat))
             * 1000000) AS BIGINT) AS z_e6
    FROM c
    """,
    doc="A/B conversion test (ops.stats.two_proportion_ztest): pooled "
    "two-proportion z between a deterministic user split (user_id "
    "parity — the assignment IS the md5-holdout idiom's degenerate "
    "case) on purchase conversion, computed at USER grain (events per "
    "user are not independent trials). One unit aggregation + a "
    "4-integer scalar reduce; z is division-only float over exact "
    "integers.",
)
def ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import two_proportion_ztest

    ev = t(spark, sf_dir, "events")
    return two_proportion_ztest(
        ev,
        F.col("user_id") % 2 == 1,
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) >= 15,
        "user_id",
    )


@register(
    "psi_price_drift",
    oracle="""
    WITH r AS (
      SELECT LEAST(GREATEST(CAST(FLOOR((o_totalprice - 0.0) / 60000.0) AS BIGINT), 0), 9) AS bin,
             CAST(COUNT(*) AS BIGINT) AS nr
      FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01' GROUP BY 1
    ),
    c AS (
      SELECT LEAST(GREATEST(CAST(FLOOR((o_totalprice - 0.0) / 60000.0) AS BIGINT), 0), 9) AS bin,
             CAST(COUNT(*) AS BIGINT) AS nc
      FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01' GROUP BY 1
    ),
    tr AS (SELECT CAST(SUM(nr) AS DOUBLE) AS t FROM r),
    tc AS (SELECT CAST(SUM(nc) AS DOUBLE) AS t FROM c),
    terms AS (
      SELECT ((COALESCE(nc, 0) + 0.5) / (tc.t + 5.0)
              - (COALESCE(nr, 0) + 0.5) / (tr.t + 5.0))
             * ln(((COALESCE(nc, 0) + 0.5) / (tc.t + 5.0))
                  / ((COALESCE(nr, 0) + 0.5) / (tr.t + 5.0))) AS t,
             tr.t AS trt, tc.t AS tct
      FROM r FULL OUTER JOIN c USING (bin) CROSS JOIN tr CROSS JOIN tc
    )
    SELECT CAST(FLOOR(SUM(t) * 1000000) AS BIGINT) AS psi_e6,
           CAST(MAX(trt) AS BIGINT) AS n_ref, CAST(MAX(tct) AS BIGINT) AS n_cur
    FROM terms
    """,
    doc="Population stability index on order value, pre-1995 vs "
    "post-1995 (ops.stats.population_stability_index): the scorecard "
    "drift monitor over FIXED equal-width bins [0, 600k)x10 (fixed "
    "bins keep ref/cur comparable and the statistic "
    "engine-replayable; edge bins clamp), add-half smoothing. Two "
    "count aggregations + a bins-sized join. corpus_drift's KL is "
    "the vocabulary twin; PSI is the numeric-column one.",
)
def psi_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import population_stability_index

    orders = t(spark, sf_dir, "orders")
    ref = orders.filter(F.col("o_orderdate") < "1995-01-01")
    cur = orders.filter(F.col("o_orderdate") >= "1995-01-01")
    return population_stability_index(
        ref, cur, "o_totalprice", lo=0.0, hi=600_000.0, n_bins=10
    )


@register(
    "kaplan_meier_retention",
    oracle="""
    WITH u AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS f, MAX(CAST(ts AS DATE)) AS l,
             MIN(CASE WHEN event_type = 'purchase' AND value > 150
                      THEN CAST(ts AS DATE) END) AS conv
      FROM events GROUP BY 1
    ),
    d AS (
      SELECT CASE WHEN conv IS NOT NULL THEN DATEDIFF('day', f, conv)
                  ELSE DATEDIFF('day', f, l) END AS t,
             (conv IS NULL) AS cens
      FROM u
    ),
    g AS (
      SELECT t, SUM(CASE WHEN NOT cens THEN 1 ELSE 0 END) AS de, COUNT(*) AS a
      FROM d GROUP BY 1
    ),
    tot AS (SELECT SUM(a) AS n FROM g),
    r1 AS (
      SELECT t, de, a,
             n - COALESCE(SUM(a) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
      FROM g CROSS JOIN tot
    ),
    r2 AS (
      SELECT t, de, n_risk,
             exp(SUM(CASE WHEN de < n_risk THEN ln(1 - de / n_risk)
                          ELSE CAST('-inf' AS DOUBLE) END) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
      FROM r1
    )
    SELECT CAST(t AS BIGINT) AS t, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(de AS BIGINT) AS d_events,
           CAST(ROUND(s * 1000000) AS BIGINT) AS surv_e6
    FROM r2 WHERE de > 0
    """,
    doc="Kaplan-Meier time-to-conversion curve "
    "(ops.stats.kaplan_meier): duration = days from a user's first "
    "event to their first high-value purchase (value > 150); users who "
    "never convert are right-censored at their last observed day — "
    "they leave the risk set without counting as conversions, the bias "
    "correction naive conversion curves miss. One user-grain "
    "aggregation; risk-set and product windows run over duration-grain "
    "summary rows only. S(t) = exp(Σ ln(1−d/n)) — ln/exp parity, "
    "ROUND-micro (the exact-rational products land ON 1e-6 multiples; "
    "floor split the engines by one ulp at sf0.1).",
)
def kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import kaplan_meier

    ev = t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("__f"),
        F.max(F.to_date("ts")).alias("__l"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150),
                F.to_date("ts"),
            )
        ).alias("__conv"),
    )
    durations = u.select(
        F.when(
            F.col("__conv").isNotNull(), F.datediff("__conv", "__f")
        ).otherwise(F.datediff("__l", "__f")).alias("dur"),
        F.col("__conv").isNull().alias("cens"),
    )
    return kaplan_meier(durations, "dur", "cens")


@register(
    "rmst_retention",
    oracle="""
    WITH u AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS f, MAX(CAST(ts AS DATE)) AS l,
             MIN(CASE WHEN event_type = 'purchase' AND value > 150
                      THEN CAST(ts AS DATE) END) AS conv
      FROM events GROUP BY 1
    ),
    d AS (
      SELECT CASE WHEN conv IS NOT NULL THEN DATEDIFF('day', f, conv)
                  ELSE DATEDIFF('day', f, l) END AS t,
             (conv IS NULL) AS cens
      FROM u
    ),
    g AS (
      SELECT t, SUM(CASE WHEN NOT cens THEN 1 ELSE 0 END) AS de, COUNT(*) AS a
      FROM d GROUP BY 1
    ),
    tot AS (SELECT SUM(a) AS n FROM g),
    r1 AS (
      SELECT t, de, a,
             n - COALESCE(SUM(a) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
      FROM g CROSS JOIN tot
    ),
    r2 AS (
      SELECT t, de, n_risk,
             exp(SUM(CASE WHEN de < n_risk THEN ln(1 - de / n_risk)
                          ELSE CAST('-inf' AS DOUBLE) END) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
      FROM r1
    ),
    km AS (
      SELECT CAST(t AS BIGINT) AS t,
             CAST(ROUND(s * 1000000) AS BIGINT) AS se6
      FROM r2 WHERE de > 0
    ),
    iv AS (SELECT t, se6, LEAD(t) OVER (ORDER BY t) AS nt FROM km),
    hd AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_event_times,
             CAST(LEAST(COALESCE(MIN(t), 14), 14) * 1000000 AS BIGINT)
               AS head
      FROM km
    ),
    bd AS (
      SELECT CAST(COALESCE(SUM(se6 * (LEAST(COALESCE(nt, 14), 14)
               - LEAST(t, 14))), 0) AS BIGINT) AS body
      FROM iv
    )
    SELECT CAST(14 AS BIGINT) AS tau, n_event_times,
           head + body AS rmst_micro
    FROM hd CROSS JOIN bd
    """,
    doc="Restricted mean survival time at a 14-day horizon over the "
    "kaplan_meier_retention curve (ops.stats."
    "restricted_mean_survival): expected days until first high-value "
    "conversion within two weeks, censoring-aware - the effect-size "
    "summary survival analysis quotes when the median is undefined "
    "or hazards cross (logrank_cohorts tests WHETHER curves differ; "
    "RMST says by how many days). The IDENTICAL KM replay as the "
    "curve gate (same CTE chain), then the step-function integral as "
    "pure BIGINT arithmetic over the round-micro surv_e6 values: "
    "min(t1, tau)*1e6 head + sum of surv*interval pieces, one LEAD "
    "over duration-grain summary rows.",
)
def rmst_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import restricted_mean_survival

    ev = t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("__f"),
        F.max(F.to_date("ts")).alias("__l"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150),
                F.to_date("ts"),
            )
        ).alias("__conv"),
    )
    durations = u.select(
        F.when(
            F.col("__conv").isNotNull(), F.datediff("__conv", "__f")
        ).otherwise(F.datediff("__l", "__f")).alias("dur"),
        F.col("__conv").isNull().alias("cens"),
    )
    return restricted_mean_survival(durations, "dur", "cens", tau=14)


@register(
    "rolling_wau",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM ud),
    win AS (
      SELECT ud.user_id,
             CAST(ud.day + INTERVAL (6 - off) DAY AS DATE) AS wend
      FROM ud CROSS JOIN (SELECT UNNEST(range(0, 7)) AS off)
    )
    SELECT CAST(wend AS VARCHAR) AS window_end,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
    FROM win CROSS JOIN bounds
    WHERE wend >= CAST(lo + INTERVAL 6 DAY AS DATE) AND wend <= hi
    GROUP BY 1
    """,
    doc="Rolling 7-day active users (WAU): the distinct-over-sliding-"
    "window problem, which has NO partial-aggregatable exact form — "
    "solved by exploding the per-(user, day) table into the 7 windows "
    "each day belongs to, then countDistinct per window end. The "
    "explode runs over the user-day GRAIN (already deduped), never raw "
    "events, so the fanout is 7x|user-days|. The 100 TB path swaps "
    "countDistinct for the agg.sketches HLL tier: materialize one "
    "sketch per day, union 7 per window — hll_distinct_rollup proves "
    "that machinery. Windows clipped to fully-covered ends.",
)
def rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    bounds = ud.agg(F.min("day").alias("__lo"), F.max("day").alias("__hi"))
    win = ud.select(
        "user_id",
        F.explode(
            F.array(*[F.date_add(F.col("day"), 6 - off) for off in range(7)])
        ).alias("wend"),
    )
    return (
        win.crossJoin(F.broadcast(bounds))
        .filter(
            (F.col("wend") >= F.date_add(F.col("__lo"), 6))
            & (F.col("wend") <= F.col("__hi"))
        )
        .groupBy(F.col("wend").cast("string").alias("window_end"))
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
    )


@register(
    "benford_price_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
    tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS tn FROM c)
    SELECT digit, n,
           CAST(FLOOR(ln(1 + 1.0 / digit) / ln(10.0) * 1000000) AS BIGINT)
             AS benford_e6,
           CAST(FLOOR(n / tn * 1000000) AS BIGINT) AS observed_e6,
           CAST(FLOOR((n / tn - ln(1 + 1.0 / digit) / ln(10.0))
                 * (n / tn - ln(1 + 1.0 / digit) / ln(10.0))
                 / (ln(1 + 1.0 / digit) / ln(10.0)) * tn * 1000000) AS BIGINT)
             AS chi2_contrib_e6
    FROM c CROSS JOIN tot
    """,
    doc="Benford's-law first-digit audit of order values — the "
    "classic forensic/data-quality screen for fabricated or truncated "
    "numeric columns: observed first-digit shares vs log10(1+1/d), "
    "with per-digit chi-squared contributions. First digit extracted "
    "through integer-string truncation (identical in both engines — "
    "no float log tricks); one count aggregation + a 9-row compare. "
    "Division-only float, floor-micro.",
)
def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    orders = t(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("long")
    c = (
        orders.filter(F.col("o_totalprice") >= 1)
        .groupBy(digit.alias("digit"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    tot = c.agg(F.sum("n").cast("double").alias("__tn"))
    p_obs = F.col("n") / F.col("__tn")
    p_ben = F.log(1 + 1.0 / F.col("digit")) / F.lit(math.log(10.0))
    return c.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        F.floor(p_ben * 1_000_000).cast("long").alias("benford_e6"),
        F.floor(p_obs * 1_000_000).cast("long").alias("observed_e6"),
        F.floor(
            (p_obs - p_ben) * (p_obs - p_ben) / p_ben * F.col("__tn") * 1_000_000
        ).cast("long").alias("chi2_contrib_e6"),
    )


@register(
    "spearman_qty_price",
    oracle="""
    WITH base AS (SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem),
    gx AS (SELECT x, COUNT(*) AS c FROM base GROUP BY 1),
    rx AS (
      SELECT x, COALESCE(SUM(c) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + (c + 1) / 2.0 AS rkx
      FROM gx
    ),
    gy AS (SELECT y, COUNT(*) AS c FROM base GROUP BY 1),
    ry AS (
      SELECT y, COALESCE(SUM(c) OVER (ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + (c + 1) / 2.0 AS rky
      FROM gy
    )
    SELECT ROUND(CORR(rkx, rky), 6) AS spearman,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM base JOIN rx USING (x) JOIN ry USING (y)
    """,
    doc="Spearman rank correlation quantity vs price "
    "(ops.stats.spearman_corr) — the monotone-dependence screen next "
    "to lineitem_corr's Pearson. Average ranks come from the distinct-"
    "VALUE grain (prefix sum over value summaries + join back), never "
    "a global row window; ties share their exact fractional mean "
    "rank. Rounded @6 like the Pearson gate.",
)
def spearman_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import spearman_corr

    return spearman_corr(t(spark, sf_dir, "lineitem"), "l_quantity", "l_extendedprice")


@register(
    "weighted_median_price",
    oracle="""
    WITH g AS (
      SELECT l_extendedprice AS v,
             SUM(CAST(l_quantity AS BIGINT)) AS w
      FROM lineitem GROUP BY 1
    ),
    c AS (
      SELECT v, SUM(w) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM g
    ),
    tot AS (SELECT SUM(w) AS t FROM g)
    SELECT MIN(v) AS wmedian, CAST(MAX(t) AS BIGINT) AS total_weight
    FROM c CROSS JOIN tot WHERE 2 * cum >= t
    """,
    doc="Quantity-weighted median price (ops.stats.weighted_median): "
    "the price below which half the shipped VOLUME trades — distinct "
    "from the unweighted median whenever quantity correlates with "
    "price. Distinct-value grain collapse + prefix sum over the grain "
    "summary + first-crossing min; integer weights make the crossing "
    "exact. No value interpolation (lower-median convention, "
    "documented).",
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import weighted_median

    return weighted_median(
        t(spark, sf_dir, "lineitem"), "l_extendedprice", "l_quantity"
    )


@register(
    "new_vs_returning_daily",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    firsts AS (SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY 1)
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS new_users,
           CAST(SUM(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS returning_users
    FROM ud JOIN firsts USING (user_id)
    GROUP BY day
    """,
    doc="Daily new vs returning actives — the growth-accounting split "
    "every product dashboard leads with. User-day grain (deduped, one "
    "data-sized pass), first-day table re-aggregated from it and "
    "joined back on user_id (co-located shuffle); integer counts.",
)
def new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    from hadoop_fcfs_spark.caching import waypoint

    ud = waypoint(ud)
    firsts = ud.groupBy("user_id").agg(F.min("day").alias("__first"))
    return (
        ud.join(firsts, "user_id")
        .groupBy(F.col("day").cast("string").alias("day"))
        .agg(
            F.sum(F.when(F.col("day") == F.col("__first"), 1).otherwise(0))
            .cast("long").alias("new_users"),
            F.sum(F.when(F.col("day") > F.col("__first"), 1).otherwise(0))
            .cast("long").alias("returning_users"),
        )
    )


@register(
    "event_seasonality",
    oracle="""
    SELECT CAST(isodow(ts) - 1 AS BIGINT) AS weekday,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2, 3
    """,
    doc="Hour-of-day x weekday seasonality matrix per event type — the "
    "load-shape profile capacity planning and anomaly baselines start "
    "from. Weekday convention pinned explicitly (Spark weekday() "
    "0=Monday == DuckDB isodow-1; naive dayofweek() would skew by one "
    "day between engines). One count aggregation, integer out.",
)
def event_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.groupBy(
        F.weekday("ts").cast("long").alias("weekday"),
        F.hour("ts").cast("long").alias("hour"),
        "event_type",
    ).agg(F.count("*").cast("long").alias("n"))


@register(
    "qty_price_histogram2d",
    oracle="""
    SELECT CAST(FLOOR(l_quantity / 10.0) AS BIGINT) AS qty_band,
           CAST(FLOOR(l_extendedprice / 10000.0) AS BIGINT) AS price_band,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM lineitem GROUP BY 1, 2
    """,
    doc="2D joint histogram quantity x price (fixed-width bands): the "
    "joint-distribution profile that 1D histograms (value_histogram) "
    "can't show — where the volume/value mass actually sits. Pure "
    "per-row binning + one aggregation; integer counts and "
    "integer-cent mass.",
)
def qty_price_histogram2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.floor(F.col("l_quantity") / 10.0).cast("long").alias("qty_band"),
        F.floor(F.col("l_extendedprice") / 10000.0).cast("long").alias("price_band"),
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long").alias("cents"),
    )


@register(
    "cohort_ltv_curve",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY 1
    ),
    sized AS (
      SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_users
      FROM firsts GROUP BY 1
    ),
    rev AS (
      SELECT f.cohort_week,
             CAST(FLOOR(DATEDIFF('day', f.cohort_week, CAST(e.ts AS DATE)) / 7.0)
               AS BIGINT) AS week_offset,
             SUM(CAST(FLOOR(e.value * 100) AS BIGINT)) AS cents
      FROM events e JOIN firsts f USING (user_id)
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT CAST(r.cohort_week AS VARCHAR) AS cohort_week,
           r.week_offset, s.cohort_users,
           CAST(SUM(r.cents) OVER (PARTITION BY r.cohort_week ORDER BY r.week_offset
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_cents,
           CAST(SUM(r.cents) OVER (PARTITION BY r.cohort_week ORDER BY r.week_offset
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 // s.cohort_users AS BIGINT) AS cum_cents_per_user
    FROM rev r JOIN sized s USING (cohort_week)
    """,
    doc="Cohort LTV curves: cumulative purchase revenue per signup-week "
    "cohort by week offset, absolute and per-user — the growth-"
    "accounting companion to cohort_retention. Revenue in integer "
    "cents from the row level; the cumulative window runs over "
    "(cohort, offset) SUMMARY rows; per-user = INTEGER division (div "
    "// — a float division cast to BIGINT truncates in Spark but "
    "rounds in DuckDB).",
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from hadoop_fcfs_spark.caching import waypoint

    ev = t(spark, sf_dir, "events")
    firsts = waypoint(
        ev.groupBy("user_id").agg(
            F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
        )
    )
    sized = firsts.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("cohort_users")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(
                F.datediff(F.to_date("ts"), F.col("cohort_week")) / 7.0
            ).cast("long").alias("week_offset"),
        )
        .agg(F.sum(F.floor(F.col("value") * 100).cast("long")).alias("__cents"))
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("__cents").over(w)
    return (
        rev.join(sized, "cohort_week")
        .select(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            "week_offset",
            "cohort_users",
            cum.cast("long").alias("cum_cents"),
        )
        .withColumn("cum_cents_per_user", F.expr("cum_cents div cohort_users"))
    )


@register(
    "user_behavior_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT user_id, SUM(n) AS t FROM c GROUP BY 1),
    ent AS (
      SELECT c.user_id,
             -SUM((CAST(n AS DOUBLE) / t) * ln(CAST(n AS DOUBLE) / t)) AS h
      FROM c JOIN tot USING (user_id) GROUP BY 1
    )
    SELECT CAST(FLOOR(h * 10) AS BIGINT) AS entropy_band,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM ent GROUP BY 1
    """,
    doc="Behavioral-diversity segmentation: Shannon entropy of each "
    "user's event-type mix (0 = single-minded, ln(5) = uniform across "
    "all types), banded at 0.1-nat width — the engagement-breadth "
    "segment marketers cut by. Per-user bounded entropy sum over the "
    "(user, type) count table; identical division/ln shapes; banding "
    "on the shared float (generic reals — not a quantization-step "
    "boundary case).",
)
def user_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    tot = c.groupBy("user_id").agg(F.sum("n").alias("__t"))
    p = F.col("n").cast("double") / F.col("__t")
    ent = (
        c.join(tot, "user_id")
        .groupBy("user_id")
        .agg((-F.sum(p * F.log(p))).alias("__h"))
    )
    return ent.groupBy(
        F.floor(F.col("__h") * 10).cast("long").alias("entropy_band")
    ).agg(F.count("*").cast("long").alias("n_users"))


@register(
    "shipping_lead_time",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority,
             DATEDIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
               AS lead_days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(lead_days) AS BIGINT) AS min_days,
           CAST(quantile_cont(lead_days, 0.5) AS DOUBLE) AS p50_days,
           CAST(quantile_cont(lead_days, 0.95) AS DOUBLE) AS p95_days,
           CAST(MAX(lead_days) AS BIGINT) AS max_days
    FROM g GROUP BY 1
    """,
    doc="Shipping lead-time distribution per order priority: days from "
    "order to line shipment, exact interpolated percentiles over "
    "integer day gaps — the SLA view of the order pipeline (does "
    "1-URGENT actually ship faster?). One join shuffled on the order "
    "key, grouped exact percentiles.",
)
def shipping_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    g = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias("lead_days"),
    )
    return g.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n"),
        F.min("lead_days").cast("long").alias("min_days"),
        F.percentile("lead_days", F.lit(0.5)).cast("double").alias("p50_days"),
        F.percentile("lead_days", F.lit(0.95)).cast("double").alias("p95_days"),
        F.max("lead_days").cast("long").alias("max_days"),
    )


@register(
    "abc_inventory_classes",
    oracle="""
    WITH pr AS (
      SELECT l_partkey,
             SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
               AS rev_cents
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT SUM(rev_cents) AS t FROM pr),
    c AS (
      SELECT rev_cents,
             SUM(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM pr
    )
    SELECT CASE WHEN 100 * cum <= 80 * t THEN 'A'
                WHEN 100 * cum <= 95 * t THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev_cents) AS BIGINT) AS revenue_cents
    FROM c CROSS JOIN tot
    GROUP BY 1
    """,
    doc="ABC inventory classification: parts ranked by exact integer-"
    "cent revenue, cumulative-share classes A (first 80% of revenue), "
    "B (to 95%), C (tail) — the Pareto stocking-policy report. The "
    "cumulative sum runs through ops.sort.global_running_sum (range-"
    "partitioned two-level scan over the part grain — at 10^8 parts a "
    "single-task ORDER BY window would melt); class membership is an "
    "exact integer cross-multiplication (100*cum <= 80*total), so no "
    "float share ever decides a boundary part.",
)
def abc_inventory_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.caching import waypoint
    from hadoop_fcfs_spark.ops.sort import global_running_sum

    li = t(spark, sf_dir, "lineitem")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    # the part grain feeds the total AND the running sum — persist so
    # the raw table is scanned once
    pr = waypoint(li.groupBy("l_partkey").agg(F.sum(cents).alias("rev_cents")))
    tot = pr.agg(F.sum("rev_cents").alias("__t"))
    cum = global_running_sum(
        pr, [F.desc("rev_cents"), F.asc("l_partkey")], "rev_cents", out_col="__cum"
    )
    cls = (
        F.when(100 * F.col("__cum") <= 80 * F.col("__t"), "A")
        .when(100 * F.col("__cum") <= 95 * F.col("__t"), "B")
        .otherwise("C")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy(cls.alias("abc_class"))
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum("rev_cents").cast("long").alias("revenue_cents"),
        )
    )


@register(
    "wilson_conversion_bounds",
    oracle="""
    WITH ch AS (
      SELECT user_id, event_type AS channel, MIN(ts) AS first_touch
      FROM events WHERE event_type <> 'purchase'
      GROUP BY 1, 2
    ),
    pu AS (
      SELECT user_id, MAX(ts) AS last_purchase
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    ),
    arms AS (
      SELECT channel,
             COUNT(*) AS n,
             COUNT(*) FILTER (last_purchase > first_touch) AS conv
      FROM ch LEFT JOIN pu USING (user_id)
      GROUP BY 1
    )
    SELECT channel, CAST(n AS BIGINT) AS n_users,
           CAST(conv AS BIGINT) AS n_converted,
           CAST(FLOOR(GREATEST(0.0,
                (((CAST(conv AS DOUBLE) / CAST(n AS DOUBLE)
                  + (1.96 * 1.96) / (2 * CAST(n AS DOUBLE)))
                 - 1.96 * sqrt((CAST(conv AS DOUBLE) / CAST(n AS DOUBLE))
                     * (1 - CAST(conv AS DOUBLE) / CAST(n AS DOUBLE))
                     / CAST(n AS DOUBLE)
                     + (1.96 * 1.96)
                       / (4 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
                / (1 + (1.96 * 1.96) / CAST(n AS DOUBLE)))) * 1000000)
              AS BIGINT) AS wilson_lb_e6
    FROM arms
    """,
    doc="Per-channel conversion with the Wilson-score 95% lower bound "
    "(ops.stats.wilson_lower_bound): a user 'converts' on a channel "
    "when their last purchase is after their first touch of it. The "
    "honest way to rank channels with unequal exposure - the naive "
    "rate lets a 2/2 channel beat a 480/520 one. Two user-grain "
    "aggregations + one channel-grain reduce; the bound is division-"
    "only float + one sqrt over exact integers with IDENTICAL "
    "expression shapes both engines (z^2 written as 1.96*1.96 in BOTH "
    "- a pre-rounded 3.8416 literal parses to a DIFFERENT double than "
    "the product), FLOOR-micro.",
)
def wilson_conversion_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import wilson_lower_bound

    ev = t(spark, sf_dir, "events")
    ch = ev.filter(F.col("event_type") != "purchase").groupBy(
        "user_id", F.col("event_type").alias("channel")
    ).agg(F.min("ts").alias("__ft"))
    pu = ev.filter(F.col("event_type") == "purchase").groupBy("user_id").agg(
        F.max("ts").alias("__lp")
    )
    arms = (
        ch.join(pu, "user_id", "left")
        .groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum(
                F.when(F.col("__lp") > F.col("__ft"), 1).otherwise(0)
            ).cast("long").alias("n_converted"),
        )
    )
    lb = wilson_lower_bound(F.col("n_converted"), F.col("n_users"))
    return arms.select(
        "channel", "n_users", "n_converted",
        F.floor(lb * 1_000_000).cast("long").alias("wilson_lb_e6"),
    )


@register(
    "ols_qty_price_by_brand",
    oracle="""
    WITH j AS (
      SELECT p_brand,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    m AS (
      SELECT p_brand, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM j GROUP BY 1
    )
    SELECT p_brand, CAST(n AS BIGINT) AS n,
           CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                THEN CAST(FLOOR((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * 1000000) AS BIGINT)
           END AS slope_e6,
           CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                THEN CAST(FLOOR((CAST(sy AS DOUBLE)
                       - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                         * CAST(sx AS DOUBLE))
                     / CAST(n AS DOUBLE) * 100) AS BIGINT)
           END AS intercept_cents
    FROM m
    """,
    doc="Per-brand OLS regression of line price (integer cents) on "
    "quantity - the classical least-squares complement to "
    "theil_sen_trend's robust slope, grouped-model fitting as pure "
    "moment aggregation (never a per-group solver UDF): slope = "
    "(n*Sxy - Sx*Sy)/(n*Sxx - Sx^2). The SUMS stay exact BIGINT (Sxy "
    "< 2^63 up to ~sf10000 for TPC-H's 25 fixed brands); the n*Sxy "
    "PRODUCTS are computed in double on BOTH sides - DuckDB would "
    "promote them to HUGEINT while Spark's long silently wraps around "
    "sf1 (rows-per-brand, not brand count, is the overflow axis), so "
    "cast-then-multiply keeps the engines on the identical IEEE "
    "value at every scale. Intercept from the fitted slope; NULL on "
    "zero-variance groups (the ANSI corr() gotcha, guarded). One "
    "map-side-combined moment pass; FLOOR-quantized outputs with "
    "identical expression shapes both engines.",
)
def ols_qty_price_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey).select(
        "p_brand",
        F.col("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    m = j.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    # products in double: long n*sxy would silently wrap around sf1
    det = nd * F.col("sxx").cast("double") - sxd * sxd
    num = nd * F.col("sxy").cast("double") - sxd * syd
    slope = num / det
    intercept = (syd - slope * sxd) / nd
    return m.select(
        "p_brand",
        F.col("n").cast("long").alias("n"),
        F.when(det > 0, F.floor(slope * 1_000_000).cast("long")).alias("slope_e6"),
        F.when(det > 0, F.floor(intercept * 100).cast("long")).alias("intercept_cents"),
    )


@register(
    "ks_price_returnflag",
    oracle="""
    WITH g AS (
      SELECT l_extendedprice AS v,
             SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS cb
      FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1
    ),
    c AS (
      SELECT SUM(ca) OVER (ORDER BY v) AS cuma,
             SUM(cb) OVER (ORDER BY v) AS cumb
      FROM g
    ),
    tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM g)
    SELECT CAST(FLOOR(MAX(ABS(CAST(cuma AS DOUBLE) / CAST(na AS DOUBLE)
                 - CAST(cumb AS DOUBLE) / CAST(nb AS DOUBLE))) * 1000000)
           AS BIGINT) AS d_e6,
           CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b
    FROM c CROSS JOIN tot
    """,
    doc="Two-sample Kolmogorov-Smirnov D between returned ('R') and "
    "in-transit ('N') line price distributions "
    "(ops.stats.ks_two_sample) - the binning-free drift screen next "
    "to psi_price_drift. Value-grain collapse + two "
    "global_running_sum passes for the ECDFs; per-row gap doubles are "
    "one division each from exact BIGINTs and max() is "
    "order-independent, so floor-micro is deterministic cross-engine.",
)
def ks_price_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import ks_two_sample

    return ks_two_sample(
        t(spark, sf_dir, "lineitem"), "l_extendedprice", "l_returnflag", "R", "N"
    )


@register(
    "emd_price_returnflag",
    oracle="""
    WITH g AS (
      SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS v,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
               AS BIGINT) AS cb
      FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1
    ),
    c AS (
      SELECT v, SUM(ca) OVER w AS cua, SUM(cb) OVER w AS cub,
             LEAD(v) OVER w AS nv
      FROM g WINDOW w AS (ORDER BY v)
    ),
    tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
                   CAST(SUM(cb) AS BIGINT) AS nb FROM g),
    s AS (
      SELECT SUM(CAST(nv - v AS HUGEINT)
                 * ABS(CAST(cua AS HUGEINT) * nb
                       - CAST(cub AS HUGEINT) * na)) AS w1
      FROM c CROSS JOIN tot WHERE nv IS NOT NULL
    )
    SELECT tot.na AS n_a, tot.nb AS n_b,
           CASE WHEN tot.na > 0 AND tot.nb > 0 THEN
             CAST((CAST(COALESCE(w1, 0) AS HUGEINT) * 1000000)
               // (CAST(na AS HUGEINT) * nb) AS BIGINT)
           END AS emd_value_e6
    FROM s CROSS JOIN tot
    """,
    doc="Exact 1-D earth mover's distance between returned ('R') and "
    "in-transit ('N') line prices in floored cents "
    "(ops.stats.emd_two_sample): the drift magnitude completing the "
    "family on the exact ks_price_returnflag slice - KS reports the "
    "worst ECDF gap (unit-free), PSI/JSD need bins, EMD integrates "
    "the gap in cents so the shift is readable in money. W1*nA*nB = "
    "sum over the value grain of (v_next - v)*|cumA*nB - cumB*nA|, "
    "every term exact, summed in DECIMAL(38,0)/HUGEINT, one "
    "truncating division to micro value units. One grain collapse + "
    "ONE multi-column global_running_sum (cumA, cumB, rank ride one "
    "range shuffle) + a rank equi-join as the range-partitioned "
    "LEAD.",
)
def emd_price_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import emd_two_sample

    li = t(spark, sf_dir, "lineitem").withColumn(
        "__cents", F.floor(F.col("l_extendedprice") * 100).cast("long")
    )
    return emd_two_sample(li, "__cents", "l_returnflag", "R", "N")


@register(
    "mwu_priority_price",
    oracle="""
    WITH g AS (
      SELECT o_totalprice AS v,
             SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS cb
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW') GROUP BY 1
    ),
    r AS (
      SELECT ca, cb, ca + cb AS c,
             COALESCE(SUM(ca + cb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
      FROM g
    ),
    m AS (
      SELECT SUM(ca * (2 * bef + c + 1)) AS r2a,
             SUM(ca) AS na, SUM(cb) AS nb,
             SUM(c * c * c - c) AS ties
      FROM r
    )
    SELECT CAST(r2a - na * (na + 1) AS BIGINT) AS u2,
           CASE WHEN na > 0 AND nb > 0
                 AND CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0
                     * ((CAST(na + nb AS DOUBLE) + 1.0)
                        - CAST(ties AS DOUBLE)
                          / (CAST(na + nb AS DOUBLE)
                             * (CAST(na + nb AS DOUBLE) - 1.0))) > 0
           THEN CAST(FLOOR(
                 (CAST(r2a - na * (na + 1) AS DOUBLE)
                  - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
                 / (2.0 * sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0
                     * ((CAST(na + nb AS DOUBLE) + 1.0)
                        - CAST(ties AS DOUBLE)
                          / (CAST(na + nb AS DOUBLE)
                             * (CAST(na + nb AS DOUBLE) - 1.0)))))
                 * 1000000) AS BIGINT)
           END AS z_e6,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b
    FROM m
    """,
    doc="Mann-Whitney U (rank-sum) test: do URGENT orders carry "
    "stochastically larger totals than LOW-priority ones "
    "(ops.stats.mann_whitney_u) - the rank-based complement to the "
    "Welch mean test, robust to the price skew. Exact 2x-scaled "
    "BIGINT rank sums over the value grain (exclusive prefix via "
    "global_running_sum, average ranks for ties), tie-corrected "
    "normal z floored to micros.",
)
def mwu_priority_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import mann_whitney_u

    return mann_whitney_u(
        t(spark, sf_dir, "orders"), "o_totalprice", "o_orderpriority",
        "1-URGENT", "5-LOW",
    )


@register(
    "welch_acctbal_segments",
    oracle="""
    WITH q AS (
      SELECT c_mktsegment AS g,
             CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS v
      FROM customer
      WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        AND c_acctbal IS NOT NULL
    ),
    m AS (
      SELECT
        SUM(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END) AS na,
        COALESCE(SUM(CASE WHEN g = 'BUILDING' THEN v END), 0) AS s1a,
        COALESCE(SUM(CASE WHEN g = 'BUILDING' THEN v * v END), 0) AS s2a,
        SUM(CASE WHEN g = 'MACHINERY' THEN 1 ELSE 0 END) AS nb,
        COALESCE(SUM(CASE WHEN g = 'MACHINERY' THEN v END), 0) AS s1b,
        COALESCE(SUM(CASE WHEN g = 'MACHINERY' THEN v * v END), 0) AS s2b
      FROM q
    ),
    d AS (
      SELECT na, nb,
        (CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE)
           / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0)
          / CAST(na AS DOUBLE) AS sea,
        (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE)
           / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0)
          / CAST(nb AS DOUBLE) AS seb,
        CAST(s1a AS DOUBLE) / CAST(na AS DOUBLE) AS ma,
        CAST(s1b AS DOUBLE) / CAST(nb AS DOUBLE) AS mb
      FROM m
    )
    SELECT
      CASE WHEN na > 1 AND nb > 1 AND sea + seb > 0
           THEN CAST(FLOOR((ma - mb) / sqrt(sea + seb) * 1000000) AS BIGINT)
      END AS t_e6,
      CASE WHEN na > 1 AND nb > 1 AND sea + seb > 0
           THEN CAST(FLOOR((sea + seb) * (sea + seb)
                / (sea * sea / (CAST(na AS DOUBLE) - 1.0)
                   + seb * seb / (CAST(nb AS DOUBLE) - 1.0)) * 1000) AS BIGINT)
      END AS df_e3,
      CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b
    FROM d
    """,
    doc="Welch's unequal-variance t-test on account balances between "
    "the BUILDING and MACHINERY market segments "
    "(ops.stats.welch_ttest) - the parametric mean comparison beside "
    "ab_test_conversion's proportion z-test. Cent-quantized values "
    "make each arm's (n, S1, S2) exact BIGINTs in one map-side "
    "combined pass; t and the Welch-Satterthwaite df are a flat "
    "division+sqrt shape over those integers, identical cross-engine.",
)
def welch_acctbal_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import welch_ttest

    return welch_ttest(
        t(spark, sf_dir, "customer"), "c_acctbal", "c_mktsegment",
        "BUILDING", "MACHINERY",
    )


@register(
    "acf_daily_events",
    oracle="""
    WITH d AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS i,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    )
    SELECT l.lag, ROUND(CORR(x.n, y.n), 6) AS acf,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM (VALUES (1), (2), (7)) AS l(lag)
    JOIN d x ON TRUE
    JOIN d y ON y.i = x.i + l.lag
    GROUP BY 1 ORDER BY 1
    """,
    doc="Daily event-count autocorrelation at lags 1, 2, 7 "
    "(ops.timeseries.acf_lags) - the seasonality fingerprint beside "
    "event_seasonality's weekday profile (that names the cycle; this "
    "measures its strength). Day grain aggregates first; all lags "
    "share ONE self-equi-join of the tiny grain (lag list exploded on "
    "the left); per-lag Pearson via engine corr rounded @6 - the "
    "lineitem_corr convention.",
)
def acf_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.timeseries import acf_lags

    ev = t(spark, sf_dir, "events")
    d = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("i")
    ).agg(F.count("*").cast("long").alias("n"))
    return acf_lags(d, "i", "n", [1, 2, 7])


@register(
    "cusum_split_events",
    oracle="""
    WITH d AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS dy,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    p AS (
      SELECT dy, SUM(n) OVER (ORDER BY dy) AS s,
             ROW_NUMBER() OVER (ORDER BY dy) AS ti
      FROM d
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn, SUM(n) AS sn FROM d)
    SELECT dy AS split_at,
           CAST(ABS(nn * s - ti * sn) AS BIGINT) AS g_max,
           CAST(FLOOR(CAST(ABS(nn * s - ti * sn) AS DOUBLE) * 1000000
                / (CAST(nn AS DOUBLE) * CAST(sn AS DOUBLE))) AS BIGINT)
             AS ratio_e6
    FROM p CROSS JOIN tot
    ORDER BY ABS(nn * s - ti * sn) DESC, dy LIMIT 1
    """,
    doc="CUSUM changepoint split of the daily event-count series "
    "(ops.timeseries.cusum_split): the day maximizing |n*S_t - t*S_n| "
    "- locates the single most likely level-shift boundary that "
    "rolling_zscore_daily/ewma flag only pointwise. Day grain "
    "collapses first; prefix sum and step index via "
    "global_running_sum; the statistic is exact BIGINT and the argmax "
    "a sort-limit(1) with min-day tiebreak.",
)
def cusum_split_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.timeseries import cusum_split

    ev = t(spark, sf_dir, "events")
    d = ev.groupBy(
        F.to_date("ts").cast("string").alias("dy")
    ).agg(F.count("*").cast("long").alias("n"))
    return cusum_split(d, "dy", "n")


def _poisson_boot_oracle() -> str:
    from hadoop_fcfs_spark.ops.sampling import POISSON1_T32

    whens = " ".join(
        f"WHEN u < {t} THEN {k}" for k, t in enumerate(POISSON1_T32)
    )
    return f"""
    WITH rows_q AS (
      SELECT o_orderkey AS k,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS q
      FROM orders
    ),
    drawn AS (
      SELECT r,
             CASE {whens} ELSE 8 END AS w,
             q
      FROM (
        SELECT q,
               CAST('0x' || substr(md5(CAST(k AS VARCHAR) || ':'
                    || CAST(r.r AS VARCHAR)), 1, 8) AS BIGINT) AS u,
               r.r AS r
        FROM rows_q CROSS JOIN LATERAL UNNEST(generate_series(0, 99)) AS r(r)
      )
    ),
    rep AS (
      SELECT CAST(FLOOR(CAST(SUM(w * q) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
                  / 100 * 10000.0) AS BIGINT) AS m4
      FROM drawn
      GROUP BY r HAVING SUM(w) > 0
    ),
    lo AS (SELECT MAX(m4) AS boot_lo_e4
           FROM (SELECT m4 FROM rep ORDER BY m4 ASC LIMIT 3)),
    hi AS (SELECT MIN(m4) AS boot_hi_e4
           FROM (SELECT m4 FROM rep ORDER BY m4 DESC LIMIT 3))
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(FLOOR(CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100 * 10000.0)
             AS BIGINT) AS mean_e4,
           lo.boot_lo_e4, hi.boot_hi_e4
    FROM orders CROSS JOIN lo CROSS JOIN hi
    GROUP BY lo.boot_lo_e4, hi.boot_hi_e4
    """


@register(
    "bootstrap_mean_totalprice",
    oracle=_poisson_boot_oracle(),
    doc="Deterministic Poisson-bootstrap 95% CI for the mean order "
    "total (ops.sampling.poisson_bootstrap_mean, Chamandy et al.'s "
    "single-pass formulation): each (order, replicate) draws a "
    "Poisson(1) weight from md5-uniform32('key:rep') against "
    "PRECOMPUTED integer CDF thresholds (no runtime exp; weight cap 8 "
    "at P ~ 1e-5, identical both engines). 100 replicates explode "
    "map-side; per-replicate sums are exact BIGINTs over cent-"
    "quantized values; CI = 3rd-smallest / 3rd-largest replicate mean "
    "via TakeOrdered selections, no global window.",
)
def bootstrap_mean_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.sampling import poisson_bootstrap_mean

    return poisson_bootstrap_mean(
        t(spark, sf_dir, "orders"), "o_orderkey", "o_totalprice",
        replicates=100,
    )


@register(
    "nelson_aalen_hazard",
    oracle="""
    WITH u AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS f, MAX(CAST(ts AS DATE)) AS l,
             MIN(CASE WHEN event_type = 'purchase' AND value > 150
                      THEN CAST(ts AS DATE) END) AS conv
      FROM events GROUP BY 1
    ),
    d AS (
      SELECT CASE WHEN conv IS NOT NULL THEN DATEDIFF('day', f, conv)
                  ELSE DATEDIFF('day', f, l) END AS t,
             (conv IS NULL) AS cens
      FROM u
    ),
    g AS (
      SELECT t, SUM(CASE WHEN NOT cens THEN 1 ELSE 0 END) AS de, COUNT(*) AS a
      FROM d GROUP BY 1
    ),
    tot AS (SELECT SUM(a) AS n FROM g),
    r1 AS (
      SELECT t, de, a,
             n - COALESCE(SUM(a) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
      FROM g CROSS JOIN tot
    ),
    r2 AS (
      SELECT t, de, n_risk,
             SUM(CAST(FLOOR(CAST(de AS DOUBLE) / CAST(n_risk AS DOUBLE)
                   * 1000000000) AS BIGINT)) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h9
      FROM r1
    )
    SELECT CAST(t AS BIGINT) AS t, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(de AS BIGINT) AS d_events, CAST(h9 AS BIGINT) AS hazard_e9
    FROM r2 WHERE de > 0
    """,
    doc="Nelson-Aalen cumulative conversion hazard "
    "(ops.stats.nelson_aalen) over the same durations as "
    "kaplan_meier_retention (first event -> first high-value "
    "purchase, never-converters right-censored): H(t) = sum d/n - "
    "the additive hazard twin of KM's product (S ~ exp(-H)), and the "
    "transcendental-free one: each step floor-quantizes to nanos and "
    "the running hazard is an EXACT BIGINT sum (no ln/exp ulp "
    "coupling). Risk set and cumulative sum via global_running_sum - "
    "no unpartitioned window at any grain size.",
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import nelson_aalen

    ev = t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("__f"),
        F.max(F.to_date("ts")).alias("__l"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150),
                F.to_date("ts"),
            )
        ).alias("__conv"),
    )
    durations = u.select(
        F.when(
            F.col("__conv").isNotNull(), F.datediff("__conv", "__f")
        ).otherwise(F.datediff("__l", "__f")).alias("dur"),
        F.col("__conv").isNull().alias("cens"),
    )
    return nelson_aalen(durations, "dur", "cens")


@register(
    "anova_acctbal_segments",
    oracle="""
    WITH q AS (
      SELECT c_mktsegment AS g,
             CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS v
      FROM customer WHERE c_acctbal IS NOT NULL
    ),
    pg AS (
      SELECT g, COUNT(*) AS n, SUM(v) AS s1, SUM(v * v) AS s2 FROM q GROUP BY 1
    ),
    m AS (
      SELECT COUNT(*) AS k, SUM(n) AS nn, SUM(s1) AS ts1, SUM(s2) AS ts2,
             SUM(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
               AS sgm
      FROM pg
    )
    SELECT CAST(k AS BIGINT) AS k_groups, CAST(nn AS BIGINT) AS n_rows,
           CASE WHEN k > 1 AND nn > k
                 AND CAST(ts2 AS DOUBLE) - sgm > 0
           THEN CAST(FLOOR(
                ((sgm - CAST(ts1 AS DOUBLE) * CAST(ts1 AS DOUBLE)
                    / CAST(nn AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
                / ((CAST(ts2 AS DOUBLE) - sgm)
                   / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)))
                * 1000000) AS BIGINT)
           END AS f_e6,
           CAST(k - 1 AS BIGINT) AS df_between,
           CAST(nn - k AS BIGINT) AS df_within
    FROM m
    """,
    doc="One-way ANOVA F across the five market segments on account "
    "balance (ops.stats.anova_oneway) - the k-arm generalization of "
    "welch_acctbal_segments. Per-group (n, S1, S2) exact BIGINT from "
    "cent-quantized values in one map-side pass; SSB/SSW in an "
    "identical flat double shape (the only engine-ordered sum is the "
    "k=5-element sum of S1_g^2/n_g - the pagerank-precedent risk "
    "class). Floor-micro F plus both dfs.",
)
def anova_acctbal_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import anova_oneway

    return anova_oneway(t(spark, sf_dir, "customer"), "c_acctbal", "c_mktsegment")


@register(
    "trimmed_mean_price",
    oracle="""
    WITH g AS (
      SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS q,
             COUNT(*) AS c
      FROM lineitem GROUP BY 1
    ),
    cum AS (
      SELECT q, c, SUM(c) OVER (ORDER BY q
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
      FROM g
    ),
    tot AS (SELECT SUM(c) AS n, SUM(c) * 50 // 1000 AS k FROM g),
    kept AS (
      SELECT q,
             GREATEST(0, LEAST(cm, n - k) - GREATEST(cm - c, k)) AS kc
      FROM cum CROSS JOIN tot
    )
    SELECT CAST(MAX(tot.n) AS BIGINT) AS n_rows,
           CAST(SUM(kc) AS BIGINT) AS n_kept,
           CAST(FLOOR(CAST(SUM(kc * q) AS DOUBLE) / CAST(SUM(kc) AS DOUBLE)
                / 100 * 10000.0) AS BIGINT) AS trimmed_mean_e4
    FROM kept CROSS JOIN tot
    """,
    doc="5%-symmetric trimmed mean of line prices "
    "(ops.stats.trimmed_mean) - the robust location estimate between "
    "mean and median, complementing winsorize_events (drop vs clamp). "
    "Exact integers end-to-end: cent-quantized value grain, "
    "cumulative counts via global_running_sum, and each grain row "
    "contributes max(0, min(cum, n-k) - max(before, k)) copies - tie "
    "groups straddling a cut contribute PARTIALLY, which rank-filter "
    "formulations get wrong. One division at the end (floor-e4).",
)
def trimmed_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import trimmed_mean

    return trimmed_mean(t(spark, sf_dir, "lineitem"), "l_extendedprice")


@register(
    "quantile_normalize_segments",
    oracle="""
    WITH q AS (
      SELECT c_mktsegment AS g, CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS v
      FROM customer
    ),
    gg AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM q GROUP BY 1, 2),
    ng AS (SELECT g, SUM(c) AS n FROM gg GROUP BY 1),
    lp AS (
      SELECT gg.g, v, c, n,
             CAST(2 * SUM(c) OVER (PARTITION BY gg.g ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
                  AS DOUBLE) / CAST(2 * n AS DOUBLE) AS p
      FROM gg JOIN ng ON ng.g = gg.g
    ),
    gv AS (SELECT v, SUM(c) AS cc FROM gg GROUP BY 1),
    nn AS (SELECT SUM(cc) AS t FROM gv),
    rp AS (
      SELECT v AS gq,
             CAST(2 * SUM(cc) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cc
                  AS DOUBLE) / CAST(2 * t AS DOUBLE) AS gp
      FROM gv CROSS JOIN nn
    ),
    m AS (
      SELECT l.g, l.c, l.v,
             COALESCE(r.gq, (SELECT MIN(v) FROM gv)) AS nv
      FROM lp l ASOF LEFT JOIN rp r ON r.gp <= l.p
    )
    SELECT g AS c_mktsegment,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(FLOOR(CAST(SUM(c * nv) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
                / 100 * 10000.0) AS BIGINT) AS mean_norm_e4,
           CAST(FLOOR(CAST(SUM(c * v) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
                / 100 * 10000.0) AS BIGINT) AS mean_raw_e4
    FROM m GROUP BY 1
    """,
    doc="Quantile normalization of account balances across market "
    "segments (ops.stats.quantile_normalize): each segment's values "
    "map to the GLOBAL distribution at the same midpoint-rank "
    "fraction - the cross-source score equalizer. Per-group "
    "cumulatives via chunked_running_sum (value-bucket chunks), "
    "global via global_running_sum, and the group-to-global mapping "
    "via ops.joins.global_as_of_join - the partition-free as-of "
    "decomposed like a two-level prefix scan (the oracle uses "
    "DuckDB's native ASOF LEFT JOIN - same semantics, independent "
    "shape). Exact BIGINT weighted sums; one floor-e4 division per "
    "output cell.",
)
def quantile_normalize_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import quantile_normalize

    return quantile_normalize(
        t(spark, sf_dir, "customer"), "c_acctbal", "c_mktsegment"
    )


@register(
    "cms_heavy_change",
    oracle="""
    WITH a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt_a
               FROM events WHERE ts < TIMESTAMP '2024-01-16' GROUP BY 1),
    b AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt_b
          FROM events WHERE ts >= TIMESTAMP '2024-01-16' GROUP BY 1),
    j AS (
      SELECT COALESCE(a.user_id, b.user_id) AS user_id,
             COALESCE(cnt_a, 0) AS cnt_a, COALESCE(cnt_b, 0) AS cnt_b
      FROM a FULL JOIN b ON a.user_id = b.user_id
    )
    SELECT user_id, cnt_a, cnt_b,
           CAST(cnt_b - cnt_a AS BIGINT) AS change, TRUE AS cms_ok
    FROM j ORDER BY ABS(cnt_b - cnt_a) DESC, user_id LIMIT 20
    """,
    doc="CMS heavy-change detection (Cormode-Muthukrishnan deltas): "
    "which users' event rates shifted most between the first and "
    "second half of the stream, answered from TWO per-window Count-Min "
    "DataFrames (agg.sketches.cms_partial x2 + cms_estimate x2) - the "
    "sketch-delta monitor that runs without re-scanning either window "
    "once the sketches are materialized. Exact top-20 |change| "
    "candidates carry the oracle values; cms_ok asserts the one-sided "
    "contract PER WINDOW (est >= true, overshoot <= ceil(3eN/width)), "
    "so sketch degradation fails the value hash. Deterministic "
    "xxhash64 row hashes; |change| ties broken by user_id.",
)
def cms_heavy_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from hadoop_fcfs_spark.agg.sketches import cms_estimate, cms_partial
    from hadoop_fcfs_spark.caching import waypoint

    ev = t(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    first = ev.filter(F.col("ts") < cut)
    second = ev.filter(F.col("ts") >= cut)
    exact = waypoint(
        ev.groupBy("user_id").agg(
            F.sum(F.when(F.col("ts") < cut, 1).otherwise(0))
            .cast("long").alias("cnt_a"),
            F.sum(F.when(F.col("ts") >= cut, 1).otherwise(0))
            .cast("long").alias("cnt_b"),
        )
    )
    top = exact.orderBy(
        F.abs(F.col("cnt_b") - F.col("cnt_a")).desc(), F.asc("user_id")
    ).limit(20)
    ska = cms_partial(first, "user_id", depth=4, width=2048)
    skb = cms_partial(second, "user_id", depth=4, width=2048)
    est_a = cms_estimate(ska, top.select("user_id"), "user_id", width=2048)
    est_b = cms_estimate(skb, top.select("user_id"), "user_id", width=2048)
    na = first.agg(F.count("*").alias("__na"))
    nb = second.agg(F.count("*").alias("__nb"))
    slack_a = F.ceil(F.lit(3.0 * math.e / 2048) * F.col("__na"))
    slack_b = F.ceil(F.lit(3.0 * math.e / 2048) * F.col("__nb"))
    return (
        top.join(est_a.withColumnRenamed("est", "__ea"), "user_id")
        .join(est_b.withColumnRenamed("est", "__eb"), "user_id")
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            "user_id", "cnt_a", "cnt_b",
            (F.col("cnt_b") - F.col("cnt_a")).cast("long").alias("change"),
            (
                (F.col("__ea") >= F.col("cnt_a"))
                & (F.col("__ea") <= F.col("cnt_a") + slack_a)
                & (F.col("__eb") >= F.col("cnt_b"))
                & (F.col("__eb") <= F.col("cnt_b") + slack_b)
            ).alias("cms_ok"),
        )
        .orderBy(F.abs("change").desc(), F.asc("user_id"))
    )


@register(
    "logrank_cohorts",
    oracle="""
    WITH u AS (
      SELECT user_id, user_id % 2 AS coh,
             MIN(CAST(ts AS DATE)) AS f, MAX(CAST(ts AS DATE)) AS l,
             MIN(CASE WHEN event_type = 'purchase' AND value > 150
                      THEN CAST(ts AS DATE) END) AS conv
      FROM events GROUP BY 1, 2
    ),
    d AS (
      SELECT coh,
             CASE WHEN conv IS NOT NULL THEN DATEDIFF('day', f, conv)
                  ELSE DATEDIFF('day', f, l) END AS t,
             (conv IS NULL) AS cens
      FROM u
    ),
    g AS (
      SELECT t,
             SUM(CASE WHEN coh = 0 AND NOT cens THEN 1 ELSE 0 END) AS d1,
             SUM(CASE WHEN coh = 1 AND NOT cens THEN 1 ELSE 0 END) AS d2,
             SUM(CASE WHEN coh = 0 THEN 1 ELSE 0 END) AS a1,
             SUM(CASE WHEN coh = 1 THEN 1 ELSE 0 END) AS a2
      FROM d GROUP BY 1
    ),
    tot AS (SELECT SUM(a1) AS n1t, SUM(a2) AS n2t FROM g),
    r AS (
      SELECT t, d1, d2,
             n1t - COALESCE(SUM(a1) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r1,
             n2t - COALESCE(SUM(a2) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r2
      FROM g CROSS JOIN tot
    ),
    s AS (
      SELECT d1, d1 + d2 AS d, r1, r1 + r2 AS n FROM r WHERE d1 + d2 > 0
    ),
    m AS (
      SELECT SUM(d1) AS o1,
             SUM(CAST(FLOOR(CAST(d AS DOUBLE) * CAST(r1 AS DOUBLE)
                   / CAST(n AS DOUBLE) * 1000000000) AS BIGINT)) AS e9,
             SUM(CASE WHEN n > 1 THEN
                 CAST(FLOOR(CAST(d AS DOUBLE)
                      * (CAST(r1 AS DOUBLE) / CAST(n AS DOUBLE))
                      * (1.0 - CAST(r1 AS DOUBLE) / CAST(n AS DOUBLE))
                      * ((CAST(n AS DOUBLE) - CAST(d AS DOUBLE))
                         / (CAST(n AS DOUBLE) - 1.0))
                      * 1000000000) AS BIGINT) ELSE 0 END) AS v9
      FROM s
    )
    SELECT CAST(tot.n1t AS BIGINT) AS n_1, CAST(tot.n2t AS BIGINT) AS n_2,
           CAST(m.o1 AS BIGINT) AS o_1, CAST(m.e9 AS BIGINT) AS e1_e9,
           CAST(m.v9 AS BIGINT) AS v_e9,
           CASE WHEN m.v9 > 0 THEN
             CAST(FLOOR(CAST(m.o1 * 1000000000 - m.e9 AS DOUBLE)
                  / sqrt(1000000000.0 * CAST(m.v9 AS DOUBLE))
                  * 1000000) AS BIGINT)
           END AS z_e6
    FROM m CROSS JOIN tot
    """,
    doc="Two-cohort log-rank test on time-to-conversion "
    "(ops.stats.logrank_test) over the kaplan_meier_retention "
    "durations, cohorts = user_id parity (the deterministic A/B "
    "assignment stand-in): O-E accumulation with hypergeometric "
    "variance at each pooled event time - the significance companion "
    "the KM/Nelson-Aalen curves need. Per-step E and V terms "
    "floor-quantize to nanos and SUM AS BIGINTs (nelson_aalen "
    "discipline); per-group risk sets via exclusive "
    "global_running_sum; z = one subtraction + sqrt at the end.",
)
def logrank_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import logrank_test

    ev = t(spark, sf_dir, "events")
    u = ev.groupBy(
        "user_id", (F.col("user_id") % 2).alias("coh")
    ).agg(
        F.min(F.to_date("ts")).alias("__f"),
        F.max(F.to_date("ts")).alias("__l"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150),
                F.to_date("ts"),
            )
        ).alias("__conv"),
    )
    durations = u.select(
        "coh",
        F.when(
            F.col("__conv").isNotNull(), F.datediff("__conv", "__f")
        ).otherwise(F.datediff("__l", "__f")).alias("dur"),
        F.col("__conv").isNull().alias("cens"),
    )
    return logrank_test(durations, "dur", "cens", "coh", 0, 1)


@register(
    "weighted_quantile_ladder",
    oracle="""
    WITH g AS (
      SELECT l_extendedprice AS v,
             SUM(CAST(l_quantity AS BIGINT)) AS w
      FROM lineitem GROUP BY 1
    ),
    c AS (
      SELECT v, SUM(w) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM g
    ),
    tot AS (SELECT SUM(w) AS t FROM g)
    SELECT p.p AS p_permille, MIN(v) AS value,
           CAST(MAX(t) AS BIGINT) AS total_weight
    FROM c CROSS JOIN tot
    JOIN (VALUES (250), (500), (750), (950)) AS p(p)
      ON 1000 * cum >= p.p * t
    GROUP BY 1 ORDER BY 1
    """,
    doc="Quantity-weighted price quantile ladder p25/p50/p75/p95 "
    "(ops.stats.weighted_quantiles) - weighted_median generalized to "
    "a report row of cut points, the EXACT weighted complement to the "
    "approximate unweighted KLL tier. One grain collapse + ONE "
    "global_running_sum shared by all quantiles; each crossing by "
    "integer cross-multiplication (1000*cum >= p*total), "
    "lower-quantile convention, no interpolation.",
)
def weighted_quantile_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import weighted_quantiles

    return weighted_quantiles(
        t(spark, sf_dir, "lineitem"), "l_extendedprice", "l_quantity",
        [250, 500, 750, 950],
    )


@register(
    "k_anonymity_customers",
    oracle="""
    WITH cls AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS c,
             CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000) AS BIGINT))
               AS BIGINT) AS l
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MIN(c) AS BIGINT) AS k_anonymity,
           CAST(MIN(l) AS BIGINT) AS l_diversity,
           CAST(SUM(CASE WHEN c < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS classes_below_k,
           CAST(SUM(CASE WHEN c < 5 THEN c ELSE 0 END) AS BIGINT)
             AS rows_below_k,
           (1000000 * CAST(SUM(CASE WHEN c < 5 THEN c ELSE 0 END) AS BIGINT))
             // CAST(SUM(c) AS BIGINT) AS rows_below_k_share_e6
    FROM cls
    """,
    doc="k-anonymity / l-diversity privacy audit on customers "
    "(ops.validate.k_anonymity_audit, Sweeney; Machanavajjhala): "
    "quasi-identifiers (nation, segment), sensitive attribute = "
    "account-balance $1000 bucket. Smallest equivalence class and "
    "smallest within-class sensitive diversity, plus the below-k "
    "exposure share - the pre-release linkage-risk check a "
    "user-adjacent training table needs. One class-grain aggregation "
    "+ one scalar rollup, exact BIGINTs, integer-division share.",
)
def k_anonymity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.validate import k_anonymity_audit

    cust = t(spark, sf_dir, "customer").withColumn(
        "__sens", F.floor(F.col("c_acctbal") / 1000).cast("long")
    )
    return k_anonymity_audit(
        cust, ["c_nationkey", "c_mktsegment"], "__sens", k=5
    )


@register(
    "binseg_daily_events",
    oracle="""
    WITH d AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS o,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    c AS MATERIALIZED (
      SELECT o, n,
             SUM(n) OVER (ORDER BY o
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
             ROW_NUMBER() OVER (ORDER BY o) AS t
      FROM d
    ),
    tot AS (SELECT COUNT(*) AS ns, SUM(n) AS shi FROM c),
    r1 AS (
      SELECT o, t, CASE WHEN t < ns THEN ABS(ns * s - t * shi) END AS g
      FROM c CROSS JOIN tot
    ),
    m1 AS (SELECT MAX(g) AS gm FROM r1),
    sp1 AS MATERIALIZED (
      SELECT MIN(t) AS st, MAX(gm) AS gmax
      FROM r1 JOIN m1 ON g = gm WHERE gm > 0
    ),
    o1 AS (
      SELECT CAST(1 AS INT) AS level, CAST(0 AS BIGINT) AS segment,
             c.o AS split_at, CAST(sp1.gmax AS BIGINT) AS g_max
      FROM sp1 JOIN c ON c.t = sp1.st
    ),
    s2 AS MATERIALIZED (
      SELECT c.*, CASE WHEN sp1.st IS NOT NULL AND c.t > sp1.st
                       THEN 1 ELSE 0 END AS seg
      FROM c LEFT JOIN sp1 ON TRUE
    ),
    st2 AS (
      SELECT seg, MIN(t) AS tlo, CAST(COUNT(*) AS BIGINT) AS ns,
             MIN_BY(s - n, t) AS slo, MAX(s) AS shi
      FROM s2 GROUP BY 1
    ),
    r2 AS (
      SELECT s2.seg, s2.o, s2.t,
             CASE WHEN (s2.t - tlo + 1) < ns
                  THEN ABS(ns * (s2.s - slo) - (s2.t - tlo + 1) * (shi - slo))
             END AS g
      FROM s2 JOIN st2 USING (seg)
    ),
    m2 AS (SELECT seg, MAX(g) AS gm FROM r2 GROUP BY 1),
    sp2 AS (
      SELECT r2.seg, MIN(r2.t) AS st, MAX(m2.gm) AS gmax
      FROM r2 JOIN m2 ON r2.seg = m2.seg AND r2.g = m2.gm
      WHERE m2.gm > 0 GROUP BY 1
    ),
    o2 AS (
      SELECT CAST(2 AS INT) AS level, CAST(sp2.seg AS BIGINT) AS segment,
             c.o AS split_at, CAST(sp2.gmax AS BIGINT) AS g_max
      FROM sp2 JOIN c ON c.t = sp2.st
    )
    SELECT * FROM o1 UNION ALL SELECT * FROM o2 ORDER BY level, segment
    """,
    doc="Binary-segmentation changepoints on daily event counts, depth "
    "2 (ops.timeseries.binseg_splits): cusum_split recursed into each "
    "side - up to 3 level-shift boundaries where the single-split "
    "gate stops at one. Fully in-plan recursion (the Python loop only "
    "builds the plan: per-segment stats by min_by/max aggregation, "
    "exact BIGINT statistic, max-then-min-order argmax; flat segments "
    "emit no split). Oracle unrolls both levels as MATERIALIZED CTEs.",
)
def binseg_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.timeseries import binseg_splits

    ev = t(spark, sf_dir, "events")
    d = ev.groupBy(
        F.to_date("ts").cast("string").alias("o")
    ).agg(F.count("*").cast("long").alias("n"))
    return binseg_splits(d, "o", "n", depth=2)


@register(
    "pacf_daily_events",
    oracle="""
    WITH d AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS i,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    a AS (
      SELECT l.lag, ROUND(CORR(x.n, y.n), 6) AS acf
      FROM (VALUES (1), (2)) AS l(lag)
      JOIN d x ON TRUE
      JOIN d y ON y.i = x.i + l.lag
      GROUP BY 1
    ),
    p AS (
      SELECT MAX(CASE WHEN lag = 1 THEN acf END) AS r1,
             MAX(CASE WHEN lag = 2 THEN acf END) AS r2
      FROM a
    )
    SELECT r1, r2,
           CASE WHEN ABS(1.0 - r1 * r1) > 0
                THEN CAST(FLOOR((r2 - r1 * r1) / (1.0 - r1 * r1) * 1000000)
                     AS BIGINT)
           END AS pacf2_e6
    FROM p
    """,
    doc="Partial autocorrelation at lag 2 of daily event counts "
    "(ops.timeseries.pacf_lag2, Durbin-Levinson closed form): is the "
    "lag-2 dependence real or lag-1 echoed twice - the AR-order "
    "picker on top of acf_daily_events. Built from the ROUNDED-@6 ACF "
    "values so both engines feed identical doubles into the flat "
    "(r2 - r1^2)/(1 - r1^2); floor-micro, NULL on r1^2 = 1.",
)
def pacf_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.timeseries import pacf_lag2

    ev = t(spark, sf_dir, "events")
    d = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("i")
    ).agg(F.count("*").cast("long").alias("n"))
    return pacf_lag2(d, "i", "n")


@register(
    "theta_churn_new_users",
    oracle="""
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM (
          SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 2000
          EXCEPT
          SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996))
        AS acquired_exact,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM (
          SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996
          EXCEPT
          SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 2000))
        AS lapsed_exact,
      TRUE AS acquired_ok, TRUE AS lapsed_ok
    """,
    doc="Theta-sketch set DIFFERENCE (theta_difference - the third "
    "algebra op after theta_user_overlap's union/intersection): "
    "customers who ordered in 2000 but not 1996 (acquired) and the "
    "reverse (lapsed), answered from the two per-year sketches "
    "without re-shuffling raw ids - the audience-delta question "
    "every growth report asks. Contract columns assert both "
    "estimates within 10% of exact (set-EXCEPT oracle; difference "
    "error scales with the UNION size, not the difference, hence the "
    "looser bound than the overlap gate - observed 4.8/5.5% at "
    "sf0.1); a degraded sketch fails the value hash.",
)
def theta_churn_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.agg.sketches import theta_partial

    orders = t(spark, sf_dir, "orders").withColumn(
        "__y", F.year("o_orderdate")
    ).filter(F.col("__y").isin(1996, 2000))
    sk = theta_partial(orders, ["__y"], "o_custkey")
    row = sk.groupBy().pivot("__y", [1996, 2000]).agg(
        F.first("theta_sketch")
    )
    ests = row.select(
        F.theta_sketch_estimate(
            F.theta_difference(F.col("`2000`"), F.col("`1996`"))
        ).alias("__acq"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("`1996`"), F.col("`2000`"))
        ).alias("__lap"),
    )
    a = orders.filter(F.col("__y") == 1996).select("o_custkey").distinct()
    b = orders.filter(F.col("__y") == 2000).select("o_custkey").distinct()
    ex_acq = b.join(a, "o_custkey", "left_anti").agg(
        F.count("*").alias("acquired_exact")
    )
    ex_lap = a.join(b, "o_custkey", "left_anti").agg(
        F.count("*").alias("lapsed_exact")
    )
    return (
        ex_acq.crossJoin(ex_lap)
        .crossJoin(F.broadcast(ests))
        .select(
            F.col("acquired_exact").cast("long"),
            F.col("lapsed_exact").cast("long"),
            (F.abs(F.col("__acq") - F.col("acquired_exact"))
             <= 0.10 * F.col("acquired_exact")).alias("acquired_ok"),
            (F.abs(F.col("__lap") - F.col("lapsed_exact"))
             <= 0.10 * F.col("lapsed_exact")).alias("lapsed_ok"),
        )
    )


@register(
    "gini_by_nation",
    oracle="""
    WITH spend AS (
      SELECT n.n_name AS nation, c.c_custkey AS cust,
             SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS q
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    r AS (
      SELECT nation, q,
             ROW_NUMBER() OVER (PARTITION BY nation
                                ORDER BY q, cust) AS rk
      FROM spend
    ),
    a AS (
      SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS total_q,
             CAST(SUM(rk * q) AS BIGINT) AS srx
      FROM r GROUP BY 1
    )
    SELECT nation, n, total_q,
           CASE WHEN CAST(n AS DOUBLE) * CAST(total_q AS DOUBLE) <> 0
                THEN CAST(FLOOR((2.0 * CAST(srx AS DOUBLE)
                       - (CAST(n AS DOUBLE) + 1.0) * CAST(total_q AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(total_q AS DOUBLE))
                     * 1000000) AS BIGINT)
           END AS gini_e6
    FROM a
    """,
    doc="Per-nation Gini of customer spend (ops.stats.gini_by_group): "
    "WITHIN-group inequality - which nation's revenue is "
    "whale-dominated, the slice gini_order_values/lorenz_deciles "
    "(global) cannot answer. Cent-quantized spend per customer, "
    "per-group ranks via chunked_running_sum over (value, id) "
    "order (value-bucket chunks - a corpus-sized group never funnels "
    "through one window task; the oracle uses the plain per-group "
    "window, independent shape); exact BIGINT rank-value sums, one "
    "floor-micro division per group.",
)
def gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import gini_by_group

    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    spend = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("cnk"),
                    F.col("n_name").alias("nation"),
                )
            ),
            F.col("c_nationkey") == F.col("cnk"),
        )
        .groupBy("nation", F.col("c_custkey").alias("cust"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100)).cast("long")
            .alias("spend_cents")
        )
    )
    # cents stay integers end to end (scale=1): a /100-then-requantize
    # round-trip can floor one cent low on non-representable doubles
    return gini_by_group(spend, "nation", "spend_cents", "cust", scale=1)


@register(
    "weekday_adjusted_anomaly",
    oracle="""
    WITH d AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS dy,
             dayofweek(CAST(ts AS DATE)) AS wd,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT wd, CAST(COUNT(*) AS BIGINT) AS cw,
             CAST(SUM(n) AS BIGINT) AS sw
      FROM d GROUP BY 1
    ),
    r AS (
      SELECT dy, n,
             CAST(FLOOR(CAST(n * cw - sw AS DOUBLE) / CAST(cw AS DOUBLE)
                  * 1000) AS BIGINT) AS res_milli
      FROM d JOIN w USING (wd)
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS mm,
             CAST(SUM(res_milli) AS BIGINT) AS s1,
             CAST(SUM(res_milli * res_milli) AS BIGINT) AS s2
      FROM r
    )
    SELECT dy, n, res_milli,
           CASE WHEN mm > 1 AND (CAST(s2 AS DOUBLE)
                  - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                    / CAST(mm AS DOUBLE)) / (CAST(mm AS DOUBLE) - 1.0) > 0
                THEN CAST(FLOOR((CAST(res_milli AS DOUBLE)
                       - CAST(s1 AS DOUBLE) / CAST(mm AS DOUBLE))
                     / sqrt((CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                         / CAST(mm AS DOUBLE))
                       / (CAST(mm AS DOUBLE) - 1.0)) * 1000000) AS BIGINT)
           END AS z_e6
    FROM r CROSS JOIN m
    ORDER BY dy
    """,
    doc="Weekday-profile-adjusted daily anomaly: each day's event count "
    "minus ITS WEEKDAY's mean, z-scored against the residual "
    "population - catches the Tuesday that behaves like a Saturday, "
    "which the raw daily z (daily_event_anomaly) buries under the "
    "weekly cycle and the rolling z only sees as local drift. Exact "
    "arithmetic: residual numerator n*cw - sw is BIGINT, ONE "
    "correctly-rounded division to milli units per day, then the "
    "rolling_zscore-style exact-moment z (never engine stddev). "
    "Weekday labels differ across engines (Sunday = 1 vs 0) but act "
    "only as grouping keys - the day partition is identical.",
)
def weekday_adjusted_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.caching import waypoint

    ev = t(spark, sf_dir, "events")
    d = waypoint(
        ev.groupBy(
            F.to_date("ts").cast("string").alias("dy"),
            F.dayofweek(F.to_date("ts")).alias("wd"),
        ).agg(F.count("*").cast("long").alias("n"))
    )
    w = d.groupBy("wd").agg(
        F.count("*").cast("long").alias("cw"),
        F.sum("n").cast("long").alias("sw"),
    )
    r = waypoint(
        d.join(w, "wd").select(
            "dy", "n",
            F.floor(
                (F.col("n") * F.col("cw") - F.col("sw")).cast("double")
                / F.col("cw").cast("double") * 1000
            ).cast("long").alias("res_milli"),
        )
    )
    m = r.agg(
        F.count("*").cast("long").alias("mm"),
        F.sum("res_milli").cast("long").alias("s1"),
        F.sum(F.col("res_milli") * F.col("res_milli")).cast("long")
        .alias("s2"),
    )
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    mm = F.col("mm").cast("double")
    var = (s2 - s1 * s1 / mm) / (mm - 1.0)
    z = (F.col("res_milli").cast("double") - s1 / mm) / F.sqrt(var)
    return (
        r.crossJoin(F.broadcast(m))
        .select(
            "dy", "n", "res_milli",
            F.when(
                (F.col("mm") > 1) & (var > 0),
                F.floor(z * 1_000_000).cast("long"),
            ).alias("z_e6"),
        )
        .orderBy("dy")
    )


@register(
    "loo_priority_price",
    oracle="""
    WITH s AS (
      SELECT o_orderpriority AS cat,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sq
      FROM orders GROUP BY 1
    )
    SELECT o_orderkey, o_orderpriority,
           CASE WHEN n > 1 THEN
             CAST(FLOOR(CAST(sq - CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                             AS DOUBLE)
                        / CAST(n - 1 AS DOUBLE) / 100 * 10000) AS BIGINT)
           END AS loo_e4
    FROM orders JOIN s ON o_orderpriority = s.cat
    """,
    doc="Leave-one-out target encoding of order price by priority "
    "(ops.encode.loo_target_encode): each order's feature is the mean "
    "totalprice of the OTHER orders in its priority class - the "
    "leakage-safe mean encoding a feature pipeline materializes "
    "before training (plain per-class means leak each row's own "
    "label). Exact BIGINT (n, S) per class from one map-side-combined "
    "pass, summary BROADCAST back, per-row encode = one subtraction + "
    "one division (floored e4) - the data rows never shuffle. "
    "Reference parity: the two-job aggregate-then-mapside-join "
    "DataJoin idiom collapsed to one broadcast.",
)
def loo_priority_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.encode import loo_target_encode

    o = t(spark, sf_dir, "orders")
    return loo_target_encode(
        o.select("o_orderkey", "o_orderpriority", "o_totalprice"),
        "o_orderpriority",
        "o_totalprice",
    ).select("o_orderkey", "o_orderpriority", "loo_e4")


@register(
    "woe_price_returns",
    oracle="""
    WITH per AS (
      SELECT CAST(FLOOR(l_extendedprice / 10000) AS BIGINT) AS bin,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS BIGINT) AS n_bad
      FROM lineitem GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n_good) AS BIGINT) AS tg,
             CAST(SUM(n_bad) AS BIGINT) AS tb
      FROM per
    )
    SELECT bin, n_good, n_bad,
           CASE WHEN n_good > 0 AND n_bad > 0 THEN
             CAST(FLOOR(ln((CAST(n_good AS DOUBLE) / CAST(tg AS DOUBLE))
                           / (CAST(n_bad AS DOUBLE) / CAST(tb AS DOUBLE)))
                        * 1000000) AS BIGINT)
           END AS woe_e6,
           CASE WHEN n_good > 0 AND n_bad > 0 THEN
             CAST(FLOOR((CAST(n_good AS DOUBLE) / CAST(tg AS DOUBLE)
                         - CAST(n_bad AS DOUBLE) / CAST(tb AS DOUBLE))
                        * ln((CAST(n_good AS DOUBLE) / CAST(tg AS DOUBLE))
                             / (CAST(n_bad AS DOUBLE) / CAST(tb AS DOUBLE)))
                        * 1000000000000) AS BIGINT)
           END AS iv_term_e12
    FROM per CROSS JOIN tot
    """,
    doc="Weight-of-evidence binning of line price vs returned-flag "
    "(ops.encode.woe_iv, fixed 10k-wide price bins): per-bin "
    "WOE = ln((g/G)/(b/B)) floored e6 plus e12-floored IV terms whose "
    "BIGINT sum is the feature's information value - the classical "
    "credit-scoring feature screen, exact counts + one ln per bin "
    "(tf_idf ln-parity precedent). Bins empty in either class emit "
    "NULL (visible for audit, never silently smoothed). One "
    "map-side-combined aggregate over #bins keys + a broadcast "
    "totals row.",
)
def woe_price_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.encode import woe_iv

    li = t(spark, sf_dir, "lineitem")
    return woe_iv(
        li,
        F.floor(F.col("l_extendedprice") / 10000).cast("long"),
        F.col("l_returnflag") == "R",
    )


@register(
    "robust_scale_price",
    oracle="""
    WITH grain AS (
      SELECT l_returnflag AS g,
             CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS q,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    cum AS (
      SELECT g, q, c,
             SUM(c) OVER (PARTITION BY g ORDER BY q) AS cumc,
             SUM(c) OVER (PARTITION BY g) AS n
      FROM grain
    ),
    quarts AS (
      SELECT g,
             MIN(CASE WHEN 4 * cumc >= n THEN q END) AS q1,
             MIN(CASE WHEN 2 * cumc >= n THEN q END) AS med,
             MIN(CASE WHEN 4 * cumc >= 3 * n THEN q END) AS q3
      FROM cum GROUP BY 1
    )
    SELECT l_orderkey, l_linenumber, l_returnflag,
           CASE WHEN q3 > q1 THEN
             CAST(FLOOR(CAST(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                             - med AS DOUBLE)
                        / CAST(q3 - q1 AS DOUBLE) * 1000000) AS BIGINT)
           END AS robust_e6
    FROM lineitem JOIN quarts ON l_returnflag = g
    """,
    doc="Per-returnflag robust scaling of line price "
    "(ops.encode.robust_scale): (x - median)/IQR with EXACT "
    "integer quartiles from grouped_quartiles (per-group value grain "
    "+ chunked_running_sum cumulatives, lower-crossing convention via "
    "integer cross-multiply) - the outlier-immune normalization of "
    "the encode tier. The #groups quartile summary broadcasts back; "
    "data rows never shuffle; one division per row floored e6. The "
    "oracle replays the crossings through DuckDB windows (small group "
    "count - the engine path stays chunked for corpus-sized groups).",
)
def robust_scale_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.encode import robust_scale

    li = t(spark, sf_dir, "lineitem")
    return robust_scale(
        li.select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"),
        "l_returnflag",
        "l_extendedprice",
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "robust_e6")


@register(
    "roc_auc_orderstatus",
    oracle="""
    WITH g AS (
      SELECT o_totalprice AS v,
             SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) AS cb
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL
      GROUP BY 1
    ),
    r AS (
      SELECT ca, cb, ca + cb AS c,
             COALESCE(SUM(ca + cb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
      FROM g
    ),
    m AS (
      SELECT SUM(ca * (2 * bef + c + 1)) AS r2a,
             SUM(ca) AS na, SUM(cb) AS nb
      FROM r
    )
    SELECT CAST(na AS BIGINT) AS n_pos, CAST(nb AS BIGINT) AS n_neg,
           CASE WHEN na > 0 AND nb > 0 THEN
             CAST(((r2a - na * (na + 1)) * 1000000) // (2 * na * nb)
                  AS BIGINT)
           END AS auc_micro
    FROM m
    """,
    doc="Exact ROC-AUC (ops.stats.roc_auc): does order total "
    "discriminate FINISHED orders from the rest - the "
    "model-discrimination metric of the eval tier (kappa = agreement, "
    "P@k = ranking, AUC = scoring). AUC = U/(n_pos*n_neg) via the "
    "mann_whitney_u rank machinery: distinct-score grain, exclusive "
    "prefix through global_running_sum, 2x-scaled exact BIGINT rank "
    "sums with average-rank ties, ONE integer division to micros "
    "(SQL div, never double /) - bit-identical across engines and "
    "partitionings. Documented bound n_pos*(2N+1) < ~9.2e12.",
)
def roc_auc_orderstatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import roc_auc

    return roc_auc(
        t(spark, sf_dir, "orders"), "o_totalprice",
        F.col("o_orderstatus") == "F",
    )


@register(
    "calibration_orderstatus",
    oracle="""
    WITH g AS (
      SELECT o_totalprice AS v,
             SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS ca,
             COUNT(*) AS c
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL
      GROUP BY 1
    ),
    r AS (
      SELECT v, ca, c,
             COALESCE(SUM(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef,
             SUM(c) OVER () AS n_tot
      FROM g
    )
    SELECT CAST(bef * 10 // n_tot AS BIGINT) AS bin,
           CAST(SUM(c) AS BIGINT) AS n,
           CAST(SUM(ca) AS BIGINT) AS n_pos,
           MIN(v) AS score_lo, MAX(v) AS score_hi,
           CAST((SUM(ca) * 1000000) // SUM(c) AS BIGINT) AS rate_micro
    FROM r GROUP BY 1
    """,
    doc="Reliability-diagram table (ops.stats.calibration_bins): "
    "decile-bin order totals and report each bin's observed "
    "FINISHED rate - the calibration twin of roc_auc_orderstatus. "
    "Bins come from the EXCLUSIVE prefix count of the distinct-score "
    "grain (bin = before*10 div N), so tied scores always share one "
    "bin and the table is deterministic under any partitioning - "
    "unlike row-level NTILE, where ties straddle bins in engine "
    "order. Exact integers + flooring div only; n_bins rows out "
    "regardless of input size.",
)
def calibration_orderstatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import calibration_bins

    return calibration_bins(
        t(spark, sf_dir, "orders"), "o_totalprice",
        F.col("o_orderstatus") == "F", n_bins=10,
    )


@register(
    "brier_orderstatus",
    oracle="""
    WITH g AS (
      SELECT o_totalprice AS v,
             SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS ca,
             COUNT(*) AS c
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL
      GROUP BY 1
    ),
    r AS (
      SELECT v, ca, c,
             COALESCE(SUM(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef,
             SUM(c) OVER () AS n_tot, SUM(ca) OVER () AS na_tot
      FROM g
    ),
    pb AS (
      SELECT CAST(bef * 10 // n_tot AS BIGINT) AS bin,
             CAST(SUM(c) AS BIGINT) AS nb,
             CAST(SUM(ca) AS BIGINT) AS cab,
             CAST(SUM(c * (bef * 1000000 // n_tot)) AS BIGINT) AS sb,
             MAX(n_tot) AS n, MAX(na_tot) AS na
      FROM r GROUP BY 1
    ),
    fin AS (
      SELECT MAX(n) AS n, MAX(na) AS na,
             SUM(POWER(CAST(sb AS DOUBLE) / 1e6 - CAST(cab AS DOUBLE), 2)
                 / CAST(nb AS DOUBLE)) AS rel_num,
             SUM(CAST(nb AS DOUBLE)
                 * POWER(CAST(cab AS DOUBLE) / CAST(nb AS DOUBLE)
                         - CAST(na AS DOUBLE) / CAST(n AS DOUBLE), 2))
               AS res_num
      FROM pb
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(na AS BIGINT) AS n_pos,
           ROUND(rel_num / n, 6) AS reliability_r6,
           ROUND(res_num / n, 6) AS resolution_r6,
           ROUND(CAST(na AS DOUBLE) / n
                 * (1.0 - CAST(na AS DOUBLE) / n), 6) AS uncertainty_r6,
           ROUND(rel_num / n - res_num / n
                 + CAST(na AS DOUBLE) / n
                 * (1.0 - CAST(na AS DOUBLE) / n), 6) AS brier_r6
    FROM fin
    """,
    doc="Murphy decomposition of the Brier score "
    "(ops.stats.brier_decomposition): the price-percentile forecast "
    "of FINISHED status decomposed into reliability - resolution + "
    "uncertainty over 10 calibration bins - the one-row scalar "
    "complement of calibration_orderstatus (same grain, same "
    "exclusive-prefix machinery, one extra per-bin BIGINT forecast "
    "sum). Per-bin sums exact BIGINT; the three components are "
    "k=10-element double sums (anova precedent - no engine-ordered "
    "float arithmetic over data rows), rounded to 6 decimals.",
)
def brier_orderstatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import brier_decomposition

    return brier_decomposition(
        t(spark, sf_dir, "orders"), "o_totalprice",
        F.col("o_orderstatus") == "F", n_bins=10,
    )


@register(
    "ab_power_priorities",
    oracle="""
    WITH a AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_obs,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS successes
      FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1
    ),
    b AS (
      SELECT *, CAST(successes AS DOUBLE) / n_obs AS p1 FROM a
    ),
    c AS (
      SELECT *, LEAST(p1 * (1.0 + 0.1), 1.0) AS p2 FROM b
    )
    SELECT o_orderpriority, n_obs, successes,
           CASE WHEN n_obs > 0 AND p1 > 0 AND p2 <> p1 THEN
             CAST(CEIL(POWER(1.959964
                 * SQRT(2.0 * ((p1 + p2) / 2.0)
                        * (1.0 - (p1 + p2) / 2.0))
                 + 0.841621 * SQRT(p1 * (1.0 - p1) + p2 * (1.0 - p2)), 2)
               / POWER(p2 - p1, 2)) AS BIGINT)
           END AS required_n_per_arm
    FROM c
    """,
    doc="A/B-test power analysis (ops.stats.ab_power_required_n): for "
    "each order priority, the per-arm sample size needed to detect a "
    "10 percent relative lift of its observed FINISHED rate at "
    "alpha=0.05 / power=0.80 - the design-stage complement of "
    "ab_test_conversion's two_proportion_ztest (that judges a "
    "finished experiment; this sizes the next one). Normal quantiles "
    "FROZEN as double literals (z=1.959964, 0.841621 - the NDCG "
    "frozen-constant discipline; no quantile function runs at query "
    "time on either engine); exact BIGINT counts, flat per-group "
    "double arithmetic (welch precedent).",
)
def ab_power_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import ab_power_required_n

    return ab_power_required_n(
        t(spark, sf_dir, "orders"), "o_orderpriority",
        F.col("o_orderstatus") == "F", rel_lift=0.1,
    )


@register(
    "conformal_threshold_prices",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority AS grp, o_totalprice AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders
      WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (SELECT grp, CAST(SUM(c) AS BIGINT) AS n FROM g GROUP BY 1),
    cum AS (
      SELECT grp, v,
             SUM(c) OVER (PARTITION BY grp ORDER BY v) AS cm
      FROM g
    ),
    sel AS (
      SELECT cum.grp, MIN(v) AS threshold
      FROM cum JOIN tot USING (grp)
      WHERE cm >= ((n + 1) * 900 + 999) // 1000
      GROUP BY 1
    )
    SELECT tot.grp AS o_orderpriority, n,
           CAST(((n + 1) * 900 + 999) // 1000 AS BIGINT) AS q_index,
           sel.threshold
    FROM tot LEFT JOIN sel ON sel.grp = tot.grp
    """,
    doc="Split-conformal calibration threshold "
    "(ops.stats.conformal_threshold) per order priority at alpha=0.1: "
    "the ceil((n+1)*0.9)-th smallest total price - the finite-sample "
    "quantile that makes 'flag anything above it' a coverage-"
    "guaranteed 90 percent procedure (plain p90 undercovers; the n+1 "
    "adjustment is the operator's whole point). Exact order statistic "
    "via the (group, value) grain + chunked_running_sum per-group "
    "cumulative (corpus-sized groups never ride one window task) and "
    "an integer cross-multiplied index - no float fractions; NULL "
    "when a group is too small to conformalize.",
)
def conformal_threshold_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import conformal_threshold

    return conformal_threshold(
        t(spark, sf_dir, "orders"), "o_orderpriority", "o_totalprice",
        alpha_permille=100, chunk_width=1000,
    )


@register(
    "t_closeness_customers",
    oracle="""
    WITH base AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS s
      FROM customer
      WHERE c_nationkey IS NOT NULL AND c_mktsegment IS NOT NULL
        AND c_acctbal IS NOT NULL
    ),
    cb AS (
      SELECT c_nationkey, c_mktsegment, s, CAST(COUNT(*) AS BIGINT) AS c
      FROM base GROUP BY 1, 2, 3
    ),
    buckets AS (SELECT s, CAST(SUM(c) AS BIGINT) AS g FROM cb GROUP BY 1),
    classes AS (
      SELECT c_nationkey, c_mktsegment, CAST(SUM(c) AS BIGINT) AS nc
      FROM cb GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(SUM(g) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS m
      FROM buckets
    ),
    grid AS (
      SELECT classes.c_nationkey, classes.c_mktsegment, classes.nc,
             buckets.s, buckets.g, tot.n, tot.m, COALESCE(cb.c, 0) AS c
      FROM classes CROSS JOIN buckets CROSS JOIN tot
      LEFT JOIN cb ON cb.c_nationkey = classes.c_nationkey
                  AND cb.c_mktsegment = classes.c_mktsegment
                  AND cb.s = buckets.s
    ),
    dev AS (
      SELECT c_nationkey, c_mktsegment, nc, m, n,
             SUM(c * n - g * nc) OVER (
               PARTITION BY c_nationkey, c_mktsegment ORDER BY s) AS cum
      FROM grid
    )
    SELECT c_nationkey, c_mktsegment, CAST(MAX(nc) AS BIGINT) AS n_class,
           CASE WHEN MAX(m) > 1 THEN
             ROUND(SUM(ABS(CAST(cum AS DOUBLE)))
               / MAX(CAST(nc AS DOUBLE) * CAST(n AS DOUBLE))
               / (MAX(m) - 1), 6)
           ELSE 0.0 END AS t_emd_r6
    FROM dev GROUP BY 1, 2
    """,
    doc="t-closeness release audit (ops.validate.t_closeness_audit; "
    "Li/Li/Venkatasubramanian) on the k_anonymity_customers scheme - "
    "QI (nation, segment), ordered sensitive attribute = $1000 "
    "acctbal bucket: per equivalence class the ordered Earth-Mover "
    "Distance to the global sensitive distribution, the escalation "
    "l-diversity cannot see (a class can be l-diverse yet leak by "
    "skewing far from the population). Dense class x bucket grid, "
    "exact integer cross-multiplied deviations c*N - g*n_c, "
    "class-key-bounded cumulative over GRID rows; only the final "
    "|.| sum over the bounded bucket grid is double (MI precedent), "
    "rounded to 6.",
)
def t_closeness_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.validate import t_closeness_audit

    cust = t(spark, sf_dir, "customer").withColumn(
        "__sens", F.floor(F.col("c_acctbal") / 1000).cast("long")
    )
    return t_closeness_audit(
        cust, ["c_nationkey", "c_mktsegment"], "__sens"
    )


@register(
    "info_gain_orders",
    oracle="""
    WITH m AS (
      SELECT CAST(o_orderstatus AS VARCHAR) AS y, 0 AS fi,
             COALESCE(CAST(o_orderpriority AS VARCHAR), '__null__') AS x
      FROM orders WHERE o_orderstatus IS NOT NULL
      UNION ALL
      SELECT CAST(o_orderstatus AS VARCHAR), 1,
             COALESCE(CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR),
                      '__null__')
      FROM orders WHERE o_orderstatus IS NOT NULL
    ),
    counts AS (
      SELECT fi, x, y, CAST(COUNT(*) AS BIGINT) AS c FROM m GROUP BY 1, 2, 3
    ),
    xtot AS (SELECT fi, x, CAST(SUM(c) AS BIGINT) AS nx FROM counts GROUP BY 1, 2),
    cond AS (
      SELECT fi,
             SUM(-CAST(c AS DOUBLE)
                 * log2(CAST(c AS DOUBLE) / CAST(nx AS DOUBLE))) AS hc_num,
             CAST(SUM(c) AS BIGINT) AS n
      FROM counts JOIN xtot USING (fi, x) GROUP BY 1
    ),
    ym AS (
      SELECT CAST(o_orderstatus AS VARCHAR) AS y, CAST(COUNT(*) AS BIGINT) AS cy
      FROM orders WHERE o_orderstatus IS NOT NULL GROUP BY 1
    ),
    hy AS (
      SELECT SUM(-CAST(cy AS DOUBLE) * log2(CAST(cy AS DOUBLE))) / SUM(cy)
             + log2(CAST(SUM(cy) AS DOUBLE)) AS hyv
      FROM ym
    )
    SELECT CASE fi WHEN 0 THEN 'o_orderpriority' ELSE 'o_year' END AS feature,
           n, ROUND(hyv, 6) AS h_label_r6,
           ROUND(hc_num / n, 6) AS h_cond_r6,
           ROUND(hyv - hc_num / n, 6) AS info_gain_r6
    FROM cond CROSS JOIN hy
    """,
    doc="Information-gain feature ranking (ops.stats.info_gain): "
    "IG(f) = H(status) - H(status|f) for order priority and order "
    "year against order status - the filter-style feature-selection "
    "report (which candidate columns are worth encoding at all), "
    "mutual_information generalized to MANY features in one melt: "
    "a posexplode projection puts every feature through ONE data "
    "shuffle to the (feature, value, label) grain regardless of how "
    "many are audited. Exact BIGINT counts; double p*log2 sums over "
    "the bounded category grids only (MI precedent), rounded to 6.",
)
def info_gain_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import info_gain

    orders = t(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority",
        F.year("o_orderdate").alias("o_year"),
    )
    return info_gain(
        orders, ["o_orderpriority", "o_year"], "o_orderstatus"
    )


@register(
    "pps_ess_priorities",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CASE WHEN SUM(w * w) > 0 THEN
             ROUND(CAST(SUM(w) AS DOUBLE) * CAST(SUM(w) AS DOUBLE)
                   / CAST(SUM(w * w) AS DOUBLE), 6) END AS ess_r6,
           CASE WHEN SUM(w * w) > 0 AND COUNT(*) > 0 THEN
             ROUND(CAST(SUM(w) AS DOUBLE) * CAST(SUM(w) AS DOUBLE)
                   / CAST(SUM(w * w) AS DOUBLE) / COUNT(*), 6)
           END AS ess_ratio_r6
    FROM (
      SELECT o_orderpriority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS w
      FROM orders
      WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
        AND o_totalprice > 0
    ) GROUP BY 1
    """,
    doc="Kish effective sample size "
    "(ops.sampling.pps_effective_sample_size) of a price-proportional "
    "(PPS) design per order priority: ESS = (Sum w)^2 / Sum w^2 - the "
    "design-QA scalar for every weighted draw in the tier "
    "(pps_sample, temperature_mix, DSIR top-k): how many equal-weight "
    "samples the weighted design is actually worth. Cent-quantized "
    "exact BIGINT (n, S1, S2) in one map-side-combined pass (welch "
    "moment discipline); flat per-group double ratio, rounded to 6.",
)
def pps_ess_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.sampling import pps_effective_sample_size

    return pps_effective_sample_size(
        t(spark, sf_dir, "orders"), "o_orderpriority", "o_totalprice",
        scale=100,
    )


@register(
    "smd_balance_nations",
    oracle="""
    WITH a AS (
      SELECT c_nationkey,
             CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
             CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING'
                  THEN CAST(ROUND(c_acctbal * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS s1t,
             CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING'
                  THEN CAST(ROUND(c_acctbal * 100) AS BIGINT)
                       * CAST(ROUND(c_acctbal * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS s2t,
             CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 0 ELSE 1 END) AS BIGINT) AS n_ctrl,
             CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 0
                  ELSE CAST(ROUND(c_acctbal * 100) AS BIGINT) END) AS BIGINT) AS s1c,
             CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 0
                  ELSE CAST(ROUND(c_acctbal * 100) AS BIGINT)
                       * CAST(ROUND(c_acctbal * 100) AS BIGINT) END) AS BIGINT) AS s2c
      FROM customer
      WHERE c_nationkey IS NOT NULL AND c_acctbal IS NOT NULL
      GROUP BY 1
    ),
    d AS (
      SELECT c_nationkey, n_treat, n_ctrl,
             CAST(s1t AS DOUBLE) / 100.0 AS sum_t,
             CAST(s1c AS DOUBLE) / 100.0 AS sum_c,
             CAST(s2t AS DOUBLE) / 100.0 / 100.0 AS sq_t,
             CAST(s2c AS DOUBLE) / 100.0 / 100.0 AS sq_c
      FROM a
    )
    SELECT c_nationkey, n_treat, n_ctrl,
           CASE WHEN n_treat > 0 AND n_ctrl > 0 THEN
             ROUND(sum_t / n_treat - sum_c / n_ctrl, 6) END AS mean_diff_r6,
           CASE WHEN n_treat >= 2 AND n_ctrl >= 2 AND
             ((sq_t - sum_t * sum_t / n_treat) / (n_treat - 1)
              + (sq_c - sum_c * sum_c / n_ctrl) / (n_ctrl - 1)) > 0 THEN
             ROUND((sum_t / n_treat - sum_c / n_ctrl)
               / SQRT(((sq_t - sum_t * sum_t / n_treat) / (n_treat - 1)
                       + (sq_c - sum_c * sum_c / n_ctrl) / (n_ctrl - 1))
                      / 2.0), 6)
           END AS smd_r6
    FROM d
    """,
    doc="Standardized mean difference (ops.stats.smd_balance) of "
    "account balance between BUILDING-segment and other customers "
    "within each nation stratum - the covariate-balance diagnostic "
    "of observational comparisons (|SMD| < 0.1 = balanced), the "
    "design-matrix QA step before any causal read of segment "
    "differences. Cent-quantized exact BIGINT (n, S1, S2) per "
    "(stratum, arm) in ONE map-side-combined aggregation (welch "
    "discipline incl. its overflow bound); SMD is flat per-stratum "
    "double arithmetic with n-1 variances, rounded to 6.",
)
def smd_balance_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import smd_balance

    return smd_balance(
        t(spark, sf_dir, "customer"), "c_nationkey",
        F.col("c_mktsegment") == "BUILDING", "c_acctbal", scale=100,
    )


@register(
    "mann_kendall_daily_events",
    oracle="""
    WITH d AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS i,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT CAST(SUM(SIGN(b.x - a.x)) AS BIGINT) AS s_stat
      FROM d a JOIN d b ON a.i < b.i
    ),
    ties AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM d GROUP BY x),
    sc AS (
      SELECT CAST(SUM(t) AS BIGINT) AS n,
             CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tv18,
             CAST(SUM(t * (t - 1)) AS BIGINT) AS tv2
      FROM ties
    )
    SELECT n, CAST(COALESCE(s_stat, 0) AS BIGINT) AS s_stat,
           CAST(n * (n - 1) * (2 * n + 5) - tv18 AS BIGINT) AS var18_num,
           CASE WHEN n * (n - 1) * (2 * n + 5) - tv18 > 0 THEN
             ROUND((CAST(COALESCE(s_stat, 0) AS DOUBLE)
                    - CAST(SIGN(COALESCE(s_stat, 0)) AS DOUBLE))
               / SQRT((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
                       - tv18) / 18.0), 6) END AS z_r6,
           CASE WHEN n >= 2 AND (n * (n - 1)) // 2 - tv2 // 2 > 0 THEN
             ROUND(CAST(COALESCE(s_stat, 0) AS DOUBLE)
               / SQRT(CAST((n * (n - 1)) // 2 AS DOUBLE)
                      * CAST((n * (n - 1)) // 2 - tv2 // 2
                             AS DOUBLE)), 6) END AS tau_b_r6
    FROM sc CROSS JOIN s
    """,
    doc="Mann-Kendall trend test (ops.stats.mann_kendall_trend) on "
    "daily event counts: exact S = sum of sign(x_j - x_i) over i<j "
    "day pairs, tie-corrected variance and the +-1-continuity z, "
    "plus Kendall tau-b as effect size - the nonparametric "
    "is-the-drift-real companion to theil_sen_trend's slope (robust "
    "to outliers and any monotone metric transform). Day grain "
    "aggregates first; the pair set is a bounded quadratic over "
    "GRAIN rows only (broadcast nested-loop i<j self-join); S and "
    "both variance numerators stay exact BIGINT, with only the "
    "final flat single-sqrt divisions double (wilson discipline), "
    "rounded @6.",
)
def mann_kendall_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import mann_kendall_trend

    ev = t(spark, sf_dir, "events")
    d = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("i")
    ).agg(F.count("*").cast("long").alias("x"))
    return mann_kendall_trend(d, "i", "x")


@register(
    "gains_orderstatus",
    oracle="""
    WITH g AS (
      SELECT -o_totalprice AS v,
             SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS ca,
             COUNT(*) AS c
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL
      GROUP BY 1
    ),
    r AS (
      SELECT v, ca, c,
             COALESCE(SUM(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef,
             SUM(c) OVER () AS n_tot, SUM(ca) OVER () AS na_tot
      FROM g
    ),
    pb AS (
      SELECT CAST(bef * 10 // n_tot AS BIGINT) AS bin,
             CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(ca) AS BIGINT) AS n_pos,
             MIN(-v) AS score_lo, MAX(-v) AS score_hi,
             MAX(n_tot) AS nt, MAX(na_tot) AS na
      FROM r GROUP BY 1
    ),
    cum AS (
      SELECT a.bin, MAX(a.n) AS n, MAX(a.n_pos) AS n_pos,
             MAX(a.score_lo) AS score_lo, MAX(a.score_hi) AS score_hi,
             CAST(SUM(b.n) AS BIGINT) AS cum_n,
             CAST(SUM(b.n_pos) AS BIGINT) AS cum_pos,
             MAX(a.nt) AS nt, MAX(a.na) AS na
      FROM pb a JOIN pb b ON b.bin <= a.bin
      GROUP BY 1
    )
    SELECT bin, n, n_pos, score_lo, score_hi, cum_n, cum_pos,
           CASE WHEN na > 0 THEN CAST(cum_pos * 1000000 // na AS BIGINT)
           END AS capture_micro,
           CASE WHEN na > 0 AND cum_n > 0 THEN
             ROUND(CAST(cum_pos AS DOUBLE) * nt
               / (CAST(cum_n AS DOUBLE) * na), 6) END AS cum_lift_r6
    FROM cum
    """,
    doc="Cumulative-gains / lift table (ops.stats.cumulative_gains): "
    "order totals binned DESCENDING into deciles (bin 0 = priciest), "
    "per bin the cumulative share of FINISHED orders captured and "
    "the cumulative lift over random targeting - the "
    "how-deep-to-score operational view completing the model-eval "
    "block (roc_auc: discrimination, calibration: probability "
    "quality, gains: yield per targeting budget). calibration_bins "
    "machinery on the NEGATED score (exact), triangular self-join of "
    "the 10-row bin table for cumulatives (broadcast, bounded - "
    "never a data-row window); capture_micro exact BIGINT, one flat "
    "double lift ratio rounded @6.",
)
def gains_orderstatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import cumulative_gains

    return cumulative_gains(
        t(spark, sf_dir, "orders"), "o_totalprice",
        F.col("o_orderstatus") == "F", n_bins=10,
    )


@register(
    "ece_orderstatus",
    oracle="""
    WITH g AS (
      SELECT o_totalprice AS v,
             SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS ca,
             COUNT(*) AS c
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL
      GROUP BY 1
    ),
    r AS (
      SELECT v, ca, c,
             COALESCE(SUM(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef,
             SUM(c) OVER () AS n_tot
      FROM g
    ),
    pb AS (
      SELECT CAST(bef * 10 // n_tot AS BIGINT) AS bin,
             CAST(SUM(c) AS BIGINT) AS nb,
             CAST(SUM(ca) AS BIGINT) AS cab,
             CAST(SUM(c * (bef * 1000000 // n_tot)) AS BIGINT) AS sb,
             MAX(n_tot) AS n
      FROM r GROUP BY 1
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_bins_used,
           ROUND(SUM(CAST(nb AS DOUBLE) / n
             * ABS(CAST(cab AS DOUBLE) / nb
                   - CAST(sb AS DOUBLE) / (CAST(nb AS DOUBLE) * 1000000.0))),
             6) AS ece_r6,
           ROUND(MAX(ABS(CAST(cab AS DOUBLE) / nb
                   - CAST(sb AS DOUBLE) / (CAST(nb AS DOUBLE) * 1000000.0))),
             6) AS mce_r6
    FROM pb
    """,
    doc="Expected / maximum calibration error "
    "(ops.stats.expected_calibration_error): the one-row scalar "
    "rollup of calibration_orderstatus's reliability diagram - "
    "ECE = sum n_b/N * |acc_b - conf_b|, MCE = max - the number a "
    "drift monitor pages on (the table is the diagnostic; this is "
    "the alert). brier_orderstatus's exclusive-prefix percentile "
    "forecast and bins verbatim; exact BIGINT per-bin sums, double "
    "L1 folds over the fixed 10 bin rows only (anova precedent), "
    "rounded @6.",
)
def ece_orderstatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import expected_calibration_error

    return expected_calibration_error(
        t(spark, sf_dir, "orders"), "o_totalprice",
        F.col("o_orderstatus") == "F", n_bins=10,
    )


@register(
    "kruskal_priority_price",
    oracle="""
    WITH base AS (
      SELECT o_orderpriority AS g, o_totalprice AS v FROM orders
      WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL
    ),
    gvg AS (
      SELECT g, v, CAST(COUNT(*) AS BIGINT) AS cg FROM base GROUP BY 1, 2
    ),
    vg AS (SELECT v, CAST(SUM(cg) AS BIGINT) AS c FROM gvg GROUP BY 1),
    pre AS (
      SELECT v, c, COALESCE(SUM(c) OVER (ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
      FROM vg
    ),
    pg AS (
      SELECT g, CAST(SUM(cg * (2 * bef + c + 1)) AS BIGINT) AS r2g,
             CAST(SUM(cg) AS BIGINT) AS ng
      FROM gvg JOIN pre USING (v) GROUP BY 1
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(ng) AS BIGINT) AS nn,
             CAST(SUM(CAST((CAST(r2g AS HUGEINT) * r2g) // (4 * ng)
                           AS BIGINT)) AS BIGINT) AS srr
      FROM pg
    ),
    tt AS (SELECT CAST(SUM(c * c * c - c) AS BIGINT) AS ties FROM vg)
    SELECT k AS k_groups, nn AS n_rows,
      CASE WHEN k > 1 AND nn > k THEN CAST(FLOOR(
        (12.0 * CAST(srr AS DOUBLE)
         / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0))
         - 3.0 * (CAST(nn AS DOUBLE) + 1.0)) * 1000000) AS BIGINT)
      END AS h_e6,
      CASE WHEN k > 1 AND nn > k AND
        (1.0 - CAST(ties AS DOUBLE)
         / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
            - CAST(nn AS DOUBLE))) > 0
      THEN CAST(FLOOR(
        (12.0 * CAST(srr AS DOUBLE)
         / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0))
         - 3.0 * (CAST(nn AS DOUBLE) + 1.0))
        / (1.0 - CAST(ties AS DOUBLE)
           / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
              - CAST(nn AS DOUBLE)))
        * 1000000) AS BIGINT) END AS hc_e6,
      CASE WHEN k > 1 AND nn > k THEN CAST(FLOOR(
        ((12.0 * CAST(srr AS DOUBLE)
          / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0))
          - 3.0 * (CAST(nn AS DOUBLE) + 1.0))
         - CAST(k AS DOUBLE) + 1.0)
        / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)) * 1000000) AS BIGINT)
      END AS eps2_e6
    FROM m CROSS JOIN tt
    """,
    doc="Kruskal-Wallis H across the 5 order priorities on order total "
    "(ops.stats.kruskal_wallis): the k-arm nonparametric omnibus that "
    "completes the hypothesis-test family (MWU = 2 arms on ranks, "
    "ANOVA = k arms on means, this = k arms on ranks) - run it first, "
    "then pairwise mwu_priority_price follow-ups on the arms it "
    "flags. One (group,value)-grain pass; exclusive prefix via "
    "global_running_sum; per-group 2x rank sums exact BIGINT; the "
    "rank-sum-squared numerator routes through DECIMAL(38,0) multiply "
    "+ truncating div (Spark div = DuckDB // on nonnegatives, parity "
    "probed) so H/H_c/eps-squared are flat double expressions of "
    "exact integers. Tie-corrected H_c and epsilon-squared effect "
    "size included.",
)
def kruskal_priority_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import kruskal_wallis

    return kruskal_wallis(
        t(spark, sf_dir, "orders"), "o_totalprice", "o_orderpriority"
    )


@register(
    "auc_by_segment",
    oracle="""
    WITH base AS (
      SELECT c.c_mktsegment AS grp, o.o_totalprice AS v,
             CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_totalprice IS NOT NULL AND o.o_orderstatus IS NOT NULL
        AND c.c_mktsegment IS NOT NULL
    ),
    g AS (
      SELECT grp, v, CAST(SUM(pos) AS BIGINT) AS ca,
             CAST(SUM(1 - pos) AS BIGINT) AS cb
      FROM base GROUP BY 1, 2
    ),
    r AS (
      SELECT grp, ca, cb, ca + cb AS c,
             COALESCE(SUM(ca + cb) OVER (PARTITION BY grp ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
      FROM g
    ),
    m AS (
      SELECT grp, CAST(SUM(ca * (2 * bef + c + 1)) AS BIGINT) AS r2a,
             CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
      FROM r GROUP BY 1
    )
    SELECT grp AS "group", na AS n_pos, nb AS n_neg,
           CASE WHEN na > 0 AND nb > 0 THEN
             CAST(((r2a - na * (na + 1)) * 1000000) // (2 * na * nb)
                  AS BIGINT)
           END AS auc_micro
    FROM m
    """,
    doc="Per-market-segment exact ROC-AUC of order total vs FINISHED "
    "status (ops.stats.roc_auc_by_group): the fairness/QA slice of "
    "roc_auc_orderstatus - a global AUC hides a segment where the "
    "score inverts; this surfaces all 5. Same 2x-scaled exact-BIGINT "
    "rank machinery, with the exclusive prefix PARTITIONED by segment "
    "over the (segment, score) grain (grouped-running-sum shape - "
    "partitioned, grain-sized, AQE skew-splits a dominant segment) "
    "and one integer div to micros per group.",
)
def auc_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import roc_auc_by_group

    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders["o_custkey"] == cust["c_custkey"],
    )
    return roc_auc_by_group(
        joined, "o_totalprice", F.col("o_orderstatus") == "F",
        "c_mktsegment",
    )


@register(
    "cramers_v_segment_priority",
    oracle="""
    WITH base AS (
      SELECT c.c_mktsegment AS x, o.o_orderpriority AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment IS NOT NULL AND o.o_orderpriority IS NOT NULL
    ),
    j AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS nxy FROM base GROUP BY 1, 2),
    mx AS (SELECT x, SUM(nxy) AS nx FROM j GROUP BY 1),
    my AS (SELECT y, SUM(nxy) AS ny FROM j GROUP BY 1),
    tot AS (SELECT CAST(SUM(nxy) AS DOUBLE) AS n,
                   CAST(SUM(nxy) AS BIGINT) AS nb FROM j),
    card AS (SELECT CAST(COUNT(DISTINCT x) AS BIGINT) AS cx,
                    CAST(COUNT(DISTINCT y) AS BIGINT) AS cy FROM j),
    s AS (
      SELECT SUM((nxy - nx * ny / n) * (nxy - nx * ny / n) / (nx * ny / n)
                 - nx * ny / n) AS t
      FROM j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot
    ),
    c2 AS (
      SELECT CAST(FLOOR((t + nb) * 1000000) AS BIGINT) AS chi2_e6,
             (cx - 1) * (cy - 1) AS dof, nb AS n,
             LEAST(cx - 1, cy - 1) AS minm
      FROM s CROSS JOIN tot CROSS JOIN card
    )
    SELECT chi2_e6, dof, n,
           CASE WHEN minm > 0 AND n > 0 THEN CAST(FLOOR(SQRT(
             (CAST(chi2_e6 AS DOUBLE) / 1000000.0)
             / (CAST(n AS DOUBLE) * CAST(minm AS DOUBLE))) * 1000000)
             AS BIGINT) END AS v_e6
    FROM c2
    """,
    doc="Cramér's V effect size for market segment x order priority "
    "(ops.stats.cramers_v): chi2 grows with N so it cannot compare "
    "tables - V = sqrt(chi2/(N*min(r-1,c-1))) is the [0,1] "
    "association strength (the categorical analogue of "
    "orders_mutual_info's normalized MI; here ~0: segment does not "
    "predict priority - the null-association fixture). Same "
    "observed-cells-only contingency shape as chi2_source_lang; V "
    "computed FROM the floored chi2_e6 so the one IEEE sqrt sees "
    "bit-identical inputs cross-engine. Broadcast customer dim.",
)
def cramers_v_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import cramers_v

    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders["o_custkey"] == cust["c_custkey"],
    )
    return cramers_v(joined, "c_mktsegment", "o_orderpriority")


@register(
    "friedman_priority_volume",
    oracle="""
    WITH cells AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) * 100
                  + EXTRACT(month FROM o_orderdate) AS BIGINT) AS b,
             o_orderpriority AS tr, CAST(COUNT(*) AS BIGINT) AS v
      FROM orders
      WHERE o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL
      GROUP BY 1, 2
    ),
    kk AS (SELECT CAST(COUNT(DISTINCT tr) AS BIGINT) AS k FROM cells),
    comp AS (
      SELECT b FROM cells GROUP BY b
      HAVING COUNT(*) = (SELECT k FROM kk)
    ),
    kept AS (SELECT c.* FROM cells c JOIN comp USING (b)),
    sub0 AS (SELECT b, v, CAST(COUNT(*) AS BIGINT) AS c FROM kept GROUP BY 1, 2),
    sub AS (
      SELECT b, v, c,
             CAST(COALESCE(SUM(c) OVER (PARTITION BY b ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS bef
      FROM sub0
    ),
    rk AS (
      SELECT k2.tr, 2 * s.bef + s.c + 1 AS r2
      FROM kept k2 JOIN sub s ON s.b = k2.b AND s.v = k2.v
    ),
    pt AS (
      SELECT tr, CAST(SUM(r2) AS BIGINT) AS r2j,
             CAST(COUNT(*) AS BIGINT) AS nb
      FROM rk GROUP BY 1
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(MAX(nb) AS BIGINT) AS n,
             CAST(SUM(CAST((CAST(r2j AS HUGEINT) * r2j) // 4 AS BIGINT))
               AS BIGINT) AS srr
      FROM pt
    ),
    tt AS (SELECT CAST(COALESCE(SUM(c * c * c - c), 0) AS BIGINT) AS ties
           FROM sub0)
    SELECT k AS k_treatments, COALESCE(n, 0) AS n_blocks,
      CASE WHEN k > 1 AND n > 0 THEN CAST(FLOOR(
        (12.0 * CAST(srr AS DOUBLE)
         / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0))
         - 3.0 * CAST(n AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0))
        * 1000000) AS BIGINT) END AS q_e6,
      CASE WHEN k > 1 AND n > 0 AND
        (1.0 - CAST(ties AS DOUBLE)
         / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
            * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0))) > 0
      THEN CAST(FLOOR(
        (12.0 * CAST(srr AS DOUBLE)
         / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0))
         - 3.0 * CAST(n AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0))
        / (1.0 - CAST(ties AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
              * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)))
        * 1000000) AS BIGINT) END AS qc_e6
    FROM m CROSS JOIN tt
    """,
    doc="Friedman test across the 5 order priorities blocked by "
    "calendar month on order VOLUME (ops.stats.friedman_test): do "
    "priorities keep one volume ordering month after month, or does "
    "the ranking genuinely shuffle - the repeated-measures omnibus of "
    "rank family (MWU 2 independent arms, Kruskal k independent, "
    "this k MATCHED). One map-side-combined pass to (month, mode) "
    "counts (exact BIGINT values - no float cell statistic); "
    "incomplete months excluded with the kept-block count visible; "
    "within-block 2x midranks on the (block, value) sub-grain; "
    "kruskal's DECIMAL(38,0)/truncating-div route for the rank-sum "
    "squares; tie-corrected Q_c included.",
)
def friedman_priority_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import friedman_test

    orders = t(spark, sf_dir, "orders")
    cells = (
        orders.filter(
            F.col("o_orderdate").isNotNull()
            & F.col("o_orderpriority").isNotNull()
        )
        .groupBy(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .cast("long")
            .alias("ym"),
            "o_orderpriority",
        )
        .agg(F.count("*").cast("long").alias("vol"))
    )
    return friedman_test(cells, "ym", "o_orderpriority", "vol")


@register(
    "page_trend_priority",
    oracle="""
    WITH cells AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) * 100
                  + EXTRACT(month FROM o_orderdate) AS BIGINT) AS b,
             CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS j,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM orders
      WHERE o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL
      GROUP BY 1, 2
    ),
    kk AS (SELECT CAST(COUNT(DISTINCT j) AS BIGINT) AS k,
                  CAST(MIN(j) AS BIGINT) AS mn,
                  CAST(MAX(j) AS BIGINT) AS mx FROM cells),
    comp AS (
      SELECT b FROM cells GROUP BY b
      HAVING COUNT(*) = (SELECT k FROM kk)
    ),
    kept AS (SELECT c.* FROM cells c JOIN comp USING (b)),
    sub0 AS (SELECT b, v, CAST(COUNT(*) AS BIGINT) AS c FROM kept GROUP BY 1, 2),
    sub AS (
      SELECT b, v, c,
             CAST(COALESCE(SUM(c) OVER (PARTITION BY b ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS bef
      FROM sub0
    ),
    rk AS (
      SELECT k2.j, 2 * s.bef + s.c + 1 AS r2
      FROM kept k2 JOIN sub s ON s.b = k2.b AND s.v = k2.v
    ),
    m AS (SELECT CAST(SUM(j * r2) AS BIGINT) AS l2 FROM rk),
    nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM comp)
    SELECT k AS k_treatments, COALESCE(n, 0) AS n_blocks, l2 AS l2,
      CASE WHEN k > 1 AND n > 0 AND mn = 1 AND mx = k THEN CAST(FLOOR(
        CAST(l2 - (n * k * (k + 1) * (k + 1)) // 2 AS DOUBLE)
        / sqrt(CAST(n AS DOUBLE) * CAST(k AS DOUBLE) * CAST(k AS DOUBLE)
               * (CAST(k AS DOUBLE) + 1.0)
               * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0) / 36.0)
        * 1000000) AS BIGINT) END AS z_e6
    FROM m CROSS JOIN nb CROSS JOIN kk
    """,
    doc="Page's trend test across the 5 order priorities (hypothesized "
    "order = the priority's leading digit, 1-URGENT..5-LOW) blocked by "
    "calendar month on order VOLUME (ops.stats.page_trend_test): the "
    "ordered-alternative completion of the blocked-rank family - "
    "friedman_priority_volume asks whether the monthly priority "
    "ranking shuffles AT ALL, this asks whether it tilts in the "
    "specific urgent-to-low direction (and jonckheere_priority_price "
    "is the same question without blocks). Identical grain and "
    "complete-block rule as the Friedman gate (shared cell CTE "
    "shape), 2x-midrank BIGINT L, classic moments, ONE flat "
    "double + sqrt floored to e6.",
)
def page_trend_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import page_trend_test

    orders = t(spark, sf_dir, "orders")
    cells = (
        orders.filter(
            F.col("o_orderdate").isNotNull()
            & F.col("o_orderpriority").isNotNull()
        )
        .groupBy(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .cast("long")
            .alias("ym"),
            F.substring("o_orderpriority", 1, 1).cast("long").alias("pj"),
        )
        .agg(F.count("*").cast("long").alias("vol"))
    )
    return page_trend_test(cells, "ym", "pj", "vol")


@register(
    "cochran_armitage_returns",
    oracle="""
    WITH g AS (
      SELECT CAST(CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT)
               AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS r,
             CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS a
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderpriority IS NOT NULL
      GROUP BY 1
    ),
    m AS (
      SELECT CAST(SUM(r) AS BIGINT) AS n, CAST(SUM(a) AS BIGINT) AS na,
             CAST(SUM(s * r) AS BIGINT) AS s1,
             CAST(SUM(s * s * r) AS BIGINT) AS s2,
             CAST(SUM(s * a) AS BIGINT) AS sa
      FROM g
    )
    SELECT n, na AS n_pos,
           CAST(CAST(sa AS HUGEINT) * n - CAST(s1 AS HUGEINT) * na
             AS BIGINT) AS tn,
           CASE WHEN (CAST(na AS HUGEINT) * (n - na)
                * (CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1)) > 0
           THEN CAST(FLOOR(
             CAST(CAST(sa AS HUGEINT) * n - CAST(s1 AS HUGEINT) * na
               AS DOUBLE)
             / sqrt(CAST(CAST(na AS HUGEINT) * (n - na)
                 * (CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1)
                 AS DOUBLE) / CAST(n AS DOUBLE))
             * 1000000) AS BIGINT) END AS z_e6
    FROM m
    """,
    doc="Cochran-Armitage trend test: does the line return rate move "
    "monotonically across the 5 order priorities (score = leading "
    "digit) - the binary-outcome trend completion "
    "(ops.stats.cochran_armitage_trend): chi2_source_lang-style "
    "omnibus tests spend power on every permutation, CA spends it "
    "all on the ordered alternative, the jonckheere/page question "
    "for a RATE. Exact BIGINT/DECIMAL(38,0) grain moments (T*n via "
    "the linearity identity sa*n - s1*A - one pass, no rescan), one "
    "flat double division + single sqrt floored e6; z > 0 means "
    "returns rise toward low priorities.",
)
def cochran_armitage_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import cochran_armitage_trend

    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    j = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).filter(F.col("o_orderpriority").isNotNull()).select(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("ps"),
        (F.col("l_returnflag") == "R").alias("ret"),
    )
    return cochran_armitage_trend(j, "ps", F.col("ret"))


@register(
    "hodges_lehmann_daily",
    oracle="""
    WITH a AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS v FROM events
      WHERE event_type = 'click'
      GROUP BY CAST(CAST(ts AS DATE) AS VARCHAR)
    ),
    b AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS v FROM events
      WHERE event_type = 'purchase'
      GROUP BY CAST(CAST(ts AS DATE) AS VARCHAR)
    ),
    ga AS (SELECT v AS va, CAST(COUNT(*) AS BIGINT) AS ca FROM a GROUP BY 1),
    gb AS (SELECT v AS vb, CAST(COUNT(*) AS BIGINT) AS cb FROM b GROUP BY 1),
    grain AS (
      SELECT va - vb AS d, CAST(SUM(ca * cb) AS BIGINT) AS w
      FROM ga CROSS JOIN gb GROUP BY 1
    ),
    cum AS (SELECT d, CAST(SUM(w) OVER (ORDER BY d) AS BIGINT) AS cum
            FROM grain),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS np FROM grain),
    na AS (SELECT CAST(SUM(ca) AS BIGINT) AS n FROM ga),
    nb AS (SELECT CAST(SUM(cb) AS BIGINT) AS n FROM gb),
    lo AS (SELECT CAST(MIN(d) AS BIGINT) AS lo
           FROM cum CROSS JOIN tot WHERE 2 * cum >= np),
    hi AS (SELECT CAST(MIN(d) AS BIGINT) AS hi
           FROM cum CROSS JOIN tot WHERE 2 * cum >= np + 2 - (np % 2))
    SELECT na.n AS n_a, nb.n AS n_b, tot.np AS n_pairs,
           lo.lo + hi.hi AS hl2_shift
    FROM na CROSS JOIN nb CROSS JOIN tot CROSS JOIN lo CROSS JOIN hi
    """,
    doc="Hodges-Lehmann shift between daily click and purchase volumes "
    "(ops.stats.hodges_lehmann_shift): the robust how-much-bigger "
    "estimate that completes the two-sample location story - "
    "mwu_priority_price detects a shift, effect_sizes_returnflag "
    "scales it parametrically (Cohen's d) and ordinally (Cliff's "
    "delta), HL states it in the measurement's own units as the "
    "median of ALL n_a*n_b pairwise differences. Day-grain collapse "
    "BEFORE the quadratic pair grid (30x30 days here - the grain, "
    "never the data, is squared), difference distribution "
    "re-collapsed and prefix-summed range-partitioned, exact 2x "
    "central order statistics via the weighted_median 2*cum rule. "
    "All-BIGINT end to end - zero floats anywhere.",
)
def hodges_lehmann_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import hodges_lehmann_shift

    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").cast("string").alias("day"), "event_type"
    ).agg(F.count("*").cast("long").alias("n"))
    return hodges_lehmann_shift(daily, "n", "event_type", "click", "purchase")


@register(
    "lin_ccc_order_value",
    oracle="""
    WITH u AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS x,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
               AS BIGINT)) AS BIGINT) AS y
      FROM lineitem GROUP BY 1
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM u
    )
    SELECT n,
      CASE WHEN ((CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
                 + (CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy)
                 + (CAST(sx - sy AS HUGEINT) * CAST(sx - sy AS HUGEINT))) > 0
      THEN CAST(FLOOR(
        CAST((2 * (CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy))
          AS DOUBLE)
        / CAST(((CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
                + (CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy)
                + (CAST(sx - sy AS HUGEINT) * CAST(sx - sy AS HUGEINT)))
          AS DOUBLE)
        * 1000000) AS BIGINT) END AS ccc_e6,
      CASE WHEN (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx) > 0
        AND (CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy) > 0
      THEN ROUND(
        CAST((2 * (CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy))
          AS DOUBLE) / 2
        / SQRT(
          CAST((CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
            AS DOUBLE)
          * CAST((CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy)
            AS DOUBLE)), 6) END AS r_r6
    FROM m
    """,
    doc="Lin's concordance correlation between an order's gross "
    "lineitem value and its discounted value, in exact floored cents "
    "(ops.stats.lin_ccc): the continuous-agreement completion of the "
    "rater family (langid_kappa/fleiss_langid score nominal "
    "agreement; this scores numeric reproducibility). The two "
    "measures rank orders almost identically (Pearson r ~ 1, also "
    "reported) but the systematic discount haircut costs CCC its "
    "bias term (mu_x - mu_y)^2 - exactly the r-vs-CCC gap the "
    "statistic exists to expose. One unit-grain pass, then a scalar "
    "reduce of exact BIGINT/DECIMAL(38,0) moments (HUGEINT parity "
    "route - cents-squared sums overflow BIGINT at scale); CCC is "
    "num/den of two EXACT n^2-scaled decimals, one double division "
    "floored e6; r adds the single sqrt, rounded @6.",
)
def lin_ccc_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import lin_ccc

    li = t(spark, sf_dir, "lineitem")
    u = li.groupBy("l_orderkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long").alias("x"),
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("long")
        ).cast("long").alias("y"),
    )
    return lin_ccc(u, "x", "y")


# AMS tug-of-war oracle fragments: one signed-sum column per estimator,
# sign = md5 parity of (key || '|' || i) — the identical hash text the
# Spark side computes, so Z_i match exactly.
_AMS_N = 16
_AMS_Z = ",\n           ".join(
    "CAST(SUM(CASE WHEN CAST('0x' || substr(md5(x || '|' || '"
    f"{i}'), 1, 8) AS BIGINT) % 2 = 1 THEN f ELSE -f END) AS BIGINT)"
    f" AS z{i}"
    for i in range(_AMS_N)
)
_AMS_ESTS = ", ".join(f"z{i} * z{i}" for i in range(_AMS_N))


@register(
    "ams_f2_custkey",
    oracle=f"""
    WITH freq AS (
      SELECT CAST(o_custkey AS VARCHAR) AS x,
             CAST(COUNT(*) AS BIGINT) AS f
      FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
    ),
    z AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(f * f) AS BIGINT) AS f2_exact,
           {_AMS_Z}
      FROM freq
    ),
    e AS (
      SELECT n_keys, f2_exact, [{_AMS_ESTS}] AS ests FROM z
    )
    SELECT n_keys, f2_exact,
           CAST(list_sum(ests) // {_AMS_N} AS BIGINT) AS est_mean,
           CAST(list_sort(ests)[{_AMS_N // 2}]
             + list_sort(ests)[{_AMS_N // 2 + 1}] AS BIGINT) AS est_med2x,
           CASE WHEN f2_exact > 0 THEN ABS(CAST(list_sum(ests)
             // {_AMS_N} AS BIGINT) - f2_exact) * 1000000 // f2_exact
           END AS rel_err_mean_micro,
           CASE WHEN f2_exact > 0 THEN ABS(CAST(list_sort(ests)[{_AMS_N // 2}]
             + list_sort(ests)[{_AMS_N // 2 + 1}] AS BIGINT)
             - 2 * f2_exact) * 1000000 // (2 * f2_exact)
           END AS rel_err_med_micro
    FROM e
    """,
    doc="AMS tug-of-war F2 sketch with exact-answer audit on the "
    "orders customer key (agg.sketches.ams_f2_audit, n_est=16): F2 = "
    "sum of squared key frequencies IS the self-join size of orders "
    "on custkey - the join-size/skew quantity planners estimate - "
    "and this gate runs the classic +-1-hash sketch and the exact "
    "computation side by side, reporting mean-of-16 and median-of-16 "
    "estimates with relative errors (the sketch tier's "
    "ann_ivf_recall: CMS has its join-size gate, HLL its rollup, "
    "MinHash its estimator audit, AMS now its variance audit). Signs "
    "from md5 parity (cross-engine portable; production = xxhash64); "
    "ONE map-side-combined pass to the key grain, the 16 signed sums "
    "as conditional aggregates in ONE single-row reduce (no "
    "fan-out), exact BIGINT squares, truncating integer divisions.",
)
def ams_f2_custkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.agg.sketches import ams_f2_audit

    orders = t(spark, sf_dir, "orders")
    return ams_f2_audit(orders, "o_custkey", n_est=_AMS_N)


@register(
    "isotonic_orderstatus",
    oracle="""
    WITH g AS (
      SELECT o_totalprice AS v,
             SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS ca,
             COUNT(*) AS c
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL
      GROUP BY 1
    ),
    r AS (
      SELECT v, ca, c,
             COALESCE(SUM(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef,
             SUM(c) OVER () AS n_tot
      FROM g
    ),
    bins AS MATERIALIZED (
      SELECT CAST(bef * 10 // n_tot AS BIGINT) AS bin,
             CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(ca) AS BIGINT) AS n_pos,
             CAST((SUM(ca) * 1000000) // SUM(c) AS BIGINT) AS rate_micro
      FROM r GROUP BY 1
    ),
    pooled AS (
      SELECT bj.bin AS j, bl.bin AS l,
             CAST(SUM(bm.n) AS BIGINT) AS sn,
             CAST(SUM(bm.n_pos) AS BIGINT) AS sp
      FROM bins bj
      JOIN bins bl ON bj.bin <= bl.bin
      JOIN bins bm ON bm.bin >= bj.bin AND bm.bin <= bl.bin
      GROUP BY 1, 2
    ),
    m1 AS (
      SELECT j, MIN(CAST(sp AS DOUBLE) / CAST(sn AS DOUBLE)) AS mn
      FROM pooled GROUP BY 1
    ),
    iso AS (
      SELECT bi.bin, MAX(m1.mn) AS v
      FROM bins bi JOIN m1 ON m1.j <= bi.bin
      GROUP BY 1
    )
    SELECT b.bin, b.n, b.n_pos, b.rate_micro,
           CAST(FLOOR(iso.v * 1000000) AS BIGINT) AS iso_micro
    FROM bins b JOIN iso ON iso.bin = b.bin
    """,
    doc="Isotonic (PAV) calibration curve over the "
    "calibration_orderstatus reliability bins "
    "(ops.stats.isotonic_calibration): the monotone rate curve "
    "closest in weighted L2 to the observed per-bin FINISHED rates - "
    "the calibration FIX under the diagnosis (nonparametric Platt "
    "alternative). PAV is sequential and would not distribute; the "
    "minimax identity iso(i) = max_{j<=i} min_{l>=j} pooled-rate(j..l) "
    "is the closed form that does, as n_bins^2-bounded broadcast "
    "triangular joins (<= 55 pairs) over exact BIGINT pooled sums "
    "with ONE double division each - min/max order-independent, "
    "floor-micro deterministic. Bin grain shared verbatim with the "
    "calibration gate.",
)
def isotonic_orderstatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import isotonic_calibration

    return isotonic_calibration(
        t(spark, sf_dir, "orders"), "o_totalprice",
        F.col("o_orderstatus") == "F", n_bins=10,
    )


@register(
    "brown_forsythe_acctbal",
    oracle="""
    WITH grain AS (
      SELECT c_mktsegment AS g,
             CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS q,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM customer WHERE c_acctbal IS NOT NULL GROUP BY 1, 2
    ),
    cum AS (
      SELECT g, q, c,
             SUM(c) OVER (PARTITION BY g ORDER BY q) AS cumc,
             SUM(c) OVER (PARTITION BY g) AS n
      FROM grain
    ),
    meds AS (
      SELECT g, MIN(CASE WHEN 2 * cumc >= n THEN q END) AS med
      FROM cum GROUP BY 1
    ),
    zq AS (
      SELECT c.c_mktsegment AS g,
             ABS(CAST(FLOOR(c.c_acctbal * 100) AS BIGINT) - m.med) AS z
      FROM customer c JOIN meds m ON c.c_mktsegment = m.g
      WHERE c.c_acctbal IS NOT NULL
    ),
    pg AS (
      SELECT g, COUNT(*) AS n, SUM(z) AS s1, SUM(z * z) AS s2 FROM zq GROUP BY 1
    ),
    m AS (
      SELECT COUNT(*) AS k, SUM(n) AS nn, SUM(s1) AS ts1, SUM(s2) AS ts2,
             SUM(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
               AS sgm
      FROM pg
    )
    SELECT CAST(k AS BIGINT) AS k_groups, CAST(nn AS BIGINT) AS n_rows,
           CASE WHEN k > 1 AND nn > k
                 AND CAST(ts2 AS DOUBLE) - sgm > 0
           THEN CAST(FLOOR(
                ((sgm - CAST(ts1 AS DOUBLE) * CAST(ts1 AS DOUBLE)
                    / CAST(nn AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
                / ((CAST(ts2 AS DOUBLE) - sgm)
                   / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)))
                * 1000000) AS BIGINT)
           END AS w_e6,
           CAST(k - 1 AS BIGINT) AS df_between,
           CAST(nn - k AS BIGINT) AS df_within
    FROM m
    """,
    doc="Brown-Forsythe variance-homogeneity test across the five "
    "market segments on account balance (ops.stats.brown_forsythe): "
    "the robust Levene variant - ANOVA's F computed on |x - group "
    "MEDIAN| - which decides whether anova_acctbal_segments' "
    "equal-variance assumption holds or Welch follow-ups are needed. "
    "Exact integer medians from grouped_quartiles broadcast back "
    "(data rows never shuffle), exact BIGINT deviation moments in one "
    "map-side pass, anova's identical flat double F shape.",
)
def brown_forsythe_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import brown_forsythe

    return brown_forsythe(
        t(spark, sf_dir, "customer"), "c_acctbal", "c_mktsegment"
    )


@register(
    "auc_delong_orderstatus",
    oracle="""
    WITH g AS (
      SELECT o_totalprice AS v,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
               AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END)
               AS BIGINT) AS cb
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL
      GROUP BY 1
    ),
    r AS (
      SELECT ca, cb,
             SUM(ca) OVER (ORDER BY v) AS cuma,
             SUM(cb) OVER (ORDER BY v) AS cumb,
             SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
      FROM g
    ),
    q AS (
      SELECT ca, cb, na, nb,
             2 * (cumb - cb) + cb AS qp,
             2 * (na - cuma) + ca AS qn
      FROM r
    ),
    m AS (
      SELECT CAST(MAX(na) AS BIGINT) AS n_pos, CAST(MAX(nb) AS BIGINT) AS n_neg,
             CAST(SUM(ca * qp) AS BIGINT) AS sp1,
             CAST(SUM(cb * qn) AS BIGINT) AS sn1,
             SUM(CAST(ca AS HUGEINT) * qp * qp) AS sp2,
             SUM(CAST(cb AS HUGEINT) * qn * qn) AS sn2
      FROM q
    ),
    s AS (
      SELECT n_pos, n_neg, sp1,
        CASE WHEN n_pos > 0 AND n_neg > 0 THEN
          CAST((sp1 * 1000000) // (2 * n_pos * n_neg) AS BIGINT)
        END AS auc_micro,
        CASE WHEN n_pos > 1 AND n_neg > 1 THEN
          SQRT(
            ((CAST(sp2 AS DOUBLE)
              - CAST(sp1 AS DOUBLE) * CAST(sp1 AS DOUBLE)
                / CAST(n_pos AS DOUBLE))
             / (CAST(n_pos AS DOUBLE) - 1.0)
             / (4.0 * CAST(n_neg AS DOUBLE) * CAST(n_neg AS DOUBLE)))
            / CAST(n_pos AS DOUBLE)
            + ((CAST(sn2 AS DOUBLE)
              - CAST(sn1 AS DOUBLE) * CAST(sn1 AS DOUBLE)
                / CAST(n_neg AS DOUBLE))
             / (CAST(n_neg AS DOUBLE) - 1.0)
             / (4.0 * CAST(n_pos AS DOUBLE) * CAST(n_pos AS DOUBLE)))
            / CAST(n_neg AS DOUBLE))
        END AS se
      FROM m
    )
    SELECT n_pos, n_neg, auc_micro,
      CASE WHEN se IS NOT NULL THEN
        CAST(FLOOR(se * 1000000000) AS BIGINT) END AS se_e9,
      CASE WHEN se IS NOT NULL THEN CAST(FLOOR(
        GREATEST(0.0, CAST(sp1 AS DOUBLE) / (2.0 * CAST(n_pos AS DOUBLE)
          * CAST(n_neg AS DOUBLE)) - 1.96 * se) * 1000000) AS BIGINT)
      END AS ci_lo_e6,
      CASE WHEN se IS NOT NULL THEN CAST(FLOOR(
        LEAST(1.0, CAST(sp1 AS DOUBLE) / (2.0 * CAST(n_pos AS DOUBLE)
          * CAST(n_neg AS DOUBLE)) + 1.96 * se) * 1000000) AS BIGINT)
      END AS ci_hi_e6
    FROM s
    """,
    doc="ROC-AUC with DeLong standard error and 95% CI "
    "(ops.stats.roc_auc_delong) on the roc_auc_orderstatus fixture: "
    "a point AUC cannot say whether 0.71 beats 0.69 - DeLong 1988 is "
    "the standard nonparametric AUC variance, from per-class "
    "placement values. Same grain collapse + one exclusive-prefix "
    "range pass; placements carried as exact 2x numerators per grain "
    "row, Sum(w*q) BIGINT and Sum(w*q^2) through DECIMAL(38,0)/"
    "HUGEINT (the kruskal route); variance/SE/CI flat double "
    "expressions with one sqrt (wilson contract), CI clamped [0,1].",
)
def auc_delong_orderstatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import roc_auc_delong

    return roc_auc_delong(
        t(spark, sf_dir, "orders"), "o_totalprice",
        F.col("o_orderstatus") == "F",
    )


@register(
    "jonckheere_priority_price",
    oracle="""
    WITH idx(glabel, gi) AS (VALUES
      ('1-URGENT', 0), ('2-HIGH', 1), ('3-MEDIUM', 2),
      ('4-NOT SPECIFIED', 3), ('5-LOW', 4)
    ),
    gvg AS (
      SELECT i.gi, o.o_totalprice AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM orders o JOIN idx i ON o.o_orderpriority = i.glabel
      WHERE o.o_totalprice IS NOT NULL
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.gi AS lo, b.gi AS h
      FROM (SELECT DISTINCT gi FROM idx) a
      JOIN (SELECT DISTINCT gi FROM idx) b ON a.gi < b.gi
    ),
    lattice AS (
      SELECT v, h, CAST(SUM(lc) AS BIGINT) AS L, CAST(SUM(hc) AS BIGINT) AS C
      FROM (
        SELECT g.v, p.h, g.c AS lc, CAST(0 AS BIGINT) AS hc
        FROM gvg g JOIN pairs p ON g.gi = p.lo
        UNION ALL
        SELECT v, gi AS h, CAST(0 AS BIGINT) AS lc, c AS hc FROM gvg
      ) u GROUP BY 1, 2
    ),
    cum AS (
      SELECT v, h, L, C,
             CAST(SUM(L) OVER (PARTITION BY h ORDER BY v) AS BIGINT) AS cumL
      FROM lattice
    ),
    jt AS (
      SELECT CAST(SUM(C * (2 * (cumL - L) + L)) AS BIGINT) AS jt2
      FROM cum WHERE C > 0
    ),
    sizes AS (SELECT gi, CAST(SUM(c) AS BIGINT) AS n FROM gvg GROUP BY 1),
    gm AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(n * (n - 1) * (2 * n + 5)) AS BIGINT) AS g1,
             CAST(SUM(n * (n - 1) * (n - 2)) AS BIGINT) AS g2,
             CAST(SUM(n * (n - 1)) AS BIGINT) AS g3
      FROM sizes
    ),
    tv AS (SELECT v, CAST(SUM(c) AS BIGINT) AS t FROM gvg GROUP BY 1),
    tm AS (
      SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS t1,
             CAST(SUM(t * (t - 1) * (t - 2)) AS BIGINT) AS t2,
             CAST(SUM(t * (t - 1)) AS BIGINT) AS t3
      FROM tv
    ),
    vz AS (
      SELECT k, nn, jt2, g3,
        CASE WHEN k > 1 AND nn > 2 THEN
          (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)
             * (2.0 * CAST(nn AS DOUBLE) + 5.0)
           - CAST(g1 AS DOUBLE) - CAST(t1 AS DOUBLE)) / 72.0
          + CAST(g2 AS DOUBLE) * CAST(t2 AS DOUBLE)
            / (36.0 * CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)
               * (CAST(nn AS DOUBLE) - 2.0))
          + CAST(g3 AS DOUBLE) * CAST(t3 AS DOUBLE)
            / (8.0 * CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0))
        END AS var
      FROM jt CROSS JOIN gm CROSS JOIN tm
    )
    SELECT k AS k_groups, nn AS n_rows, jt2,
      CASE WHEN var IS NOT NULL AND var > 0 THEN CAST(FLOOR(
        (CAST(jt2 AS DOUBLE) / 2.0
         - (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
            - (CAST(g3 AS DOUBLE) + CAST(nn AS DOUBLE))) / 4.0)
        / SQRT(var) * 1000000) AS BIGINT) END AS z_e6
    FROM vz
    """,
    doc="Jonckheere-Terpstra ordered-alternative trend across the 5 "
    "order priorities (URGENT -> LOW) on order total "
    "(ops.stats.jonckheere_terpstra): KW asks 'any difference', JT "
    "asks 'a MONOTONE difference' along the given order - far more "
    "power when the ordering is the hypothesis (here ~null: priority "
    "does not price orders - the no-trend fixture). JT = sum of "
    "pairwise MWU counts over ordered group pairs as exact 2x "
    "BIGINTs; per-h value prefixes through chunked_running_sum (no "
    "single-task window); z uses the full Hollander-Wolfe "
    "tie-corrected variance from exact group-size and tie-block "
    "moments, one flat double shape.",
)
def jonckheere_priority_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import jonckheere_terpstra

    return jonckheere_terpstra(
        t(spark, sf_dir, "orders"), "o_totalprice", "o_orderpriority",
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
    )


@register(
    "effect_sizes_returnflag",
    oracle="""
    WITH g AS (
      SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS q,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
               AS BIGINT) AS cb
      FROM lineitem
      WHERE l_returnflag IN ('R', 'N') AND l_extendedprice IS NOT NULL
      GROUP BY 1
    ),
    r AS (
      SELECT q, ca, cb, ca + cb AS c,
             COALESCE(SUM(ca + cb) OVER (ORDER BY q
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
      FROM g WHERE ca + cb > 0
    ),
    m AS (
      SELECT CAST(SUM(ca * (2 * bef + c + 1)) AS BIGINT) AS r2a,
             CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
             CAST(SUM(ca * q) AS BIGINT) AS sa1,
             CAST(SUM(ca * q * q) AS BIGINT) AS sa2,
             CAST(SUM(cb * q) AS BIGINT) AS sb1,
             CAST(SUM(cb * q * q) AS BIGINT) AS sb2
      FROM r
    )
    SELECT na AS n_a, nb AS n_b,
      CASE WHEN na > 0 AND nb > 0 THEN
        CAST(((r2a - na * (na + 1)) - na * nb) * 1000000 // (na * nb)
          AS BIGINT) END AS cliffs_delta_micro,
      CASE WHEN na > 1 AND nb > 1 AND
        ((CAST(sa2 AS DOUBLE) - CAST(sa1 AS DOUBLE) * CAST(sa1 AS DOUBLE)
            / CAST(na AS DOUBLE))
         + (CAST(sb2 AS DOUBLE) - CAST(sb1 AS DOUBLE) * CAST(sb1 AS DOUBLE)
            / CAST(nb AS DOUBLE))) > 0
      THEN CAST(FLOOR(
        (CAST(sa1 AS DOUBLE) / CAST(na AS DOUBLE)
         - CAST(sb1 AS DOUBLE) / CAST(nb AS DOUBLE))
        / SQRT(
          ((CAST(sa2 AS DOUBLE) - CAST(sa1 AS DOUBLE) * CAST(sa1 AS DOUBLE)
              / CAST(na AS DOUBLE))
           + (CAST(sb2 AS DOUBLE) - CAST(sb1 AS DOUBLE) * CAST(sb1 AS DOUBLE)
              / CAST(nb AS DOUBLE)))
          / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 2.0))
        * 1000000) AS BIGINT) END AS cohens_d_e6
    FROM m
    """,
    doc="Two-sample effect sizes R vs N returnflag on line price "
    "(ops.stats.effect_sizes_two_sample): Cliff's delta (rank-based "
    "P(a>b)-P(a<b) from the exact MWU 2x rank sum, one integer "
    "division) and pooled-SD Cohen's d (cent-quantized exact moments, "
    "flat double) - the HOW-different numbers a pipeline acts on "
    "where mwu_priority_price's p-value only gatekeeps (a significant "
    "z at n=1e7 can be an operationally irrelevant delta). ONE "
    "quantized-value grain pass feeds both; here ~0, the "
    "null-effect fixture.",
)
def effect_sizes_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import effect_sizes_two_sample

    return effect_sizes_two_sample(
        t(spark, sf_dir, "lineitem"), "l_extendedprice", "l_returnflag",
        "R", "N",
    )


@register(
    "cuped_purchases",
    oracle="""
    WITH units AS (
      SELECT user_id,
             MAX(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS v,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS y,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_control,
             CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_treat,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(CASE WHEN v = 0 THEN x ELSE 0 END) AS BIGINT) AS sxc,
             CAST(SUM(CASE WHEN v = 0 THEN y ELSE 0 END) AS BIGINT) AS syc,
             CAST(SUM(CASE WHEN v = 1 THEN x ELSE 0 END) AS BIGINT) AS sxt,
             CAST(SUM(CASE WHEN v = 1 THEN y ELSE 0 END) AS BIGINT) AS syt
      FROM units
    )
    SELECT n_control, n_treat,
      CASE WHEN n_control > 0 AND n_treat > 0 AND
        (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
      THEN CAST(FLOOR(
        (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1000000)
        AS BIGINT) END AS theta_e6,
      CASE WHEN n_control > 0 AND n_treat > 0 THEN CAST(FLOOR(
        (CAST(syt AS DOUBLE) / CAST(n_treat AS DOUBLE)
         - CAST(syc AS DOUBLE) / CAST(n_control AS DOUBLE)) * 1000000)
        AS BIGINT) END AS raw_diff_e6,
      CASE WHEN n_control > 0 AND n_treat > 0 AND
        (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
      THEN CAST(FLOOR(
        ((CAST(syt AS DOUBLE) / CAST(n_treat AS DOUBLE)
          - CAST(syc AS DOUBLE) / CAST(n_control AS DOUBLE))
         - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
           * (CAST(sxt AS DOUBLE) / CAST(n_treat AS DOUBLE)
              - CAST(sxc AS DOUBLE) / CAST(n_control AS DOUBLE)))
        * 1000000) AS BIGINT) END AS adj_diff_e6,
      CASE WHEN n_control > 0 AND n_treat > 0 AND
        (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0 AND
        (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
      THEN CAST(FLOOR(
        (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        * 1000000) AS BIGINT) END AS var_reduction_micro
    FROM m
    """,
    doc="CUPED variance-reduction A/B readout (ops.stats."
    "cuped_adjustment, Deng et al. WSDM 2013): per-user purchase "
    "count adjusted by the per-user VIEW count covariate, variants "
    "split on user_id parity (the ab_test_conversion convention). "
    "theta = cov(x,y)/var(x) on pooled units, adjusted diff = raw "
    "diff - theta * covariate diff, variance cut = rho^2 - the reason "
    "every mature experimentation platform runs CUPED (same test "
    "detects a 1/(1-rho^2)x smaller effect). One unit-grain pass, one "
    "scalar reduce of exact BIGINT moments, flat double readouts.",
)
def cuped_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import cuped_adjustment

    ev = t(spark, sf_dir, "events")
    return cuped_adjustment(
        ev, "user_id",
        (F.col("user_id") % 2 == 1),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)),
    )


@register(
    "kendall_events_daily",
    oracle="""
    WITH g AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    p AS (
      SELECT a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb
      FROM g a JOIN g b ON a.d < b.d
    ),
    m AS (
      SELECT
        CAST(SUM(CASE WHEN (xa < xb AND ya < yb) OR (xa > xb AND ya > yb)
                 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
        CAST(SUM(CASE WHEN (xa < xb AND ya > yb) OR (xa > xb AND ya < yb)
                 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
        CAST(SUM(CASE WHEN xa = xb THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(SUM(CASE WHEN ya = yb THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        CAST(COUNT(*) AS BIGINT) AS n0
      FROM p
    ),
    c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM g)
    SELECT n, COALESCE(concordant, 0) AS concordant,
           COALESCE(discordant, 0) AS discordant,
           CASE WHEN (n0 - n1) > 0 AND (n0 - n2) > 0 THEN ROUND(
             CAST(concordant - discordant AS DOUBLE)
             / SQRT(CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n2 AS DOUBLE)), 6)
           END AS tau_b_r6
    FROM m CROSS JOIN c
    """,
    doc="Kendall's tau-b between daily event volume and daily active "
    "users (ops.stats.kendall_tau_b): pairwise concordance on the "
    "day grain - the ordinal-honest dependence measure completing "
    "the family (lineitem_corr linear, spearman_qty_price monotone "
    "ranks, this concordance with the clean tie story). Pair set is "
    "a broadcast nested-loop self-join over ~90 day-summary rows "
    "(never data rows, the mann_kendall contract); exact BIGINT "
    "C/D/tie counts, one flat double + single sqrt rounded @6. "
    "Expected strongly positive: busier days have more users.",
)
def kendall_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import kendall_tau_b

    ev = t(spark, sf_dir, "events")
    g = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").cast("long").alias("x"),
        F.countDistinct("user_id").cast("long").alias("y"),
    )
    return kendall_tau_b(g, "x", "y")


@register(
    "ordinal_assoc_weekday",
    oracle="""
    WITH g AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(isodow(CAST(ts AS DATE)) - 1 AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    p AS (
      SELECT a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb
      FROM g a JOIN g b ON a.d < b.d
    ),
    m AS (
      SELECT
        CAST(SUM(CASE WHEN (xa < xb AND ya < yb) OR (xa > xb AND ya > yb)
                 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
        CAST(SUM(CASE WHEN (xa < xb AND ya > yb) OR (xa > xb AND ya < yb)
                 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
        CAST(SUM(CASE WHEN xa = xb THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(SUM(CASE WHEN ya = yb THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        CAST(COUNT(*) AS BIGINT) AS n0
      FROM p
    ),
    c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM g)
    SELECT n, COALESCE(concordant, 0) AS concordant,
           COALESCE(discordant, 0) AS discordant,
           CASE WHEN (concordant + discordant) > 0 THEN
             ((concordant - discordant) * 1000000)
             // (concordant + discordant) END AS gamma_e6,
           CASE WHEN (n0 - n1) > 0 THEN
             ((concordant - discordant) * 1000000)
             // (n0 - n1) END AS somers_d_yx_e6,
           CASE WHEN (n0 - n2) > 0 THEN
             ((concordant - discordant) * 1000000)
             // (n0 - n2) END AS somers_d_xy_e6
    FROM m CROSS JOIN c
    """,
    doc="Goodman-Kruskal gamma and both Somers' D between weekday "
    "position (Monday=0, the pinned Spark weekday == DuckDB isodow-1 "
    "convention) and daily event volume "
    "(ops.stats.ordinal_association): does volume climb through the "
    "week, measured on the tie-handling spectrum - gamma scores only "
    "the pairs that order (x is 7-valued, so same-weekday tie pairs "
    "abound), D_yx charges x-ties against predicting volume from "
    "weekday, D_xy conditions the other way; kendall_events_daily's "
    "tau-b is their compromise and replays the SAME pair census "
    "(shared _concordance_counts). Day-grain pairs (never data "
    "rows); exact BIGINT counts, truncating micro divisions - zero "
    "floats anywhere.",
)
def ordinal_assoc_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import ordinal_association

    ev = t(spark, sf_dir, "events")
    g = ev.groupBy(
        F.to_date("ts").alias("d"),
        F.weekday(F.to_date("ts")).cast("long").alias("x"),
    ).agg(F.count("*").cast("long").alias("y"))
    return ordinal_association(g, "x", "y")


@register(
    "seasonal_naive_events",
    oracle="""
    WITH g AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS i,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT a.v, p.v AS pv
      FROM g a JOIN g p ON a.i = p.i + 7
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ABS(v - pv)) AS BIGINT) AS sae,
             CAST(SUM((v - pv) * (v - pv)) AS BIGINT) AS sse,
             CAST(SUM(CASE WHEN (v + pv) > 0 THEN
               2 * ABS(v - pv) * 1000000 // (v + pv)
               ELSE 0 END) AS BIGINT) AS ssm
      FROM s
    )
    SELECT n AS n_scored,
           CASE WHEN n > 0 THEN CAST(sae * 1000000 // n AS BIGINT)
           END AS mae_micro,
           CASE WHEN n > 0 THEN CAST(FLOOR(
             SQRT(CAST(sse AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000)
             AS BIGINT) END AS rmse_e6,
           CASE WHEN n > 0 THEN CAST(ssm // n AS BIGINT) END AS smape_micro
    FROM m
    """,
    doc="Seasonal-naive backtest of daily event volume, period 7 "
    "(ops.timeseries.seasonal_naive_eval): predict each day by the "
    "same weekday last week and score MAE/RMSE/sMAPE - the baseline "
    "every forecasting pipeline must publish next to its model "
    "(forecast_revenue says trend; this says how predictable the "
    "series even is, and rolling_origin_folds carves the windows it "
    "runs in). One grain-sized equi-join on day-index minus 7; exact "
    "BIGINT MAE/sMAPE micro terms with integer division, one sqrt "
    "for RMSE.",
)
def seasonal_naive_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.timeseries import seasonal_naive_eval

    ev = t(spark, sf_dir, "events")
    g = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("i")
    ).agg(F.count("*").cast("long").alias("v"))
    return seasonal_naive_eval(g, "i", "v", period=7)


@register(
    "cmh_segment_status",
    oracle="""
    WITH med AS (
      SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS q,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1
    ),
    cum AS (
      SELECT q, SUM(c) OVER (ORDER BY q) AS cumc, SUM(c) OVER () AS nt
      FROM med
    ),
    m AS (SELECT MIN(CASE WHEN 2 * cumc >= nt THEN q END) AS medq FROM cum),
    base AS (
      SELECT cu.c_mktsegment AS st,
             CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) > m.medq AS ex,
             o.o_orderstatus = 'F' AS oc
      FROM orders o JOIN customer cu ON o.o_custkey = cu.c_custkey
      CROSS JOIN m
      WHERE o.o_totalprice IS NOT NULL AND cu.c_mktsegment IS NOT NULL
    ),
    per AS (
      SELECT st,
        CAST(SUM(CASE WHEN ex AND oc THEN 1 ELSE 0 END) AS BIGINT) AS a,
        CAST(SUM(CASE WHEN ex AND NOT oc THEN 1 ELSE 0 END) AS BIGINT) AS b,
        CAST(SUM(CASE WHEN NOT ex AND oc THEN 1 ELSE 0 END) AS BIGINT) AS cx,
        CAST(SUM(CASE WHEN NOT ex AND NOT oc THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM base GROUP BY 1
    ),
    per2 AS (SELECT st, a, b, cx, d, a + b + cx + d AS nk FROM per),
    terms AS (
      SELECT nk, a,
        (a * d * 1000000) // nk AS tad,
        (b * cx * 1000000) // nk AS tbc,
        ((a + b) * (a + cx) * 1000000) // nk AS te,
        CASE WHEN nk > 1 THEN CAST(
          (CAST(a + b AS HUGEINT) * (cx + d) * (a + cx) * (b + d) * 1000000)
          // (CAST(nk AS HUGEINT) * nk * (nk - 1)) AS BIGINT)
        ELSE 0 END AS tv
      FROM per2 WHERE nk > 0
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
             CAST(SUM(nk) AS BIGINT) AS n,
             CAST(SUM(tad) AS BIGINT) AS sad,
             CAST(SUM(tbc) AS BIGINT) AS sbc,
             CAST(SUM(a) * 1000000 - SUM(te) AS BIGINT) AS num,
             CAST(SUM(tv) AS BIGINT) AS sv
      FROM terms
    )
    SELECT n_strata, n,
           CASE WHEN sbc > 0 THEN (sad * 1000000) // sbc END AS or_mh_e6,
           CASE WHEN sv > 0 THEN CAST(FLOOR(
             CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
             / CAST(sv AS DOUBLE)) AS BIGINT) END AS chi2_e6
    FROM s
    """,
    doc="Mantel-Haenszel pooled odds ratio + CMH chi-square for "
    "above-median order value -> fulfilled status, stratified by "
    "market segment (ops.stats.mantel_haenszel) - the ESTIMATION "
    "half of the Simpson story on the IDENTICAL variables as "
    "simpson_segment_status: that gate flags strata whose "
    "association flips against the pooled table; this reports what "
    "to quote instead, the confounder-adjusted common OR (b*c/n "
    "weights keep sparse segments from dominating) and its 1-df "
    "test. Per-stratum fractional terms floor-micro quantized "
    "BEFORE summing (documented <=1e-6/stratum, the quantized-"
    "moments discipline - determinism over hidden float "
    "accumulation); V's n^4-scale numerator rides DECIMAL(38,0)/"
    "HUGEINT; one double multiply+divide for chi2, one truncating "
    "division for the OR. One stratum-grain pass + scalar reduce.",
)
def cmh_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.sort import global_running_sum
    from hadoop_fcfs_spark.ops.stats import mantel_haenszel

    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    q = F.floor(F.col("o_totalprice") * 100).cast("long")
    grain = (
        orders.filter(F.col("o_totalprice").isNotNull())
        .groupBy(q.alias("__q"))
        .agg(F.count("*").cast("long").alias("__c"))
    )
    cum = global_running_sum(grain, ["__q"], "__c", out_col="__cum")
    tot = grain.agg(F.sum("__c").alias("__n"))
    med = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.min(
                F.when(2 * F.col("__cum") >= F.col("__n"), F.col("__q"))
            ).alias("__medq")
        )
    )
    joined = (
        orders.filter(
            F.col("o_totalprice").isNotNull()
        )
        .join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders["o_custkey"] == cust["c_custkey"],
        )
        .filter(F.col("c_mktsegment").isNotNull())
        .crossJoin(F.broadcast(med))
    )
    return mantel_haenszel(
        joined, "c_mktsegment",
        q > F.col("__medq"),
        F.col("o_orderstatus") == "F",
    )


@register(
    "simpson_segment_status",
    oracle="""
    WITH med AS (
      SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS q,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1
    ),
    cum AS (
      SELECT q, SUM(c) OVER (ORDER BY q) AS cumc, SUM(c) OVER () AS nt
      FROM med
    ),
    m AS (SELECT MIN(CASE WHEN 2 * cumc >= nt THEN q END) AS medq FROM cum),
    base AS (
      SELECT c.c_mktsegment AS stratum,
             CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) > m.medq AS e,
             o.o_orderstatus = 'F' AS oc
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      CROSS JOIN m
      WHERE o.o_totalprice IS NOT NULL AND c.c_mktsegment IS NOT NULL
    ),
    per AS (
      SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS exposed,
             CAST(SUM(CASE WHEN e AND oc THEN 1 ELSE 0 END) AS BIGINT)
               AS exposed_pos,
             CAST(SUM(CASE WHEN NOT e THEN 1 ELSE 0 END) AS BIGINT)
               AS unexposed,
             CAST(SUM(CASE WHEN NOT e AND oc THEN 1 ELSE 0 END) AS BIGINT)
               AS unexposed_pos
      FROM base GROUP BY 1
    ),
    pooled AS (
      SELECT CAST(SIGN(SUM(exposed_pos) * SUM(unexposed)
                       - SUM(unexposed_pos) * SUM(exposed)) AS BIGINT)
               AS pooled_sign
      FROM per
    )
    SELECT stratum, n, exposed, exposed_pos, unexposed, unexposed_pos,
           CAST(SIGN(exposed_pos * unexposed - unexposed_pos * exposed)
             AS BIGINT) AS d_sign,
           pooled_sign,
           CAST(SIGN(exposed_pos * unexposed - unexposed_pos * exposed)
             AS BIGINT) * pooled_sign = -1 AS reversed
    FROM per CROSS JOIN pooled
    """,
    doc="Simpson's-paradox audit per market segment "
    "(ops.stats.simpson_reversal): exposure = order total above the "
    "GLOBAL exact median (lower-crossing on the cent grain, broadcast "
    "scalar), outcome = FINISHED status - does the above-median -> "
    "finished association flip sign inside any segment vs the pooled "
    "table, the aggregation-bias check a dashboard rate comparison "
    "needs before anyone acts on it. ENTIRELY exact integers: signs "
    "via cross-multiplied count products, not even a final float. "
    "Broadcast customer dim; one stratum-count pass.",
)
def simpson_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import simpson_reversal

    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    q = F.floor(F.col("o_totalprice") * 100).cast("long")
    grain = (
        orders.filter(F.col("o_totalprice").isNotNull())
        .groupBy(q.alias("__q"))
        .agg(F.count("*").cast("long").alias("__c"))
    )
    from hadoop_fcfs_spark.ops.sort import global_running_sum

    cum = global_running_sum(grain, ["__q"], "__c", out_col="__cum")
    tot = grain.agg(F.sum("__c").alias("__n"))
    med = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.min(
                F.when(2 * F.col("__cum") >= F.col("__n"), F.col("__q"))
            ).alias("__medq")
        )
    )
    joined = (
        orders.filter(F.col("o_totalprice").isNotNull())
        .join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders["o_custkey"] == cust["c_custkey"],
        )
        .crossJoin(F.broadcast(med))
    )
    return simpson_reversal(
        joined, "c_mktsegment",
        q > F.col("__medq"),
        F.col("o_orderstatus") == "F",
    )


@register(
    "pr_curve_orderstatus",
    oracle="""
    WITH g AS (
      SELECT o_totalprice AS v,
             SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS ca,
             COUNT(*) AS c
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL
      GROUP BY 1
    ),
    r AS (
      SELECT v, ca, c,
             COALESCE(SUM(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef,
             COALESCE(SUM(ca) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cabef,
             SUM(c) OVER () AS n, SUM(ca) OVER () AS p
      FROM g
    ),
    thr AS (
      SELECT (n - bef) AS kept, (p - cabef) AS tp, p,
             (p - cabef) * 1000000 // (n - bef) AS prec
      FROM r
    ),
    ck AS (SELECT UNNEST(generate_series(0, 10)) AS rp)
    SELECT CAST(rp AS BIGINT) AS recall_pt,
           CAST(MAX(CASE WHEN p > 0 THEN prec END) AS BIGINT)
             AS prec_interp_micro
    FROM ck JOIN thr ON tp * 10 >= rp * p
    GROUP BY 1
    """,
    doc="11-point interpolated precision-recall curve "
    "(ops.stats.pr_curve_interp): does order total discriminate "
    "FINISHED orders when judged the PR way - the imbalance-honest "
    "companion to roc_auc_orderstatus (same score, same label, same "
    "distinct-score grain and exclusive global_running_sum prefix; "
    "ROC asks how rarely a negative outscores a positive, PR asks "
    "what fraction of everything above the cut is actually positive "
    "at each recall depth - THE question for a selection/filtering "
    "stage). Exact: precision floor-quantizes to micros BEFORE the "
    "max and flooring is monotone, so max(floor) = floor(max); the "
    "recall qualifier cross-multiplies (tp*10 >= r*P). Zero float "
    "comparisons anywhere; 11 rows out.",
)
def pr_curve_orderstatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import pr_curve_interp

    return pr_curve_interp(
        t(spark, sf_dir, "orders"), "o_totalprice",
        F.col("o_orderstatus") == "F", points=10,
    )


@register(
    "aalen_johansen_cif",
    oracle="""
    WITH u AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS f, MAX(CAST(ts AS DATE)) AS l,
             MIN(CASE WHEN event_type = 'purchase' AND value > 150
                      THEN CAST(ts AS DATE) END) AS ca,
             MIN(CASE WHEN event_type = 'error'
                      THEN CAST(ts AS DATE) END) AS cb
      FROM events GROUP BY 1
    ),
    d AS (
      SELECT CASE
               WHEN ca IS NOT NULL AND (cb IS NULL OR ca <= cb)
                 THEN DATEDIFF('day', f, ca)
               WHEN cb IS NOT NULL THEN DATEDIFF('day', f, cb)
               ELSE DATEDIFF('day', f, l) END AS t,
             CASE
               WHEN ca IS NOT NULL AND (cb IS NULL OR ca <= cb) THEN 'conv'
               WHEN cb IS NOT NULL THEN 'err' END AS cause
      FROM u
    ),
    g AS (
      SELECT t,
             SUM(CASE WHEN cause = 'conv' THEN 1 ELSE 0 END) AS d1,
             SUM(CASE WHEN cause = 'err' THEN 1 ELSE 0 END) AS d2,
             COUNT(*) AS a
      FROM d GROUP BY 1
    ),
    tot AS (SELECT SUM(a) AS n FROM g),
    r1 AS (
      SELECT t, d1, d2, a,
             n - COALESCE(SUM(a) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM g CROSS JOIN tot
    ),
    r2 AS (
      SELECT t, d1, d2, n_risk,
             exp(COALESCE(SUM(CASE WHEN d1 + d2 < n_risk
                   THEN ln(1 - (d1 + d2) / n_risk)
                   ELSE CAST('-inf' AS DOUBLE) END) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
               AS sprev
      FROM r1
    ),
    r3 AS (
      SELECT t, d1, d2, n_risk,
             SUM(sprev * d1 / n_risk) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
             SUM(sprev * d2 / n_risk) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
      FROM r2
    )
    SELECT CAST(t AS BIGINT) AS t, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d1 AS BIGINT) AS d_conv,
           CAST(ROUND(c1 * 1000000) AS BIGINT) AS cif_conv_e6,
           CAST(d2 AS BIGINT) AS d_err,
           CAST(ROUND(c2 * 1000000) AS BIGINT) AS cif_err_e6
    FROM r3 WHERE d1 + d2 > 0
    """,
    doc="Aalen-Johansen cumulative incidence under competing risks "
    "(ops.stats.aalen_johansen): from each user's first event, does "
    "a high-value conversion (purchase > 150) or an error come FIRST "
    "- the two-exit refinement of kaplan_meier_retention (1-KM per "
    "cause treats the competing exit as censoring and OVERSTATES "
    "both incidences; AJ's CIFs + overall survival partition to 1). "
    "Ties conv-first (documented priority); never-exiting users "
    "censor at their last observed day. Same duration-grain shape as "
    "the KM gate: one user-grain aggregation, exclusive-prefix risk "
    "set, S(t-) = exp of the STRICT-prefix ln sum with the -inf "
    "exhausted-risk guard, CIF = ordered prefix sum of "
    "S(t-)*d_k/n (sequential windowed sum, engine-order identical), "
    "ROUND-micro per the KM one-ulp lesson.",
)
def aalen_johansen_cif(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import aalen_johansen

    ev = t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("__f"),
        F.max(F.to_date("ts")).alias("__l"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150),
                F.to_date("ts"),
            )
        ).alias("__ca"),
        F.min(
            F.when(F.col("event_type") == "error", F.to_date("ts"))
        ).alias("__cb"),
    )
    conv_first = F.col("__ca").isNotNull() & (
        F.col("__cb").isNull() | (F.col("__ca") <= F.col("__cb"))
    )
    durations = u.select(
        F.when(conv_first, F.datediff("__ca", "__f"))
        .when(F.col("__cb").isNotNull(), F.datediff("__cb", "__f"))
        .otherwise(F.datediff("__l", "__f")).alias("dur"),
        F.when(conv_first, F.lit("conv"))
        .when(F.col("__cb").isNotNull(), F.lit("err")).alias("cause"),
    )
    return aalen_johansen(durations, "dur", "cause", causes=["conv", "err"])


@register(
    "p_chart_daily_returns",
    oracle="""
    WITH g AS (
      SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS grain,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS x
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS tn, SUM(x) AS tx FROM g)
    SELECT grain, n, x,
           x * 1000000 // n AS rate_e6,
           CAST(FLOOR(1000000 * ((CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE))
             + 3.0 * sqrt((CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE))
               * (1.0 - CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE))
               / CAST(n AS DOUBLE)))) AS BIGINT) AS ucl_e6,
           CAST(FLOOR(1000000 * GREATEST(0.0,
             (CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE))
             - 3.0 * sqrt((CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE))
               * (1.0 - CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE))
               / CAST(n AS DOUBLE)))) AS BIGINT) AS lcl_e6,
           (CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
              > (CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE))
                + 3.0 * sqrt((CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE))
                  * (1.0 - CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE))
                  / CAST(n AS DOUBLE)))
           OR (CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
              < GREATEST(0.0, (CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE))
                - 3.0 * sqrt((CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE))
                  * (1.0 - CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE))
                  / CAST(n AS DOUBLE)))) AS out_of_control
    FROM g CROSS JOIN tot
    """,
    doc="Shewhart p-chart on the daily line-return rate "
    "(ops.stats.p_chart): per ship-day defect fraction (returnflag = "
    "'R') against pooled-rate 3-sigma binomial control limits with "
    "per-day widths (variable-n textbook form) - the SPC monitor a "
    "publish loop runs per batch (out-of-limits = special cause for "
    "a human; inside = common-cause noise the changepoint tier would "
    "overfit). Counts and rate_e6 exact BIGINT; limits are doubles "
    "built from single-rounded IEEE ops on exact integers (divide / "
    "subtract / multiply / sqrt - the wilson-bounds precedent), "
    "floor-quantized; the flag compares the exact rate against the "
    "float limits identically on both engines. Day-grain output.",
)
def p_chart_daily_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import p_chart

    li = t(spark, sf_dir, "lineitem")
    return p_chart(
        li,
        F.to_date("l_shipdate").cast("string"),
        F.col("l_returnflag") == "R",
        group_alias="grain",
        sigmas=3.0,
    )


@register(
    "cusum_chart_daily_returns",
    oracle="""
    WITH g AS (
      SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS grain,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS x
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS tn, SUM(x) AS tx FROM g),
    s AS (
      SELECT grain, n, x,
             x * 1000000 - n * ((tx * 1000000 // tn) + 5000) AS sup,
             n * ((tx * 1000000 // tn) - 5000) - x * 1000000 AS sdn
      FROM g CROSS JOIN tot
    ),
    ps AS (
      SELECT grain, n, x,
             SUM(sup) OVER (ORDER BY grain
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS su,
             SUM(sdn) OVER (ORDER BY grain
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sd
      FROM s
    ),
    pm AS (
      SELECT grain, n, x, su, sd,
             MIN(su) OVER (ORDER BY grain
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mu,
             MIN(sd) OVER (ORDER BY grain
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS md
      FROM ps
    )
    SELECT grain, n, x,
           CAST(su - LEAST(0, mu) AS BIGINT) AS cusum_up_e6,
           CAST(sd - LEAST(0, md) AS BIGINT) AS cusum_dn_e6,
           su - LEAST(0, mu) > 5000000 AS alarm_up,
           sd - LEAST(0, md) > 5000000 AS alarm_dn
    FROM pm
    """,
    doc="Two-sided binomial CUSUM over the daily return-rate series "
    "(ops.stats.cusum_chart), slack 0.5 percent, decision interval "
    "5e6 micro-defects - the sequential-drift twin of "
    "p_chart_daily_returns (Shewhart flags one big excursion; CUSUM "
    "accumulates a sustained small shift). The max(0, C+s) recursion "
    "is computed via its exact closed form C_t = S_t - min(0, min "
    "prefix S) - two range-partitioned prefix passes "
    "(global_running_sum + global_running_max on the negated sum), "
    "never a sequential loop or unpartitioned window; all slack "
    "arithmetic exact BIGINT micro-counts off the flooring pooled "
    "rate. The oracle's windows are the oracle's privilege.",
)
def cusum_chart_daily_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import cusum_chart

    li = t(spark, sf_dir, "lineitem")
    return cusum_chart(
        li,
        F.to_date("l_shipdate").cast("string"),
        F.col("l_returnflag") == "R",
        group_alias="grain",
        slack_e6=5000,
        h_e6=5_000_000,
    )


@register(
    "ewma_chart_daily_returns",
    oracle="""
    WITH g AS (
      SELECT DATEDIFF('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
               AS nd,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS x
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS tn, SUM(x) AS tx FROM g),
    r AS (
      SELECT nd, n, x,
             x * 1000000 // n AS rate,
             tx * 1000000 // tn AS pbar
      FROM g CROSS JOIN tot
    ),
    band AS (
      SELECT a.nd, a.n, a.x, a.rate, a.pbar,
             SUM(b.rate * CAST(power(2, 19 - (a.nd - b.nd)) AS BIGINT))
               AS wsum,
             SUM(CAST(power(2, 19 - (a.nd - b.nd)) AS BIGINT)) AS wtot
      FROM r a JOIN r b ON b.nd <= a.nd AND b.nd > a.nd - 20
      GROUP BY 1, 2, 3, 4, 5
    )
    SELECT
      CAST(CAST(DATE '1970-01-01' + INTERVAL (nd) DAY AS DATE) AS VARCHAR)
        AS grain,
      n, x, rate AS rate_e6,
      CAST((wsum + (1048576 - wtot) * pbar) // 1048576 AS BIGINT)
        AS ewma_e6,
      (wsum + (1048576 - wtot) * pbar) // 1048576 > pbar + 100000
        AS alarm_up,
      (wsum + (1048576 - wtot) * pbar) // 1048576 < pbar - 100000
        AS alarm_dn
    FROM band
    """,
    doc="EWMA control chart over the daily return-rate series "
    "(ops.stats.ewma_chart, lambda = 1/2, 20-day calendar kernel, "
    "decision band 0.1 micro-rate) - the slow-drift leg completing "
    "the SPC trio on this grain: p_chart_daily_returns flags one big "
    "excursion, cusum_chart_daily_returns a sustained shift, EWMA a "
    "slow drift the other two smear out. The Z_t = lambda x_t + "
    "(1-lambda) Z_{t-1} recursion runs as its closed form - a "
    "20-step dyadic kernel over the day grain via the EQUI chunked "
    "band self-join (never a sequential loop or per-grid quadratic), "
    "truncated-tail + gap-day mass assigned to the pooled center so "
    "silent days shrink history toward p-bar; daily rates floor to "
    "micro-units and the weights are the integers 2^(19-k), so every "
    "cell is exact BIGINT arithmetic - no float anywhere.",
)
def ewma_chart_daily_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import ewma_chart

    li = t(spark, sf_dir, "lineitem")
    out = ewma_chart(
        li,
        F.datediff(F.to_date("l_shipdate"), F.lit("1970-01-01").cast("date")),
        F.col("l_returnflag") == "R",
        idx_alias="__nd",
        window=20,
        h_e6=100_000,
    )
    return out.select(
        F.date_add(F.lit("1970-01-01").cast("date"), F.col("__nd").cast("int"))
        .cast("string")
        .alias("grain"),
        "n", "x", "rate_e6", "ewma_e6", "alarm_up", "alarm_dn",
    )


@register(
    "run_rules_daily_returns",
    oracle="""
    WITH g AS (
      SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS grain,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS x
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS tn, SUM(x) AS tx FROM g),
    s AS (
      SELECT grain, n, x,
             x * 1000000 // n AS rate_e6,
             CASE WHEN x * 1000000 // n > tx * 1000000 // tn THEN 1
                  WHEN x * 1000000 // n < tx * 1000000 // tn THEN -1
                  ELSE 0 END AS side
      FROM g CROSS JOIN tot
    ),
    isl AS (
      SELECT grain, n, x, rate_e6, side,
             ROW_NUMBER() OVER (ORDER BY grain)
               - ROW_NUMBER() OVER (PARTITION BY side ORDER BY grain)
               AS island
      FROM s
    )
    SELECT grain, n, x, rate_e6, CAST(side AS INT) AS side,
           CAST(COUNT(*) OVER (PARTITION BY side, island) AS BIGINT)
             AS run_len,
           side <> 0
             AND COUNT(*) OVER (PARTITION BY side, island) >= 9 AS rule2
    FROM isl
    """,
    doc="Western Electric run rule 2 (9 consecutive points one side of "
    "center) over the daily return-rate series (ops.stats.run_rules) "
    "- the pattern leg completing the SPC suite on this grain: "
    "p_chart one 3-sigma excursion, CUSUM sustained shift, EWMA slow "
    "drift, the run rule the 'moved but never far enough to alarm' "
    "signature. Gaps-and-islands: ONE range prefix for the global row "
    "number, per-side row numbers and island counts as GRAIN-bounded "
    "windows (days, never events); center and rates are exact "
    "flooring BIGINT micro-rates, so side assignment is "
    "engine-exact.",
)
def run_rules_daily_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import run_rules

    li = t(spark, sf_dir, "lineitem")
    return run_rules(
        li,
        F.to_date("l_shipdate").cast("string"),
        F.col("l_returnflag") == "R",
        group_alias="grain",
        min_run=9,
    )


@register(
    "nelson_rules_daily_returns",
    oracle="""
    WITH g AS (
      SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS grain,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS x
      FROM lineitem GROUP BY 1
    ),
    r AS (SELECT grain, n, x, x * 1000000 // n AS rate_e6 FROM g),
    d AS (
      SELECT *,
             CASE WHEN lag(rate_e6) OVER (ORDER BY grain) IS NULL THEN NULL
                  WHEN rate_e6 > lag(rate_e6) OVER (ORDER BY grain) THEN 1
                  WHEN rate_e6 < lag(rate_e6) OVER (ORDER BY grain) THEN -1
                  ELSE 0 END AS dir
      FROM r
    ),
    p AS (SELECT *, lag(dir) OVER (ORDER BY grain) AS pd FROM d),
    b AS (
      SELECT *,
        CASE WHEN dir IS NULL OR dir = 0 THEN 1
             WHEN pd IS NULL OR pd = 0 OR dir <> pd THEN 1
             ELSE 0 END AS bt,
        CASE WHEN dir IS NULL OR dir = 0 THEN 1
             WHEN pd IS NULL OR pd = 0 OR pd <> -dir THEN 1
             ELSE 0 END AS ba
      FROM p
    ),
    i AS (
      SELECT *, SUM(bt) OVER w AS ti, SUM(ba) OVER w AS ai
      FROM b WINDOW w AS (ORDER BY grain
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    lens AS (
      SELECT grain, n, x, rate_e6, dir,
        CASE WHEN dir IS NOT NULL AND dir <> 0
             THEN ROW_NUMBER() OVER (PARTITION BY ti ORDER BY grain)
             ELSE 0 END AS trend_len,
        CASE WHEN dir IS NOT NULL AND dir <> 0
             THEN ROW_NUMBER() OVER (PARTITION BY ai ORDER BY grain)
             ELSE 0 END AS alt_len
      FROM i
    )
    SELECT grain, n, x, rate_e6, CAST(dir AS INT) AS direction,
           CAST(trend_len AS BIGINT) AS trend_len,
           trend_len >= 5 AS rule3,
           CAST(alt_len AS BIGINT) AS alt_len,
           alt_len >= 13 AS rule4
    FROM lens
    """,
    doc="Nelson rules 3 and 4 over the daily return-rate series "
    "(ops.stats.nelson_rules) - the difference-pattern legs "
    "completing the SPC suite on this grain: rule 3 flags 6 points "
    "continually increasing/decreasing (a steady trend the "
    "center-line tests smear out), rule 4 flags 14 points "
    "alternating up/down (the two-stream / overcorrection "
    "signature). Direction = sign of the micro-rate delta (exact "
    "BIGINT; equal rates break both patterns), runs are "
    "gaps-and-islands on the DIFF stream, each rule fires at every "
    "point completing a qualifying run - a pure prefix property. "
    "Grain-bounded summary windows only (calendar days, never "
    "events; the kaplan_meier precedent).",
)
def nelson_rules_daily_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import nelson_rules

    li = t(spark, sf_dir, "lineitem")
    return nelson_rules(
        li,
        F.to_date("l_shipdate").cast("string"),
        F.col("l_returnflag") == "R",
        group_alias="grain",
        min_trend=6,
        min_alt=14,
    )


@register(
    "zone_rules_daily_returns",
    oracle="""
    WITH g AS (
      SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS grain,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS x
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS tn, SUM(x) AS tx FROM g),
    z AS (
      SELECT grain, n, x, x * 1000000 // n AS rate_e6,
        CASE WHEN CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
                  > CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE)
                    + 2.0 * sqrt(CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE)
                      * (1.0 - CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE))
                      / CAST(n AS DOUBLE)) THEN 1
             WHEN CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
                  < CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE)
                    - 2.0 * sqrt(CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE)
                      * (1.0 - CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE))
                      / CAST(n AS DOUBLE)) THEN -1
             ELSE 0 END AS beyond2,
        CASE WHEN CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
                  > CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE)
                    + sqrt(CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE)
                      * (1.0 - CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE))
                      / CAST(n AS DOUBLE)) THEN 1
             WHEN CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
                  < CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE)
                    - sqrt(CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE)
                      * (1.0 - CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE))
                      / CAST(n AS DOUBLE)) THEN -1
             ELSE 0 END AS beyond1
      FROM g CROSS JOIN tot
    )
    SELECT grain, n, x, rate_e6, beyond1, beyond2,
      beyond1 = 0 AS within1,
      SUM(CASE WHEN beyond2 = 1 THEN 1 ELSE 0 END) OVER w3 >= 2
        OR SUM(CASE WHEN beyond2 = -1 THEN 1 ELSE 0 END) OVER w3 >= 2
        AS rule5,
      SUM(CASE WHEN beyond1 = 1 THEN 1 ELSE 0 END) OVER w5 >= 4
        OR SUM(CASE WHEN beyond1 = -1 THEN 1 ELSE 0 END) OVER w5 >= 4
        AS rule6,
      ROW_NUMBER() OVER (ORDER BY grain) >= 15
        AND SUM(CASE WHEN beyond1 = 0 THEN 1 ELSE 0 END) OVER w15 = 15
        AS rule7,
      ROW_NUMBER() OVER (ORDER BY grain) >= 8
        AND SUM(CASE WHEN beyond1 = 0 THEN 0 ELSE 1 END) OVER w8 = 8
        AS rule8
    FROM z
    WINDOW
      w3 AS (ORDER BY grain ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
      w5 AS (ORDER BY grain ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
      w8 AS (ORDER BY grain ROWS BETWEEN 7 PRECEDING AND CURRENT ROW),
      w15 AS (ORDER BY grain ROWS BETWEEN 14 PRECEDING AND CURRENT ROW)
    """,
    doc="Nelson rules 5-8 (the Western Electric zone tests) over the "
    "daily return-rate series (ops.stats.zone_rules) - COMPLETING the "
    "Nelson 1-8 battery on this grain (p_chart = rule 1, run_rules = "
    "rule 2, nelson_rules = rules 3/4): rule 5 = 2 of 3 beyond "
    "2-sigma same side, rule 6 = 4 of 5 beyond 1-sigma same side, "
    "rule 7 = 15 within 1-sigma (stratification / gamed metric), "
    "rule 8 = 8 with none within (bimodality). Per-cell zone widths "
    "from the variable-n attribute-chart form; zone flags compare "
    "exact integer counts against single-rounded IEEE floats (the "
    "p_chart/wilson discipline); rolling 3/5/8/15-row windows over "
    "the calendar-bounded day grain only.",
)
def zone_rules_daily_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import zone_rules

    li = t(spark, sf_dir, "lineitem")
    return zone_rules(
        li,
        F.to_date("l_shipdate").cast("string"),
        F.col("l_returnflag") == "R",
        group_alias="grain",
    )


@register(
    "durbin_watson_daily_returns",
    oracle="""
    WITH g AS (
      SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS grain,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS x
      FROM lineitem GROUP BY 1
    ),
    r AS (SELECT grain, x * 1000000 // n AS rate FROM g),
    d AS (
      SELECT rate, lag(rate) OVER (ORDER BY grain) AS pr FROM r
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(rate) AS s1,
             SUM(CAST(rate AS HUGEINT) * rate) AS s2,
             SUM(CASE WHEN pr IS NOT NULL
                 THEN CAST(rate - pr AS HUGEINT) * (rate - pr)
                 ELSE 0 END) AS num
      FROM d
    )
    SELECT k AS n_points,
           CASE WHEN k > 1 AND (k * s2 - CAST(s1 AS HUGEINT) * s1) > 0 THEN
             CAST((k * num * 1000000)
                  // (k * s2 - CAST(s1 AS HUGEINT) * s1) AS BIGINT)
           END AS dw_e6
    FROM m
    """,
    doc="Durbin-Watson statistic over the daily return-rate series "
    "(ops.stats.durbin_watson) - the serial-correlation companion to "
    "the Nelson battery: the run/zone rules FLAG autocorrelation "
    "patterns, DW quantifies lag-1 dependence (2 = independent, -> 0 "
    "positive/drifting, -> 4 negative/overcorrecting). Numerator sums "
    "squared integer micro-rate deltas, denominator clears the mean "
    "via k*Sum(r^2) - (Sum r)^2, one flooring DECIMAL division - "
    "exact BIGINT throughout, no float; one grain aggregation + one "
    "calendar-bounded lag + a scalar reduce.",
)
def durbin_watson_daily_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import durbin_watson

    li = t(spark, sf_dir, "lineitem")
    return durbin_watson(
        li,
        F.to_date("l_shipdate").cast("string"),
        F.col("l_returnflag") == "R",
        group_alias="grain",
    )


@register(
    "brunner_munzel_price",
    oracle="""
    WITH g AS (
      SELECT o_totalprice AS v,
             CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1
               ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1
               ELSE 0 END) AS BIGINT) AS cb
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        AND o_totalprice IS NOT NULL
      GROUP BY 1
    ),
    r AS (
      SELECT ca, cb, ca + cb AS c,
             COALESCE(SUM(ca + cb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef,
             COALESCE(SUM(ca) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS befa
      FROM g
    ),
    tmom AS (
      SELECT SUM(ca) AS na, SUM(cb) AS nb,
             SUM(ca * (2 * bef + c + 1)) AS r2a,
             SUM(cb * (2 * bef + c + 1)) AS r2b
      FROM r
    ),
    q AS (
      SELECT na, nb, r2a, r2b,
        SUM(ca * (CAST(na AS HUGEINT) * (2 * bef + c - 2 * befa - ca)
                  - r2a + CAST(na AS HUGEINT) * (na + 1))
               * (CAST(na AS HUGEINT) * (2 * bef + c - 2 * befa - ca)
                  - r2a + CAST(na AS HUGEINT) * (na + 1))) AS qa,
        SUM(cb * (CAST(nb AS HUGEINT)
                    * (2 * bef + c - 2 * (bef - befa) - cb)
                  - r2b + CAST(nb AS HUGEINT) * (nb + 1))
               * (CAST(nb AS HUGEINT)
                    * (2 * bef + c - 2 * (bef - befa) - cb)
                  - r2b + CAST(nb AS HUGEINT) * (nb + 1))) AS qb
      FROM r CROSS JOIN tmom
      GROUP BY 1, 2, 3, 4
    ),
    s AS (
      SELECT na, nb, r2a, r2b, qa, qb,
        CAST(qa AS DOUBLE)
          / (CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0)) AS ta,
        CAST(qb AS DOUBLE)
          / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0)) AS tb
      FROM q
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
      CASE WHEN na > 0 AND nb > 0 THEN
        CAST((CAST(r2b AS HUGEINT) - CAST(nb AS HUGEINT) * (nb + 1))
             * 1000000 // (2 * CAST(na AS HUGEINT) * nb) AS BIGINT)
      END AS phat_e6,
      CASE WHEN na > 1 AND nb > 1 AND qa + qb > 0 THEN
        CAST(FLOOR((CAST(na AS DOUBLE) * CAST(r2b AS DOUBLE)
                    - CAST(nb AS DOUBLE) * CAST(r2a AS DOUBLE))
             / (CAST(na + nb AS DOUBLE) * sqrt(ta + tb))
             * 1000000) AS BIGINT)
      END AS w_e6,
      CASE WHEN na > 1 AND nb > 1 AND qa + qb > 0 THEN
        CAST(FLOOR((ta + tb) * (ta + tb)
             / (ta * ta / (CAST(na AS DOUBLE) - 1.0)
                + tb * tb / (CAST(nb AS DOUBLE) - 1.0))
             * 1000) AS BIGINT)
      END AS df_e3
    FROM s
    """,
    doc="Brunner-Munzel test: do URGENT orders carry stochastically "
    "larger totals than LOW-priority ones WITHOUT mwu_priority_price's "
    "equal-shape assumption (ops.stats.brunner_munzel) - the "
    "rank-world Welch: studentized P(A<B)+P(A=B)/2 estimate with "
    "Welch-Satterthwaite df, the textbook replacement when the arms "
    "differ in spread. Same value-grain substrate as MWU (one "
    "two-column exclusive prefix via global_running_sum), all rank "
    "moments exact 2x-scaled BIGINT/DECIMAL sums (ties collapse per "
    "value), statistic and df one flat float expression floored to "
    "micros/millis.",
)
def brunner_munzel_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import brunner_munzel

    return brunner_munzel(
        t(spark, sf_dir, "orders"), "o_totalprice", "o_orderpriority",
        "1-URGENT", "5-LOW",
    )


@register(
    "youden_j_orderstatus",
    oracle="""
    WITH g AS (
      SELECT o_totalprice AS v,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
               AS BIGINT) AS ca,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL
      GROUP BY 1
    ),
    r AS (
      SELECT v, ca, c,
             COALESCE(SUM(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef,
             COALESCE(SUM(ca) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cabef
      FROM g
    ),
    tot AS (SELECT SUM(c) AS n, SUM(ca) AS p FROM g),
    j AS (
      SELECT v, n, p,
             CASE WHEN p > 0 AND n > p THEN
               (p - cabef) * 1000000 // p
               - ((n - p) - (bef - cabef)) * 1000000 // (n - p)
             END AS jv
      FROM r CROSS JOIN tot
    ),
    best AS (SELECT MAX(jv) AS mj FROM j)
    SELECT CAST(COALESCE(MAX(n), 0) AS BIGINT) AS n,
           CAST(COALESCE(MAX(p), 0) AS BIGINT) AS n_pos,
           CAST(MAX(mj) AS BIGINT) AS j_e6,
           MIN(CASE WHEN jv = mj THEN v END) AS threshold
    FROM j CROSS JOIN best
    """,
    doc="Youden's J and its optimal cutpoint over the order-total / "
    "FINISHED-status score (ops.stats.youden_j): max over thresholds "
    "of TPR - FPR, the threshold-PICKER companion to "
    "roc_auc_orderstatus (AUC says whether the score discriminates, J "
    "says where to cut it; ties break to the smallest threshold). "
    "Same substrate as pr_auc: distinct-score grain + ONE two-column "
    "exclusive prefix; TPR/FPR floor to micros independently so J is "
    "an exact integer per threshold and the max is order-free; the "
    "scalar max rejoins as a broadcast 1-row cross, never a shuffled "
    "self-join.",
)
def youden_j_orderstatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import youden_j

    orders = t(spark, sf_dir, "orders")
    return youden_j(orders, "o_totalprice", F.col("o_orderstatus") == "F")


@register(
    "pr_auc_orderstatus",
    oracle="""
    WITH g AS (
      SELECT o_totalprice AS v,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
               AS BIGINT) AS ca,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL
      GROUP BY 1
    ),
    r AS (
      SELECT ca, c,
             COALESCE(SUM(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef,
             COALESCE(SUM(ca) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cabef
      FROM g
    ),
    tot AS (SELECT SUM(c) AS n, SUM(ca) AS p FROM g),
    terms AS (
      SELECT n, p,
             CASE WHEN ca > 0 AND p > 0 THEN
               (p - cabef) * ca * 1000000 // ((n - bef) * p)
             ELSE 0 END AS term
      FROM r CROSS JOIN tot
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n, CAST(MAX(p) AS BIGINT) AS n_pos,
           CASE WHEN MAX(p) > 0 THEN CAST(SUM(term) AS BIGINT) END AS ap_e6
    FROM terms
    """,
    doc="Average-precision scalar / step-function PR-AUC "
    "(ops.stats.pr_auc): does order total discriminate FINISHED "
    "orders, summarized on the precision-recall axis where ROC-AUC "
    "flatters rare positives - the one-number companion to "
    "pr_curve_orderstatus exactly as roc_auc is to the calibration "
    "tier. Same substrate: distinct-score grain + ONE two-column "
    "exclusive global_running_sum prefix; each threshold's term "
    "tp*d_pos*1e6 div (kept*P) floor-quantizes to micros "
    "INDEPENDENTLY (DECIMAL(38,0) products - per-term flooring "
    "because kept varies per row, unlike the 11-point curve's fixed "
    "checkpoints) and the terms sum as BIGINTs - accumulation order "
    "cannot matter on either engine.",
)
def pr_auc_orderstatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import pr_auc

    return pr_auc(
        t(spark, sf_dir, "orders"), "o_totalprice",
        F.col("o_orderstatus") == "F",
    )


@register(
    "gray_test_cohorts",
    oracle="""
    WITH u AS (
      SELECT user_id, user_id % 2 AS coh,
             MIN(CAST(ts AS DATE)) AS f, MAX(CAST(ts AS DATE)) AS l,
             MIN(CASE WHEN event_type = 'purchase' AND value > 150
                      THEN CAST(ts AS DATE) END) AS ca,
             MIN(CASE WHEN event_type = 'error'
                      THEN CAST(ts AS DATE) END) AS cb
      FROM events GROUP BY 1, 2
    ),
    d AS (
      SELECT coh,
             CASE
               WHEN ca IS NOT NULL AND (cb IS NULL OR ca <= cb)
                 THEN DATEDIFF('day', f, ca)
               WHEN cb IS NOT NULL THEN DATEDIFF('day', f, cb)
               ELSE DATEDIFF('day', f, l) END AS t,
             CASE
               WHEN ca IS NOT NULL AND (cb IS NULL OR ca <= cb) THEN 'conv'
               WHEN cb IS NOT NULL THEN 'err' END AS cause
      FROM u
    ),
    g AS (
      SELECT t,
             SUM(CASE WHEN coh = 0 AND cause = 'conv' THEN 1 ELSE 0 END) AS d1,
             SUM(CASE WHEN coh = 1 AND cause = 'conv' THEN 1 ELSE 0 END) AS d2
      FROM d GROUP BY 1
    ),
    tot AS (
      SELECT SUM(CASE WHEN coh = 0 THEN 1 ELSE 0 END) AS n1t,
             SUM(CASE WHEN coh = 1 THEN 1 ELSE 0 END) AS n2t
      FROM d
    ),
    r AS (
      SELECT t, d1, d2,
             n1t - COALESCE(SUM(d1) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r1,
             n2t - COALESCE(SUM(d2) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r2
      FROM g CROSS JOIN tot
    ),
    s AS (
      SELECT d1, d1 + d2 AS d, r1, r1 + r2 AS y FROM r WHERE d1 + d2 > 0
    ),
    m AS (
      SELECT SUM(d1) AS o1,
             SUM(CAST(FLOOR(CAST(d AS DOUBLE) * CAST(r1 AS DOUBLE)
                   / CAST(y AS DOUBLE) * 1000000000) AS BIGINT)) AS e9,
             SUM(CASE WHEN y > 1 THEN
                 CAST(FLOOR(CAST(d AS DOUBLE)
                      * (CAST(r1 AS DOUBLE) / CAST(y AS DOUBLE))
                      * (1.0 - CAST(r1 AS DOUBLE) / CAST(y AS DOUBLE))
                      * ((CAST(y AS DOUBLE) - CAST(d AS DOUBLE))
                         / (CAST(y AS DOUBLE) - 1.0))
                      * 1000000000) AS BIGINT) ELSE 0 END) AS v9
      FROM s
    )
    SELECT CAST(tot.n1t AS BIGINT) AS n_1, CAST(tot.n2t AS BIGINT) AS n_2,
           CAST(m.o1 AS BIGINT) AS o_1, CAST(m.e9 AS BIGINT) AS e1_e9,
           CAST(m.v9 AS BIGINT) AS v_e9,
           CASE WHEN m.v9 > 0 THEN
             CAST(FLOOR(CAST(m.o1 * 1000000000 - m.e9 AS DOUBLE)
                  / sqrt(1000000000.0 * CAST(m.v9 AS DOUBLE))
                  * 1000000) AS BIGINT)
           END AS z_e6
    FROM m CROSS JOIN tot
    """,
    doc="Gray's test (rho=0, complete follow-up) for equality of the "
    "two parity cohorts' cumulative incidence of CONVERSION under "
    "the competing error exit (ops.stats.gray_test) - the "
    "significance companion to aalen_johansen_cif exactly as "
    "logrank_cohorts is to the KM curve, and the test log-rank "
    "cannot replace: log-rank on the cause-specific hazard treats "
    "competing exits as censoring, so a cohort that merely errors "
    "FASTER looks protected from conversion. Same duration grain as "
    "the AJ gate; subdistribution risk sets subtract only prior "
    "TARGET-cause exits (competing exits stay at risk forever); "
    "per-step E/V floor-quantize to nanos and sum as BIGINTs "
    "(logrank discipline); z = one subtraction + sqrt at the end.",
)
def gray_test_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import gray_test

    ev = t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("__f"),
        F.max(F.to_date("ts")).alias("__l"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150),
                F.to_date("ts"),
            )
        ).alias("__ca"),
        F.min(
            F.when(F.col("event_type") == "error", F.to_date("ts"))
        ).alias("__cb"),
    )
    d = u.select(
        (F.col("user_id") % 2).alias("coh"),
        F.when(
            F.col("__ca").isNotNull()
            & (F.col("__cb").isNull() | (F.col("__ca") <= F.col("__cb"))),
            F.datediff(F.col("__ca"), F.col("__f")),
        )
        .when(
            F.col("__cb").isNotNull(),
            F.datediff(F.col("__cb"), F.col("__f")),
        )
        .otherwise(F.datediff(F.col("__l"), F.col("__f")))
        .alias("t"),
        F.when(
            F.col("__ca").isNotNull()
            & (F.col("__cb").isNull() | (F.col("__ca") <= F.col("__cb"))),
            F.lit("conv"),
        )
        .when(F.col("__cb").isNotNull(), F.lit("err"))
        .alias("cause"),
    )
    return gray_test(d, "t", "cause", "conv", "coh", 0, 1)


@register(
    "mondrian_conformal_prices",
    oracle="""
    WITH base AS (
      SELECT o_orderpriority AS g, o_totalprice AS v,
             CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
               || ':conf'), 1, 8) AS BIGINT) < 2147483648 AS calib
      FROM orders
      WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
    ),
    cg AS (
      SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c
      FROM base WHERE calib GROUP BY 1, 2
    ),
    ct AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM cg GROUP BY 1),
    cc AS (
      SELECT g, v, SUM(c) OVER (PARTITION BY g ORDER BY v) AS cm FROM cg
    ),
    thr_m AS (
      SELECT cc.g, MIN(v) AS thr
      FROM cc JOIN ct USING (g)
      WHERE cm >= ((n + 1) * 900 + 999) // 1000
      GROUP BY 1
    ),
    mt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base WHERE calib),
    mc AS (
      SELECT v, SUM(c) OVER (ORDER BY v) AS cm
      FROM (SELECT v, CAST(COUNT(*) AS BIGINT) AS c
            FROM base WHERE calib GROUP BY 1)
    ),
    thr_g AS (
      SELECT MIN(v) AS thr FROM mc CROSS JOIN mt
      WHERE cm >= ((n + 1) * 900 + 999) // 1000
    )
    SELECT base.g AS o_orderpriority,
           CAST(MAX(ct.n) AS BIGINT) AS n_calib,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           MAX(thr_m.thr) AS thr_mondrian,
           MAX(thr_g.thr) AS thr_marginal,
           CASE WHEN MAX(thr_m.thr) IS NOT NULL THEN
             CAST(SUM(CASE WHEN v <= thr_m.thr THEN 1 ELSE 0 END)
               * 1000000 // COUNT(*) AS BIGINT) END AS cov_mondrian_e6,
           CASE WHEN MAX(thr_g.thr) IS NOT NULL THEN
             CAST(SUM(CASE WHEN v <= thr_g.thr THEN 1 ELSE 0 END)
               * 1000000 // COUNT(*) AS BIGINT) END AS cov_marginal_e6
    FROM base
    LEFT JOIN ct ON ct.g = base.g
    LEFT JOIN thr_m ON thr_m.g = base.g
    CROSS JOIN thr_g
    WHERE NOT calib
    GROUP BY 1
    """,
    doc="Mondrian vs marginal split-conformal coverage audit at "
    "alpha=0.1 (ops.stats.mondrian_conformal_audit): calibrate on "
    "the md5-parity half of orders (replayable RNG-state-free split, "
    "sampling-tier discipline), evaluate per-priority coverage of "
    "(a) each priority's own ceil((n+1)*0.9)-th order-statistic "
    "threshold and (b) the single marginal threshold - the audit "
    "that motivates Mondrian conformal: marginal guarantees only "
    "AGGREGATE 1-alpha coverage, so a price-heavy priority silently "
    "undercovers while easy ones overcover; per-group calibration "
    "restores the guarantee group-by-group (Vovk's "
    "taxonomy-conditional validity). Exact order statistics via the "
    "conformal_threshold machinery; flooring-micro coverage rates.",
)
def mondrian_conformal_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import mondrian_conformal_audit

    o = t(spark, sf_dir, "orders")
    calib = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("o_orderkey").cast("string"), F.lit(":conf")
                    ).cast("binary")
                ),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        < 2147483648
    )
    return mondrian_conformal_audit(
        o, "o_orderpriority", "o_totalprice", calib,
        alpha_permille=100, chunk_width=1000,
    )


@register(
    "pinball_loss_priorities",
    oracle="""
    WITH v AS (
      SELECT o_orderpriority AS g,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS a
      FROM orders
      WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
    ),
    cg AS (SELECT g, a, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY 1, 2),
    tot AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM cg GROUP BY 1),
    cum AS (
      SELECT g, a, SUM(c) OVER (PARTITION BY g ORDER BY a) AS cm FROM cg
    ),
    thr AS (
      SELECT cum.g, MIN(a) AS p
      FROM cum JOIN tot USING (g)
      WHERE cm >= ((n + 1) * 500 + 999) // 1000
      GROUP BY 1
    )
    SELECT v.g AS o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN a >= p THEN 500 * (a - p)
                         ELSE 500 * (p - a) END) AS BIGINT)
             AS pinball_total_milli,
           CAST(SUM(CASE WHEN a >= p THEN 500 * (a - p)
                         ELSE 500 * (p - a) END) // COUNT(*) AS BIGINT)
             AS pinball_mean_milli
    FROM v JOIN thr ON thr.g = v.g
    GROUP BY 1
    """,
    doc="Pinball (quantile) loss of each priority's own conformal "
    "median price predictor (ops.stats.pinball_loss at q=500 against "
    "ops.stats.conformal_threshold at alpha=500) - the SHARPNESS "
    "metric the conformal tier needs next to its coverage guarantee "
    "(a quantile predictor can cover while being uselessly wide; "
    "pinball is the proper scoring rule a q-quantile minimizes). "
    "Exact BIGINT milli-cent losses per row (floor-cents inputs), "
    "DECIMAL(38,0) sums, flooring mean; the predictor join "
    "broadcasts the 5-row threshold table.",
)
def pinball_loss_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import conformal_threshold, pinball_loss

    o = t(spark, sf_dir, "orders")
    v = o.filter(
        F.col("o_orderpriority").isNotNull() & F.col("o_totalprice").isNotNull()
    ).select(
        F.col("o_orderpriority").alias("g"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("a"),
    )
    thr = (
        conformal_threshold(v, "g", "a", alpha_permille=500)
        .filter(F.col("threshold").isNotNull())
        .select("g", F.col("threshold").alias("p"))
    )
    joined = v.join(F.broadcast(thr), "g")
    return pinball_loss(joined, "a", "p", 500, group_col="g").select(
        F.col("g").alias("o_orderpriority"), "n",
        "pinball_total_milli", "pinball_mean_milli",
    )


@register(
    "sprt_daily_returns",
    oracle="""
    WITH g AS (
      SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS grain,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS x
      FROM lineitem GROUP BY 1
    ),
    s AS (
      SELECT grain,
             x * CAST(FLOOR(ln(260000.0 / 240000.0) * 1000000) AS BIGINT)
             + (n - x)
               * CAST(FLOOR(ln(740000.0 / 760000.0) * 1000000) AS BIGINT)
               AS sc
      FROM g
    ),
    ps AS (
      SELECT grain, sc,
             SUM(sc) OVER (ORDER BY grain
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
      FROM s
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
             CAST(SUM(sc) AS BIGINT) AS llr_end_e6,
             MIN(CASE WHEN cs >= 2944439 THEN grain END) AS first_h1,
             MIN(CASE WHEN cs <= -2944439 THEN grain END) AS first_h0
      FROM ps
    )
    SELECT n_cells, llr_end_e6, first_h1, first_h0,
           CASE WHEN first_h1 IS NOT NULL AND (first_h0 IS NULL
                  OR first_h1 <= first_h0) THEN 'accept_h1'
                WHEN first_h0 IS NOT NULL THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM m
    """,
    doc="Wald SPRT over the daily return-rate series "
    "(ops.stats.sprt_audit): H0 p=0.24 vs H1 p=0.26 at "
    "alpha=beta=0.05 (bounds +-ln 19 = +-2944439 micros) - the third "
    "leg of the SPC tier: Shewhart flags a point, CUSUM a sustained "
    "shift, SPRT answers 'can we stop monitoring yet' with "
    "guaranteed error rates. Per-observation log-ratios floor-micro "
    "quantize ONCE (single-rounded double ratio of the exact e6 "
    "rates through the one blessed ln), every cell contribution and "
    "prefix is exact BIGINT, crossings are integer comparisons on "
    "the global_running_sum prefix. The oracle's window is the "
    "oracle's privilege.",
)
def sprt_daily_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import sprt_audit

    li = t(spark, sf_dir, "lineitem")
    return sprt_audit(
        li,
        F.to_date("l_shipdate").cast("string"),
        F.col("l_returnflag") == "R",
        p0_e6=240_000, p1_e6=260_000,
        a_e6=2_944_439, b_e6=-2_944_439,
        group_alias="grain",
    )


@register(
    "bh_fdr_daily_returns",
    oracle="""
    WITH g AS (
      SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS grain,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS x
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tn,
                   CAST(SUM(x) AS BIGINT) AS tx FROM g),
    pv AS (
      SELECT grain,
             CASE WHEN x * tn - n * tx = 0 THEN CAST(1000000 AS BIGINT)
                  ELSE LEAST(CAST(1000000 AS BIGINT), CAST(
                    CAST(n AS HUGEINT) * tx * (tn - tx) * 1000000
                    // (CAST(x * tn - n * tx AS HUGEINT)
                        * (x * tn - n * tx)) AS BIGINT))
             END AS p_e6
      FROM g CROSS JOIN tot
    ),
    r AS (
      SELECT grain, p_e6,
             ROW_NUMBER() OVER (ORDER BY p_e6, grain) AS rk
      FROM pv
    ),
    mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM r),
    k AS (
      SELECT MAX(CASE WHEN p_e6 * m <= rk * 50000 THEN rk END) AS kmax
      FROM r CROSS JOIN mm
    )
    SELECT grain, p_e6, CAST(rk AS BIGINT) AS rank,
           COALESCE(rk <= kmax, FALSE) AS rejected
    FROM r CROSS JOIN k
    """,
    doc="Benjamini-Hochberg FDR control (ops.stats.bh_fdr at "
    "alpha=0.05) over a per-day battery of Chebyshev-conservative "
    "p-values on the daily return rate (p = min(1, 1/z^2) with z^2 = "
    "(x*tn - n*tx)^2 / (n*tx*(tn-tx)) - EXACT integer moments, so "
    "the whole battery is cross-engine bit-identical without "
    "touching erf) - the multiple-comparisons layer every per-cell "
    "monitor in the repo needs before a human reads 2500 "
    "'significant' days at alpha=0.05. Step-up condition "
    "cross-multiplied to p_e6*m <= rank*alpha_e6 (no division); "
    "ranks via ranked_total_order with deterministic tiebreak; "
    "rejection is rank <= k_max, the step-up rule naive per-cell "
    "thresholding gets wrong. Production plugs any upstream exact-p "
    "column into the same op.",
)
def bh_fdr_daily_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import bh_fdr

    li = t(spark, sf_dir, "lineitem")
    g = li.groupBy(
        F.to_date("l_shipdate").cast("string").alias("grain")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long").alias("x"),
    )
    tot = g.agg(
        F.sum("n").cast("long").alias("tn"),
        F.sum("x").cast("long").alias("tx"),
    )
    pv = (
        g.crossJoin(F.broadcast(tot))
        .withColumn("__d", F.col("x") * F.col("tn") - F.col("n") * F.col("tx"))
        .selectExpr(
            "grain",
            "CASE WHEN __d = 0 THEN CAST(1000000 AS BIGINT)"
            " ELSE LEAST(CAST(1000000 AS BIGINT), CAST("
            "CAST(n AS DECIMAL(38,0)) * tx * (tn - tx) * 1000000"
            " div (CAST(__d AS DECIMAL(38,0)) * __d) AS BIGINT))"
            " END AS p_e6",
        )
    )
    return bh_fdr(pv, "grain", "p_e6", alpha_e6=50_000)


@register(
    "runs_test_daily_returns",
    oracle="""
    WITH g AS (
      SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS grain,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS x
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS tn, SUM(x) AS tx FROM g),
    s AS (
      SELECT grain,
             CASE WHEN x * 1000000 // n > tx * 1000000 // tn THEN 1
                  WHEN x * 1000000 // n < tx * 1000000 // tn THEN -1
                  ELSE 0 END AS side
      FROM g CROSS JOIN tot
    ),
    nz AS (
      SELECT side,
             CASE WHEN lag(side) OVER (ORDER BY grain) IS NULL
                    OR side <> lag(side) OVER (ORDER BY grain)
                  THEN 1 ELSE 0 END AS new_run
      FROM s WHERE side <> 0
    ),
    c AS (
      SELECT CAST(COALESCE(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS n_pos,
             CAST(COALESCE(SUM(CASE WHEN side = -1 THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS n_neg,
             CAST(COALESCE(SUM(new_run), 0) AS BIGINT) AS n_runs
      FROM nz
    ),
    zz AS (
      SELECT CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero
      FROM s
    )
    SELECT n_pos, n_neg, n_zero, n_runs,
           CAST(n_runs * (n_pos + n_neg) - 2 * n_pos * n_neg
                - (n_pos + n_neg) AS BIGINT) AS z_num,
           CASE WHEN n_pos + n_neg >= 2
                 AND 2 * n_pos * n_neg > n_pos + n_neg THEN
             ROUND(CAST(n_runs * (n_pos + n_neg) - 2 * n_pos * n_neg
                        - (n_pos + n_neg) AS DOUBLE)
               / SQRT(CAST(2 * n_pos * n_neg AS DOUBLE)
                      * (2 * n_pos * n_neg - (n_pos + n_neg))
                      / (n_pos + n_neg - 1)), 6) END AS z_r6
    FROM c CROSS JOIN zz
    """,
    doc="Wald-Wolfowitz runs test over the daily return-rate series "
    "(ops.stats.runs_test) - the significance quantifier for the "
    "patterns run rule 2 and Nelson rule 4 flag qualitatively: too "
    "FEW runs of the side-of-center sequence = clustering/persistent "
    "shifts, too MANY = overcorrection/alternation, z from the exact "
    "randomization moments. Sides on exact flooring micro-rates "
    "(run_rules' center discipline), on-center days dropped (the "
    "classic ties dichotomy, reported as n_zero); ONE grain collapse, "
    "one broadcast pooled scalar, one lag over the calendar-bounded "
    "day grain, two single-row aggregates broadcast-crossed; only "
    "the final z is a flat double (round @6).",
)
def runs_test_daily_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import runs_test

    li = t(spark, sf_dir, "lineitem")
    return runs_test(
        li,
        F.to_date("l_shipdate").cast("string"),
        F.col("l_returnflag") == "R",
        group_alias="grain",
    )


@register(
    "kendall_tau_quantity_discount",
    oracle="""
    WITH base AS (
      SELECT CAST(l_quantity AS INT) AS x,
             CAST(ROUND(l_discount * 100) AS INT) AS y
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
    ),
    cells AS (
      SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY x, y
    ),
    cd AS (
      SELECT CAST(COALESCE(SUM(CASE WHEN a.x < b.x AND a.y < b.y
                                    THEN a.c * b.c ELSE 0 END), 0)
               AS BIGINT) AS n_concordant,
             CAST(COALESCE(SUM(CASE WHEN a.x < b.x AND a.y > b.y
                                    THEN a.c * b.c ELSE 0 END), 0)
               AS BIGINT) AS n_discordant
      FROM cells a JOIN cells b
        ON a.x < b.x OR (a.x = b.x AND a.y < b.y)
    ),
    tx AS (
      SELECT CAST(SUM(t) AS BIGINT) AS n,
             CAST(SUM(t * (t - 1)) AS BIGINT) AS tx2
      FROM (SELECT COUNT(*) AS t FROM base GROUP BY x)
    ),
    ty AS (
      SELECT CAST(SUM(t * (t - 1)) AS BIGINT) AS ty2
      FROM (SELECT COUNT(*) AS t FROM base GROUP BY y)
    ),
    txy AS (
      SELECT CAST(SUM(c * (c - 1)) AS BIGINT) AS txy2 FROM cells
    )
    SELECT n, n_concordant, n_discordant,
           CAST(tx2 // 2 AS BIGINT) AS ties_x,
           CAST(ty2 // 2 AS BIGINT) AS ties_y,
           CAST(txy2 // 2 AS BIGINT) AS ties_xy,
           CASE WHEN (n * (n - 1)) // 2 - tx2 // 2 > 0
                 AND (n * (n - 1)) // 2 - ty2 // 2 > 0 THEN
             ROUND((CAST(n_concordant AS DOUBLE) - n_discordant)
               / SQRT(CAST((n * (n - 1)) // 2 - tx2 // 2 AS DOUBLE)
                      * CAST((n * (n - 1)) // 2 - ty2 // 2 AS DOUBLE)), 6)
           END AS tau_b_r6,
           CASE WHEN n_concordant + n_discordant > 0 THEN
             ROUND((CAST(n_concordant AS DOUBLE) - n_discordant)
               / (CAST(n_concordant AS DOUBLE) + n_discordant), 6)
           END AS gamma_r6
    FROM cd CROSS JOIN tx CROSS JOIN ty CROSS JOIN txy
    """,
    doc="Kendall's tau-b (+ Goodman-Kruskal gamma) between order "
    "quantity and discount percent (ops.stats.kendall_tau_b_cells) - "
    "the "
    "tie-corrected bivariate concordance coefficient completing the "
    "rank-association tier on RAW data rows (kendall_events_daily's "
    "row-pair census needs a pre-bounded summary grain; this one "
    "does not). Pair masses collapse to the bounded VALUE-PAIR "
    "cell grain first (50 quantities x 11 discounts), then one "
    "broadcast nested-loop self-join over ordered CELL pairs - the "
    "quadratic is (#cells)^2, never data rows (brunner_munzel "
    "discipline); C/D/tie totals exact BIGINT, only the final tau-b "
    "and gamma divisions are flat doubles (round @6).",
)
def kendall_tau_quantity_discount(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import kendall_tau_b_cells

    li = t(spark, sf_dir, "lineitem")
    return kendall_tau_b_cells(
        li,
        F.col("l_quantity").cast("int"),
        F.round(F.col("l_discount") * 100).cast("int"),
    )


@register(
    "theil_u_source_lang",
    oracle="""
    WITH joint AS (
      SELECT source AS x, lang AS y, CAST(COUNT(*) AS BIGINT) AS nxy
      FROM documents GROUP BY 1, 2
    ),
    hx AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_x,
             CAST(SUM(c) AS BIGINT) AS nn,
             SUM(CAST(c AS HUGEINT)
                 * CAST(FLOOR(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT))
               AS sfl
      FROM (SELECT CAST(SUM(nxy) AS BIGINT) AS c FROM joint GROUP BY x)
    ),
    hy AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_y,
             CAST(SUM(c) AS BIGINT) AS nn,
             SUM(CAST(c AS HUGEINT)
                 * CAST(FLOOR(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT))
               AS sfl
      FROM (SELECT CAST(SUM(nxy) AS BIGINT) AS c FROM joint GROUP BY y)
    ),
    hxy AS (
      SELECT CAST(SUM(nxy) AS BIGINT) AS nn,
             SUM(CAST(nxy AS HUGEINT)
                 * CAST(FLOOR(ln(CAST(nxy AS DOUBLE)) * 1000000) AS BIGINT))
               AS sfl
      FROM joint
    ),
    e AS (
      SELECT hxy.nn AS n, hx.n_x, hy.n_y,
             CAST(CAST(FLOOR(ln(CAST(hx.nn AS DOUBLE)) * 1000000) AS BIGINT)
                  - hx.sfl // hx.nn AS BIGINT) AS hx_e6,
             CAST(CAST(FLOOR(ln(CAST(hy.nn AS DOUBLE)) * 1000000) AS BIGINT)
                  - hy.sfl // hy.nn AS BIGINT) AS hy_e6,
             CAST(CAST(FLOOR(ln(CAST(hxy.nn AS DOUBLE)) * 1000000) AS BIGINT)
                  - hxy.sfl // hxy.nn AS BIGINT) AS hxy_e6
      FROM hxy CROSS JOIN hx CROSS JOIN hy
    )
    SELECT n, n_x, n_y, hx_e6, hy_e6, hxy_e6,
           GREATEST(CAST(0 AS BIGINT),
                    CAST(hx_e6 + hy_e6 - hxy_e6 AS BIGINT)) AS mi_q_e6,
           CASE WHEN hy_e6 > 0 THEN
             CAST(GREATEST(CAST(0 AS BIGINT),
                           CAST(hx_e6 + hy_e6 - hxy_e6 AS BIGINT))
                  * 1000000 // hy_e6 AS BIGINT) END AS theil_u_yx_e6,
           CASE WHEN hx_e6 > 0 THEN
             CAST(GREATEST(CAST(0 AS BIGINT),
                           CAST(hx_e6 + hy_e6 - hxy_e6 AS BIGINT))
                  * 1000000 // hx_e6 AS BIGINT) END AS theil_u_xy_e6
    FROM e
    """,
    doc="Theil's uncertainty coefficient between document source and "
    "language, BOTH directions (ops.stats.theil_u) - the normalized "
    "ASYMMETRIC member of the categorical-association family "
    "(orders_mutual_info raw nats, cramers_v symmetric chi2 effect "
    "size): U(lang|source) = I/H(lang) is the fraction of language "
    "uncertainty the source removes, and the yx/xy asymmetry says "
    "which column predicts which - the direction a leakage screen "
    "cares about. Exact floor-micro entropies (token_entropy's "
    "per-term quantization, DECIMAL sums - no order-dependent float "
    "accumulation), I from the quantized identity H(X)+H(Y)-H(X,Y) "
    "clamped at 0, each U one flooring BIGINT division; ONE pass to "
    "the observed-cells contingency grain, marginals re-aggregated "
    "from cells.",
)
def theil_u_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.stats import theil_u

    docs = t(spark, sf_dir, "documents")
    return theil_u(docs, "source", "lang")
