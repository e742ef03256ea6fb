"""Correctness-gate queries: event-time windowing over `events`
(SURVEY.md §2.7 — net-new surface; the reference is batch-only).

These are the BATCH twins of the streaming operators in
hadoop_fcfs_spark.streaming — identical expressions run under
readStream in production; pytest drives the streaming path through the
memory sink (tests/test_streaming.py), the DuckDB oracle checks the
semantics here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_fcfs_spark.registry import register
from hadoop_fcfs_spark.streaming.sessionize import sessionize
from hadoop_fcfs_spark.streaming.windows import session_window_agg, sliding_agg, tumbling_agg
from hadoop_fcfs_spark.tables import t


@register(
    "tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS win_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS win_end,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY 1, 2, 3
    """,
    doc="Tumbling 1h event-time windows per event_type (window()).",
)
def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_agg(t(spark, sf_dir, "events"), "ts", "1 hour", "event_type")


@register(
    "sliding_window",
    oracle="""
    WITH starts AS (
      SELECT date_trunc('hour', ts) AS win_start, value FROM events
      UNION ALL
      SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS win_start, value FROM events
    )
    SELECT win_start, win_start + INTERVAL 2 HOUR AS win_end,
           COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
    FROM starts GROUP BY 1, 2
    """,
    doc="Sliding windows (2h window, 1h slide): each event in 2 windows.",
)
def sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_agg(t(spark, sf_dir, "events"), "ts", "2 hours", "1 hour")


_SESSION_CTE = """
    flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) {gap_op} 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts, value,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS session_id
      FROM flagged
    )
"""


@register(
    "sessionize",
    oracle=f"""
    WITH {_SESSION_CTE.format(gap_op=">")}
    SELECT user_id, session_id, MIN(ts) AS sess_start, MAX(ts) AS sess_end,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
    doc="Batch sessionization: lag+cumsum gap split (>30 min gap = new session).",
)
def sessionize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(t(spark, sf_dir, "events"), "user_id", "ts", gap_minutes=30)


@register(
    "session_window",
    oracle=f"""
    WITH {_SESSION_CTE.format(gap_op=">=")}
    SELECT user_id, MIN(ts) AS sess_start, MAX(ts) + INTERVAL 30 MINUTE AS sess_end,
           COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
    FROM sess GROUP BY user_id, session_id
    """,
    doc="session_window(ts, 30 min): merged dynamic windows, end = last event + gap "
    "(strict-< merge semantics → gap exactly 30min starts a new session).",
)
def session_window_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_window_agg(t(spark, sf_dir, "events"), "ts", "30 minutes", "user_id")


@register(
    "event_interval_join",
    oracle="""
    SELECT p.user_id, COUNT(*) AS n_pairs,
           CAST(COUNT(DISTINCT p.event_id) AS BIGINT) AS n_purchases_matched
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    GROUP BY p.user_id
    """,
    doc="Batch twin of the stream-stream interval join "
    "(tests/test_streaming.py runs the same shape under readStream with "
    "watermarks both sides): purchases matched to same-user clicks in "
    "the trailing hour. Equality join on user_id + residual time bound — "
    "one shuffle per side, no range cross-product.",
)
def event_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    joined = p.join(
        c,
        (p.user_id == c.c_user)
        & (c.c_ts >= p.p_ts - F.expr("INTERVAL 1 HOUR"))
        & (c.c_ts <= p.p_ts),
    )
    return joined.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("p_id").alias("n_purchases_matched"),
    )


@register(
    "session_path_topk",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS sid
      FROM flagged
    ),
    grams AS (
      SELECT event_type AS step_1,
             LEAD(event_type, 1) OVER w2 AS step_2,
             LEAD(event_type, 2) OVER w2 AS step_3
      FROM sess
      WINDOW w2 AS (PARTITION BY user_id, sid ORDER BY ts, event_id)
    )
    SELECT step_1, step_2, step_3, CAST(COUNT(*) AS BIGINT) AS path_count
    FROM grams WHERE step_3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY path_count DESC, step_1, step_2, step_3 LIMIT 25
    """,
    doc="Top-25 consecutive 3-step paths within 30-min sessions "
    "(ops.seqmine.session_ngram_paths): sessionize (lag+cumsum gap "
    "split) then LEAD×2 inside (user, session) — both window layers "
    "reuse ONE user-key exchange, path counts partial-aggregate, "
    "top-k is TakeOrdered with a total ordering (count desc, lexical "
    "steps) so boundary ties are deterministic. The n=3 extension of "
    "event_transitions' Markov bigrams.",
)
def session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.seqmine import session_ngram_paths

    ev = t(spark, sf_dir, "events")
    out = session_ngram_paths(
        ev, "user_id", "ts", "event_type", "event_id", n=3, gap_minutes=30
    )
    return (
        out.select("step_1", "step_2", "step_3",
                   F.col("path_count").cast("long").alias("path_count"))
        .orderBy(F.desc("path_count"), "step_1", "step_2", "step_3")
        .limit(25)
    )


@register(
    "debounce_events",
    oracle="""
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id)) AS gap
      FROM events
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_raw,
           CAST(COUNT(*) FILTER (gap IS NULL OR gap > 60000000) AS BIGINT)
             AS n_kept
    FROM g GROUP BY 1
    """,
    doc="Debounce / burst collapse (ops.timeseries.debounce): per "
    "(user, event_type), keep only rows more than 60 s after their "
    "predecessor — double-click / retry-storm cleaning. One "
    "key-bounded lag window, (ts, event_id) total order; the gate "
    "reports per-type raw vs kept counts (integers).",
)
def debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.timeseries import debounce

    ev = t(spark, sf_dir, "events")
    kept = debounce(ev, ["user_id", "event_type"], "ts", "event_id", quiet_ms=60_000)
    raw = ev.groupBy("event_type").agg(F.count("*").cast("long").alias("n_raw"))
    k = kept.groupBy("event_type").agg(F.count("*").cast("long").alias("n_kept"))
    return raw.join(k, "event_type")


@register(
    "linear_attribution",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id AS p_id, ts AS p_ts FROM events
      WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT p.p_id, e.event_type AS channel
      FROM p JOIN events e
        ON e.user_id = p.user_id
       AND e.event_type <> 'purchase'
       AND e.ts <= p.p_ts
       AND epoch_us(p.p_ts) - epoch_us(e.ts) <= 1800000000
    ),
    k AS (SELECT p_id, CAST(COUNT(*) AS BIGINT) AS kk FROM touches GROUP BY 1)
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS touches,
           CAST(SUM(1000000 // kk) AS BIGINT) AS credit_micro
    FROM touches JOIN k USING (p_id)
    GROUP BY channel
    """,
    doc="Linear multi-touch attribution: every non-purchase event in "
    "the 30 minutes before a purchase shares the credit equally "
    "(1/k each) — the fairness-spread companion to last-touch "
    "purchase_attribution. Credit is INTEGER micro-units "
    "(1000000 div k), so the per-channel sums are exact under any "
    "accumulation order (float 1/k credits would drift at the ulp). "
    "The touch join is ops.joins.trailing_band_join: purchases "
    "explode into the 2 epoch buckets their 30-min band spans and the "
    "join is EQUI on (user, bucket) — a hot user's fan-out is bounded "
    "per 30-min window, never lifetime P x E; k re-aggregates from "
    "the touch table.",
)
def linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.caching import waypoint
    from hadoop_fcfs_spark.ops.joins import trailing_band_join

    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
    )
    e = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", F.col("event_type").alias("channel"), "ts"
    )
    touches = waypoint(
        trailing_band_join(
            p, e, "p_user", "user_id", "p_ts", "ts", band_us=1_800_000_000
        ).select("p_id", "channel")
    )
    k = touches.groupBy("p_id").agg(F.count("*").cast("long").alias("__k"))
    return (
        touches.join(k, "p_id")
        .groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("touches"),
            F.sum(F.expr("1000000 div __k")).cast("long").alias("credit_micro"),
        )
    )


@register(
    "frequent_subsequences",
    oracle="""
    WITH flagged AS (
      SELECT user_id AS u, event_type AS s, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 43200000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    pos AS (
      SELECT u, s,
             SUM(is_new) OVER (PARTITION BY u ORDER BY ts, event_id) AS sid,
             ROW_NUMBER() OVER (PARTITION BY u ORDER BY ts, event_id) AS p
      FROM flagged
    ),
    g AS (
      SELECT u, sid, s, MIN(p) AS fp, MAX(p) AS lp
      FROM pos GROUP BY 1, 2, 3
    ),
    nu AS (SELECT COUNT(DISTINCT user_id) AS n FROM events),
    hits AS (
      SELECT DISTINCT a.u, a.s AS step_a, b.s AS step_b, c.s AS step_c
      FROM g a JOIN g b ON a.u = b.u AND a.sid = b.sid
               JOIN g c ON b.u = c.u AND b.sid = c.sid
      WHERE EXISTS (SELECT 1 FROM pos pb WHERE pb.u = a.u
                    AND pb.sid = a.sid AND pb.s = b.s
                    AND pb.p > a.fp AND pb.p < c.lp)
    )
    SELECT step_a, step_b, step_c, CAST(COUNT(*) AS BIGINT) AS support
    FROM hits CROSS JOIN nu
    GROUP BY 1, 2, 3, nu.n
    HAVING 5 * COUNT(*) >= 2 * nu.n
    ORDER BY support DESC, step_a, step_b, step_c
    LIMIT 15
    """,
    doc="Top-15 frequent 3-step subsequences within 12h sessions "
    "(ops.seqmine.frequent_subsequences - the PrefixSpan/GSP family; "
    "session_path_topk counts only CONSECUTIVE runs, this is the "
    "order-only relaxation funnel mining wants). Containment is "
    "aggregation-only: (a,b,c) occurs in a session iff some b-position "
    "lies strictly between first_pos(a) and last_pos(c) - an EXISTS "
    "over the (user, session, step) type grain, never a positional "
    "self-join; Apriori prune (answer-invariant by anti-monotonicity) "
    "bounds candidates to joins of frequent pairs, and the naive-SQL "
    "oracle proves the prune drops nothing. Support floor is RELATIVE "
    "(exact cross-multiply, 5*support >= 2*n_users) and the output is "
    "top-k with a total ordering: probed session supports CONCENTRATE "
    "with scale (48-66% of users at sf0.01, 53-60% at sf0.1), so any "
    "fixed percentage sits knife-edge at some SF - ranking stays "
    "discriminating at all of them.",
)
def frequent_subsequences_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.seqmine import frequent_subsequences

    ev = t(spark, sf_dir, "events")
    out = frequent_subsequences(
        ev, "user_id", "ts", "event_type", "event_id",
        min_support_num=2, min_support_den=5, session_gap_minutes=720,
    )
    return out.orderBy(
        F.desc("support"), "step_a", "step_b", "step_c"
    ).limit(15)


@register(
    "temporal_split_audit",
    oracle="""
    WITH s AS (
      SELECT user_id, ts < TIMESTAMP '2024-01-22' AS is_train FROM events
    ),
    tr AS (SELECT DISTINCT user_id FROM s WHERE is_train),
    te AS (SELECT DISTINCT user_id FROM s WHERE NOT is_train)
    SELECT
      CAST((SELECT COUNT(*) FROM s WHERE is_train) AS BIGINT)
        AS n_train_events,
      CAST((SELECT COUNT(*) FROM s WHERE NOT is_train) AS BIGINT)
        AS n_test_events,
      CAST((SELECT COUNT(*) FROM tr) AS BIGINT) AS n_train_users,
      CAST((SELECT COUNT(*) FROM te) AS BIGINT) AS n_test_users,
      CAST((SELECT COUNT(*) FROM tr JOIN te USING (user_id)) AS BIGINT)
        AS n_shared_users
    """,
    doc="Temporal train/test split audit: split events at a cutoff "
    "date and report per-split event/user counts plus the SHARED-user "
    "count - the point-in-time leakage screen (user-level features "
    "computed over the whole history leak future signal into train "
    "rows for every shared user; this quantifies the exposure). One "
    "scan + two distinct-user aggregations + one semi-join, all "
    "integer outputs. Complements train_holdout_split (random, "
    "engine-replayable) with the time-ordered split an events pipeline "
    "actually deploys.",
)
def temporal_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-22").cast("timestamp")
    s = ev.select("user_id", (F.col("ts") < cutoff).alias("is_train"))
    counts = s.agg(
        F.sum(F.when(F.col("is_train"), 1).otherwise(0)).cast("long").alias("n_train_events"),
        F.sum(F.when(~F.col("is_train"), 1).otherwise(0)).cast("long").alias("n_test_events"),
    )
    tr = s.filter(F.col("is_train")).select("user_id").distinct()
    te = s.filter(~F.col("is_train")).select("user_id").distinct()
    u = (
        tr.agg(F.count("*").cast("long").alias("n_train_users"))
        .crossJoin(te.agg(F.count("*").cast("long").alias("n_test_users")))
        .crossJoin(
            tr.join(te, "user_id", "left_semi")
            .agg(F.count("*").cast("long").alias("n_shared_users"))
        )
    )
    return counts.crossJoin(F.broadcast(u))


def _markov_oracle(iters: int, scale: int, select: str | None = None) -> str:
    """Unrolled integer power iteration (AS MATERIALIZED per the r4
    chained-CTE gotcha). Exact-integer matvec terms (pi*c // r) make
    every round order-independent — see ops.graph.markov_stationary."""
    parts = [
        f"""p0 AS MATERIALIZED (
      SELECT node,
             CAST({scale} // (SELECT COUNT(*) FROM states) AS BIGINT) AS pi
      FROM states
    )"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"""p{k} AS MATERIALIZED (
      SELECT e.j AS node, CAST(SUM(p.pi * e.c // e.r) AS BIGINT) AS pi
      FROM p{k - 1} p JOIN e ON e.i = p.node GROUP BY 1
    )"""
        )
    tail = select or f"""
    SELECT node AS event_type, pi AS pi_e12 FROM p{iters}
    """
    return (
        """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    pairs AS (
      SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT event_type, SUM(n) AS r FROM pairs GROUP BY 1),
    e AS MATERIALIZED (
      SELECT p.event_type AS i, p.next_type AS j, p.n AS c, t.r
      FROM pairs p JOIN tot t USING (event_type)
    ),
    states AS MATERIALIZED (
      SELECT DISTINCT i AS node FROM e UNION SELECT DISTINCT j FROM e
    ),
    """
        + ",\n    ".join(parts)
        + tail
    )


@register(
    "markov_stationary_events",
    oracle=_markov_oracle(iters=10, scale=10**12),
    doc="Stationary distribution of the event-type Markov chain "
    "(ops.graph.markov_stationary - power iteration as relational "
    "algebra, the PageRank loop without teleportation): where the "
    "user funnel settles if the observed transition matrix keeps "
    "running. 10 rounds from uniform; pi lives in INTEGER 1e12 units "
    "and every matvec term is pi*c div r - exact integer end to end, "
    "so per-state sums are order-independent and both engines replay "
    "the identical trajectory (a float matvec drifts at the ulp per "
    "round in engine-specific sum order). State is one row per event "
    "type; each round is the transition-table join + map-side sum.",
)
def markov_stationary_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from hadoop_fcfs_spark.ops.graph import markov_stationary

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    pairs = seq.groupBy("event_type", "next_type").agg(
        F.count("*").cast("long").alias("n")
    )
    out = markov_stationary(
        pairs, iters=10, src="event_type", dst="next_type", weight="n"
    )
    return out.select(
        F.col("node").alias("event_type"), F.col("pi").alias("pi_e12")
    )


def _entropy_tail(iters: int) -> str:
    """Tail parameterized on iters so it can never silently join a
    stale p{k} CTE when the iteration count at the call site moves."""
    return f"""
    SELECT ROUND(-SUM(
             (CAST(p.pi AS DOUBLE) / 1000000000000.0)
             * (CAST(e.c AS DOUBLE) / CAST(e.r AS DOUBLE))
             * log2(CAST(e.c AS DOUBLE) / CAST(e.r AS DOUBLE))
           ), 6) AS entropy_rate_bits,
           CAST(COUNT(*) AS BIGINT) AS n_transitions
    FROM e JOIN p{iters} p ON p.node = e.i
    """


@register(
    "markov_entropy_rate",
    oracle=_markov_oracle(iters=10, scale=10**12, select=_entropy_tail(10)),
    doc="Entropy rate of the event-type Markov chain: H = -sum_i pi_i "
    "sum_j p_ij log2 p_ij over the observed transition matrix, pi "
    "from the SAME exact-integer 10-round power iteration as "
    "markov_stationary_events - bits of genuine surprise per step "
    "once lag-1 structure is accounted for (user_behavior_entropy's "
    "iid entropy minus this gap IS the behavioral predictability). "
    "Every input to the float expression is an exact integer "
    "(pi_e12, c, r), so both engines evaluate identical doubles; "
    "states^2-bounded term sum, round @6 (char_entropy convention).",
)
def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from hadoop_fcfs_spark.ops.graph import markov_stationary

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    pairs = seq.groupBy("event_type", "next_type").agg(
        F.count("*").cast("long").alias("n")
    )
    from hadoop_fcfs_spark.caching import waypoint

    pairs = waypoint(pairs)
    tot = pairs.groupBy("event_type").agg(F.sum("n").alias("__r"))
    pi = markov_stationary(
        pairs, iters=10, src="event_type", dst="next_type", weight="n"
    )
    p = F.col("n").cast("double") / F.col("__r").cast("double")
    term = (
        (F.col("pi").cast("double") / F.lit(1e12)) * p * F.log2(p)
    )
    return (
        pairs.join(tot, "event_type")
        .join(pi.withColumnRenamed("node", "event_type"), "event_type")
        .agg(
            F.round(-F.sum(term), 6).alias("entropy_rate_bits"),
            F.count("*").cast("long").alias("n_transitions"),
        )
    )


@register(
    "rolling_origin_folds_events",
    oracle="""
    WITH g AS (
      SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    mx AS (SELECT MAX(d) AS m FROM g),
    folds AS (SELECT * FROM (VALUES (1), (2), (3), (4)) f(fold)),
    lab AS (
      SELECT fold,
             m - (fold - 1) * 14 AS test_end,
             m - (fold * 14 - 1) AS test_start,
             m - fold * 14 AS train_end
      FROM folds CROSS JOIN mx
    )
    SELECT CAST(fold AS INT) AS fold,
           CAST(train_end AS VARCHAR) AS train_end_day,
           CAST(test_start AS VARCHAR) AS test_start_day,
           CAST(test_end AS VARCHAR) AS test_end_day,
           CAST(SUM(CASE WHEN d <= train_end THEN c ELSE 0 END) AS BIGINT) AS n_train,
           CAST(SUM(CASE WHEN d >= test_start AND d <= test_end THEN c ELSE 0 END) AS BIGINT) AS n_test
    FROM lab CROSS JOIN g
    GROUP BY 1, 2, 3, 4
    """,
    doc="Rolling-origin backtest folds over the event stream "
    "(ops.timeseries.rolling_origin_folds, 4 folds x 14 test days): "
    "fold i tests on the 14-day window ending i windows before the "
    "series end and trains on everything strictly before it - the "
    "expanding-window CV scheme that never lets a fold see its own "
    "future (the multi-fold generalization of temporal_split_audit). "
    "One day-grain aggregate over the raw rows, then a folds x days "
    "summary cross join re-aggregated - raw data touched once, fold "
    "table broadcast.",
)
def rolling_origin_folds_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.timeseries import rolling_origin_folds

    ev = t(spark, sf_dir, "events")
    out = rolling_origin_folds(ev, "ts", n_folds=4, test_days=14)
    return out.select(
        "fold",
        F.col("train_end_day").cast("string").alias("train_end_day"),
        F.col("test_start_day").cast("string").alias("test_start_day"),
        F.col("test_end_day").cast("string").alias("test_end_day"),
        "n_train",
        "n_test",
    )


@register(
    "funnel_conversion",
    oracle="""
    WITH u1 AS (
      SELECT user_id, MIN(epoch_us(ts)) AS prev FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ),
    u2 AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS prev
      FROM events e JOIN u1 USING (user_id)
      WHERE e.event_type = 'view' AND epoch_us(e.ts) > u1.prev
        AND epoch_us(e.ts) <= u1.prev + 86400000000
      GROUP BY 1
    ),
    u3 AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS prev
      FROM events e JOIN u2 USING (user_id)
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > u2.prev
        AND epoch_us(e.ts) <= u2.prev + 86400000000
      GROUP BY 1
    ),
    u4 AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS prev
      FROM events e JOIN u3 USING (user_id)
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > u3.prev
        AND epoch_us(e.ts) <= u3.prev + 86400000000
      GROUP BY 1
    ),
    c AS (
      SELECT 1 AS step, 'signup' AS step_name,
             CAST(COUNT(*) AS BIGINT) AS n_users FROM u1
      UNION ALL SELECT 2, 'view', CAST(COUNT(*) AS BIGINT) FROM u2
      UNION ALL SELECT 3, 'click', CAST(COUNT(*) AS BIGINT) FROM u3
      UNION ALL SELECT 4, 'purchase', CAST(COUNT(*) AS BIGINT) FROM u4
    )
    SELECT step, step_name, n_users,
           CASE WHEN (SELECT n_users FROM c WHERE step = 1) > 0 THEN
             CAST((n_users * 1000000)
                  // (SELECT n_users FROM c WHERE step = 1) AS BIGINT)
           END AS conversion_micro
    FROM c
    """,
    doc="Ordered funnel signup -> view -> click -> purchase with a 24h "
    "per-step window (ops.seqmine.funnel_steps): a user reaches step "
    "i only via an event STRICTLY AFTER the moment they reached step "
    "i-1 and within 24h of it - the standard product-analytics "
    "funnel that naive per-type MIN comparisons get wrong when steps "
    "happen out of order (and that converts everybody without a "
    "window: probed 1500->550->192->73 at sf0.1 vs 1500->1500->... "
    "unwindowed - the r2 gate event_funnel is exactly that unwindowed "
    "3-step shape and its equal counts are the vacuity proof; this "
    "gate adds the window + conversion accounting the PRODUCT funnel "
    "needs, via the generic ops.seqmine.funnel_steps). "
    "All comparisons in unix MICROS as BIGINTs "
    "(matching tables.t's nanos truncation, so engine and oracle "
    "compare identical integers). Per step: one type-pruned scan "
    "joined to the shrinking user-grain frontier on the shared user "
    "key - no windows, no event materialization.",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.seqmine import funnel_steps

    return funnel_steps(
        t(spark, sf_dir, "events"), "user_id", "event_type", "ts",
        ["signup", "view", "click", "purchase"],
        within_us=86_400_000_000,
    )


@register(
    "cohort_retention_matrix",
    oracle="""
    WITH b AS (
      SELECT user_id AS u, epoch_us(ts) // 604800000000 AS p FROM events
    ),
    f AS (SELECT u, MIN(p) AS cw FROM b GROUP BY 1),
    s AS (SELECT cw, CAST(COUNT(*) AS BIGINT) AS n0 FROM f GROUP BY 1),
    a AS (
      SELECT DISTINCT b.u, f.cw, b.p - f.cw AS off
      FROM b JOIN f USING (u)
    ),
    m AS (
      SELECT cw, off, CAST(COUNT(*) AS BIGINT) AS n_active
      FROM a GROUP BY 1, 2
    )
    SELECT m.cw AS cohort_period, m.off AS period_offset, m.n_active,
           s.n0 AS cohort_size,
           CAST((m.n_active * 1000000) // s.n0 AS BIGINT) AS retention_micro
    FROM m JOIN s USING (cw)
    """,
    doc="Weekly cohort retention matrix over the event log "
    "(ops.timeseries.cohort_retention): users cohorted by the week of "
    "their first event (exact epoch//week integer buckets - no WEEK() "
    "whose week-start convention differs across engines), per "
    "(cohort, offset) active counts and retained fraction in floored "
    "micros. Extends the r2 day-grain cohort_retention gate (active "
    "counts only, offsets capped 0..7) with cohort sizes, retained "
    "FRACTIONS, uncapped offsets, and the reusable operator; the "
    "retention-triangle matrix view of what kaplan_meier_retention "
    "summarizes as a curve. One user-grain first-touch agg + one "
    "(user, week) DISTINCT collapse sharing the user key; matrix "
    "rollup is calendar-bounded; cohort sizes broadcast back.",
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.timeseries import cohort_retention

    return cohort_retention(t(spark, sf_dir, "events"), "user_id", "ts")


@register(
    "position_attribution",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id AS p_id, ts AS p_ts FROM events
      WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT p.p_id, e.event_type AS channel,
             epoch_us(e.ts) AS us, e.event_id AS tid
      FROM p JOIN events e
        ON e.user_id = p.user_id
       AND e.event_type <> 'purchase'
       AND e.ts <= p.p_ts
       AND epoch_us(p.p_ts) - epoch_us(e.ts) <= 1800000000
    ),
    r AS (
      SELECT p_id, channel,
             ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY us, tid) AS pos,
             CAST(COUNT(*) OVER (PARTITION BY p_id) AS BIGINT) AS kk
      FROM touches
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS touches,
           CAST(SUM(CASE WHEN kk = 1 THEN 1000000
                         WHEN kk = 2 THEN 500000
                         WHEN pos = 1 OR pos = kk THEN 400000
                         ELSE 200000 // (kk - 2) END) AS BIGINT)
             AS credit_micro
    FROM r GROUP BY channel
    """,
    doc="Position-based (U-shaped) multi-touch attribution: the first "
    "and last touch in the 30-min pre-purchase band get 40% credit "
    "each, middles share the remaining 20% - the "
    "discovery-and-closer-weighted alternative to linear_attribution "
    "(k=1 takes all, k=2 splits 50/50). Same trailing_band_join touch "
    "table (epoch-bucket EQUI join, hot-user fan-out bounded per "
    "band); positions come from a p_id-BOUNDED window ordered by "
    "(ts, event_id) - a purchase's touch list is band-bounded, never "
    "corpus-sized. Credits are exact micro-integers (the middle share "
    "floors via 200000 div (k-2)), so per-channel sums are "
    "order-independent; float 0.4/0.2/k credits would drift at the "
    "ulp.",
)
def position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from hadoop_fcfs_spark.caching import waypoint
    from hadoop_fcfs_spark.ops.joins import trailing_band_join

    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
    )
    e = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", F.col("event_type").alias("channel"),
        F.col("event_id").alias("tid"), "ts",
    )
    touches = waypoint(
        trailing_band_join(
            p, e, "p_user", "user_id", "p_ts", "ts", band_us=1_800_000_000
        ).select("p_id", "channel", F.unix_micros("ts").alias("us"), "tid")
    )
    w = Window.partitionBy("p_id")
    r = touches.select(
        "p_id", "channel",
        F.row_number().over(w.orderBy("us", "tid")).alias("pos"),
        F.count("*").over(w).cast("long").alias("kk"),
    )
    return r.groupBy("channel").agg(
        F.count("*").cast("long").alias("touches"),
        F.sum(
            F.expr(
                "CASE WHEN kk = 1 THEN 1000000 WHEN kk = 2 THEN 500000 "
                "WHEN pos = 1 OR pos = kk THEN 400000 "
                "ELSE 200000 div (kk - 2) END"
            )
        ).cast("long").alias("credit_micro"),
    )


@register(
    "watermark_late_audit",
    oracle="""
    WITH g AS (
      SELECT event_type, epoch_us(ts) AS us,
             MAX(epoch_us(ts)) OVER (ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wmax
      FROM events
      WHERE event_id IS NOT NULL AND ts IS NOT NULL
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) FILTER (wmax - 1800000000 > us) AS BIGINT)
             AS n_late,
           CAST(COALESCE(MAX(CASE WHEN wmax - 1800000000 > us
             THEN wmax - 1800000000 - us END), 0) AS BIGINT) AS max_late_us
    FROM g GROUP BY 1
    """,
    doc="Watermark drop-rule replay per event type "
    "(ops.timeseries.watermark_late_audit): with a 30-minute "
    "withWatermark delay (the sessionize gap convention) and arrival "
    "order = event_id (the ingestion sequence), which rows would "
    "Structured Streaming have DROPPED because their event time fell "
    "below max-event-time-seen minus the delay - the tuning audit "
    "run before choosing a delay (n_late is the silent data loss; "
    "max_late_us is how much more delay the worst row needed). The "
    "high-water mark is a STRICT prefix max in arrival order via "
    "ops.sort.global_running_max's range-partitioned two-level "
    "decomposition - never a single-task window over data rows (the "
    "oracle's unpartitioned window is the oracle's privilege); the "
    "first arrival has no watermark and cannot be late (NULL "
    "semantics on both engines).",
)
def watermark_late_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.timeseries import watermark_late_audit as wla

    ev = t(spark, sf_dir, "events")
    return wla(
        ev, "event_id", "ts", delay_us=1_800_000_000,
        group_cols=["event_type"],
    )


@register(
    "dedup_watermark_audit",
    oracle="""
    WITH g AS (
      SELECT event_type, user_id, event_id, epoch_us(ts) AS us,
             MAX(epoch_us(ts)) OVER (ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wmax
      FROM events
      WHERE event_id IS NOT NULL AND ts IS NOT NULL
        AND user_id IS NOT NULL AND event_type IS NOT NULL
    ),
    c AS (
      SELECT *, COALESCE(wmax - 1800000000 > us, FALSE) AS late FROM g
    ),
    s AS (
      SELECT event_type, us, wmax,
             LAG(us) OVER (PARTITION BY user_id, event_type
               ORDER BY event_id) AS pus
      FROM c WHERE NOT late
    ),
    la AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(*) FILTER (late) AS BIGINT) AS n_late
      FROM c GROUP BY 1
    ),
    du AS (
      SELECT event_type,
             CAST(COUNT(*) FILTER (pus IS NOT NULL
               AND COALESCE(wmax - 1800000000 <= pus + 1800000000, TRUE))
               AS BIGINT) AS n_dup
      FROM s GROUP BY 1
    )
    SELECT event_type, n_events, n_late, COALESCE(n_dup, 0) AS n_dup,
           n_events - n_late - COALESCE(n_dup, 0) AS n_emitted
    FROM la LEFT JOIN du USING (event_type)
    """,
    doc="dropDuplicatesWithinWatermark replay per event type "
    "(ops.timeseries.dedup_watermark_audit): with key = (user_id, "
    "event_type), a 30-minute delay, and arrival order = event_id, "
    "how many rows would streaming dedup have dropped as duplicates "
    "(previous surviving occurrence's state still alive: watermark "
    "<= prev_ts + delay) and how many the watermark would have "
    "discarded as LATE before dedup saw them - the state-sizing and "
    "loss audit run before picking the dedup delay, completing the "
    "streaming drop-rule pair with watermark_late_audit (that gate "
    "audits the lateness rule alone; this one composes it with the "
    "dedup state-expiry rule on the same high-water mark). The "
    "watermark is the SAME strict prefix max via "
    "ops.sort.global_running_max (ONE range exchange over data "
    "rows); the predecessor lookup is a per-key lag window (keys "
    "are data-grain, distributed); each surviving occurrence "
    "re-anchors the horizon (refresh-anchored replay). The ENGINE is "
    "measured FIRST-anchored on Spark 4.1 (probe test pins it), so "
    "audit n_dup >= engine drops, equal whenever dups fall within "
    "their first occurrence's horizon - direction documented at the "
    "op. The oracle's unpartitioned window is the oracle's "
    "privilege.",
)
def dedup_watermark_audit_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_fcfs_spark.ops.timeseries import dedup_watermark_audit

    ev = t(spark, sf_dir, "events")
    return dedup_watermark_audit(
        ev, "event_id", "ts", ["user_id", "event_type"],
        delay_us=1_800_000_000, group_cols=["event_type"],
    )
