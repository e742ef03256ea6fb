"""Sequential pattern mining over event streams: the "what do users do
next" workload — top navigation paths, funnel discovery input, Markov
chain estimation at n > 2 (ops/ queries event_transitions is the n=2
case).

Scale shape: sessions are numbered with the lag+cumsum gap split
(user-bounded windows, one shuffle on the user key), n-grams come from
LEAD within (user, session) — the same partition, NO second shuffle
(Catalyst reuses the user-key exchange for both window layers), and
the path counts partial-aggregate map-side. Top-k is TakeOrdered —
never a full sort of the path space.

Reference analog: secondary sort (user, ts) + per-reducer sliding
window over the value stream — the canonical MapReduce sequence
pattern (mr-core/.../mapreduce/lib/partition/
KeyFieldBasedPartitioner.java grouping idiom).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def session_ngram_paths(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    step_col: str,
    order_tiebreak: str | Column,
    n: int = 3,
    gap_minutes: int = 30,
) -> DataFrame:
    """Count length-``n`` step sequences that occur CONSECUTIVELY inside
    a session (sessions split on gaps > gap_minutes, ordered by
    (ts, tiebreak) so ties can't flip paths between runs or engines).
    Output: step_1..step_n + path_count.
    """
    w_user = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    us = F.unix_micros(F.col(ts_col))
    gap_us = us - F.lag(us).over(w_user)
    is_new = F.when(
        gap_us.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), 1
    ).otherwise(0)
    sess = events.withColumn("__sid", F.sum(is_new).over(w_user))
    w_sess = Window.partitionBy(user_col, "__sid").orderBy(ts_col, order_tiebreak)
    steps = sess.select(
        F.col(step_col).alias("step_1"),
        *[
            F.lead(step_col, i).over(w_sess).alias(f"step_{i + 1}")
            for i in range(1, n)
        ],
    ).filter(F.col(f"step_{n}").isNotNull())
    return steps.groupBy(*[f"step_{i + 1}" for i in range(n)]).agg(
        F.count("*").alias("path_count")
    )


def frequent_subsequences(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    step_col: str,
    order_tiebreak: str | Column,
    min_support_num: int,
    min_support_den: int,
    session_gap_minutes: int | None = None,
) -> DataFrame:
    """Gap-allowed frequent 3-step subsequences (the PrefixSpan / GSP
    sequential-pattern family, level 3): support(a,b,c) = number of
    users with SOME occurrence of a, then later some b, then later some
    c — steps need not be adjacent (session_ngram_paths counts only
    CONSECUTIVE runs; this is the order-only relaxation funnel mining
    actually wants). With ``session_gap_minutes`` set, the containment
    must happen INSIDE one session (gap-split like sessionize); support
    still counts distinct users. The support threshold is RELATIVE —
    keep (a,b,c) iff den·support ≥ num·n_users, tested by exact integer
    cross-multiplication so no float share decides a boundary pattern
    and the same fraction discriminates at every data scale.

    Scale shape — no per-event quadratic anywhere:
      * positions + session ids come from ONE user-key window stack
        (row_number / lag+cumsum share the exchange);
      * per (user, session, step) collapse to (first_pos, last_pos,
        sorted_pos_list) — the type grain;
      * a unit contains (a,b,c) iff pos_b has an element strictly
        between first_pos(a) and last_pos(c) — an EXISTS over the
        type-grain arrays, never a positional self-join;
      * Apriori prune (support is anti-monotone for subsequences) —
        candidate triples come only from frequent pairs, broadcast, so
        the verify join is bounded by surviving candidates, not
        |steps|³.

    Output: (step_a, step_b, step_c, support). Reference analog: the
    MR sequential-pattern chain (candidate-generation job +
    support-count job)."""
    if min_support_num <= 0 or min_support_den <= 0:
        raise ValueError("min_support fraction must be positive")
    w_user = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    if session_gap_minutes is not None:
        gap_us = session_gap_minutes * 60_000_000
        us = F.unix_micros(F.col(ts_col))
        is_new = F.when(
            F.lag(us).over(w_user).isNull()
            | ((us - F.lag(us).over(w_user)) > gap_us),
            1,
        ).otherwise(0)
        sid = F.sum(is_new).over(
            w_user.rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        sid = F.lit(0)
    from hadoop_fcfs_spark.caching import waypoint

    typed = events.select(
        F.col(user_col).alias("u"),
        sid.alias("sid"),
        F.col(step_col).alias("s"),
        F.row_number().over(w_user).alias("p"),
    )
    # the type grain feeds SIX consumers (ga/gb/gc/gbl + both pair
    # sides) — Catalyst re-derives common subplans per consumer, so an
    # unpersisted grain re-scans (and re-windows) the raw events once
    # per consumer
    g = waypoint(
        typed.groupBy("u", "sid", "s").agg(
            F.min("p").alias("fp"),
            F.max("p").alias("lp"),
            F.sort_array(F.collect_list("p")).alias("pl"),
        )
    )
    # every user has >= 1 event, so the persisted grain already holds
    # the exact distinct-user set — counting from it avoids a second
    # full scan of the raw events table
    n_users = g.select("u").distinct().agg(F.count("*").alias("__nu"))
    keep = lambda sup: min_support_den * sup >= min_support_num * F.col("__nu")  # noqa: E731
    ga = g.select("u", "sid", F.col("s").alias("a"), F.col("fp").alias("fa"))
    gb = g.select("u", "sid", F.col("s").alias("b"), F.col("lp").alias("lb"))
    # 2-seq containment: first_pos(a) < last_pos(b) within the unit
    # (covers a == b: first < last <=> the step occurs at least twice)
    pairs = (
        ga.join(gb, ["u", "sid"])
        .filter(F.col("fa") < F.col("lb"))
        .select("u", "a", "b")
        .distinct()
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("n2"))
    )
    freq2 = pairs.crossJoin(F.broadcast(n_users)).filter(keep(F.col("n2")))
    cand = (
        freq2.select(F.col("a"), F.col("b"))
        .join(
            freq2.select(F.col("a").alias("b"), F.col("b").alias("c")),
            "b",
        )
        .select("a", "b", "c")
    )
    gc = g.select("u", "sid", F.col("s").alias("c"), F.col("lp").alias("lc"))
    gbl = g.select("u", "sid", F.col("s").alias("b"), F.col("pl").alias("plb"))
    per_user = (
        ga.join(gbl, ["u", "sid"])
        .join(gc, ["u", "sid"])
        .join(F.broadcast(cand), ["a", "b", "c"])
        .filter(
            F.exists(
                F.col("plb"),
                lambda x: (x > F.col("fa")) & (x < F.col("lc")),
            )
        )
        .select("u", "a", "b", "c")
        .distinct()
    )
    return (
        per_user.groupBy("a", "b", "c")
        .agg(F.count("*").cast("long").alias("support"))
        .crossJoin(F.broadcast(n_users))
        .filter(keep(F.col("support")))
        .select(
            F.col("a").alias("step_a"),
            F.col("b").alias("step_b"),
            F.col("c").alias("step_c"),
            "support",
        )
    )


def funnel_steps(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
    within_us: int | None = None,
) -> DataFrame:
    """Ordered-funnel conversion: for a step sequence [s1, s2, ...],
    a user reaches step i when an s_i event exists STRICTLY AFTER the
    moment they reached step i-1 (earliest-first semantics: t1 =
    min ts of s1, t_i = min ts of s_i with ts > t_{i-1}), optionally
    within ``within_us`` microseconds of it (the per-step conversion
    window every product funnel carries — without one, any long event
    log converts everybody eventually). Returns one row per step:
    (step, step_name, n_users, conversion_micro) with conversion
    measured against the step-1 population.

    All time arithmetic happens in unix MICROSECONDS as BIGINTs —
    matching the nanos→micros truncation tables.t applies to the
    events scan, so engine and oracle compare identical integers (a
    raw nanos ORDER BY would tie-break differently than Spark's
    truncated timestamps).

    Scale shape: stage i is one user-key aggregation of the s_i slice
    joined to the (user, t_{i-1}) frontier — the frontier is user-grain
    (shrinking monotonically), every join and groupBy shares the user
    key, and the per-step counts are scalar aggregates over frontier
    rows. The event log is scanned once per step but each scan prunes
    to one event_type (predicate reaches the parquet scan); no window
    functions, no per-user event materialization. Reference parity:
    the chained secondary-sort jobs a MapReduce funnel takes — one
    job per step, reducer keeps min qualifying ts per user.
    """
    if len(steps) < 2:
        raise ValueError(f"need >= 2 funnel steps, got {len(steps)}")
    if within_us is not None and within_us < 1:
        # a zero/negative window can never qualify a step — loud beats a
        # silently-empty funnel
        raise ValueError(f"within_us must be >= 1, got {within_us}")
    from functools import reduce

    from hadoop_fcfs_spark.caching import waypoint

    base = events.select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("__t"),
        F.unix_micros(F.col(ts_col)).alias("__us"),
    )
    frontier = waypoint(
        base.filter(F.col("__t") == steps[0])
        .groupBy("__u")
        .agg(F.min("__us").alias("__prev"))
    )
    counts = [
        frontier.agg(
            F.lit(1).cast("int").alias("step"),
            F.lit(steps[0]).alias("step_name"),
            F.count("*").cast("long").alias("n_users"),
        )
    ]
    for i, s in enumerate(steps[1:], start=2):
        qual = F.col("__us") > F.col("__prev")
        if within_us is not None:
            qual = qual & (F.col("__us") <= F.col("__prev") + int(within_us))
        frontier = waypoint(
            base.filter(F.col("__t") == s)
            .join(frontier, "__u")
            .filter(qual)
            .groupBy("__u")
            .agg(F.min("__us").alias("__prev"))
        )
        counts.append(
            frontier.agg(
                F.lit(i).cast("int").alias("step"),
                F.lit(s).alias("step_name"),
                F.count("*").cast("long").alias("n_users"),
            )
        )
    funnel = reduce(lambda a, b: a.unionByName(b), counts)
    first = funnel.filter(F.col("step") == 1).select(
        F.col("n_users").alias("__n1")
    )
    return funnel.crossJoin(F.broadcast(first)).selectExpr(
        "step", "step_name", "n_users",
        "CASE WHEN __n1 > 0 THEN "
        "CAST((n_users * 1000000) div __n1 AS BIGINT) END AS conversion_micro",
    )
