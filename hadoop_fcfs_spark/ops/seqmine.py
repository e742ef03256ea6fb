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
