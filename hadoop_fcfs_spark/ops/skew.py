"""Skew mitigation helpers.

The reference's analog is RehashPartitioner (defeating bad hashCodes,
``mr-core/mapreduce/lib/partition/RehashPartitioner.java:35``) plus
manual key design; at Spark scale the levers are AQE skew-join
(enabled in session.py) and explicit salting when a single group key
is too hot for one task.

``salted_agg`` is the classic two-stage aggregation: stage 1 aggregates
on (key, salt) — spreading a hot key over `salt_n` tasks — stage 2
merges the partials per key. Works for any algebraic aggregate
(sum/count/min/max); averages must be decomposed as sum+count by the
caller.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    partial_aggs: list[tuple[Column, str]],
    merge_aggs: list[tuple[str, str]],
    salt_n: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    partial_aggs: [(agg_expr_over_input, alias)] for stage 1.
    merge_aggs:   [(merge_fn_name, alias)] for stage 2, e.g.
                  [("sum", "cnt"), ("max", "mx")] — applied to the
                  stage-1 columns of the same alias.

    Salt = xxhash64(row cols, monotonically_increasing_id) % salt_n:
    the id term spreads BYTE-IDENTICAL rows (common in log data — and
    exactly the hot-key case this operator exists for) that a pure
    row-content hash would pile into one salt bucket. The id makes the
    salt nondeterministic across recomputations, which is safe here:
    stage 2 re-merges per key, so ANY salt assignment yields the same
    final aggregate (each row still contributes exactly once).
    """
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns], F.monotonically_increasing_id()),
        F.lit(salt_n),
    ).alias("__salt")
    stage1 = df.select(*df.columns, salt).groupBy(*group_cols, "__salt").agg(
        *[expr.alias(alias) for expr, alias in partial_aggs]
    )
    merged = stage1.groupBy(*group_cols).agg(
        *[getattr(F, fn)(alias).alias(alias) for fn, alias in merge_aggs]
    )
    return merged


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the BIG (skewed) side per row, replicate
    the small side across all ``salt_n`` salt values, join on
    (keys + salt). A key holding 30% of the big table spreads over
    ``salt_n`` tasks instead of melting one.

    This is the manual form of what AQE skew-join does at runtime
    (session.py enables AQE); keep it for the cases AQE can't see —
    skew introduced mid-query by a prior operator, or a small side just
    above the broadcast threshold. Replication multiplies the small
    side by ``salt_n``: only use when |small| * salt_n stays shuffle-
    friendly. Supports inner and left joins (the replicated-right outer
    variants would need a post-dedup; refuse rather than mis-answer).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    dup = set(big.columns) & (set(small.columns) - set(on))
    if dup:
        raise ValueError(f"ambiguous non-key columns on both sides: {sorted(dup)}")
    # id term spreads byte-identical hot-key rows (see salted_agg); safe
    # because the small side is replicated across EVERY salt value, so any
    # per-row salt joins correctly.
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns], F.monotonically_increasing_id()),
        F.lit(salt_n),
    )
    bs = big.withColumn("__salt", salt)
    ss = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)).cast("array<long>")))
    return bs.join(ss, [*on, "__salt"], how).drop("__salt")
