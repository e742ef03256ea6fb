"""Rank aggregation: reciprocal rank fusion (Cormack et al. 2009) —
the standard way to combine heterogeneous retrieval signals (lexical
BM25, embedding cosine, recency, quality priors) without score
calibration: rrf(d) = Σ_lists 1 / (k + rank_list(d)).

Scale shape: each input ranking is already top-N-bounded by its
producer (TakeOrdered); fusion is a chain of outer equi-joins on the
item id over those bounded lists — broadcastable, no data-sized
shuffle. The fused score is a FIXED-ORDER sum of per-list terms
(coalesce per list, not an aggregation over rows), so it is
deterministic bit-for-bit for any list count — rankings built from
quantized scores keep the whole pipeline engine-replayable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reciprocal_rank_fusion(
    rankings: list[DataFrame], id_col: str, k: int = 60
) -> DataFrame:
    """Fuse rankings (each: id_col + integer ``rank``, rank ≥ 1) into
    (id_col, in_lists, rrf). Items missing from a list contribute 0 for
    it; ``in_lists`` counts memberships — a common downstream filter
    (require ≥2 signals)."""
    if not rankings:
        raise ValueError("need at least one ranking")
    sides = [
        r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(k) + F.col("rank"))).alias(f"__rrf_{i}"),
        )
        for i, r in enumerate(rankings)
    ]
    joined = reduce(lambda a, b: a.join(b, id_col, "full_outer"), sides)
    terms = [F.col(f"__rrf_{i}") for i in range(len(sides))]
    rrf = reduce(lambda a, b: a + F.coalesce(b, F.lit(0.0)),
                 terms[1:], F.coalesce(terms[0], F.lit(0.0)))
    in_lists = reduce(
        lambda a, b: a + b,
        [t.isNotNull().cast("int") for t in terms],
    )
    return joined.select(
        F.col(id_col), in_lists.alias("in_lists"), rrf.alias("rrf")
    )


def diversified_topk(
    df: DataFrame,
    order_cols: list,
    k: int,
    group_col: str,
    per_group_cap: int,
) -> DataFrame:
    """Global top-k with a per-group diversity cap: at most
    ``per_group_cap`` rows from any one ``group_col`` value may occupy
    the top-k — the result-diversification rule every search/feed
    ranking applies (a plain top-k lets one hot customer/domain flood
    the list). Equivalent to: rank within group, drop rows past the
    cap, then take the global top-k of the survivors.

    Scale shape: one key-bounded per-group window (row_number, cap
    filter prunes to ≤cap rows per group) followed by a global
    sort-limit — TakeOrderedAndProject, never a global window. Order
    columns must give a total order (include a unique id) for a
    deterministic result."""
    from pyspark.sql import Window

    if k < 1 or per_group_cap < 1:
        raise ValueError(f"k and per_group_cap must be >= 1, got {k}/{per_group_cap}")
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn("__gr", F.row_number().over(w))
        .filter(F.col("__gr") <= per_group_cap)
        .drop("__gr")
        .orderBy(*order_cols)
        .limit(k)
    )
