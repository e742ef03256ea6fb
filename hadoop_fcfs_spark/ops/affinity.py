"""Market-basket affinity: co-occurrence pairs + lift over
transaction-grouped items — the Amazon-style co-purchase kernel that
was a flagship Hadoop-era batch workload (the "stripes" pattern of
Lin & Dyer applied to baskets instead of token windows;
the reference's aggregate framework would express the counts as
ValueAggregator jobs, mr-core/mapreduce/lib/aggregate/
ValueAggregatorJob.java:66).

Scale shape: items collapse to one sorted distinct array PER BASKET
(groupBy basket — map-side combined, basket-bounded rows), pairs are
generated INSIDE the array (nested transform + flatten, one explode —
never a basket self-join), and the pair count aggregation partial-
combines. The quadratic term is bounded by max basket size squared —
cap with ``max_basket`` to keep a pathological mega-basket from
dominating (dropped baskets are the standard practice: a basket with
10k items carries no affinity signal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _baskets(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket: int | None,
) -> DataFrame:
    """Shared basket collapse: one sorted distinct item array per basket
    (map-side combined), oversized baskets dropped. Every pair/triple
    generator in this module starts here — keep the collapse in ONE
    place so the dedup/cap semantics can't drift between them.

    No pre-``distinct()``: collect_set already deduplicates per basket,
    and a distinct here would add a SECOND full shuffle (distinct
    exchange + groupBy exchange) on every pair/triple/RA path. Cap
    semantics are unchanged — sizes are measured on the deduped array."""
    baskets = df.select(basket_col, item_col).groupBy(basket_col).agg(
        F.sort_array(F.collect_set(item_col)).alias("__items")
    )
    if max_basket is not None:
        baskets = baskets.filter(F.size("__items") <= max_basket)
    return baskets


def _ordered_pairs(arr):
    """(item_a < item_b) pair structs generated INSIDE the sorted array
    — the one subtle slice/index expression, defined once."""
    return F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + F.lit(2), F.size(arr)),
                lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
            ),
        )
    )



def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket: int | None = None,
) -> DataFrame:
    """Unordered item pairs co-present in a basket → (item_a, item_b,
    pair_count) with item_a < item_b; each basket contributes each pair
    at most once (distinct items per basket)."""
    baskets = _baskets(df, basket_col, item_col, max_basket)
    return (
        baskets.select(F.explode(_ordered_pairs(F.col("__items"))).alias("p"))
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("pair_count"))
    )


def basket_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket: int | None = None,
) -> DataFrame:
    """Pair counts + LIFT = P(a,b) / (P(a)·P(b)) over baskets: > 1 means
    the items co-occur more than independence predicts — the affinity
    score item-item recommenders rank by. Adds (count_a, count_b,
    lift); item marginals and the basket total re-aggregate from the
    per-basket distinct item table (one scan of it, never of raw
    rows)."""
    from hadoop_fcfs_spark.caching import waypoint

    # distinct (basket, item) feeds pairs, marginals AND the total:
    # persist one materialization
    bi = waypoint(df.select(basket_col, item_col).distinct())
    pairs = basket_pairs(bi, basket_col, item_col, max_basket=max_basket)
    marg = bi.groupBy(F.col(item_col)).agg(F.count("*").alias("__c"))
    n = bi.agg(F.countDistinct(basket_col).cast("long").alias("__n"))
    ma = marg.select(F.col(item_col).alias("item_a"), F.col("__c").alias("count_a"))
    mb = marg.select(F.col(item_col).alias("item_b"), F.col("__c").alias("count_b"))
    lift = (
        F.col("__n").cast("double")
        * F.col("pair_count")
        / F.col("count_a")
        / F.col("count_b")
    )
    return (
        pairs.join(ma, "item_a")
        .join(mb, "item_b")
        .crossJoin(F.broadcast(n))
        .select(
            "item_a", "item_b", "pair_count", "count_a", "count_b",
            lift.alias("lift"),
        )
    )


def frequent_triples(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int,
    max_basket: int | None = None,
) -> DataFrame:
    """Apriori frequent 3-itemsets: unordered item triples co-present in
    ≥ ``min_support`` baskets → (item_a < item_b < item_c, support).

    Apriori pruning, distributed: items below min_support are dropped
    BEFORE triple generation (monotonicity: a triple's support is ≤
    every member item's support, so pruning never changes the answer —
    it only shrinks the cubic term). The prune is a semi-join of the
    distinct (basket, item) table against the frequent-item table, so
    no driver-side frequent-set materialization at any item
    cardinality. Triples are then generated INSIDE each basket's sorted
    pruned array (three nested transforms, one explode — never a
    basket³ self-join), bounded by max_basket³; the count aggregation
    partial-combines map-side."""
    from hadoop_fcfs_spark.caching import waypoint

    bi = waypoint(df.select(basket_col, item_col).distinct())
    freq = bi.groupBy(item_col).agg(F.count("*").alias("__c")).filter(
        F.col("__c") >= min_support
    )
    pruned = bi.join(freq.select(item_col), item_col, "left_semi")
    baskets = pruned.groupBy(basket_col).agg(
        F.sort_array(F.collect_set(item_col)).alias("__items")
    )
    if max_basket is not None:
        baskets = baskets.filter(F.size("__items") <= max_basket)
    arr = F.col("__items")
    triples = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.flatten(
                F.transform(
                    F.slice(arr, i + F.lit(2), F.size(arr)),
                    lambda y, j: F.transform(
                        F.slice(arr, i + j + F.lit(3), F.size(arr)),
                        lambda z: F.struct(
                            x.alias("item_a"), y.alias("item_b"), z.alias("item_c")
                        ),
                    ),
                )
            ),
        )
    )
    return (
        baskets.select(F.explode(triples).alias("t"))
        .select("t.item_a", "t.item_b", "t.item_c")
        .groupBy("item_a", "item_b", "item_c")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= min_support)
    )


def resource_allocation_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket: int | None = None,
) -> DataFrame:
    """Resource-Allocation link-prediction score over item pairs that
    share baskets: RA(a,b) = Σ over shared baskets of 1/|basket| (Zhou,
    Lü & Zhang 2009) — the common-neighbor weighting where a HUGE
    shared hub contributes almost nothing and a small exclusive basket
    contributes a lot. The ranking complement to basket_lift (lift
    normalizes by item popularity; RA discounts hub promiscuity), and
    the exactly-computable stand-in for Adamic-Adar (whose 1/log(d)
    weight needs a transcendental that is not correctly rounded
    cross-engine; 1/d is an exact rational).

    Per-basket weight is quantized to BIGINT micro-units with integer
    division (1_000_000 div d — floor division exact in any engine), so
    pair scores are EXACT integer sums, order-independent. Pair
    generation happens INSIDE each basket's sorted distinct array (one
    explode, never a basket self-join); quadratic bounded by
    max_basket². Output: (item_a < item_b, ra_e6, n_shared)."""
    baskets = _baskets(df, basket_col, item_col, max_basket).withColumn(
        "__w", F.expr("1000000 div size(__items)").cast("long")
    )
    return (
        baskets.select(
            F.explode(_ordered_pairs(F.col("__items"))).alias("p"), "__w"
        )
        .select("p.item_a", "p.item_b", "__w")
        .groupBy("item_a", "item_b")
        .agg(
            F.sum("__w").cast("long").alias("ra_e6"),
            F.count("*").cast("long").alias("n_shared"),
        )
    )


def basket_partners(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket: int | None = None,
) -> DataFrame:
    """DIRECTED co-occurrence counts: (item_a, item_b≠item_a,
    pair_count) — both directions of every co-present pair, the shape
    item-centric recommenders rank ("customers who bought A also
    bought …" needs A's partners, not unordered pairs). Same in-array
    generation as basket_pairs (one explode, quadratic bounded by
    max_basket²), each basket counting a partner pair at most once."""
    baskets = _baskets(df, basket_col, item_col, max_basket)
    arr = F.col("__items")
    pairs = F.flatten(
        F.transform(
            arr,
            lambda x: F.transform(
                F.filter(arr, lambda y: y != x),
                lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
            ),
        )
    )
    return (
        baskets.select(F.explode(pairs).alias("p"))
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("pair_count"))
    )
