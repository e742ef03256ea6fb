"""Re-aggregatable sketch tier: HyperLogLog partial sketches + rollup.

The 100 TB pattern this exists for: you cannot afford to re-scan the
corpus for every distinct-count slice, so you materialize SKETCHES at a
fine grain once (one corpus scan, map-side partial aggregation, a few
KB per group) and answer every coarser rollup by UNIONING sketches —
never touching the raw data again. Spark ships Apache DataSketches HLL
as built-in aggregates (hll_sketch_agg / hll_union_agg /
hll_sketch_estimate), all JVM-side and mergeable across partitions —
the same algebraic-aggregate contract the reference's combiner
machinery (mapreduce.lib.aggregate, ValueAggregator.java:29) expresses
for sum/max/min, extended to the sketch algebra.

Estimates carry a relative standard error of ~1.04/sqrt(2^lgk)
(~1.6% at the default lgk=12); gates therefore assert a BOUND
(|approx-exact| <= tol*exact) rather than equality — the bound itself
is the oracled value, so a regression that degrades the sketch beyond
its contract fails the value-hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_partial(
    df: DataFrame, group_cols: list[str], value_col: str, lgk: int = 12
) -> DataFrame:
    """One corpus scan → a binary HLL sketch per group (columns:
    group_cols + `hll_sketch`). This is the materialization step: store
    it partitioned by the finest grain you'll ever roll up from."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("hll_sketch")
    )


def hll_rollup(
    partial: DataFrame, group_cols: list[str], sketch_col: str = "hll_sketch"
) -> DataFrame:
    """Roll partial sketches up to a coarser grain WITHOUT rescanning:
    union-merge the sketches, then estimate. Output: group_cols +
    `approx_distinct` (long)."""
    return partial.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias("approx_distinct")
    )
