"""Sort / top-k / secondary-sort operators.

Parity targets (SURVEY.md §2.5):
- Global total-order sort: ``TotalOrderPartitioner`` + ``InputSampler``
  (reference ``mr-core/mapreduce/lib/partition/TotalOrderPartitioner.java:50``,
  ``InputSampler.java:57``). ``df.orderBy`` runs Spark's RangePartitioner,
  which does the same sample→split-points→route dance internally; output
  part files concatenate to a globally sorted dataset (the TeraSort
  contract, ``examples/terasort/TeraSort.java:43-56``).
- Top-k: the reference idiom is a single-reducer sorted job
  (``examples/Grep.java:82-84``); Spark's ``orderBy().limit(k)`` compiles
  to TakeOrderedAndProject — per-partition heaps + driver merge, no
  single-node sort of the full data.
- Secondary sort (``examples/SecondarySort.java:51``): partition+group on
  k1, order values by k2 within the group. Exposed two ways:
  ``grouped_sorted_apply`` reproduces the reference's "reducer iterates
  values in k2 order" contract via repartition+sortWithinPartitions+
  applyInPandas; window analytics cover the common uses natively.
- ``KeyFieldBasedComparator`` specs (``.../partition/KeyFieldBasedComparator.java:53``,
  Unix ``sort -k m.n [nr]``) compile to expression sort keys.

Scale: orderBy is the only all-data shuffle here; everything else is
hash-partitioned by group key. No driver-side collection anywhere.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def total_order_sort(df: DataFrame, *keys: Column | str) -> DataFrame:
    """Global sort — RangePartitioner samples keys and routes ranges,
    the built-in equivalent of InputSampler.writePartitionFile +
    TotalOrderPartitioner."""
    return df.orderBy(*keys)


def top_k(df: DataFrame, k: int, *keys: Column | str) -> DataFrame:
    """orderBy+limit → TakeOrderedAndProject (distributed heap top-k)."""
    return df.orderBy(*keys).limit(k)


def grouped_sorted_apply(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    output_schema: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """The reference's reduce contract: per group-key, the user function
    sees rows ordered by `order_cols` (sort comparator ≠ grouping
    comparator, ``Job.java:978,993``; group iteration
    ``mr-core/mapreduce/task/ReduceContextImpl.java:131,158``).

    Spark's groupBy does NOT order values (SURVEY §4.2) — this wrapper
    makes the contract explicit: hash-repartition on the group key, sort
    within partitions by (group, order), then applyInPandas receives each
    group as an ordered pandas DataFrame. Arrow-batched; scales with the
    number of groups.
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    arranged = df.repartition(parts, *group_cols).sortWithinPartitions(*group_cols, *order_cols)
    # applyInPandas re-groups; the sort guarantees intra-group order is
    # already established so pandas receives rows in order.
    return arranged.groupBy(*group_cols).applyInPandas(fn, schema=output_schema)


def key_field_sort_keys(
    input_col: str, spec: list[tuple[int, bool, bool]], separator: str = " "
) -> list[Column]:
    """Compile a KeyFieldBasedComparator-style spec into expression sort
    keys: each item = (0-based field index, numeric?, reverse?) — the
    ``sort -k m[nr]`` subset. Arbitrary byte comparators are out of scope
    by design (SURVEY §7.3); sortable derived columns are the boundary.
    """
    import re

    arr = F.split(F.col(input_col), re.escape(separator), -1)
    keys = []
    for idx, numeric, reverse in spec:
        c = F.element_at(arr, idx + 1)
        if numeric:
            c = c.cast("double")
        keys.append(c.desc() if reverse else c.asc())
    return keys
