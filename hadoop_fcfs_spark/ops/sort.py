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


def ranked_total_order(
    df: DataFrame,
    keys: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Globally sorted output with a materialized 1-based global rank,
    WITHOUT the single-partition ``row_number().over(Window.orderBy(...))``
    scale-killer (one WindowExec task swallowing the whole table).

    Two-level decomposition (the ``llm/packing.py`` prefix-sum shape,
    applied to ranking):
      1. ``repartitionByRange`` on the sort keys — the one full-data
         shuffle, identical to what a plain global sort pays — then
         ``sortWithinPartitions``. Range partition ids are ordered by
         key, so partition p holds exactly the ranks after all rows of
         partitions < p.
      2. Per-partition enumeration via ``monotonically_increasing_id()``:
         the id is ``(partition_index << 33) | row_index_in_partition``,
         assigned AFTER the sort (nondeterministic expressions are not
         pushed through sorts), so it yields both the partition id and
         the local 0-based rank in pure JVM codegen — no extra shuffle,
         no Python.
      3. Offsets = exclusive prefix sum over the per-partition COUNTS —
         a single-partition window over #partitions summary rows only —
         broadcast-joined back.

    Ranks equal the unpartitioned-window ranks whenever the keys form a
    total order (add a unique tiebreaker otherwise, as with any
    row_number).

    The enumerated table is a tracked persist waypoint
    (``caching.waypoint``): it feeds both the count summary and the
    final join, and its lineage is nondeterministic (range sampling +
    monotonically_increasing_id) — re-derivation per branch could
    disagree, so it must materialize once.
    """
    from pyspark.sql import Window

    from hadoop_fcfs_spark.caching import waypoint

    parts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    mid = F.monotonically_increasing_id()
    local = waypoint(
        df.repartitionByRange(int(parts), *keys)
        .sortWithinPartitions(*keys)
        .withColumn("__mid", mid)
        .withColumn("__pid", F.shiftright("__mid", 33))
        .withColumn("__loc", F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1)))
    )
    counts = local.groupBy("__pid").agg(F.count("*").alias("__n"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__n").over(w_off), F.lit(0))
    ).select("__pid", "__off")
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__loc") + F.col("__off") + 1).cast("int"))
        .drop("__mid", "__pid", "__loc", "__off")
    )


def global_running_sum(
    df: DataFrame,
    keys: list[Column | str],
    value_col: str | list[str],
    out_col: str | list[str] = "running",
    inclusive: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global (ungrouped) running sum of ``value_col`` over the total
    order given by ``keys`` — WITHOUT the unpartitioned
    ``sum().over(Window.orderBy(...))`` that drags the whole input
    through one WindowExec task.

    Same two-level decomposition as ``ranked_total_order``:
    ``repartitionByRange`` on the keys (range partition ids are ordered
    by key, and rows with equal keys land in one partition), local
    prefix sums inside each sorted partition (partition-bounded
    windows), then per-partition totals prefix-summed — a
    single-partition window over #partitions SUMMARY rows only — and
    broadcast-joined back as offsets. ``inclusive=False`` yields the
    exclusive prefix sum (0 for each partition's first row).

    ``value_col``/``out_col`` accept parallel LISTS to carry several
    running sums through ONE range shuffle + one offsets broadcast —
    two-column consumers (KS ECDFs, log-rank risk sets) must not pay
    the scan twice.

    Keys must form a total order for a deterministic result (ties share
    no defined order, as with any running sum). The enumerated table is
    a persist waypoint: its lineage is nondeterministic (range sampling
    + monotonically_increasing_id) and it feeds both the totals and the
    final join."""
    from pyspark.sql import Window

    from hadoop_fcfs_spark.caching import waypoint

    vcols = [value_col] if isinstance(value_col, str) else list(value_col)
    ocols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(vcols) != len(ocols):
        raise ValueError(
            f"value_col/out_col length mismatch: {vcols} vs {ocols}"
        )
    parts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    local = waypoint(
        df.repartitionByRange(int(parts), *keys)
        .sortWithinPartitions(*keys)
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.shiftright("__mid", 33))
    )
    end = 0 if inclusive else -1
    w_local = (
        Window.partitionBy("__pid")
        .orderBy("__mid")
        .rowsBetween(Window.unboundedPreceding, end)
    )
    totals = local.groupBy("__pid").agg(
        *[F.sum(v).alias(f"__tot_{i}") for i, v in enumerate(vcols)]
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        *[
            F.coalesce(F.sum(f"__tot_{i}").over(w_off), F.lit(0)).alias(
                f"__off_{i}"
            )
            for i in range(len(vcols))
        ],
    )
    out = local
    for i, v in enumerate(vcols):
        out = out.withColumn(
            f"__lsum_{i}", F.coalesce(F.sum(v).over(w_local), F.lit(0))
        )
    out = out.join(F.broadcast(offsets), "__pid")
    for i, o in enumerate(ocols):
        out = out.withColumn(o, F.col(f"__lsum_{i}") + F.col(f"__off_{i}"))
    return out.drop(
        "__mid", "__pid",
        *[f"__lsum_{i}" for i in range(len(vcols))],
        *[f"__off_{i}" for i in range(len(vcols))],
    )


def global_running_max(
    df: DataFrame,
    keys: list[Column | str],
    value_col: str,
    out_col: str = "running_max",
    inclusive: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global running MAX of ``value_col`` over the total order given
    by ``keys`` — the :func:`global_running_sum` decomposition with
    max as the combine (max is associative and idempotent, so the
    same two-level split is exact): range partition on the keys,
    local prefix max inside each sorted partition, per-partition
    totals prefix-maxed (single-partition window over #partitions
    SUMMARY rows only), broadcast-joined back and combined with
    ``greatest``. The high-water-mark primitive: streaming watermark
    replay, drawdown analysis, record-to-date scans.

    ``inclusive=False`` gives the strict prefix (max over EARLIER
    rows only): NULL for the global first row — callers get NULL
    semantics, not a sentinel. Keys must form a total order."""
    from pyspark.sql import Window

    from hadoop_fcfs_spark.caching import waypoint

    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    local = waypoint(
        df.repartitionByRange(int(parts), *keys)
        .sortWithinPartitions(*keys)
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.shiftright("__mid", 33))
    )
    end = 0 if inclusive else -1
    w_local = (
        Window.partitionBy("__pid")
        .orderBy("__mid")
        .rowsBetween(Window.unboundedPreceding, end)
    )
    totals = local.groupBy("__pid").agg(F.max(value_col).alias("__tot"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid", F.max("__tot").over(w_off).alias("__off")
    )
    return (
        local.withColumn("__lmax", F.max(value_col).over(w_local))
        .join(F.broadcast(offsets), "__pid")
        # greatest() ignores NULL sides (NULL only when both are)
        .withColumn(out_col, F.greatest("__lmax", "__off"))
        .drop("__mid", "__pid", "__lmax", "__off")
    )


def ntile_from_rank(rank: Column, n: int, k: int) -> Column:
    """Exact SQL ``NTILE(k)`` bucket from a 1-based global rank over ``n``
    rows — so the single-task ``NTILE() OVER (ORDER BY ...)`` window can be
    replaced by ``ranked_total_order`` + this per-row expression.

    NTILE front-loads the remainder: with ``q = n DIV k``, ``r = n MOD k``,
    the first ``r`` buckets hold ``q+1`` rows and the rest hold ``q``. The
    equi-width formula ``(rank-1)*k DIV n + 1`` spreads the remainder
    instead and diverges whenever ``n % k != 0`` (e.g. n=23, k=10).
    """
    if n <= 0 or k <= 0:
        raise ValueError(f"ntile_from_rank needs n>0 and k>0, got n={n} k={k}")
    q, r = divmod(n, k)
    if q == 0:  # fewer rows than buckets: bucket == rank
        return rank.cast("int")
    cut = (q + 1) * r  # ranks 1..cut fall in the r wide buckets
    wide = F.floor((rank - 1) / F.lit(q + 1)) + 1
    narrow = F.lit(r) + F.floor((rank - 1 - cut) / F.lit(q)) + 1
    return F.when(rank <= cut, wide).otherwise(narrow).cast("int")


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


def latest_by_key(
    df: DataFrame, key_cols: list[str], order_cols: list[Column | str]
) -> DataFrame:
    """Keep the single latest/winning record per key — the log-compaction
    / CDC-upsert idiom (the reference idiom is a secondary-sorted reduce
    that emits only the first value per key group,
    ``examples/SecondarySort.java:51`` reversed). ``order_cols`` are the
    recency order, HIGHEST first wins; include a unique tiebreaker for
    determinism. The rank()=1 filter compiles to WindowGroupLimit on
    Spark 4, so per-group state is O(1) — no full sort of the group."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return df.withColumn("__rk", F.row_number().over(w)).filter(F.col("__rk") == 1).drop("__rk")


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


def chunked_running_sum(
    df: DataFrame,
    group_cols: list[str],
    chunk_col: Column,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running",
) -> DataFrame:
    """Scale-safe grouped running (inclusive prefix) sum — the
    llm/packing.py two-level scan generalized: a plain
    ``sum().over(Window.partitionBy(group).orderBy(...))`` puts each
    group's ENTIRE history through one task, which melts when a group is
    corpus-sized (a hot event_type, a whole-table scan with one group).

    Level 1 windows within (group, chunk) — parallel across chunks of
    the same group; level 2 computes per-(group, chunk) totals and
    prefix-sums THOSE (a per-group window over chunk-summary rows only),
    joining the offsets back. ``chunk_col`` must be a deterministic
    value-based bucketing of the order columns (e.g. the day of a
    timestamp) so chunk order agrees with row order.

    The offsets table has one row per (group, chunk) — usually tiny, but
    with high-cardinality group_cols it can be data-sized, so the join
    strategy is left to AQE (which broadcasts when the built side is
    small) rather than forced with a broadcast hint that could exceed
    executor memory.
    """
    from pyspark.sql import Window

    chunked = df.withColumn("__chunk", chunk_col)
    w_local = (
        Window.partitionBy(*group_cols, "__chunk")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = chunked.withColumn("__local", F.sum(value_col).over(w_local))
    # Totals aggregate over `local`, not `chunked`: same rows and the
    # same (group, chunk) grain, but `local` is already exchanged and
    # sorted by the window, so the aggregation rides that partitioning
    # — deriving totals from `chunked` re-evaluated the whole upstream
    # subtree a second time (one extra corpus-sized pass at scale).
    totals = local.groupBy(*group_cols, "__chunk").agg(
        F.sum(value_col).alias("__tot")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__tot").over(w_off), F.lit(0))
    ).select(*group_cols, "__chunk", "__off")
    return (
        local.join(offsets, [*group_cols, "__chunk"])
        .withColumn(out_col, F.col("__local") + F.col("__off"))
        .drop("__chunk", "__local", "__off")
    )
