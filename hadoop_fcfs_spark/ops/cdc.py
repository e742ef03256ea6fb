"""Change-data-capture shapes: SCD Type-2 dimension building.

Companion to the latest-by-key compaction gate (SCD Type-1 /
last-write-wins, queries_relational.latest_event_per_user). Type 2
keeps every historical value as a validity interval — the warehouse
pattern for "what was this attribute at time T" joins (pairs with
ops/joins.as_of_join for the lookup side).

Scale shape: two key-partitioned windows (change collapse, then
interval stitching) — state is per-key and bounded by that key's
change count; no global sort, no driver state. Skewed keys (one
entity with millions of changes) are real but rare in dimension
streams; pre-split such keys by epoch if they appear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changes(
    changes: DataFrame,
    key: str,
    ts_col: str,
    attr: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Build an SCD Type-2 versioned dimension from a change stream.

    Consecutive rows with the same ``attr`` value per key collapse
    (no-op updates produce no version); each surviving change opens an
    interval [valid_from, valid_to) closed by the next change, with the
    latest version carrying valid_to = NULL and is_current = true.
    ``tiebreak`` orders same-timestamp changes deterministically
    (required for engine-replayable output when ts has duplicates).
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    # Carry the tiebreak through the collapse so the stitching window can
    # order identically: two surviving changes sharing (key, ts) would
    # otherwise get nondeterministic valid_to/is_current assignment.
    keep = [key, attr, ts_col] + ([tiebreak] if tiebreak else [])
    collapsed = (
        changes.withColumn("__prev", F.lag(attr).over(w))
        .filter(F.col("__prev").isNull() | (F.col(attr) != F.col("__prev")))
        .select(*keep)
    )
    w2 = Window.partitionBy(key).orderBy(*order)
    nxt = F.lead(ts_col).over(w2)
    return collapsed.select(
        F.col(key),
        F.col(attr),
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
