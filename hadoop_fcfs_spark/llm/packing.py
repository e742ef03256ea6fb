"""Training-sequence packing: assign documents (in id order) to
fixed-token-budget sequences.

The assignment rule is the streaming-pack approximation used by large
pretraining pipelines: documents are laid out in id order and a new
sequence starts every `budget` tokens of the running total — i.e.
seq_id = floor(exclusive_prefix_sum(tokens) / budget). Deterministic,
order-defined, and (unlike first-fit bin packing) expressible as a
prefix sum, which is what makes it tractable at corpus scale.

Scale design: a naive `Window.orderBy(id)` cumulative sum collapses to
ONE partition (Spark warns — the whole corpus through a single task).
Instead this is a two-level distributed prefix sum:
  1. per-chunk exclusive cumsum (window partitioned by id-range chunk —
     parallel across chunks),
  2. chunk offsets = exclusive cumsum over the per-chunk totals (a
     window over n_chunks rows — tiny), broadcast-joined back.
The same decomposition extends to any associative scan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int = 2048,
    chunk: int = 100_000,
) -> DataFrame:
    """Per-doc sequence assignment: (id, tokens, seq_id) with
    seq_id = floor(exclusive-prefix-sum(tokens) in id order / budget).
    `chunk` is the id-range width of the parallel scan unit — size it
    so one chunk's rows fit a task comfortably (ids need not be dense).

    Guards: budget/chunk must be >= 1 (a budget of 0 would emit NULL
    seq_ids), and the id column must be numeric — a string id silently
    casting to NULL would collapse every row into one __chunk, i.e. the
    exact single-task scan the two-level design exists to avoid."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")
    id_type = df.schema[id_col].dataType.typeName()
    if id_type not in {"byte", "short", "integer", "long", "decimal"}:
        raise TypeError(
            f"id column {id_col!r} must be an integral type for chunked "
            f"prefix-sum ordering, got {id_type}"
        )
    chunked = df.select(
        F.col(id_col),
        F.col(token_col).cast("long").alias("__tok"),
        (F.col(id_col).cast("long") - (F.col(id_col).cast("long") % chunk)).alias("__chunk"),
    )
    w_local = (
        Window.partitionBy("__chunk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = chunked.withColumn(
        "__local", F.coalesce(F.sum("__tok").over(w_local), F.lit(0))
    )
    totals = chunked.groupBy("__chunk").agg(F.sum("__tok").alias("__tot"))
    # n_chunks rows only — the single-partition window here is over the
    # chunk SUMMARY, not the data (that's the point of the two levels)
    w_off = Window.orderBy("__chunk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__tot").over(w_off), F.lit(0))
    ).select("__chunk", "__off")
    return (
        local.join(F.broadcast(offsets), "__chunk")
        .select(
            F.col(id_col),
            F.col("__tok").alias("tokens"),
            F.expr(f"CAST((__local + __off) DIV {int(budget)} AS BIGINT)").alias("seq_id"),
        )
    )


def packing_manifest(packed: DataFrame) -> DataFrame:
    """Roll a pack_sequences() output up to one row per training
    sequence: (seq_id, n_docs, sum_tokens)."""
    return packed.groupBy("seq_id").agg(
        F.count("*").alias("n_docs"), F.sum("tokens").alias("sum_tokens")
    )
