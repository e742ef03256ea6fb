"""Map/Reduce-shaped UDF wrappers.

Parity targets (SURVEY.md §2.8):
- ``Mapper.map`` (reference ``mr-core/mapreduce/Mapper.java:123``) is a
  UDTF: 0..n output records per input record, plus setup/cleanup.
  → ``map_records``: mapInPandas with a per-record generator function;
  Arrow-batched, setup/cleanup run once per partition (exactly the
  reference's task-lifecycle hooks, at partition granularity).
- ``Reducer.reduce`` (``Reducer.java:147``): per key, iterate values —
  **in sort order when a sort comparator is set** (``Job.java:978,993``).
  → ``reduce_groups``: the sorted-values-per-group contract done right
  (SURVEY §4.2/§7.3 — plain groupBy does NOT order values):
  repartition on the group key + sortWithinPartitions + applyInPandas.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame


def map_records(
    df: DataFrame,
    fn: Callable[[dict[str, Any]], Iterator[dict[str, Any]]],
    output_schema: str,
    setup: Callable[[], Any] | None = None,
    cleanup: Callable[[Any], None] | None = None,
) -> DataFrame:
    """Mapper parity: `fn(record) -> iterator of output records`.
    setup() runs once per partition (its return value is not passed to
    fn — close over shared state in fn if needed); cleanup(state) runs
    after the partition drains. Arrow-batched under the hood; per-record
    Python is the cost of arbitrary-code parity — use Column expressions
    whenever the logic is expressible."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state = setup() if setup else None
        try:
            for pdf in batches:
                out = []
                for rec in pdf.to_dict("records"):
                    out.extend(fn(rec))
                if out:
                    yield pd.DataFrame(out)
        finally:
            if cleanup:
                cleanup(state)

    return df.mapInPandas(run, schema=output_schema)


def reduce_groups(
    df: DataFrame,
    group_cols: list[str],
    fn: Callable[[tuple, pd.DataFrame], pd.DataFrame],
    output_schema: str,
    order_cols: list[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Reducer parity: `fn(key, group_frame) -> output frame`, with the
    group's rows ordered by `order_cols` (secondary-sort contract).
    Without order_cols this is plain applyInPandas."""
    if order_cols:
        from hadoop_fcfs_spark.ops.sort import grouped_sorted_apply

        return grouped_sorted_apply(
            df, group_cols, order_cols, lambda pdf: fn(tuple(pdf.iloc[0][group_cols]), pdf),
            output_schema, num_partitions,
        )
    return df.groupBy(*group_cols).applyInPandas(
        lambda pdf: fn(tuple(pdf.iloc[0][group_cols]), pdf), schema=output_schema
    )


def broadcast_lookup(
    df: DataFrame, mapping: dict, key_col: str, out_col: str, default=None
) -> DataFrame:
    """Side-data join against a driver-side dict — the DistributedCache
    pattern (reference Job.java:1079-1104: ship a read-only table to
    every task, probe it in map()).

    Small maps (≤ ~10k entries) compile to a literal MapType column —
    pure JVM, no Python. Larger maps fall back to a broadcast variable
    probed inside a Pandas UDF (one pickled copy per executor, Arrow
    batches, never per-task re-pickling)."""
    from pyspark.sql import functions as F

    if len(mapping) <= 10_000:
        entries = []
        for k, v in mapping.items():
            entries.extend([F.lit(k), F.lit(v)])
        m = F.create_map(*entries)
        looked = m[F.col(key_col)]
        if default is not None:
            looked = F.coalesce(looked, F.lit(default))
        return df.withColumn(out_col, looked)

    bc = df.sparkSession.sparkContext.broadcast(mapping)
    sample = next(iter(mapping.values()))
    out_type = "double" if isinstance(sample, float) else ("long" if isinstance(sample, int) else "string")

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(out_type)
    def probe(keys: pd.Series) -> pd.Series:
        m = bc.value
        return keys.map(lambda k: m.get(k, default))

    return df.withColumn(out_col, probe(F.col(key_col)))


def _split_top_level_fields(schema: str) -> list[str]:
    """Split a DDL schema string on top-level commas only.

    ``"a decimal(10,2), b map<string,int>"`` has commas INSIDE the type
    parameters; a naive ``split(",")`` would derive bogus column names
    and every yielded frame would mismatch the declared schema. Track
    ``<>``/``()`` bracket depth and split only at depth 0.
    """
    fields: list[str] = []
    depth = 0
    start = 0
    for i, ch in enumerate(schema):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            fields.append(schema[start:i])
            start = i + 1
    fields.append(schema[start:])
    return [f for f in fields if f.strip()]


def map_records_skipping(
    df: DataFrame,
    fn: Callable[[dict[str, Any]], Iterator[dict[str, Any]]],
    output_schema: str,
    max_skip_records: int | None = None,
    error_col: str = "__skip_error",
    setup: Callable[[], Any] | None = None,
    cleanup: Callable[[Any], None] | None = None,
) -> DataFrame:
    """SkipBadRecords parity: ``map_records`` whose per-record crashes
    QUARANTINE instead of killing the task (reference
    ``mapred/SkipBadRecords.java:62`` — skipping mode narrows in on the
    bad record, skips it, and writes it to the skip output path with
    counters). Spark-first shape: good records emit fn's outputs with
    ``error_col`` NULL; a record whose fn raises emits ONE row of NULL
    output columns carrying "ExcType: msg | record=<truncated repr>" in
    ``error_col`` — the skip-output-path audit trail as a side column,
    so the skipped-record counter is just a FILTER + COUNT (counters
    are derivable aggregations here, not a side channel).
    ``max_skip_records`` caps skips PER TASK like
    ``mapreduce.map.skip.maxrecords``: exceeding the budget re-raises
    the original error and fails the task; None = unlimited skipping.
    Only Exception subclasses are caught — KeyboardInterrupt etc.
    still kill the task, and so does exhausting the budget."""

    out_with_err = f"{output_schema}, {error_col} string"
    out_cols = [
        f.strip().split(" ")[0].strip("`")
        for f in _split_top_level_fields(output_schema)
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state = setup() if setup else None
        skipped = 0
        try:
            for pdf in batches:
                out = []
                for rec in pdf.to_dict("records"):
                    try:
                        for produced in fn(rec):
                            row = dict(produced)
                            row[error_col] = None
                            out.append(row)
                    except Exception as exc:
                        skipped += 1
                        if (
                            max_skip_records is not None
                            and skipped > max_skip_records
                        ):
                            raise
                        row = {c: None for c in out_cols}
                        row[error_col] = (
                            f"{type(exc).__name__}: {exc} | "
                            f"record={repr(rec)[:200]}"
                        )
                        out.append(row)
                if out:
                    yield pd.DataFrame(
                        out, columns=[*out_cols, error_col]
                    )
        finally:
            if cleanup:
                cleanup(state)

    return df.mapInPandas(run, schema=out_with_err)
