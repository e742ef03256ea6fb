"""Metadata-only table statistics: answer COUNT/MIN/MAX from parquet
FOOTERS without scanning a single data page — the "query the metadata"
path behind file skipping, partition pruning decisions and cost-based
planning (reference analog: FileInputFormat.listStatus split planning,
mr-core/.../lib/input/FileInputFormat.java:380 — the one phase of a
MapReduce job that already worked this way).

Scale shape: the FILE LIST is the dataset (one row per file), so the
footer reads are distributed over it with mapInPandas (pyarrow opens
each footer on the executor — a few KB of IO per file, no row groups
touched). A 100k-file table costs 100k footer reads spread across the
cluster, not a driver loop and not a data scan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parquet_file_stats(
    spark: SparkSession, path: str, columns: list[str]
) -> DataFrame:
    """Per-file footer statistics for ``columns``: (file, n_rows, then
    per column: <col>_min, <col>_max, <col>_nulls) — from row-group
    metadata only. Min/max come from the column-chunk statistics every
    parquet writer emits; files lacking stats yield NULLs."""
    import glob
    import os

    files = sorted(
        glob.glob(os.path.join(path, "*.parquet"))
        + ([path] if path.endswith(".parquet") and os.path.isfile(path) else [])
    )
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    flist = spark.createDataFrame([(f,) for f in files], "file string")

    out_schema = "file string, n_rows long, " + ", ".join(
        f"`{c}_min` double, `{c}_max` double, `{c}_nulls` long" for c in columns
    )

    def read_footers(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                md = pq.ParquetFile(f).metadata
                idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
                rec = {"file": f, "n_rows": md.num_rows}
                for c in columns:
                    mn = mx = None
                    nulls = 0
                    have_mm = have_st = False
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx[c]).statistics
                        if st is None:
                            continue
                        # null accounting is independent of min/max: an
                        # all-null chunk has has_min_max=False but still
                        # carries a valid null_count
                        have_st = True
                        nulls += st.null_count or 0
                        if not st.has_min_max:
                            continue
                        have_mm = True
                        mn = st.min if mn is None else min(mn, st.min)
                        mx = st.max if mx is None else max(mx, st.max)
                    rec[f"{c}_min"] = float(mn) if have_mm else None
                    rec[f"{c}_max"] = float(mx) if have_mm else None
                    rec[f"{c}_nulls"] = nulls if have_st else None
                rows.append(rec)
            yield pd.DataFrame(rows)

    return flist.mapInPandas(read_footers, out_schema)


def table_stats_from_footers(
    spark: SparkSession, path: str, columns: list[str]
) -> DataFrame:
    """Global (table-level) COUNT + per-column MIN/MAX aggregated from
    the per-file footer stats — one row, zero data pages read."""
    per_file = parquet_file_stats(spark, path, columns)
    aggs = [F.sum("n_rows").cast("long").alias("n_rows")]
    for c in columns:
        aggs.append(F.min(f"{c}_min").alias(f"{c}_min"))
        aggs.append(F.max(f"{c}_max").alias(f"{c}_max"))
    return per_file.agg(*aggs)
