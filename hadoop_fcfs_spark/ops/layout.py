"""Data-layout operators: multi-dimensional clustering (Z-order) and
small-file compaction.

At 100 TB the scan you avoid is worth more than the shuffle you tune.
Parquet keeps min/max statistics per row group; a scan with a filter
skips row groups whose stats exclude the predicate. Linear sort layout
makes that pruning perfect for ONE column and useless for the rest —
Z-ORDER interleaves the bits of several key columns so every file/row
group covers a small hyper-rectangle of the key space, giving useful
pruning on ALL clustered dimensions at once (the technique Delta/
Iceberg expose as OPTIMIZE ZORDER BY; Morton order from the classic
multidimensional-indexing literature).

Compaction is the other half of the layout story: streaming/incremental
ingestion produces many small files; scans pay per-file open cost and
lose row-group pruning granularity. The reference's CombineFileInputFormat
(`mr-core/mapreduce/lib/input/CombineFileInputFormat.java:70`) solves
this READ-side (pack many small files into one split — io/readers.py
read_parquet_combined); ``compact_files`` is the WRITE-side fix that
makes every later scan cheap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton/Z-value: interleave the low ``bits`` bits of each column
    into one long (col0 owns bit positions 0, n, 2n, ...). Pure bit
    arithmetic — shuffle-free, engine-replayable. Callers normalize
    values into [0, 2^bits) first (see ``rank_normalize``) unless the
    raw ints already live there; high bits are masked off."""
    n = len(cols)
    if not 1 <= n <= 4:
        raise ValueError(f"zvalue interleaves 1-4 columns, got {n}")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        v = (c if isinstance(c, Column) else F.col(c)).cast("long")
        for b in range(bits):
            # bit b of column ci lands at interleaved position b*n + ci
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(v, b).bitwiseAND(F.lit(1)), b * n + ci)
            )
    return z


def hilbert_value(
    df: DataFrame,
    x_col: Column | str,
    y_col: Column | str,
    bits: int = 8,
    out_col: str = "hval",
) -> DataFrame:
    """2-D Hilbert-curve index of (x, y) ∈ [0, 2^bits)² — the
    better-locality sibling of :func:`zvalue`: Morton order takes a
    long diagonal jump every power-of-two boundary, the Hilbert curve
    moves ONE grid cell per step everywhere, so consecutive curve
    ranges cover tighter rectangles and min/max pruning skips more
    row groups (the curve modern lakehouse clustering uses where
    available). Callers normalize into range first (rank_normalize),
    as with zvalue.

    Pure per-row integer arithmetic, unrolled over the ``bits``
    levels of the classic xy→d recurrence: per level s = 2^k the
    quadrant is (3·rx) XOR ry — carried as the identity 3rx + ry −
    2rx·ry, no bit-XOR needed — and the frame rotates via the
    full-grid reflection (x', y') = (n−1−y, n−1−x) when rx=1, ry=0 /
    plain swap when rx=ry=0, which keeps every intermediate
    NONNEGATIVE (the s-local variant reflects below zero and leans
    on two's-complement masking — avoided for cross-engine safety).
    Each level lands in its own projection column so the expression
    tree stays LINEAR in ``bits`` (inlining the recurrence doubles
    the tree per level). Validated by the curve's defining property
    in pytest: consecutive d are grid NEIGHBORS, everywhere."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    n1 = (1 << bits) - 1
    xc = x_col if isinstance(x_col, Column) else F.col(x_col)
    yc = y_col if isinstance(y_col, Column) else F.col(y_col)
    out = df.withColumn("__hx", xc.cast("long")).withColumn(
        "__hy", yc.cast("long")
    ).withColumn("__hd", F.lit(0).cast("long"))
    for k in range(bits - 1, -1, -1):
        s = 1 << k
        rx = F.shiftright(F.col("__hx"), k).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("__hy"), k).bitwiseAND(F.lit(1))
        out = (
            out.withColumn("__rx", rx)
            .withColumn("__ry", ry)
            .withColumn(
                "__hd",
                F.col("__hd")
                + F.lit(s * s)
                * (
                    3 * F.col("__rx") + F.col("__ry")
                    - 2 * F.col("__rx") * F.col("__ry")
                ),
            )
            .withColumn(
                "__hx2",
                F.when(F.col("__ry") == 1, F.col("__hx")).otherwise(
                    F.when(
                        F.col("__rx") == 1, F.lit(n1) - F.col("__hy")
                    ).otherwise(F.col("__hy"))
                ),
            )
            .withColumn(
                "__hy2",
                F.when(F.col("__ry") == 1, F.col("__hy")).otherwise(
                    F.when(
                        F.col("__rx") == 1, F.lit(n1) - F.col("__hx")
                    ).otherwise(F.col("__hx"))
                ),
            )
            .withColumn("__hx", F.col("__hx2"))
            .withColumn("__hy", F.col("__hy2"))
            .drop("__rx", "__ry", "__hx2", "__hy2")
        )
    return out.withColumn(out_col, F.col("__hd")).drop(
        "__hx", "__hy", "__hd"
    )


def rank_normalize(df: DataFrame, col: str, id_col: str, bits: int = 16, out_col: str | None = None) -> DataFrame:
    """Map a column of any type/skew onto [0, 2^bits) by rank, adding
    ``out_col`` (default ``<col>_znorm``). Exact NTILE semantics, but NOT
    via an unpartitioned window: the total order comes from
    ``ranked_total_order`` (range partition + per-partition enumeration +
    broadcast offsets) and the bucket is a per-row expression
    (``ntile_from_rank``) — no single-task WindowExec, so normalizing a
    100 TB column shuffles once and never funnels through one task.

    The row count the bucket formula needs is read from the WAYPOINTED
    input (r14, the CDC-guard class sweep: an uncached ``df.count()``
    here was a second full pass over an arbitrary upstream lineage —
    with the waypoint, the input materializes once and both the count
    and the rank pass read the cache)."""
    from hadoop_fcfs_spark.caching import waypoint
    from hadoop_fcfs_spark.ops.sort import ntile_from_rank, ranked_total_order

    out = out_col or f"{col}_znorm"
    df = waypoint(df)
    n = df.count()
    ranked = ranked_total_order(df, [F.col(col), F.col(id_col)], rank_col="__rk")
    return ranked.withColumn(
        out, (ntile_from_rank(F.col("__rk"), n, 2**bits) - 1).cast("long")
    ).drop("__rk")


def zorder_by(
    df: DataFrame, cols: list[str], bits: int = 16, num_partitions: int | None = None
) -> DataFrame:
    """Cluster rows in Z-order on ``cols`` (raw low bits — pre-normalize
    skewed/unbounded columns): range-partition on the z-value so each
    output task (→ file) covers one compact z-range ≈ one small
    hyper-rectangle, then sort within partitions for row-group-level
    locality. The write that follows this is what makes every later
    multi-dimensional filter scan cheap."""
    z = zvalue([F.col(c) for c in cols], bits).alias("__z")
    out = df.withColumn("__z", z)
    if num_partitions:
        out = out.repartitionByRange(num_partitions, "__z")
    else:
        out = out.repartitionByRange("__z")
    return out.sortWithinPartitions("__z").drop("__z")


def compact_files(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Write-side small-file compaction: rewrite ``src_path`` into files
    of ~``target_file_bytes`` (sized from the source's total on-disk
    bytes, so the row-count-per-file adapts to the data). Returns the
    number of files written. Layout-preserving only in the trivial
    sense — run zorder_by/orderBy before writing when clustering
    matters."""
    df = spark.read.format(fmt).load(src_path)
    # size from filesystem metadata (no data scan): sum of leaf file sizes
    jvm = spark._jvm
    jsc = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = path.getFileSystem(jsc)
    total = fs.getContentSummary(path).getLength()
    n_files = max(1, int(total / target_file_bytes) + (1 if total % target_file_bytes else 0))
    df.repartition(n_files).write.format(fmt).mode("overwrite").save(dst_path)
    return n_files
