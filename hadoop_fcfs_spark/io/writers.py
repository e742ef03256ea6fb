"""Output formats → DataFrame writers.

Parity targets (reference files under ``mr-core/mapreduce/lib/output/``
— SURVEY.md §2.1):

- ``TextOutputFormat.java:44`` → ``write_text_kv`` (`key SEP value`
  lines, default TAB).
- ``SequenceFileOutputFormat.java:43`` → ``write_sequencefile`` (RDD
  bridge for interop; parquet is the engine-native container).
- ``MapFileOutputFormat.java:49`` (sorted + indexed, point lookups) →
  ``write_sorted_bucketed``: bucketBy + sortBy parquet table — bucket
  pruning + row-group stats give the same point-lookup behavior.
- ``MultipleOutputs.java:88`` (per-record output routing) →
  ``write_partitioned`` (`partitionBy` — filename-from-record routing);
  heterogeneous named side-outputs → ``write_side_outputs`` (persist
  once, N filtered/projected write jobs).
- ``LazyOutputFormat.java:42`` → Spark never creates empty partitionBy
  directories; nothing to build.
- ``NullOutputFormat.java:36`` / ``FilterOutputFormat.java:36`` →
  ``write_noop`` (the noop sink — also the bench harness sink).
- ``db/DBOutputFormat.java:50`` → ``write_jdbc``.
- ``FileOutputCommitter.java:46`` two-phase commit → built into Spark's
  HadoopMapReduceCommitProtocol; nothing to build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_text_kv(
    df: DataFrame,
    path: str,
    key_col: str = "key",
    value_col: str = "value",
    separator: str = "\t",
    mode: str = "overwrite",
) -> None:
    """`key SEP value` text lines (TextOutputFormat default contract)."""
    df.select(
        F.concat_ws(separator, F.col(key_col).cast("string"), F.col(value_col).cast("string")).alias(
            "value"
        )
    ).write.mode(mode).text(path)


def write_sequencefile(df: DataFrame, path: str, key_col: str = "key", value_col: str = "value") -> None:
    """K/V SequenceFile for Hadoop interop (RDD bridge)."""
    df.select(key_col, value_col).rdd.map(tuple).saveAsSequenceFile(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
    compression: str | None = None,
    dynamic_overwrite: bool = False,
) -> None:
    """MultipleOutputs-style output routing: one directory per distinct
    partition value, written in a single job. At scale, partition count
    is the file-count lever — repartition on the partition cols first
    so each dir gets few large files instead of (tasks × dirs) shards.

    ``dynamic_overwrite=True`` switches overwrite to dynamic partition
    mode: only the partitions PRESENT in ``df`` are replaced, untouched
    partition dirs survive — the idempotent incremental-rerun contract
    (re-run yesterday's slice without truncating the table; static mode
    would drop every existing partition first)."""
    writer = (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .format(fmt)
    )
    if dynamic_overwrite:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    if compression:
        # gzip/snappy/zstd/lz4 — the reference's codec set (common/io/compress/)
        # is built into Spark's sources; pick per-table at write time
        writer = writer.option("compression", compression)
    writer.save(path)


def write_side_outputs(
    df: DataFrame,
    outputs: dict[str, tuple],
    base_path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """MultipleOutputs named side-outputs (MultipleOutputs.java:88
    ``write(name, k, v, basePath)``): route each record to zero or more
    named outputs, each with its own projection.

    ``outputs`` maps name -> (filter Column | None, [columns] | None).
    The input is persisted once so the source is scanned a single time
    while N write jobs run — the Spark analog of MR emitting to several
    named files inside one task. Partition-parallel at any scale; the
    cache spills to disk if the round doesn't fit in memory.
    """
    from pyspark import StorageLevel

    df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        for name, (cond, cols) in outputs.items():
            out = df if cond is None else df.filter(cond)
            if cols:
                out = out.select(*cols)
            out.write.mode(mode).format(fmt).save(f"{base_path.rstrip('/')}/{name}")
    finally:
        df.unpersist()


def write_routed_text(
    df: DataFrame,
    path: str,
    filename_col: str = "filename",
    line_col: str = "line",
    mode: str = "overwrite",
) -> int:
    """Old-API ``MultipleTextOutputFormat`` parity
    (``mr-core/mapred/lib/MultipleTextOutputFormat.java``:
    ``generateFileNameForKeyValue`` returns an arbitrary, possibly
    nested, per-record filename): every record lands in
    ``<path>/<filename_col value>``, one text line per record.

    Spark-first shape: the filename is a derived ROUTING COLUMN (the
    caller expresses f(record) as a column expression), written with
    ``partitionBy`` after a hash repartition on it — so each distinct
    filename is produced by exactly one task (the same "key-partition
    your records per name" discipline MR users needed, made structural).
    A driver-side commit pass then renames each escaped
    ``__route=<name>`` directory to the literal filename through the
    Hadoop FileSystem API (FS-agnostic: local/HDFS/S3A). The commit is
    O(#distinct filenames) driver work — file count is the scale unit
    of this format, exactly as it was for the reference.

    Null filenames are rejected; ``..`` path segments are rejected
    (traversal guard). Returns the number of files committed."""
    from urllib.parse import unquote

    tagged = df.select(
        F.col(filename_col).alias("__route"), F.col(line_col).cast("string").alias("value")
    )
    tagged.repartition("__route").write.mode(mode).partitionBy("__route").text(path)

    spark = df.sparkSession
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    base = jvm.org.apache.hadoop.fs.Path(path)
    fs = base.getFileSystem(hconf)
    committed = 0
    for st in fs.listStatus(base):
        dirname = st.getPath().getName()
        if not dirname.startswith("__route="):
            continue
        rel = unquote(dirname[len("__route=") :])
        if rel == "__HIVE_DEFAULT_PARTITION__":
            raise ValueError("null filename in routed write (a record produced NULL route)")
        if ".." in rel.split("/"):
            raise ValueError(f"refusing path-traversal filename {rel!r}")
        parts = sorted(
            (s.getPath() for s in fs.listStatus(st.getPath()) if s.getPath().getName().startswith("part-")),
            key=lambda p: p.getName(),
        )
        target = jvm.org.apache.hadoop.fs.Path(base, rel)
        if target.getParent() is not None:
            fs.mkdirs(target.getParent())
        for i, part in enumerate(parts):
            # one part per route by construction (hash repartition on the
            # route); numbered suffixes keep any maxRecordsPerFile split safe
            dest = target if i == 0 else jvm.org.apache.hadoop.fs.Path(base, f"{rel}-{i:05d}")
            fs.rename(part, dest)
            committed += 1
        fs.delete(st.getPath(), True)
    return committed


def write_sorted_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
    bloom_cols: list[str] | None = None,
    bloom_ndv: int = 100_000,
) -> None:
    """MapFileOutputFormat parity: sorted, indexed output supporting
    point lookups — bucketed+sorted parquet table; later equi-joins or
    lookups on the bucket column skip the shuffle (SURVEY §2.3
    CompositeInputFormat's pre-partitioned contract).

    ``bloom_cols`` adds the BloomMapFile tier
    (``common/io/BloomMapFile.java``: a membership filter in front of the
    MapFile index): parquet writes a split-block bloom filter per row
    group for each listed column, and the reader's pushed point predicate
    consults it to skip row groups whose min/max stats alone cannot rule
    the key out — the same negative-lookup fast path BloomMapFile.get
    provides. Size ``bloom_ndv`` to the expected distinct keys per file
    (over-sizing costs footer bytes, under-sizing raises the false-positive
    rate — DynamicBloomFilter's errorRate knob in the reference)."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    for c in bloom_cols or []:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(bloom_ndv)
        )
    writer.format("parquet").saveAsTable(table_name)


def lookup_bucketed(spark, table_name: str, bucket_col: str, key) -> DataFrame:
    """MapFileOutputFormat.getEntry parity: point lookup against a
    sorted+bucketed table (``write_sorted_bucketed``). The filter on the
    bucket column prunes to one bucket's files (checked in tests via the
    SelectedBucketsCount plan marker) and row-group stats skip
    non-matching pages — the same two-level index MapFile maintains."""
    from pyspark.sql import functions as F

    # the planner's autoBucketedScan drops the bucketed layout when it
    # sees no join/agg; for point lookups the win IS bucket pruning, so
    # keep the bucketed scan on
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    return spark.table(table_name).filter(F.col(bucket_col) == key)


def write_noop(df: DataFrame) -> None:
    """Discard output after full computation (NullOutputFormat; also
    the benchmarking sink)."""
    df.write.format("noop").mode("overwrite").save()


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append", **options) -> None:
    """Generated-INSERT writes (DBOutputFormat.java:50). Proven
    end-to-end against embedded Derby (dbcount_pageview gate +
    tests/test_io.py); other dialects need their driver jar in
    spark.jars."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
