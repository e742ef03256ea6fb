"""Input formats → DataFrame readers.

Parity targets (reference files under
``mr-core/mapreduce/lib/input/`` unless noted — SURVEY.md §2.1):

- ``TextInputFormat.java:42`` / ``LineRecordReader.java:49`` → ``read_text``.
  The reference keys lines by byte offset; Spark's scan has no byte
  offset, so the parity surface is (file, line) — offset-dependent jobs
  don't exist in the examples suite, and the boundary is documented here.
- ``KeyValueTextInputFormat.java:47`` / ``KeyValueLineRecordReader.java:39``
  → ``read_kv_text`` (split at FIRST separator; no separator → whole
  line is the key, empty value).
- ``NLineInputFormat.java:61`` → ``read_text(num_partitions=…)`` — the
  reference uses N-lines-per-split purely to control task fan-out;
  partition count is the Spark-native control.
- ``FixedLengthInputFormat.java:47`` → ``read_fixed_width`` — built on
  ``sc.binaryRecords`` (which wraps the same Hadoop input format), with
  a pure-expression substring/hex projection to typed columns.
- ``CombineFileInputFormat.java:84`` (small-files packing) → built into
  the Spark scan (``spark.sql.files.maxPartitionBytes`` /
  ``openCostInBytes``); exposed as ``small_files_conf``.
- ``MultipleInputs.java:40`` / ``DelegatingInputFormat.java:50`` →
  ``read_multiple`` (per-path reader + unionByName, each row tagged
  with its source — the TaggedInputSplit).
- ``SequenceFileInputFormat.java:41`` → ``read_sequencefile`` (RDD
  bridge; Writables auto-convert to Python via the JVM converters).
- ``SequenceFileInputFilter.java:49`` → ``sample_filter`` (regex /
  percent / hash-sampling predicates as Column filters — pushed into
  the scan by Catalyst where the source supports it).
- ``db/DBInputFormat.java:61`` + ``DataDrivenDBInputFormat.java:61`` →
  ``read_jdbc`` (partitionColumn/lowerBound/upperBound/numPartitions is
  exactly the reference's MIN..MAX range splitting).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text(spark: SparkSession, path: str, num_partitions: int | None = None) -> DataFrame:
    """Lines with their source file: (file, value). NLineInputFormat's
    fan-out control = optional repartition."""
    df = spark.read.text(path).select(
        F.input_file_name().alias("file"), F.col("value")
    )
    if num_partitions:
        df = df.repartition(num_partitions)
    return df


def read_text_offsets(spark: SparkSession, path: str) -> DataFrame:
    """Lines keyed by their BYTE OFFSET in the file — the exact
    ``TextInputFormat``/``LineRecordReader`` key contract
    (``mr-core/mapreduce/lib/input/LineRecordReader.java:49``: key =
    position of the line start). ``read_text`` substitutes (file, line)
    keys; this reader closes that boundary for ported jobs that depend
    on offsets, by running Hadoop's own input format inside Spark
    (``newAPIHadoopFile`` + TextInputFormat) — split-parallel, byte
    ranges per task, identical offset semantics including the
    skip-partial-first-line rule at split boundaries.

    Output: (offset long, value string). Offsets reset per file; add
    ``input_file_name`` downstream if multiple files need disambiguation
    (the RDD bridge loses file provenance, as MR mappers did)."""
    rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
    )
    return spark.createDataFrame(rdd, "offset long, value string")


def read_kv_text(
    spark: SparkSession, path: str, separator: str = "\t"
) -> DataFrame:
    """KeyValueTextInputFormat: line split at the FIRST separator into
    (key, value); line without separator → (line, '')."""
    lines = spark.read.text(path)
    pos = F.instr(F.col("value"), separator)
    key = F.when(pos > 0, F.substring_index("value", separator, 1)).otherwise(F.col("value"))
    val = F.when(
        pos > 0, F.col("value").substr(pos + len(separator), F.length("value"))
    ).otherwise(F.lit(""))
    return lines.select(key.alias("key"), val.alias("value"))


def read_csv(spark: SparkSession, path: str, schema=None, sep: str = ",", header: bool = False) -> DataFrame:
    """Delimited text with explicit schema (never inferSchema in
    production — one extra full scan)."""
    reader = spark.read.option("sep", sep).option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


# field type → byte width for fixed-width records
_FW_TYPES = {"long_be": 8, "int_be": 4, "ascii": None}


def read_fixed_width(
    spark: SparkSession,
    path: str,
    fields: list[tuple[str, str, int]],
) -> DataFrame:
    """Fixed-byte-width binary records → typed columns.

    fields = [(name, type, width)] with type in {'long_be', 'int_be',
    'ascii'}; record length = sum of widths. Splitting is done by the
    same FixedLengthInputFormat the reference uses (via
    ``sc.binaryRecords``); projection is pure expressions (substring on
    binary + hex→decimal for big-endian ints) — no Python per record.
    """
    record_len = sum(w for _, _, w in fields)
    rdd = spark.sparkContext.binaryRecords(path, record_len)
    df = spark.createDataFrame(rdd.map(lambda b: (b,)), "record binary")
    cols: list[Column] = []
    off = 1  # substring is 1-based
    for name, ftype, width in fields:
        raw = F.substring(F.col("record"), off, width)
        if ftype == "ascii":
            cols.append(F.decode(raw, "UTF-8").alias(name))
        elif ftype in ("long_be", "int_be"):
            cols.append(F.conv(F.hex(raw), 16, 10).cast("long").alias(name))
        else:
            raise ValueError(f"unknown fixed-width field type {ftype!r}")
        off += width
    return df.select(*cols)


def read_multiple(
    spark: SparkSession, sources: dict[str, DataFrame]
) -> DataFrame:
    """MultipleInputs: heterogeneous per-path readers unioned into one
    logical input, each row tagged with its source name."""
    tagged = [df.withColumn("__source", F.lit(name)) for name, df in sources.items()]
    out = tagged[0]
    for df in tagged[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def read_sequencefile(spark: SparkSession, path: str, as_text: bool = False) -> DataFrame:
    """SequenceFile K/V → 2-column DataFrame (interop bridge; the
    engine-native container is parquet). Writable→Python conversion is
    done by Spark's built-in converters. ``as_text=True`` re-encodes
    both sides as strings — SequenceFileAsTextInputFormat
    (reference ``.../input/SequenceFileAsTextInputFormat.java:37``)."""
    rdd = spark.sparkContext.sequenceFile(path)
    df = rdd.toDF(["key", "value"])
    if as_text:
        df = df.select(
            F.col("key").cast("string").alias("key"),
            F.col("value").cast("string").alias("value"),
        )
    return df


def sample_filter(
    df: DataFrame,
    key_col: str = "key",
    regex: str | None = None,
    percent: float | None = None,
    hash_every: int | None = None,
) -> DataFrame:
    """SequenceFileInputFilter's three scan-time filters: regex match,
    random percent sample, deterministic hash sampling (keep keys with
    hash(key) % f == 0 — the reference's MD5-based variant, here
    murmur3 via pmod(hash))."""
    out = df
    if regex is not None:
        out = out.filter(F.col(key_col).rlike(regex))
    if percent is not None:
        out = out.sample(fraction=percent, seed=42)
    if hash_every is not None:
        out = out.filter(F.pmod(F.hash(F.col(key_col)), F.lit(hash_every)) == 0)
    return out


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
    **options,
) -> DataFrame:
    """JDBC scan. With partition_column, Spark issues one range query
    per partition over [lower, upper] — the reference's
    DataDrivenDBInputFormat MIN..MAX splitters (IntegerSplitter.java:37
    etc.). Embedded Derby (on Spark's classpath) proves the path
    end-to-end (tests/test_io.py, dbcount_pageview gate); any other
    dialect only needs its driver jar in spark.jars."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def small_files_conf(spark: SparkSession, max_partition_bytes: int, open_cost_bytes: int = 4 * 1024 * 1024) -> None:
    """CombineFileInputFormat parity: pack many small files per
    partition. Spark's FileSourceScan bin-packs files up to
    maxPartitionBytes, charging openCostInBytes per file."""
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(max_partition_bytes))
    spark.conf.set("spark.sql.files.openCostInBytes", str(open_cost_bytes))


def parse_xml_records(df: DataFrame, text_col: str, begin_tag: str, end_tag: str) -> DataFrame:
    """StreamXmlRecordReader parity: extract begin…end tag spans from
    text as one record per match (regex assembly; a full XML source
    would use spark-xml, not bundled here)."""
    pat = re.escape(begin_tag) + "(.*?)" + re.escape(end_tag)
    recs = F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
    return df.select(F.explode(recs).alias("record"))


def read_json(
    spark: SparkSession,
    path: str,
    schema=None,
    bad_records: str = "quarantine",
) -> DataFrame:
    """JSON lines with explicit schema (no inference pass in
    production). Semi-structured sibling of the text readers; nested
    access via dot paths / explode.

    Malformed-record policy (a 100 TB ingest WILL contain garbage):
      - "quarantine" (default): PERMISSIVE parse with the raw line
        captured in `_corrupt_record` — rows route cleanly downstream
        (filter on `_corrupt_record IS NULL`, quarantine the rest);
        requires an explicit schema.
      - "drop": DROPMALFORMED — silently skip bad lines.
      - "fail": FAILFAST — abort the job on the first bad line.
    """
    from pyspark.sql.types import StringType, StructType

    modes = {"quarantine": "PERMISSIVE", "drop": "DROPMALFORMED", "fail": "FAILFAST"}
    if bad_records not in modes:
        raise ValueError(f"bad_records must be one of {sorted(modes)}, got {bad_records!r}")
    reader = spark.read.option("mode", modes[bad_records])
    if schema is not None:
        if bad_records == "quarantine":
            # the corrupt-record column must exist in the schema; DDL
            # strings and StructType need different append paths
            if isinstance(schema, StructType):
                if "_corrupt_record" not in schema.fieldNames():
                    schema = schema.add("_corrupt_record", StringType())
            elif isinstance(schema, str):
                if "_corrupt_record" not in schema:
                    schema = f"{schema}, _corrupt_record string"
            else:
                raise TypeError(
                    f"schema must be a DDL string or StructType, got {type(schema).__name__}"
                )
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same pushdown/pruning behavior as parquet."""
    return spark.read.orc(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw-file ingestion via the core ``binaryFile`` source — the
    multimodal front door: a directory of image/audio/video files
    becomes (path, modificationTime, length, content binary) rows that
    feed llm.multimodal.attach_media_meta / decode_images directly
    (reference parity: WholeFileRecordReader in the distributed-cache
    examples — one record per file, content as bytes).

    ``glob`` filters filenames at the SOURCE (pathGlobFilter — the
    PathFilter analog: listing-time pruning, no content read);
    ``max_bytes`` pushes `length <= N` down as a data filter so
    oversized blobs never reach the executor's row buffer — the
    binaryFile source prunes on its length column BEFORE loading
    content (the one pushdown this source supports; verify with
    .explain when it matters).

    Scale notes: one row per FILE — fine for media corpora (files are
    the natural unit), wrong for millions of tiny text files (use
    read_text / archives). `spark.sql.files.maxPartitionBytes` governs
    packing; a partition holds whole files only."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= int(max_bytes))
    return df
