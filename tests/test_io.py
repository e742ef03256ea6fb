"""Round-trip tests for the IO layer (SURVEY §2.1 readers/writers)."""

from __future__ import annotations

import os
import struct

import pytest
from pyspark.sql import functions as F

from hadoop_fcfs_spark.io.readers import (
    parse_xml_records,
    read_fixed_width,
    read_kv_text,
    read_multiple,
    read_sequencefile,
    read_text,
    sample_filter,
)
from hadoop_fcfs_spark.io.writers import (
    write_partitioned,
    write_sequencefile,
    write_text_kv,
)


def test_text_kv_roundtrip(spark, tmp_path):
    out = str(tmp_path / "kv")
    df = spark.createDataFrame(
        [("k1", "v1"), ("k2", "v with spaces"), ("k3", "")], "key string, value string"
    )
    write_text_kv(df, out)
    back = read_kv_text(spark, out)
    assert sorted(map(tuple, back.collect())) == [("k1", "v1"), ("k2", "v with spaces"), ("k3", "")]


def test_kv_text_no_separator_line(spark, tmp_path):
    p = tmp_path / "raw"
    p.mkdir()
    (p / "f.txt").write_text("solo\nk\tv\n")
    back = {r["key"]: r["value"] for r in read_kv_text(spark, str(p)).collect()}
    assert back == {"solo": "", "k": "v"}


def test_read_text_tags_file_and_partitions(spark, tmp_path):
    p = tmp_path / "t"
    p.mkdir()
    (p / "a.txt").write_text("1\n2\n")
    (p / "b.txt").write_text("3\n")
    df = read_text(spark, str(p), num_partitions=2)
    rows = df.collect()
    assert len(rows) == 3
    assert df.rdd.getNumPartitions() == 2
    assert {os.path.basename(r["file"]) for r in rows} == {"a.txt", "b.txt"}


def test_fixed_width_roundtrip(spark, tmp_path):
    # FIXTURES.md F6: id int64 + code ascii(4) + amount int64 + flag ascii(4)
    p = tmp_path / "fw"
    p.mkdir()
    recs = [(1, b"AB12", 500, b"OK__"), (2, b"CD34", 12345678901, b"NO__")]
    with open(p / "data.bin", "wb") as f:
        for rid, code, amount, flag in recs:
            f.write(struct.pack(">q", rid) + code + struct.pack(">q", amount) + flag)
    df = read_fixed_width(
        spark,
        str(p / "data.bin"),
        [("id", "long_be", 8), ("code", "ascii", 4), ("amount", "long_be", 8), ("flag", "ascii", 4)],
    )
    got = sorted(map(tuple, df.collect()))
    assert got == [(1, "AB12", 500, "OK__"), (2, "CD34", 12345678901, "NO__")]


def test_sequencefile_roundtrip(spark, tmp_path):
    out = str(tmp_path / "seq")
    df = spark.createDataFrame([("a", 1), ("b", 2), ("c", 3)], "key string, value long")
    write_sequencefile(df, out)
    back = read_sequencefile(spark, out)
    assert sorted(map(tuple, back.collect())) == [("a", 1), ("b", 2), ("c", 3)]


def test_multiple_inputs_tagging(spark):
    a = spark.createDataFrame([(1, "x")], "id long, payload string")
    b = spark.createDataFrame([(2,)], "id long")
    out = read_multiple(spark, {"src_a": a, "src_b": b})
    rows = {r["__source"]: r for r in out.collect()}
    assert rows["src_a"]["payload"] == "x"
    assert rows["src_b"]["payload"] is None  # allowMissingColumns


def test_partitioned_write_routing(spark, tmp_path):
    out = str(tmp_path / "parts")
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "bucket string, v long"
    )
    write_partitioned(df, out, ["bucket"])
    dirs = {d for d in os.listdir(out) if d.startswith("bucket=")}
    assert dirs == {"bucket=a", "bucket=b"}
    back = spark.read.parquet(out)
    assert back.count() == 3
    # single job wrote each dir; routing preserved values
    assert back.filter(F.col("bucket") == "a").agg(F.sum("v")).collect()[0][0] == 3


def test_side_outputs_routing(spark, tmp_path):
    """MultipleOutputs named side-outputs: one pass over the source, N
    heterogeneous outputs (own filter + projection each)."""
    from hadoop_fcfs_spark.io.writers import write_side_outputs

    base = str(tmp_path / "side")
    df = spark.createDataFrame(
        [(1, "ok", 10.0), (2, "bad", -1.0), (3, "ok", 5.5)], "id long, status string, v double"
    )
    write_side_outputs(
        df,
        {
            "good": (F.col("status") == "ok", ["id", "v"]),
            "rejects": (F.col("status") != "ok", None),
            "all_ids": (None, ["id"]),
        },
        base,
    )
    good = spark.read.parquet(f"{base}/good")
    assert sorted(r.id for r in good.collect()) == [1, 3] and good.columns == ["id", "v"]
    rejects = spark.read.parquet(f"{base}/rejects")
    assert rejects.count() == 1 and rejects.columns == ["id", "status", "v"]
    assert spark.read.parquet(f"{base}/all_ids").count() == 3


def test_sample_filter_modes(spark):
    df = spark.createDataFrame([(f"key_{i}", i) for i in range(100)], "key string, value long")
    assert sample_filter(df, regex="key_1$").count() == 1
    h = sample_filter(df, hash_every=5)
    n = h.count()
    assert 0 < n < 100
    # deterministic: same predicate, same rows
    assert h.count() == n
    s = sample_filter(df, percent=0.2).count()
    assert 0 < s < 100


def test_parse_xml_records(spark):
    df = spark.createDataFrame(
        [("<r>alpha</r>junk<r>beta</r>",), ("no records here",)], "text string"
    )
    recs = parse_xml_records(df, "text", "<r>", "</r>")
    got = sorted(r["record"] for r in recs.collect())
    assert got == ["<r>alpha</r>", "<r>beta</r>"]


def test_jdbc_roundtrip_partitioned(spark, tmp_path):
    """DBInputFormat/DBOutputFormat end-to-end against embedded Derby (the
    same embedded-DB strategy the reference's HSQLDB tests use,
    jobclient/src/test/.../lib/db/TestDataDrivenDBInputFormat.java): write
    over JDBC, read back with DataDrivenDB-style range splits, verify the
    scan really fans out into the requested partitions, then shut the DB
    down (Derby signals successful shutdown with an exception)."""
    from hadoop_fcfs_spark.io.readers import read_jdbc
    from hadoop_fcfs_spark.io.writers import write_jdbc

    db = f"{tmp_path}/db"
    url = f"jdbc:derby:{db};create=true"
    drv = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}

    src = spark.range(0, 1000).selectExpr("id AS k", "CAST(id % 7 AS STRING) AS grp", "id * 1.5 AS v")
    write_jdbc(src, url, "T", mode="overwrite", **drv)
    # append mode: generated INSERTs add rows, no re-create
    write_jdbc(src.filter("k < 10"), url, "T", mode="append", **drv)

    back = read_jdbc(
        spark, url, "T", partition_column="k", lower_bound=0, upper_bound=999,
        num_partitions=4, **drv,
    )
    assert back.rdd.getNumPartitions() == 4  # one range query per split
    assert back.count() == 1010
    assert back.filter("k < 10").count() == 20  # appended duplicates present
    got = back.groupBy("grp").count().orderBy("grp").collect()
    assert sum(r["count"] for r in got) == 1010

    # Derby embedded shutdown contract: success raises SQLException 08006
    with pytest.raises(Exception):
        spark._jvm.java.sql.DriverManager.getConnection(f"jdbc:derby:{db};shutdown=true")


def test_generators_deterministic(spark):
    from hadoop_fcfs_spark.io.generators import random_kv, random_text

    a = random_kv(spark, 100, partitions=4)
    b = random_kv(spark, 100, partitions=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert a.select(F.length("key")).distinct().collect()[0][0] == 10
    txt = random_text(spark, 50, words_per_row=7)
    rows = txt.collect()
    assert len(rows) == 50
    assert all(len(r["text"].split(" ")) == 7 for r in rows)


def test_bucketed_table_point_lookup(spark, tmp_path):
    from hadoop_fcfs_spark.io.writers import lookup_bucketed, write_sorted_bucketed

    # default warehouse dir (spark-warehouse/, gitignored) — the conf is static
    import shutil

    spark.sql("DROP TABLE IF EXISTS kv_bucketed")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(wh, "kv_bucketed"), ignore_errors=True)
    df = spark.createDataFrame([(i, f"v{i}") for i in range(1000)], "k long, v string")
    write_sorted_bucketed(df, "kv_bucketed", "k", num_buckets=8, sort_col="k")
    hit = lookup_bucketed(spark, "kv_bucketed", "k", 423)
    rows = hit.collect()
    assert [(r["k"], r["v"]) for r in rows] == [(423, "v423")]
    # bucket pruning visible in the scan: only 1 of 8 buckets selected
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount: 1 out of 8" in plan
    spark.sql("DROP TABLE kv_bucketed")


def test_read_text_offsets_byte_keys(spark, tmp_path):
    """LineRecordReader parity: keys are byte offsets of line starts,
    including multi-byte lines — verified against hand-computed
    cumulative positions."""
    from hadoop_fcfs_spark.io.readers import read_text_offsets

    lines = ["alpha", "bb", "", "final line"]
    (tmp_path / "f.txt").write_text("\n".join(lines) + "\n")
    got = sorted(map(tuple, read_text_offsets(spark, str(tmp_path / "f.txt")).collect()))
    expected, off = [], 0
    for ln in lines:
        expected.append((off, ln))
        off += len(ln.encode()) + 1
    assert got == sorted(expected)


def test_routed_text_filename_from_record(spark, tmp_path):
    """MultipleTextOutputFormat parity: per-record filenames, nested
    subdirectories, exact file placement and contents."""
    from hadoop_fcfs_spark.io.writers import write_routed_text

    rows = [
        ("2024/jan.log", "a 1"),
        ("2024/jan.log", "a 2"),
        ("2024/feb.log", "b 1"),
        ("misc notes.txt", "c 1"),
    ]
    df = spark.createDataFrame(rows, "filename string, line string")
    base = str(tmp_path / "routed")
    n = write_routed_text(df, base)
    assert n == 3
    jan = sorted((tmp_path / "routed" / "2024" / "jan.log").read_text().splitlines())
    assert jan == ["a 1", "a 2"]
    assert (tmp_path / "routed" / "2024" / "feb.log").read_text().splitlines() == ["b 1"]
    assert (tmp_path / "routed" / "misc notes.txt").read_text().splitlines() == ["c 1"]
    # no leftover staging dirs
    assert not [p for p in os.listdir(base) if p.startswith("__route=")]


def test_routed_text_rejects_traversal_and_null(spark, tmp_path):
    from pyspark.sql import functions as F

    from hadoop_fcfs_spark.io.writers import write_routed_text

    df = spark.createDataFrame([("../escape.txt", "x")], "filename string, line string")
    with pytest.raises(ValueError, match="traversal"):
        write_routed_text(df, str(tmp_path / "r1"))
    df2 = spark.createDataFrame([("ok", "x")], "filename string, line string").select(
        F.lit(None).cast("string").alias("filename"), "line"
    )
    with pytest.raises(ValueError, match="NULL route"):
        write_routed_text(df2, str(tmp_path / "r2"))


def test_bloom_mapfile_tier(spark):
    """BloomMapFile parity (common/io/BloomMapFile.java): the written
    parquet files must carry a bloom filter on the key column (verified
    in the footer through parquet-mr), the point predicate must reach
    the scan as a pushed filter (so the reader consults the bloom to
    skip row groups), and a negative lookup — BloomMapFile's fast
    path — returns empty."""
    import shutil

    from hadoop_fcfs_spark.io.writers import lookup_bucketed, write_sorted_bucketed

    spark.sql("DROP TABLE IF EXISTS kv_bloom")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(wh, "kv_bloom"), ignore_errors=True)
    # scatter values so min/max row-group stats are useless for pruning
    # (every group spans the full range) — only the bloom can say "absent"
    df = spark.range(2000).selectExpr("CAST(hash(id) AS LONG) AS k", "CAST(id AS STRING) AS v")
    write_sorted_bucketed(df, "kv_bloom", "k", num_buckets=4, bloom_cols=["k"], bloom_ndv=2000)

    # footer: bloom present on k, absent on v
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    table_dir = os.path.join(wh, "kv_bloom")
    pq = [f for f in os.listdir(table_dir) if f.endswith(".parquet")]
    assert pq, "no parquet files written"
    jpath = jvm.org.apache.hadoop.fs.Path(os.path.join(table_dir, pq[0]))
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(jpath, hconf)
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    try:
        blooms = {}
        block = reader.getFooter().getBlocks().get(0)
        for i in range(block.getColumns().size()):
            cc = block.getColumns().get(i)
            blooms[cc.getPath().toDotString()] = reader.readBloomFilter(cc) is not None
    finally:
        reader.close()
    assert blooms == {"k": True, "v": False}, blooms

    # the membership predicate reaches the parquet reader
    absent = lookup_bucketed(spark, "kv_bloom", "k", 123456789)
    full = absent._jdf.queryExecution().toString()
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,123456789)]" in full
    assert absent.count() == 0  # negative lookup, bloom's fast path
    present = df.first()["k"]
    assert lookup_bucketed(spark, "kv_bloom", "k", present).count() >= 1
    spark.sql("DROP TABLE kv_bloom")


def test_sequencefile_as_text(spark, tmp_path):
    out = str(tmp_path / "seqt")
    df = spark.createDataFrame([("a", 1)], "key string, value long")
    write_sequencefile(df, out)
    back = read_sequencefile(spark, out, as_text=True)
    assert [tuple(r) for r in back.collect()] == [("a", "1")]


def test_read_json_with_schema(spark, tmp_path):
    from hadoop_fcfs_spark.io.readers import read_json

    p = tmp_path / "j"
    p.mkdir()
    (p / "a.jsonl").write_text('{"k": 1, "tags": ["x"]}\n{"k": 2, "tags": []}\n')
    df = read_json(spark, str(p), schema="k long, tags array<string>")
    rows = sorted((r["k"], tuple(r["tags"])) for r in df.collect())
    assert rows == [(1, ("x",)), (2, ())]


def test_compression_codec_roundtrips(spark, tmp_path):
    """Codec parity (common/io/compress/: Gzip/BZip2/Snappy/Lz4/Deflate;
    SequenceFile NONE/RECORD/BLOCK): every Spark-built-in codec
    round-trips losslessly for both the columnar container and text
    lines."""
    df = spark.range(500).select("id", (F.col("id") * 1.5).alias("v"))
    for codec in ("snappy", "gzip", "zstd", "lz4"):
        out = str(tmp_path / f"pq_{codec}")
        df.write.mode("overwrite").option("compression", codec).parquet(out)
        assert spark.read.parquet(out).count() == 500
    lines = df.select(F.concat_ws("\t", "id", "v").alias("value"))
    for codec in ("gzip", "bzip2", "deflate"):
        out = str(tmp_path / f"txt_{codec}")
        lines.write.mode("overwrite").option("compression", codec).text(out)
        back = spark.read.text(out)
        assert back.count() == 500
    # bzip2 is splittable (SplittableCompressionCodec.java) — a read of
    # the compressed text still parallelizes; gzip reads whole-file
    assert spark.read.text(str(tmp_path / "txt_bzip2")).rdd.getNumPartitions() >= 1


def test_small_files_packing(spark, tmp_path):
    """CombineFileInputFormat parity (CombineFileInputFormat.java:84):
    many tiny files must bin-pack into few scan partitions under
    maxPartitionBytes/openCostInBytes, not one task per file."""
    from hadoop_fcfs_spark.io.readers import small_files_conf

    src = str(tmp_path / "many")
    # 64 one-row files
    spark.range(64).repartition(64).write.mode("overwrite").parquet(src)
    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_oc = spark.conf.get("spark.sql.files.openCostInBytes")
    try:
        small_files_conf(spark, max_partition_bytes=128 * 1024 * 1024, open_cost_bytes=16 * 1024)
        packed = spark.read.parquet(src)
        n = packed.rdd.getNumPartitions()
        assert n <= 8, f"64 tiny files should pack into few partitions, got {n}"
        assert packed.count() == 64
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", old_oc)


def test_dynamic_partition_overwrite_preserves_untouched(spark, tmp_path):
    """Incremental-rerun contract: dynamic overwrite replaces only the
    partitions present in the new frame; static overwrite would truncate
    the whole table first."""
    from hadoop_fcfs_spark.io.writers import write_partitioned

    base = str(tmp_path / "t")
    full = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), ("c", 4)], "part string, v long"
    )
    write_partitioned(full, base, ["part"])
    # re-run only partition 'a' with corrected values
    fix = spark.createDataFrame([("a", 99)], "part string, v long")
    write_partitioned(fix, base, ["part"], dynamic_overwrite=True)
    got = {(r["part"], r["v"]) for r in spark.read.parquet(base).collect()}
    assert got == {("a", 99), ("b", 3), ("c", 4)}  # b/c untouched, a replaced


def test_read_json_bad_records_policies(spark, tmp_path):
    """Quarantine routes malformed lines to _corrupt_record, drop skips
    them, fail aborts — the ingestion contract for dirty corpora."""
    import pytest
    from pyspark.sql import functions as F

    from hadoop_fcfs_spark.io.readers import read_json

    p = tmp_path / "dirty"
    p.mkdir()
    (p / "a.jsonl").write_text('{"k": 1}\nnot json at all\n{"k": 3}\n')

    q = read_json(spark, str(p), schema="k long", bad_records="quarantine")
    good = q.filter(F.col("_corrupt_record").isNull()).select("k")
    bad = q.filter(F.col("_corrupt_record").isNotNull())
    assert sorted(r["k"] for r in good.collect()) == [1, 3]
    assert [r["_corrupt_record"] for r in bad.collect()] == ["not json at all"]

    d = read_json(spark, str(p), schema="k long", bad_records="drop")
    assert sorted(r["k"] for r in d.collect()) == [1, 3]

    with pytest.raises(Exception):
        read_json(spark, str(p), schema="k long", bad_records="fail").collect()

    with pytest.raises(ValueError):
        read_json(spark, str(p), schema="k long", bad_records="explode")

    # StructType schemas get _corrupt_record appended via schema.add, not
    # string concatenation (ADVICE r3: the f-string path produced an
    # invalid schema for StructType)
    from pyspark.sql.types import LongType, StructField, StructType

    st = StructType([StructField("k", LongType())])
    qs = read_json(spark, str(p), schema=st, bad_records="quarantine")
    assert "_corrupt_record" in qs.columns
    assert sorted(
        r["k"] for r in qs.filter(F.col("_corrupt_record").isNull()).collect()
    ) == [1, 3]
    with pytest.raises(TypeError):
        read_json(spark, str(p), schema=123, bad_records="quarantine")


def test_parquet_footer_stats_match_data(spark, tmp_path):
    from hadoop_fcfs_spark.io.metadata import parquet_file_stats, table_stats_from_footers

    d = str(tmp_path / "t")
    spark.range(0, 1000).selectExpr(
        "id", "CAST(id % 7 AS DOUBLE) AS v",
        "CASE WHEN id % 10 = 0 THEN NULL ELSE id END AS n",
    ).repartition(4).write.parquet(d)

    per_file = parquet_file_stats(spark, d, ["id", "v", "n"]).collect()
    assert len(per_file) == 4
    assert sum(r["n_rows"] for r in per_file) == 1000
    assert sum(r["n_nulls"] for r in per_file) == 100

    tot = table_stats_from_footers(spark, d, ["id", "v"]).collect()[0]
    assert tot["n_rows"] == 1000
    assert tot["id_min"] == 0.0 and tot["id_max"] == 999.0
    assert tot["v_min"] == 0.0 and tot["v_max"] == 6.0

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        parquet_file_stats(spark, str(tmp_path / "missing"), ["id"])


def test_parquet_footer_stats_all_null_column(spark, tmp_path):
    from hadoop_fcfs_spark.io.metadata import parquet_file_stats

    # an all-null column chunk has has_min_max=False but a valid
    # null_count — null accounting must not be gated on min/max presence
    d = str(tmp_path / "allnull")
    spark.range(0, 100).selectExpr(
        "id", "CAST(NULL AS DOUBLE) AS v"
    ).coalesce(1).write.parquet(d)
    r = parquet_file_stats(spark, d, ["id", "v"]).collect()[0]
    assert r["n_rows"] == 100
    assert r["v_nulls"] == 100
    assert r["v_min"] is None and r["v_max"] is None
    assert r["id_nulls"] == 0 and r["id_min"] == 0.0


def test_read_binary_files_feeds_multimodal(spark, tmp_path):
    """binaryFile source end-to-end: a dir of real GIF/PNG/BMP files ->
    (path, length, content) rows -> attach_media_meta sniffs formats ->
    decode_images decodes pixels; pathGlobFilter prunes at listing
    time and max_bytes prunes by length."""
    import numpy as np

    from hadoop_fcfs_spark.io.readers import read_binary_files
    from hadoop_fcfs_spark.llm.multimodal import (
        _encode_gif,
        _encode_png,
        attach_media_meta,
        decode_images,
    )

    d = tmp_path / "media"
    d.mkdir()
    pal = np.array([[0, 0, 0], [255, 255, 255], [9, 9, 9], [7, 7, 7]],
                   dtype=np.uint8)
    gif = _encode_gif(np.ones((4, 6), dtype=np.int32), pal)
    png = _encode_png(np.full((3, 5, 3), 200, dtype=np.uint8))
    (d / "a.gif").write_bytes(gif)
    (d / "b.png").write_bytes(png)
    (d / "notes.txt").write_bytes(b"not media")

    df = read_binary_files(spark, str(d))
    assert df.count() == 3
    media = read_binary_files(spark, str(d), glob="*.{gif,png}")
    assert media.count() == 2

    meta = attach_media_meta(media, binary_col="content").select(
        "path", "media_meta.format"
    )
    fmts = {r["path"].rsplit("/", 1)[-1]: r["format"] for r in meta.collect()}
    assert fmts == {"a.gif": "gif", "b.png": "png"}

    withid = media.select(
        F.monotonically_increasing_id().alias("media_id"),
        F.col("content").alias("payload"),
        "path",
    )
    decoded = {
        (r["width"], r["height"])
        for r in decode_images(withid, fake=False).collect()
    }
    assert decoded == {(6, 4), (5, 3)}

    small = read_binary_files(spark, str(d), glob="*.{gif,png}",
                              max_bytes=len(png))
    kept = [r["path"].rsplit("/", 1)[-1] for r in small.collect()]
    assert (len(gif) > len(png) and kept == ["b.png"]) or set(kept) == {
        "a.gif", "b.png"
    }


def test_table_handle_memo_is_plans_not_data(spark):
    """r16: tables.t memoizes the ANALYZED HANDLE per (app, path, table)
    — repeat calls return the identical DataFrame object (no re-listing
    / footer re-read), different sf dirs stay distinct, and the handle
    is a logical plan, not cached data: execution after a blanket
    clearCache still reads the parquet files (row counts match a fresh
    un-memoized read), and the events handle keeps its micros-converted
    timestamp column."""
    from tests.conftest import SF_ORACLE, SF_SMOKE

    from hadoop_fcfs_spark.tables import t

    a1 = t(spark, SF_SMOKE, "orders")
    a2 = t(spark, SF_SMOKE, "orders")
    b = t(spark, SF_ORACLE, "orders")
    assert a1 is a2, "same (app, path, table) must return the memoized handle"
    assert a1 is not b, "different sf dirs must not share a handle"

    fresh = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    spark.catalog.clearCache()
    assert a1.count() == fresh.count() > 0

    ev1 = t(spark, SF_SMOKE, "events")
    ev2 = t(spark, SF_SMOKE, "events")
    assert ev1 is ev2
    assert dict(ev1.dtypes)["ts"] == "timestamp"

    # r17 (r16 ADVICE #2): a hit is honored only for the OWNING session
    # — a sibling session sharing the applicationId gets its own handle
    # (DataFrames bind to the session's confs/temp views). Latest owner
    # wins the slot (alternating sessions rebuild — correct, just not
    # memoized); the repo runs one getOrCreate session in practice.
    sib = spark.newSession()
    s1 = t(sib, SF_SMOKE, "orders")
    assert s1 is not a1, "sibling session must not receive another session's handle"
    assert t(sib, SF_SMOKE, "orders") is s1
    assert t(spark, SF_SMOKE, "orders") is not s1
