"""TeraGen / TeraSort / TeraValidate equivalents.

Parity targets (reference ``examples/terasort/`` — SURVEY.md §2.5/§5):
- ``TeraGen.java:59``: 100-byte records = 10-byte random key + 2-byte
  break + 32-byte row id + filler. Here: ``spark.range(n)`` + a
  deterministic key expression (xxhash64-derived bytes — same
  reproducibility contract as TeraGen's seeded Random, no RNG state).
- ``TeraSort.java:43``: global total order. The reference hand-builds
  sampling (``TeraInputFormat.writePartitionFile:115``) + a 2-level
  trie partitioner; ``df.orderBy`` runs Spark's RangePartitioner which
  does sample→split-points→route internally. Concatenating output
  part files in order yields globally sorted data — the TeraSort
  contract.
- ``TeraValidate.java`` / ``SortValidator.java:54``: (a) within each
  partition keys are non-decreasing, (b) partition boundaries are
  non-decreasing across part files, (c) a content checksum (sum of
  per-row key hashes) is preserved input→output — catching dropped or
  duplicated rows, not just misordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def teragen(spark: SparkSession, num_rows: int, partitions: int | None = None) -> DataFrame:
    """Deterministic 100-byte-ish records: (key binary(10), rowid long,
    filler string). key bytes derive from xxhash64(id, salt) — uniform,
    reproducible, order-free."""
    df = spark.range(0, num_rows, 1, partitions or spark.sparkContext.defaultParallelism)
    h1 = F.xxhash64(F.col("id"), F.lit(1))
    h2 = F.xxhash64(F.col("id"), F.lit(2))
    # 10-byte key: 8 bytes of h1 + first 2 bytes of h2 (hex → unhex)
    key_hex = F.concat(
        F.lpad(F.hex(h1), 16, "0"), F.substring(F.lpad(F.hex(h2), 16, "0"), 1, 4)
    )
    return df.select(
        F.unhex(key_hex).alias("key"),
        F.col("id").alias("rowid"),
        F.rpad(F.concat(F.lit("row-"), F.col("id").cast("string")), 88, "X").alias("filler"),
    )


def terasort(df: DataFrame, key_col: str = "key") -> DataFrame:
    """Global total-order sort on the binary key (unsigned bytewise —
    Spark compares BinaryType lexicographically unsigned, the same
    order TeraSort's raw-byte comparator produces)."""
    return df.orderBy(key_col)


def teravalidate(sorted_df: DataFrame, key_col: str = "key") -> dict:
    """Distributed validation — no driver-side key collection:
    per-partition (min, max, count, inversions, crc checksum), then
    boundary continuity checked across the handful of partition rows.
    Returns {'ok': bool, 'rows': n, 'checksum': long,
    'order_violations': n_adjacent_inversions_within_partitions,
    'boundary_violations': n_partition_boundary_inversions} — the counts
    make the verdict value-comparable (TeraValidate emits 'error' records
    per misordering; we emit the count)."""

    def part_stats(idx: int, it):
        import builtins
        import zlib  # crc32 — deterministic across processes (TeraChecksum parity)

        prev = None
        inversions = 0
        n = 0
        mn = mx = None
        chk = 0
        for row in it:
            k = bytes(row[key_col])
            if prev is not None and k < prev:
                inversions += 1
            prev = k
            n += 1
            mn = k if mn is None else builtins.min(mn, k)
            mx = k if mx is None else builtins.max(mx, k)
            chk = (chk + zlib.crc32(k)) & 0x7FFFFFFFFFFFFFFF
        yield (idx, inversions, n, mn, mx, chk)

    stats = sorted(sorted_df.rdd.mapPartitionsWithIndex(part_stats).collect())
    order_violations = sum(s[1] for s in stats)
    boundary_violations = 0
    nonempty = [s for s in stats if s[2] > 0]
    for a, b in zip(nonempty, nonempty[1:]):
        if a[4] > b[3]:  # prev partition max > next partition min
            boundary_violations += 1
    return {
        "ok": order_violations == 0 and boundary_violations == 0,
        "rows": sum(s[2] for s in stats),
        "checksum": sum(s[5] for s in stats) & 0x7FFFFFFFFFFFFFFF,
        "order_violations": order_violations,
        "boundary_violations": boundary_violations,
    }


def content_checksum(df: DataFrame, key_col: str = "key") -> int:
    """Order-insensitive content checksum (SortValidator's record-hash
    sum): sum of xxhash64(key) in decimal(38) — ANSI-safe against long
    overflow — computed JVM-side, one scan."""
    s = df.select(
        F.sum(F.xxhash64(F.col(key_col)).cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]
    return int(s)
