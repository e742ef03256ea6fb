"""Synthetic data generators.

Parity targets (SURVEY.md §2.1):
- ``RandomWriter`` (reference ``examples/RandomWriter.java``): random
  K/V records, map-only. → ``random_kv``.
- ``RandomTextWriter`` (``examples/RandomTextWriter.java``): random
  word text. → ``random_text``.
- ``TeraGen`` lives in bench/tera.py.

All generators derive values from xxhash64(id, salt) instead of RNG
state: deterministic for a given n regardless of partitioning or
cluster size (stronger reproducibility than the reference's per-task
seeds), embarrassingly parallel via spark.range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_WORDS = (
    "diurnalness,habitability,scholarium,emetically,sterility,aliment,"
    "epidiascope,carnassial,lithograph,quintessence,mendacious,pyrrhic,"
    "vestibule,tessellate,ombudsman,wainscot,xylophone,zeitgeist"
).split(",")


def _h(salt: int):
    return F.xxhash64(F.col("id"), F.lit(salt))


def random_kv(
    spark: SparkSession, num_rows: int, key_bytes: int = 10, value_bytes: int = 100,
    partitions: int | None = None,
) -> DataFrame:
    """Random binary-ish K/V records (RandomWriter): hex strings of the
    requested widths, uniform, deterministic."""
    df = spark.range(0, num_rows, 1, partitions or spark.sparkContext.defaultParallelism)
    key = F.substring(F.repeat(F.lpad(F.hex(_h(1)), 16, "0"), (key_bytes // 16) + 1), 1, key_bytes)
    val = F.substring(
        F.repeat(F.concat(F.lpad(F.hex(_h(2)), 16, "0"), F.lpad(F.hex(_h(3)), 16, "0")), (value_bytes // 32) + 1),
        1,
        value_bytes,
    )
    return df.select(key.alias("key"), val.alias("value"))


def random_text(
    spark: SparkSession, num_rows: int, words_per_row: int = 20, partitions: int | None = None
) -> DataFrame:
    """Random word lines (RandomTextWriter): each row a sentence of
    dictionary words chosen by hash — same vocabulary trick as the
    reference's word list."""
    df = spark.range(0, num_rows, 1, partitions or spark.sparkContext.defaultParallelism)
    vocab = F.array(*[F.lit(w) for w in _WORDS])
    words = F.transform(
        F.sequence(F.lit(1), F.lit(words_per_row)),
        lambda i: F.element_at(
            vocab, (F.pmod(F.xxhash64(F.col("id"), i), F.lit(len(_WORDS))) + 1).cast("int")
        ),
    )
    return df.select(F.col("id").alias("line_id"), F.array_join(words, " ").alias("text"))
