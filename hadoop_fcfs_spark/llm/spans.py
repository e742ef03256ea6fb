"""Exact duplicate-substring detection: the "suffix-array tier" of
training-data dedup (Lee et al., "Deduplicating Training Data Makes
Language Models Better", ACL 2022), re-expressed Spark-first.

The reference corpus-dedup literature finds byte-level substrings of
length >= L that occur more than once in the corpus and removes the
extra occurrences. A literal suffix array is a single-machine data
structure; the distributed re-expression used here is the standard
posting-list form:

  1. tokenize each document (positions over the *filtered* token array,
     so both engines agree on offsets),
  2. slide a width-``w`` token window over every document — every
     duplicated substring of >= w tokens is a run of >= 1 duplicated
     w-gram windows, and conversely any maximal run of duplicated
     windows IS a maximal duplicated span (same guarantee the winnowing
     / n-gram literature relies on),
  3. group window fingerprints corpus-wide, keep fingerprints with
     count >= min_count (one aggregation: the posting list),
  4. semi-join window starts against the duplicated-fingerprint set,
  5. per-document gaps-and-islands merge of overlapping windows
     (window function partitioned BY DOCUMENT — never a global sort).

Scale notes (100 TB):
  - The only corpus-sized shuffles are (a) the fingerprint groupBy —
    8-byte xxhash64 keys + a count, partial-aggregated map-side — and
    (b) the island merge, partitioned by doc_id. No all-pairs joins.
  - Super-frequent windows (boilerplate: license headers, nav bars) are
    exactly the skewed keys; the aggregation is a count (map-side
    combine absorbs the skew) and the semi-join build side is the
    *duplicated-fingerprint* set, handled by AQE skew-join splitting.
  - xxhash64 fingerprints: at 1e12 windows expect ~birthday 1e6 spurious
    64-bit collisions — harmless for dedup (a false "duplicate" span is
    a removal policy question, not a correctness crash); use the
    gram text itself (or a 128-bit hash pair) where exactness matters.

Reference parity: the reference tree has no corpus dedup; this module
belongs to the LLM-pipeline extension surface (SURVEY §2 extension
tier) next to llm/dedup.py's MinHash/SimHash approximate tiers — this
is the *exact substring* tier those papers pair with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hadoop_fcfs_spark.tables import fan_out


def _token_array(df: DataFrame, id_col: str, text_col: str):
    """(id, tk: array<string>) with empty tokens dropped BEFORE position
    assignment, so offsets match any engine that filters-then-enumerates."""
    return fan_out(df).select(
        F.col(id_col),
        F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")).alias("tk"),
    )


def window_fingerprints(
    df: DataFrame, id_col: str, text_col: str, w: int
) -> DataFrame:
    """All width-``w`` token windows: (id, pos, fp) where ``pos`` is the
    0-based start token offset and ``fp`` = xxhash64 of the
    space-rejoined window. Docs shorter than ``w`` tokens produce no
    rows (sequence() is guarded — Spark's sequence(0, negative) counts
    DOWNWARD, it does not return empty)."""
    if w < 1:
        raise ValueError(f"window width must be >= 1, got {w}")
    toks = _token_array(df, id_col, text_col)
    starts = F.when(
        F.size("tk") >= w, F.sequence(F.lit(0), F.size("tk") - F.lit(w))
    ).otherwise(F.array().cast("array<int>"))
    grams = toks.select(
        F.col(id_col),
        F.posexplode(
            F.transform(starts, lambda i: F.concat_ws(" ", F.slice("tk", i + 1, w)))
        ).alias("pos", "gram"),
    )
    return grams.select(
        F.col(id_col),
        F.col("pos").cast("long").alias("pos"),
        F.xxhash64("gram").alias("fp"),
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Maximal duplicated token spans per document.

    Returns (id_col, span_start, span_end, n_windows): every maximal
    token range [span_start, span_end] (inclusive, 0-based offsets into
    the filtered token sequence) whose width-``w`` windows ALL occur
    >= ``min_count`` times corpus-wide. Overlapping duplicated windows
    (sharing >= 1 token, start gap <= w-1) merge into one span;
    touching-but-disjoint runs stay separate spans (the boundary-
    crossing window was not duplicated, so the concatenation is not an
    attested duplicate substring).
    """
    from hadoop_fcfs_spark.caching import waypoint

    # grams feeds TWO structurally different consumers (the corpus-wide
    # fingerprint census and the semi-join probe side); without the
    # persist the scan→tokenize→window-hash chain executes once per
    # consumer (no ReusedExchange across the branches). Rows are
    # (id, pos, fp) — 24 bytes each, same size class as the jaccard/LSH
    # gram waypoints.
    grams = waypoint(window_fingerprints(df, id_col, text_col, w))
    # Posting list: fingerprints seen >= min_count times corpus-wide.
    # 8-byte keys + a count; map-side partial agg absorbs boilerplate skew.
    dup_fps = grams.groupBy("fp").count().where(F.col("count") >= min_count).select("fp")
    hits = grams.join(dup_fps, "fp", "leftsemi").select(id_col, "pos")
    wdoc = Window.partitionBy(id_col).orderBy("pos")
    islands = (
        hits.withColumn(
            "brk",
            F.when(F.col("pos") - F.lag("pos").over(wdoc) > w - 1, F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
        .withColumn("island", F.sum("brk").over(wdoc))
    )
    return islands.groupBy(id_col, "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(w - 1)).cast("long").alias("span_end"),
        F.count(F.lit(1)).alias("n_windows"),
    ).drop("island")


def duplicate_span_stats(
    df: DataFrame, id_col: str, text_col: str, w: int = 8, min_count: int = 2
) -> DataFrame:
    """Per-document duplicated-span summary: (id, n_spans,
    dup_tokens, max_span_len) — the triage view a dedup pipeline ranks
    documents by before deciding a removal policy (Lee et al. drop all
    but one occurrence; which occurrence survives is a policy knob,
    deliberately not baked in here)."""
    spans = duplicate_spans(df, id_col, text_col, w, min_count)
    span_len = F.col("span_end") - F.col("span_start") + F.lit(1)
    return spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(span_len).alias("dup_tokens"),
        F.max(span_len).alias("max_span_len"),
    )


def remove_boilerplate_units(
    df: DataFrame,
    id_col: str,
    text_col: str,
    unit_tokens: int = 16,
    min_docs: int = 2,
) -> DataFrame:
    """Paragraph-level cross-document dedup (the CCNet / C4 boilerplate
    pass): split every document into consecutive ``unit_tokens``-token
    units ("paragraphs" — the splitter is positional because the test
    corpus has no newlines; swap the unit builder for a newline split on
    real web text), drop every unit that occurs in >= ``min_docs``
    DISTINCT documents (license headers, nav bars, cookie banners),
    and reassemble each document from its surviving units in order.

    Returns (id_col, clean_text, n_kept, n_dropped). Documents that were
    pure boilerplate come back with clean_text = ''.

    Scale shape: one unit-fingerprint aggregation (8-byte xxhash64 keys,
    distinct-doc count partial-aggregated), a fingerprint equi-join to
    flag units, one groupBy(doc) reassembly — three linear shuffles, no
    all-pairs anything. The distinct-doc count is exactly where
    boilerplate skew concentrates; the count itself is the aggregate, so
    map-side combine absorbs it.
    """
    toks = _token_array(df, id_col, text_col)
    n_units = F.ceil(F.size("tk") / F.lit(float(unit_tokens))).cast("int")
    starts = F.when(
        F.size("tk") > 0, F.sequence(F.lit(0), n_units - F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    units = toks.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                starts,
                lambda i: F.concat_ws(
                    " ", F.slice("tk", i * unit_tokens + 1, unit_tokens)
                ),
            )
        ).alias("upos", "unit"),
    ).withColumn("fp", F.xxhash64("unit"))
    boiler = (
        units.groupBy("fp")
        .agg(F.countDistinct(id_col).alias("ndocs"))
        .where(F.col("ndocs") >= min_docs)
        .select("fp", F.lit(True).alias("is_b"))
    )
    flagged = units.join(boiler, "fp", "left").withColumn(
        "is_b", F.coalesce(F.col("is_b"), F.lit(False))
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("upos"), F.col("unit"), F.col("is_b")))
    )
    kept = F.filter(ordered, lambda s: ~s["is_b"])
    return flagged.groupBy(id_col).agg(
        F.array_join(F.transform(kept, lambda s: s["unit"]), " ").alias("clean_text"),
        F.size(kept).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("is_b"), 1).otherwise(0)).cast("long").alias("n_dropped"),
    )
