"""Text map operators: tokenize, regex extract, grep, inverse.

Parity targets (SURVEY.md §2.2):
- ``TokenCounterMapper`` (reference
  ``mr-core/mapreduce/lib/map/TokenCounterMapper.java:35``): Java
  StringTokenizer ≈ split on whitespace runs, drop empties.
- ``RegexMapper`` (``mr-core/mapreduce/lib/map/RegexMapper.java:36``):
  emit (match_group, 1) per regex match.
- ``Grep`` example 2-job pipeline (``examples/Grep.java:59-88``):
  regex-count then sort-by-count-desc — here a single lazy DataFrame
  chain (job-boundary removal is free in Spark).
- ``InverseMapper`` (``mr-core/mapreduce/lib/map/InverseMapper.java:30``).

All pure Column expressions — codegen'd, no Python on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokenize(df: DataFrame, text_col: str, out_col: str = "token") -> DataFrame:
    """One output row per whitespace-delimited token (UDTF-shaped map)."""
    tok = F.explode(F.split(F.col(text_col), r"\s+")).alias(out_col)
    return df.select(tok).filter(F.col(out_col) != "")


def token_count(df: DataFrame, text_col: str) -> DataFrame:
    """WordCount (reference ``examples/WordCount.java:35``): map-side
    partial aggregation (the combiner) is automatic in HashAggregateExec."""
    return tokenize(df, text_col).groupBy("token").agg(F.count("*").alias("cnt"))


def regex_extract_count(df: DataFrame, text_col: str, pattern: str, group: int = 0) -> DataFrame:
    """RegexMapper + IntSumReducer: count every regex match occurrence."""
    m = F.explode(F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(group)))
    return (
        df.select(m.alias("match"))
        .filter(F.col("match") != "")
        .groupBy("match")
        .agg(F.count("*").alias("cnt"))
    )


def grep(df: DataFrame, text_col: str, pattern: str, group: int = 0) -> DataFrame:
    """The Grep example: regex-count, then order by count desc (the
    reference's second single-reducer sort job ``Grep.java:82-84`` is the
    final orderBy here — one DataFrame chain, no intermediate HDFS I/O)."""
    counted = regex_extract_count(df, text_col, pattern, group)
    return counted.orderBy(F.desc("cnt"), F.asc("match"))


def inverse(df: DataFrame, key_col: str = "key", value_col: str = "value") -> DataFrame:
    """(k, v) → (v, k)."""
    return df.select(F.col(value_col).alias(key_col), F.col(key_col).alias(value_col))


def inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_shards: int | None = None,
) -> DataFrame:
    """Inverted index — the canonical MapReduce example beyond WordCount
    (map: (term, doc) pairs; reduce: postings list per term — the shape
    every Hadoop-era tutorial built on ``examples/WordCount.java:35``'s
    skeleton). Output: (term, doc_freq, total_tf, postings) where
    postings is the SORTED distinct doc-id list.

    Scale shape: the (term, doc) partial aggregation combines map-side;
    the only hotspot is the postings ``collect_list`` for stopword-grade
    terms (one reducer key holding millions of doc ids — the same
    reducer-hotspot the reference had). ``n_shards`` bounds it: postings
    group by (term, doc_id % n_shards) so no single task materializes a
    full stopword posting; readers union shards (d-gap style blocked
    postings). Leave None when term frequencies are corpus-bounded.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    per_doc = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    keys = ["term"] if n_shards is None else ["term", "shard"]
    if n_shards is not None:
        per_doc = per_doc.withColumn("shard", F.pmod("doc_id", F.lit(n_shards)))
    return per_doc.groupBy(*keys).agg(
        F.count("*").alias("doc_freq"),
        F.sum("tf").cast("long").alias("total_tf"),
        F.sort_array(F.collect_list("doc_id")).alias("postings"),
    )


def cooccurrence_pairs(
    df: DataFrame, text_col: str, window: int = 2
) -> DataFrame:
    """Windowed word co-occurrence — the "pairs" pattern (Lin & Dyer,
    *Data-Intensive Text Processing with MapReduce* §3.2, the standard
    companion exercise to the reference's WordCount): count unordered
    token pairs within ``window`` positions of each other.

    All pair generation happens INSIDE the token array (nested
    ``transform`` + ``slice`` + one ``flatten``), so the plan is a
    single explode of the final pair array → groupBy count: no
    positions self-join, no row ever carries the token array more than
    once. Pair keys are canonicalized (least, greatest) so (a,b) and
    (b,a) merge. The count aggregation partial-combines map-side — the
    combiner the MapReduce pattern had to hand-write.
    """
    # project the token array ONCE — referencing the split expression
    # inside the per-element lambda would re-tokenize per element
    base = df.select(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "").alias("__arr")
    )
    arr = F.col("__arr")
    pairs = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + F.lit(2), F.lit(window)),
                lambda y: F.struct(
                    F.least(x, y).alias("w1"), F.greatest(x, y).alias("w2")
                ),
            ),
        )
    )
    return (
        base.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cnt"))
    )


def fuzzy_term_pairs(
    terms: DataFrame, term_col: str = "term", min_len: int = 4
) -> DataFrame:
    """Approximate string self-join at edit distance <= 1 without an
    all-pairs comparison (the FastSS / deletion-neighborhood algorithm):
    every term emits itself plus its single-character-deletion variants;
    two terms within one edit ALWAYS share a variant, so candidates come
    from an equi-join on the variant key and are then verified with an
    exact levenshtein. Cost = O(len) variants per term + bucket joins —
    never vocabulary².

    Output: (term_a, term_b, dist) with term_a < term_b, dist <= 1
    (identical strings are not pairs — dedup them upstream).
    """
    tl = F.col(term_col)
    # deletion variants via substring concat: del_i = s[:i-1] + s[i:]
    dels = F.transform(
        F.sequence(F.lit(1), F.length(tl)),
        lambda i: F.concat(
            F.substring(tl, F.lit(1), i - F.lit(1)),
            F.substring(tl, i + F.lit(1), F.length(tl)),
        ),
    )
    keyed = terms.filter(F.length(tl) >= min_len).select(
        tl.alias("t"), F.explode(F.array_union(F.array(tl), dels)).alias("v")
    )
    l = keyed.select(F.col("t").alias("term_a"), "v")
    r = keyed.select(F.col("t").alias("term_b"), "v")
    return (
        l.join(r, "v")
        .filter(F.col("term_a") < F.col("term_b"))
        .select("term_a", "term_b")
        .distinct()
        .withColumn("dist", F.levenshtein("term_a", "term_b"))
        .filter(F.col("dist") <= 1)
    )
