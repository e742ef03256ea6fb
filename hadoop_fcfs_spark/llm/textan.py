"""Text-analysis operators: language-ID, quality scoring, token
counting, fingerprinting. All pure Column expressions — codegen'd,
scale-free (per-row map work, no shuffle).

These generalize the reference's word-stats family
(examples/WordMean.java:196 etc.) into the per-document scoring ops a
training-data pipeline filters on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small deterministic stopword inventories (n-gram heuristic seed sets).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es": ("el", "la", "los", "que", "y", "es", "un", "en"),
}


def _tokens(text_col: str) -> Column:
    return F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit(""))


def _stop_ratio(toks: Column, words: tuple[str, ...]) -> Column:
    sw = F.array(*[F.lit(w) for w in words])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return hits / F.greatest(F.size(toks), F.lit(1))


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-ratio language heuristic. Per doc: one score per
    language; prediction = argmax (ties → lexicographically first
    language; 'und' = undetermined when all scores are 0).
    Output: (id, score_<lang>…, lang_pred)."""
    toks = _tokens(text_col)
    scores = {lang: F.round(_stop_ratio(toks, words), 4) for lang, words in STOPWORDS.items()}
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    # reversed alphabetical so the FIRST alphabetical language wins ties
    for lang in sorted(STOPWORDS, reverse=True):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best <= 0, F.lit("und")).otherwise(pred)
    cols = [F.col(id_col)] + [scores[lang].alias(f"score_{lang}") for lang in sorted(STOPWORDS)]
    return df.select(*cols, pred.alias("lang_pred"))


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic document quality: token count, distinct ratio, mean
    token length, alphabetic-token ratio, English stopword ratio, and
    a bounded composite score. The filterable per-doc signal set of a
    pretraining pipeline; every term is deterministic and engine-
    portable (ANSI-SQL-expressible for the oracle)."""
    toks = _tokens(text_col)
    n = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    mean_len = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
    ) / F.greatest(n, F.lit(1))
    alpha_ratio = F.size(F.filter(toks, lambda t: t.rlike("^[a-z]+$"))) / F.greatest(n, F.lit(1))
    stop_ratio = _stop_ratio(toks, STOPWORDS["en"])
    uniq_ratio = n_uniq / F.greatest(n, F.lit(1))
    score = (
        0.3 * F.least(n.cast("double") / 100.0, F.lit(1.0))
        + 0.3 * stop_ratio
        + 0.2 * uniq_ratio
        + 0.2 * alpha_ratio
    )
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        n_uniq.cast("long").alias("n_uniq_tokens"),
        F.round(mean_len, 4).alias("mean_tok_len"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(uniq_ratio, 4).alias("uniq_ratio"),
        # floor-to-micro-units instead of round: the composite's exact
        # rational value lands on decimal half-tails for round doc
        # lengths (e.g. n=64 → granularity 1/128000), where round()
        # implementations disagree across engines (Java shortest-repr
        # HALF_UP vs C scale-and-round). floor(x*1e6) is a pure IEEE
        # function of the (bit-identical) double — engine-portable.
        F.floor(score * 1_000_000).cast("long").alias("quality_e6"),
    )


# BPE-ish pre-tokenization: letter runs, digit runs, single other chars.
BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish pre-token count + char count —
    the cost/budget accounting columns of a data pipeline."""
    toks = _tokens(text_col)
    bpe = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), F.lit(0))
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("ws_tokens"),
        F.size(bpe).cast("long").alias("bpe_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str, prefix_words: int = 8) -> DataFrame:
    """Document fingerprints: full-text digest (md5 of normalized
    text), prefix digest (first `prefix_words` words — cheap clustering
    key for prefix-dup detection), and a 64-bit rolling content hash
    (xxhash64 of the sorted distinct token set — order-insensitive)."""
    norm = F.lower(F.trim(F.col(text_col)))
    toks = _tokens(text_col)
    prefix = F.concat_ws(" ", F.slice(toks, 1, prefix_words))
    bag = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("md5_full"),
        F.md5(prefix).alias("md5_prefix"),
        F.xxhash64(bag).alias("bag_hash"),
    )


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, w: int = 4
) -> DataFrame:
    """MOSS-style winnowing fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash every word k-gram, then in each sliding window of
    `w` consecutive k-gram hashes keep the minimum — any shared
    contiguous run of ≥ k + w - 1 words between two documents is
    GUARANTEED to share a fingerprint (the local-minimum property),
    while only ~2/(w+1) of positions are kept.

    Pure expressions end-to-end (split → transform → sliding
    array_min → distinct → explode); per-row map work, no shuffle —
    the copy-detection substrate that pairs with the LSH dedup tier.
    Output: (doc, fp) distinct pairs."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit(""))
    base = df.select(F.col(id_col).alias("doc"), toks.alias("__t"))
    n = F.size(F.col("__t"))
    kgrams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.xxhash64(F.array_join(F.slice(F.col("__t"), i, k), " ")),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    hashed = base.select("doc", kgrams.alias("__kh"))
    m = F.size(F.col("__kh"))
    fps = F.when(
        m >= w,
        F.transform(
            F.sequence(F.lit(1), m - w + 1),
            lambda i: F.array_min(F.slice(F.col("__kh"), i, w)),
        ),
    ).otherwise(F.col("__kh"))  # short docs: every k-gram hash is a fingerprint
    return (
        hashed.select("doc", F.explode(F.array_distinct(fps)).alias("fp"))
        .distinct()
    )
