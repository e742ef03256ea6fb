"""Byte-Pair-Encoding tokenizer training at corpus scale (Sennrich et
al. 2016): the count-heavy kernel of tokenizer construction, run as
DataFrame aggregations.

The scale insight (same as every serious BPE trainer): merges operate
on the WORD-TYPE table weighted by frequency — |vocab| rows (millions)
— never on the token stream (trillions). The corpus is touched exactly
once, to build (word, count); every merge iteration after that is a
vocab-sized explode + partial-aggregated pair count + an in-array
greedy merge rewrite. Driver state per iteration is ONE row (the
argmax pair — the k-means-centroid precedent for bounded collects).

Reference analog: the aggregate framework's iterative job chaining
(JobControl over ValueAggregator count jobs); each merge step is one
"job" whose output feeds the next.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END = "</w>"


def word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus → weighted word-type table with initial symbol arrays:
    (word, cnt, symbols = chars + '</w>'). The only corpus-sized pass
    in BPE training."""
    w = (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    return w.withColumn(
        "symbols", F.concat(F.split(F.col("word"), ""), F.array(F.lit(END)))
    )


def pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over the weighted vocab: one
    in-array zip (no positions self-join), one explode, map-side
    combined sum. Output: (left, right, pair_count)."""
    s = F.col("symbols")
    pairs = F.zip_with(
        F.slice(s, 1, F.size(s) - 1),
        F.slice(s, 2, F.size(s) - 1),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    return (
        vocab.select(F.explode(pairs).alias("p"), "cnt")
        .groupBy("p.left", "p.right")
        .agg(F.sum("cnt").alias("pair_count"))
    )


def _merge_once(symbols: Column, left: str, right: str) -> Column:
    """Greedy left-to-right rewrite of adjacent (left, right) →
    left||right inside a symbol array — the fold BPE applies per merge.
    Word-bounded arrays, pure expression, no UDF."""
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), x)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe_merges(
    df: DataFrame, text_col: str, n_merges: int
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Run ``n_merges`` BPE iterations. Returns (merges, final_vocab):
    merges as (left, right, pair_count) in learned order — argmax by
    (count desc, lexical left/right) so ties are deterministic across
    runs and partitionings — and the vocab with its rewritten symbol
    arrays. Each iteration localCheckpoints the vocab: the lineage
    would otherwise grow by one fold per merge and re-execute the whole
    history every count.

    Driver-iteration bound: BPE merges are inherently sequential (merge
    i+1's pair counts depend on merge i's rewrite), so each iteration
    costs exactly one 1-row argmax collect + one distributed rewrite —
    wall-clock grows linearly in ``n_merges`` with a per-iteration
    floor of one Spark job (~100ms scheduling latency). Practical
    ceiling is n_merges in the low thousands (a 32k-token vocab is a
    different regime — batch non-overlapping merges or use a
    single-node trainer on the aggregated word-type table, which is
    small: vocab size is bounded by distinct word TYPES, not corpus
    rows)."""
    from hadoop_fcfs_spark.ops.sort import top_k

    vocab = word_vocab(df, text_col).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = top_k(
            pair_counts(vocab),
            1,
            F.desc("pair_count"),
            F.asc("left"),
            F.asc("right"),
        ).collect()
        if not best:
            break
        b = best[0]
        merges.append((b["left"], b["right"], b["pair_count"]))
        vocab = vocab.withColumn(
            "symbols", _merge_once(F.col("symbols"), b["left"], b["right"])
        ).localCheckpoint()
    return merges, vocab


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    id_col: str | None = None,
    out_col: str = "tokens",
) -> DataFrame:
    """Apply a learned merge list to a corpus — the inference half of
    the trainer (``learn_bpe_merges`` builds the merges; this encodes
    arbitrary text with them). Semantics match the trainer exactly:
    each word becomes chars + '</w>' and the merges are applied IN
    LEARNED ORDER, each pass rewriting all adjacent occurrences greedy
    left-to-right (the same fold ``_merge_once`` applies during
    training — encode(train_corpus) reproduces the trainer's final
    vocab symbol arrays, pytest-locked).

    Scale shape: one ``mapInPandas`` over the documents — the merge
    list ships in the task closure (a tokenizer is ≤ ~32k pairs, KBs),
    encoding is pure per-row Python at the Arrow batch boundary (the
    documented slow-path exception: a symbol-level iterative rewrite
    has no Column-expression form at arbitrary merge depth; the
    expression fold used in training is per-MERGE, not per-corpus).
    Output: (id?, tokens array<string>, n_tokens).

    Tokenization matches ``word_vocab`` EXACTLY: NULL text encodes to
    [] (not the string 'None'), and words split on the same ASCII
    whitespace class Java's \\s matches — Python's str.split() is
    Unicode-aware (U+00A0 etc.) and would split words the trainer
    treated as single types, silently breaking the round-trip."""
    import re

    import pandas as pd

    # Java regex \s = [ \t\n\x0B\f\r] (ASCII only, unlike Python \s)
    java_ws = re.compile("[ \t\n\x0b\f\r]+")

    pairs = [(str(a), str(b)) for a, b in merges]
    cols = ([id_col] if id_col else []) + [text_col]
    src = df.select(*cols)
    schema = (
        (f"`{id_col}` {dict(src.dtypes)[id_col]}, " if id_col else "")
        + f"{out_col} array<string>, n_tokens long"
    )

    def encode_word(word: str) -> list[str]:
        syms = list(word) + [END]
        for left, right in pairs:
            if len(syms) < 2:
                break
            out, i, changed = [], 0, False
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                    changed = True
                else:
                    out.append(syms[i])
                    i += 1
            if changed:
                syms = out
        return syms

    def run(batches):
        for pdf in batches:
            toks = [
                []
                if txt is None
                else [
                    s
                    for w in java_ws.split(str(txt))
                    if w
                    for s in encode_word(w)
                ]
                for txt in pdf[text_col]
            ]
            out = {}
            if id_col:
                out[id_col] = pdf[id_col]
            out[out_col] = toks
            out["n_tokens"] = [len(ts) for ts in toks]
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema)
