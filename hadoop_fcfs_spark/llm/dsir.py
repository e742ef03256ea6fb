"""DSIR-style importance weighting for pretraining-data selection
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling"): score every raw document by how much more likely its
hashed n-gram bag is under a TARGET distribution than under the RAW
distribution, log w(x) = Σ_f c_f · (ln p_t(f) − ln p_r(f)), with
features hashed into a fixed bucket space so the model is two
B-sized count vectors, not a vocabulary.

Scale shape: one explode of unigrams+bigrams → per-(doc, bucket)
counts (the only data-sized shuffle, map-side combined); the bucket
log-ratio model re-aggregates FROM that table (aggregate-of-aggregate,
no second corpus scan) and is ≤ B rows — broadcast back for the
per-doc weight sum. The bucket key is the md5-uniform32 idiom
(ops/sampling._sample_key) so any engine replays the exact weights.

Reference analog: the aggregate-framework two-job shape
(ValueAggregatorJob counts then a scoring pass); here the "two jobs"
share one materialized feature table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hadoop_fcfs_spark.caching import waypoint


def _bucket(col: Column, num_buckets: int) -> Column:
    """md5-uniform bucket id in [0, num_buckets) — engine-replayable."""
    key = F.conv(
        F.substring(F.md5(col.cast("string").cast("binary")), 1, 8), 16, 10
    ).cast("long")
    return key % num_buckets


def hashed_ngram_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_buckets: int = 8192,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document hashed feature-bag counts: whitespace unigrams plus
    adjacent bigrams, bucketed. Output: id + carry_cols + (bucket, cnt).
    Bigrams are built inside the token ARRAY (zip of the array with its
    own shift — never a positions self-join), and the token array is
    projected to a column first so lambdas don't re-tokenize per
    element."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    base = df.select(F.col(id_col), *carry_cols, toks.alias("__ws"))
    ws = F.col("__ws")
    bigrams = F.zip_with(
        F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
        F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    grams = base.select(
        id_col, *carry_cols, F.explode(F.concat(ws, bigrams)).alias("__g")
    )
    return grams.groupBy(
        id_col, *carry_cols, _bucket(F.col("__g"), num_buckets).alias("bucket")
    ).agg(F.count("*").alias("cnt"))


def dsir_log_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    num_buckets: int = 8192,
) -> DataFrame:
    """Per-document DSIR log importance weight vs the in-corpus target
    subset selected by ``target_pred``. Add-1 smoothed bucket
    probabilities: p(f) = (count_f + 1) / (total + B). Positive
    log_weight = more target-like than the raw average (a corpus-scale
    statement: on toy inputs the +1 smoothing and a probe doc's own
    contribution to the raw counts can dominate the sign).

    Output: (id_col, n_features, log_weight). Division-only float math
    with identical expression shapes per engine; callers that gate on
    the weight should compare a FLOOR-quantized copy, not rank raw
    float sums."""
    feats = waypoint(
        hashed_ngram_features(
            df.withColumn("__is_t", target_pred),
            id_col,
            text_col,
            num_buckets,
            carry_cols=("__is_t",),
        )
    )
    stats = feats.groupBy("bucket").agg(
        F.sum("cnt").alias("__r"),
        F.sum(F.when(F.col("__is_t"), F.col("cnt")).otherwise(F.lit(0))).alias("__t"),
    )
    # Corpus totals ride a whole-frame window over the BUCKET-grain
    # stats table (≤ num_buckets rows by construction — the bounded
    # summary-window class, never data-grain), so the bucket aggregation
    # over the cached feature table runs ONCE; the previous
    # stats.agg→crossJoin shape evaluated it twice (once to build the
    # totals broadcast, once for the model side). Integer sums — the
    # totals are exact and identical either way.
    wall = Window.partitionBy()
    lam = (
        F.log(
            (F.col("__t") + 1.0)
            / (F.sum("__t").over(wall) + F.lit(float(num_buckets)))
        )
        - F.log(
            (F.col("__r") + 1.0)
            / (F.sum("__r").over(wall) + F.lit(float(num_buckets)))
        )
    )
    model = F.broadcast(stats.select("bucket", lam.alias("__lam")))
    return (
        feats.join(model, "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_features"),
            F.sum(F.col("cnt") * F.col("__lam")).alias("log_weight"),
        )
    )


def greedy_max_coverage(
    postings: DataFrame,
    k: int,
    doc_col: str = "doc",
    item_col: str = "item",
) -> list[tuple[int, object, int]]:
    """Greedy maximum-coverage selection (the (1−1/e)-approximation of
    the NP-hard max-cover objective): repeatedly pick the document
    covering the most NOT-yet-covered items — the diversity-first
    data-selection complement to DSIR's distribution matching (DSIR
    matches a target; max-cover maximizes breadth, e.g. of n-gram
    shingles, for instruction-tuning variety).

    Scale shape: ``postings`` (doc, item — distinct) stays distributed;
    each of the k iterations is one anti-join of the postings against
    the covered-item set (hash join, no window), a per-doc count
    aggregation (map-side combined), and a TakeOrdered(1) argmax with
    (gain desc, doc asc) tiebreak — exact integer gains, any engine
    replays the identical picks. Driver state is k rows + the covered
    set stays a DataFrame (localCheckpoint per pick, kcenter_greedy
    precedent; the per-iteration 1-row collect is inherent to the
    sequential greedy, cost ∝ k).

    Stops early when no remaining document covers a new item. Returns
    [(pick, doc, gain)] with pick 1..≤k."""
    from pyspark.sql import functions as F

    from hadoop_fcfs_spark.ops.sort import top_k

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    p = postings.select(
        F.col(doc_col).alias("__doc"), F.col(item_col).alias("__item")
    ).distinct().localCheckpoint()
    spark = postings.sparkSession
    covered = spark.createDataFrame([], p.select("__item").schema)
    chosen: list[tuple[int, object, int]] = []
    for pick in range(1, k + 1):
        remaining = p.join(covered, "__item", "left_anti")
        if chosen:
            taken = spark.createDataFrame(
                [(c[1],) for c in chosen], p.select("__doc").schema
            )
            remaining = remaining.join(taken, "__doc", "left_anti")
        gains = remaining.groupBy("__doc").agg(F.count("*").alias("__gain"))
        best = top_k(gains, 1, F.desc("__gain"), F.asc("__doc")).collect()
        if not best:
            break
        b = best[0]
        chosen.append((pick, b["__doc"], b["__gain"]))
        covered = (
            covered.unionByName(
                p.filter(F.col("__doc") == F.lit(b["__doc"])).select("__item")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
    return chosen
