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

from pyspark.sql import Column, DataFrame
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
    totals = stats.agg(
        F.sum("__r").alias("__rtot"), F.sum("__t").alias("__ttot")
    )
    lam = (
        F.log((F.col("__t") + 1.0) / (F.col("__ttot") + F.lit(float(num_buckets))))
        - F.log((F.col("__r") + 1.0) / (F.col("__rtot") + F.lit(float(num_buckets))))
    )
    model = F.broadcast(
        stats.crossJoin(F.broadcast(totals)).select("bucket", lam.alias("__lam"))
    )
    return (
        feats.join(model, "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_features"),
            F.sum(F.col("cnt") * F.col("__lam")).alias("log_weight"),
        )
    )
