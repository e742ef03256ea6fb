"""DSIR-style importance weighting for pretraining-data selection
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling"): score every raw document by how much more likely its
hashed n-gram bag is under a TARGET distribution than under the RAW
distribution, log w(x) = Σ_f c_f · (ln p_t(f) − ln p_r(f)), with
features hashed into a fixed bucket space so the model is two
B-sized count vectors, not a vocabulary.

Scale shape: per-(doc, bucket) counts fold IN-ROW (sort + run-length
encode of each doc's bucket array — no data-sized shuffle at all); the
bucket log-ratio model aggregates FROM that doc-grain table (explode +
map-side combine bounds the exchange at ≤ B rows per task) and
collapses to ONE dense B-double-array row broadcast back for the
in-row per-doc weight fold. The bucket key is the md5-uniform32 idiom
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


def _gram_bucket_arrays(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_buckets: int = 8192,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Doc-grain hashed gram-instance buckets: id + carry_cols + ``__bk``,
    an array<long> with ONE element per unigram/bigram instance (doc
    order, duplicates kept) — the flat per-gram form of the feature bag,
    computed without any exchange. Documents with no tokens yield no row
    (explode parity)."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    base = df.select(F.col(id_col), *carry_cols, toks.alias("__ws"))
    ws = F.col("__ws")
    bigrams = F.zip_with(
        F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
        F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bk = F.transform(F.concat(ws, bigrams), lambda g: _bucket(g, num_buckets))
    return base.select(id_col, *carry_cols, bk.alias("__bk")).where(
        F.size(F.col("__bk")) > 0
    )


def _ngram_bucket_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_buckets: int = 8192,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Doc-grain hashed feature bags: id + carry_cols + ``__fb``, an
    array<struct<bucket,cnt>> sorted by bucket, computed IN-ROW (sort +
    run-length encode of the per-doc bucket array). The per-(doc, bucket)
    counts are EXACTLY the rows the old explode→groupBy produced — same
    integer cnt per (doc, bucket), grouped inside the row instead of
    through a data-sized exchange. Documents with no tokens yield no row
    (explode parity). Bigrams are built inside the token ARRAY (zip of
    the array with its own shift — never a positions self-join)."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    base = df.select(F.col(id_col), *carry_cols, toks.alias("__ws"))
    ws = F.col("__ws")
    bigrams = F.zip_with(
        F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
        F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bs = F.array_sort(
        F.transform(F.concat(ws, bigrams), lambda g: _bucket(g, num_buckets))
    )
    rows = base.select(id_col, *carry_cols, bs.alias("__bs")).where(
        F.size(F.col("__bs")) > 0
    )
    n = F.size(F.col("__bs"))
    # Run starts in the sorted bucket array. The i == 1 guard compares
    # bs[1] to bs[max(i-1, 1)] = bs[1] (never index 0 — ANSI-safe
    # without relying on OR short-circuit), which is false, so position
    # 1 rides the explicit i == 1 disjunct.
    starts = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: (i == F.lit(1))
        | (
            F.element_at(F.col("__bs"), i)
            != F.element_at(F.col("__bs"), F.greatest(i - 1, F.lit(1)))
        ),
    )
    nexts = F.concat(
        F.slice(starts, 2, F.greatest(F.size(starts) - 1, F.lit(0))),
        F.array(n + 1),
    )
    fb = F.zip_with(
        starts,
        nexts,
        lambda s, e: F.struct(
            F.element_at(F.col("__bs"), s).alias("bucket"),
            (e - s).cast("long").alias("cnt"),
        ),
    )
    # The n > 0 guard makes the expression TOTAL: the optimizer infers a
    # `size(__fb) > 0` conjunct from a downstream explode and can
    # evaluate it on rows the size(__bs) > 0 filter would drop (conjunct
    # evaluation order is not a contract), and on an empty __bs
    # sequence(1, 0) descends through index 0 — element_at throws.
    # when/otherwise branch laziness IS a contract, so empty rows yield
    # NULL (then filtered) instead of evaluating the RLE.
    guarded = F.when(n > 0, fb).otherwise(
        F.lit(None).cast("array<struct<bucket:bigint,cnt:bigint>>")
    )
    return rows.select(id_col, *carry_cols, guarded.alias("__fb"))


def hashed_ngram_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_buckets: int = 8192,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document hashed feature-bag counts: whitespace unigrams plus
    adjacent bigrams, bucketed. Output: id + carry_cols + (bucket, cnt).
    The (doc, bucket) counts fold IN-ROW (``_ngram_bucket_rows``) and
    explode — same rows as the old explode→groupBy shape with ZERO
    exchange (the data-sized (doc, bucket) shuffle is gone)."""
    rows = _ngram_bucket_rows(df, id_col, text_col, num_buckets, carry_cols)
    return rows.select(
        id_col, *carry_cols, F.explode(F.col("__fb")).alias("__e")
    ).select(
        id_col,
        *carry_cols,
        F.col("__e.bucket").alias("bucket"),
        F.col("__e.cnt").alias("cnt"),
    )


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
        _gram_bucket_arrays(
            df.withColumn("__is_t", target_pred),
            id_col,
            text_col,
            num_buckets,
            carry_cols=("__is_t",),
        )
    )
    # Bucket totals: explode the doc-grain gram-bucket arrays and
    # aggregate to bucket grain — partial (map-side) aggregation bounds
    # the exchange at ≤ num_buckets rows per map task, so unlike the old
    # (doc, bucket) feature shuffle nothing data-sized crosses the wire.
    # COUNT per bucket over gram instances == SUM(cnt) over the old
    # per-(doc, bucket) rows — identical integers, so lam is
    # bit-identical.
    ex = feats.select("__is_t", F.explode(F.col("__bk")).alias("__b"))
    stats = ex.groupBy(F.col("__b").alias("bucket")).agg(
        F.count("*").alias("__r"),
        F.sum(F.when(F.col("__is_t"), F.lit(1)).otherwise(F.lit(0))).alias(
            "__t"
        ),
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
    # Scoring: the model collapses to ONE row — a dense num_buckets
    # double array indexed by bucket (built once from the ≤ num_buckets
    # model rows; every bucket referenced by any doc exists in stats by
    # construction, absent buckets fill 0.0 and are never read) — and is
    # broadcast-attached to the doc-grain gram arrays. The per-doc
    # weight folds IN-ROW over the grams (one lam term per gram
    # instance, doc order), so the old explode→broadcast-join→
    # groupBy(doc) re-shuffle of the feature table is gone: after the
    # waypoint the doc side is exchange-free. Per-doc Σ_g lam[bucket(g)]
    # sums the SAME real mass as the old Σ_b cnt_b·lam_b with a
    # different float term grouping — the DuckDB oracles are
    # restructured in lockstep (per-gram model join), and the gate's
    # floor-e3 margin (min |·×1000 − round| ≈ 5e-5 at sf0.1) dwarfs the
    # ~1e-9 regrouping perturbation; verified output-identical at all
    # three SFs.
    model = stats.select("bucket", lam.alias("__lam"))
    mm = model.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bucket"), F.col("__lam")))
        ).alias("__mm")
    )
    dense = mm.select(
        F.transform(
            F.sequence(F.lit(0), F.lit(num_buckets - 1)),
            lambda b: F.coalesce(
                F.try_element_at(F.col("__mm"), b.cast("long")), F.lit(0.0)
            ),
        ).alias("__lams")
    )
    lams = F.col("__lams")
    return feats.crossJoin(F.broadcast(dense)).select(
        id_col,
        F.size(F.col("__bk")).cast("long").alias("n_features"),
        F.aggregate(
            F.col("__bk"),
            F.lit(0.0),
            lambda acc, b: acc
            + F.element_at(lams, (b + F.lit(1)).cast("int")),
        ).alias("log_weight"),
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
