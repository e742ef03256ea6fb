"""Feature-encoding operators for training-data preparation: the
encode-before-train steps a modeling pipeline runs over raw columns
(leakage-safe target statistics, evidence-weight binning).

Reference parity: the reference expressed these as two chained
MapReduce jobs (per-key aggregate, then a map-side join of the
aggregate back onto the rows — e.g. the DataJoin pattern,
hadoop-fcfs datajoin/DataJoinReducerBase.java:40); here the aggregate
is a broadcast and the data rows never shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def loo_target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    scale: int = 100,
    out_col: str = "loo_e4",
) -> DataFrame:
    """Leave-one-out target encoding: each row's category feature is
    the mean of ``target_col`` over the OTHER rows of its category —
    the leakage-safe variant of mean encoding (plain per-category mean
    leaks each row's own label into its feature; LOO subtracts it:
    (S_g − y_i)/(n_g − 1)).

    Determinism and scale: targets floor-quantize to 1/``scale`` units
    so each category's (n, S) is an EXACT BIGINT pair from one
    map-side-combined aggregate over #categories keys; the tiny
    summary BROADCASTS back (the data rows never shuffle — the
    temperature_mix shape) and the per-row encode is one subtraction
    + one correctly-rounded division, floored to e4 of the original
    units. Singleton categories (n=1) yield NULL — no other rows to
    borrow a mean from. NULL targets are excluded from (n, S) and get
    NULL encodes (they have no label to subtract)."""
    q = F.floor(F.col(target_col) * scale).cast("long")
    summ = (
        df.filter(F.col(target_col).isNotNull())
        .groupBy(F.col(cat_col).alias("__cat"))
        .agg(
            F.count("*").cast("long").alias("__n"),
            F.sum(q).cast("long").alias("__s"),
        )
    )
    enc = (
        (F.col("__s") - q).cast("double")
        / (F.col("__n") - 1).cast("double")
        / scale
        * 10_000.0
    )
    return (
        df.join(F.broadcast(summ), F.col(cat_col) == F.col("__cat"), "left")
        .withColumn(
            out_col,
            F.when(
                F.col(target_col).isNotNull() & (F.col("__n") > 1),
                F.floor(enc).cast("long"),
            ),
        )
        .drop("__cat", "__n", "__s")
    )


def woe_iv(
    df: DataFrame,
    bin_col: str | Column,
    flag_col: str | Column,
) -> DataFrame:
    """Weight-of-evidence binning table + per-bin information-value
    terms: for each bin, WOE = ln((g/G)/(b/B)) where g/b are the bin's
    event/non-event counts and G/B the totals — the classical
    credit-scoring / feature-screening encoding (monotone evidence
    scale; IV = Σ (g/G − b/B)·WOE ranks feature predictiveness).

    Determinism: counts are exact BIGINTs (one map-side-combined
    aggregate over #bins keys + a broadcast totals row); WOE is a flat
    ratio-of-ratios + one ln over those integers (identical expression
    shape cross-engine — the tf_idf ln-parity precedent), floored to
    e6. Each bin's IV term floor-quantizes to e12 SEPARATELY so the
    total IV = Σ terms is an exact BIGINT sum — order-independent,
    never an engine-ordered float accumulation. Bins empty in either
    class emit NULL woe/iv (ln(0) is undefined; standard practice is
    to merge or smooth such bins upstream — left visible here for
    audit rather than silently smoothed). Output: one row per bin
    (bin, n_good, n_bad, woe_e6, iv_term_e12)."""
    b = bin_col if isinstance(bin_col, Column) else F.col(bin_col)
    fl = flag_col if isinstance(flag_col, Column) else F.col(flag_col)
    per = df.groupBy(b.alias("bin")).agg(
        F.sum(F.when(fl, 1).otherwise(0)).cast("long").alias("n_good"),
        F.sum(F.when(fl, 0).otherwise(1)).cast("long").alias("n_bad"),
    )
    tot = per.agg(
        F.sum("n_good").cast("long").alias("__tg"),
        F.sum("n_bad").cast("long").alias("__tb"),
    )
    dg = F.col("n_good").cast("double") / F.col("__tg").cast("double")
    db = F.col("n_bad").cast("double") / F.col("__tb").cast("double")
    ok = (F.col("n_good") > 0) & (F.col("n_bad") > 0)
    woe = F.log(dg / db)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_good",
            "n_bad",
            F.when(ok, F.floor(woe * 1_000_000).cast("long")).alias("woe_e6"),
            F.when(
                ok, F.floor((dg - db) * woe * 1_000_000_000_000).cast("long")
            ).alias("iv_term_e12"),
        )
    )


def grouped_quartiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Exact per-group quartiles (q1, median, q3) in 1/``scale`` units,
    lower-quantile convention: the smallest value whose cumulative count
    crosses p·n (integer cross-multiplied — never a float percentile).

    Scale shape: collapse to the per-group VALUE GRAIN once (map-side
    combined), cumulative counts via ops.sort.chunked_running_sum
    (value-bucket chunks — a corpus-sized group never funnels through
    one window task), then the three crossings fall out of ONE
    aggregation over grain rows. Output: one row per group
    (group, n, q1_q, med_q, q3_q) — quantized integers."""
    from hadoop_fcfs_spark.ops.sort import chunked_running_sum

    q = F.floor(F.col(value_col) * scale).cast("long")
    grain = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("__g"), q.alias("__q"))
        .agg(F.count("*").cast("long").alias("__c"))
    )
    cum = chunked_running_sum(
        grain, ["__g"], F.shiftright(F.col("__q"), 16), ["__q"], "__c",
        out_col="__cum",
    )
    n = grain.groupBy("__g").agg(F.sum("__c").cast("long").alias("__n"))
    return (
        cum.join(n, "__g")
        .groupBy("__g")
        .agg(
            F.max("__n").alias("n"),
            F.min(F.when(4 * F.col("__cum") >= F.col("__n"), F.col("__q")))
            .alias("q1_q"),
            F.min(F.when(2 * F.col("__cum") >= F.col("__n"), F.col("__q")))
            .alias("med_q"),
            F.min(F.when(4 * F.col("__cum") >= 3 * F.col("__n"), F.col("__q")))
            .alias("q3_q"),
        )
        .select(F.col("__g").alias(group_col), "n", "q1_q", "med_q", "q3_q")
    )


def robust_scale(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: int = 100,
    out_col: str = "robust_e6",
) -> DataFrame:
    """Per-group robust scaling (x − median)/IQR — the outlier-immune
    normalization feature pipelines prefer over z-scores when the raw
    column is heavy-tailed (a whale order moves a mean and stddev; it
    moves a median and IQR not at all). Completes the encode tier:
    mean-encode (loo_target_encode), evidence-encode (woe_iv),
    scale-normalize (this).

    Determinism: median/IQR are EXACT quantized integers from
    ``grouped_quartiles`` (lower-crossing convention, integer
    cross-multiplies); the per-row scale is then one subtraction and
    one correctly-rounded division, floored to e6. The #groups-row
    quartile summary broadcasts back — the data rows never shuffle.
    NULL when the group's IQR is 0 (constant-bodied group: scaling is
    undefined, left visible rather than forced to 0) or the value is
    NULL."""
    qcol = F.floor(F.col(value_col) * scale).cast("long")
    quarts = grouped_quartiles(df, group_col, value_col, scale).select(
        F.col(group_col).alias("__qg"), "q1_q", "med_q", "q3_q"
    )
    scaled = (
        (qcol - F.col("med_q")).cast("double")
        / (F.col("q3_q") - F.col("q1_q")).cast("double")
    )
    return (
        df.join(F.broadcast(quarts), F.col(group_col) == F.col("__qg"), "left")
        .withColumn(
            out_col,
            F.when(
                F.col(value_col).isNotNull()
                & (F.col("q3_q") > F.col("q1_q")),
                F.floor(scaled * 1_000_000).cast("long"),
            ),
        )
        .drop("__qg", "q1_q", "med_q", "q3_q")
    )


def feature_hash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_features: int = 1024,
) -> DataFrame:
    """Hashing-trick text vectorization (Weinberger et al.): each token
    maps to feat_idx = md5_uniform32(token) mod D with a ±1 sign from
    an independent md5 nibble, and a document's feature value is the
    signed occurrence sum — the fixed-width, vocabulary-free
    featurizer a training pipeline uses when a learned vocabulary is
    too big or not yet available (no dictionary to build, broadcast,
    or version). The sign debiases collisions: E[colliding
    contribution] = 0, the standard signed hashing trick.

    Output: (id, feat_idx, val) for nonzero features only (signed
    counts can cancel to 0 — those are dropped, as a sparse vector
    would).

    Determinism at any scale: the md5-tier idiom shared with
    ops.sampling._sample_key — index and sign are pure per-token
    expressions, engine-replayable (DuckDB: CAST('0x'||substr(md5(w),
    1,8) AS BIGINT)), no vocabulary state, no RNG. Scale shape: the
    tokenize+explode is a projection; ONE shuffle to the (id,
    feat_idx) grain — map-side combinable since signs sum
    associatively. Collisions are a modeling tradeoff (D trades
    memory for collision rate), not a correctness issue."""
    if n_features < 1:
        raise ValueError(f"n_features must be >= 1, got {n_features}")
    toks = df.select(
        F.col(id_col).alias("__i"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("__w"),
    ).filter(F.col("__w") != "")
    key = F.conv(
        F.substring(F.md5(F.col("__w").cast("binary")), 1, 8), 16, 10
    ).cast("long")
    sign_nibble = F.conv(
        F.substring(F.md5(F.col("__w").cast("binary")), 9, 1), 16, 10
    ).cast("long")
    return (
        toks.select(
            "__i",
            (key % F.lit(int(n_features))).alias("feat_idx"),
            F.when(sign_nibble % 2 == 0, F.lit(1))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("__s"),
        )
        .groupBy(F.col("__i").alias(id_col), "feat_idx")
        .agg(F.sum("__s").cast("long").alias("val"))
        .filter(F.col("val") != 0)
    )
