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
