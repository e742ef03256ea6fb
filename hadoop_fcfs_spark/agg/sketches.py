"""Re-aggregatable sketch tier: HyperLogLog / KLL-quantile / Theta
partial sketches + rollups.

The 100 TB pattern this exists for: you cannot afford to re-scan the
corpus for every distinct-count slice, so you materialize SKETCHES at a
fine grain once (one corpus scan, map-side partial aggregation, a few
KB per group) and answer every coarser rollup by UNIONING sketches —
never touching the raw data again. Spark ships Apache DataSketches HLL
as built-in aggregates (hll_sketch_agg / hll_union_agg /
hll_sketch_estimate), all JVM-side and mergeable across partitions —
the same algebraic-aggregate contract the reference's combiner
machinery (mapreduce.lib.aggregate, ValueAggregator.java:29) expresses
for sum/max/min, extended to the sketch algebra.

Estimates carry a relative standard error of ~1.04/sqrt(2^lgk)
(~1.6% at the default lgk=12); gates therefore assert a BOUND
(|approx-exact| <= tol*exact) rather than equality — the bound itself
is the oracled value, so a regression that degrades the sketch beyond
its contract fails the value-hash gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_partial(
    df: DataFrame, group_cols: list[str], value_col: str, lgk: int = 12
) -> DataFrame:
    """One corpus scan → a binary HLL sketch per group (columns:
    group_cols + `hll_sketch`). This is the materialization step: store
    it partitioned by the finest grain you'll ever roll up from."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("hll_sketch")
    )


def hll_rollup(
    partial: DataFrame, group_cols: list[str], sketch_col: str = "hll_sketch"
) -> DataFrame:
    """Roll partial sketches up to a coarser grain WITHOUT rescanning:
    union-merge the sketches, then estimate. Output: group_cols +
    `approx_distinct` (long)."""
    return partial.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias("approx_distinct")
    )


def kll_partial(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 200
) -> DataFrame:
    """One scan → a mergeable KLL quantile sketch (DataSketches) per
    group over a DOUBLE column (columns: group_cols + `kll_sketch`).
    The quantile twin of ``hll_partial``: materialize at the finest
    grain once, answer any coarser quantile by MERGING sketches —
    KLL guarantees ~1.65% RANK error at k=200 (99% confidence),
    independent of the value distribution."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)).alias(
            "kll_sketch"
        )
    )


def kll_merge_fold(list_col: Column) -> Column:
    """Merge an ARRAY of KLL sketch binaries into one sketch: fold the
    tail onto the head with the 2-arg scalar merge (Spark exposes no
    KLL merge-AGGREGATE, so callers collect_list a BOUNDED fan-in —
    days per type, state+delta — and fold here). Empty arrays yield
    NULL (try_element_at seed — plain element_at(arr, 1) THROWS on an
    empty array under ANSI); single-element arrays pass through."""
    return F.aggregate(
        F.slice(list_col, 2, F.greatest(F.size(list_col) - 1, F.lit(0))),
        F.try_element_at(list_col, F.lit(1)),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )


def kll_quantile_rollup(
    partial: DataFrame,
    group_cols: list[str],
    quantiles: list[float],
    sketch_col: str = "kll_sketch",
) -> DataFrame:
    """Roll KLL sketches up to a coarser grain without rescanning:
    merge, then read quantiles. Output: group_cols + q_<pct> double
    per requested quantile."""
    # Spark exposes KLL merge as a 2-arg scalar (no merge-aggregate), so
    # fold the per-fine-grain sketches with a higher-order aggregate():
    # collect_list is bounded by the fine-grain/coarse-grain fan-in (days
    # per type, shards per table — structurally small), each sketch ~KB.
    lists = partial.groupBy(*group_cols).agg(
        F.collect_list(sketch_col).alias("__sks")
    )
    merged = lists.select(
        *group_cols, kll_merge_fold(F.col("__sks")).alias("__m")
    )
    return merged.select(
        *group_cols,
        *[
            F.kll_sketch_get_quantile_double(F.col("__m"), F.lit(q)).alias(
                f"q_{int(q * 100)}"
            )
            for q in quantiles
        ],
    )


def theta_partial(
    df: DataFrame, group_cols: list[str], value_col: str, lgk: int = 12
) -> DataFrame:
    """One scan → a Theta sketch per group (columns: group_cols +
    `theta_sketch`). Unlike HLL, Theta supports the FULL set algebra —
    union, intersection, difference — so segment-overlap questions
    ("distinct users who did A and B") roll up from per-segment
    sketches without rescanning or re-shuffling raw ids."""
    return df.groupBy(*group_cols).agg(
        F.theta_sketch_agg(value_col, F.lit(lgk)).alias("theta_sketch")
    )


def cms_partial(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Count-Min sketch materialized AS A DATAFRAME: ``depth`` hash rows
    × ``width`` counters, stored as (group_cols…, row, pos, cnt) — at
    most depth·width rows per group regardless of input size.

    Cormode & Muthukrishnan's CMS is a pure counter array, so its
    algebra is exactly Spark's aggregation algebra: BUILD is one
    explode(depth)+groupBy-sum scan (map-side combined — the partial
    sketch per task IS the per-task CMS), and MERGE across finer grains
    is union + groupBy-sum (``cms_rollup``) — the same
    materialize-once / roll-up-forever contract as the HLL/KLL/Theta
    tiers, with no sketch binary to deserialize. Row hashes are
    ``xxhash64(row_index, key)`` — independent per row index,
    engine-deterministic.
    """
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    gc = list(group_cols or [])
    rows = df.select(
        *gc,
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
        F.col(key_col).alias("__k"),
    )
    return (
        rows.select(*gc, "row", cms_cell_pos("row", "__k", width).alias("pos"))
        .groupBy(*gc, "row", "pos")
        .agg(F.count("*").alias("cnt"))
    )


def cms_cell_pos(row_col: str, key_col: str, width: int) -> Column:
    """THE CMS cell-hash definition: pos = xxhash64(row, key) mod width
    — one shared expression so the batch build (:func:`cms_partial`),
    the estimator (:func:`cms_estimate`) and the streaming twin
    (streaming.stateful.stream_cms_monitor) can never disagree on
    where an element lands (the hashing stays JVM-side in all three;
    the stream twin's Python state only ADDS, it never hashes)."""
    return F.pmod(F.xxhash64(row_col, key_col), F.lit(width))


def cms_rollup(
    partial: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge finer-grain CMS partials to a coarser grain: counter-wise
    sum. (CMS merge is exact counter addition — order-independent.)"""
    gc = list(group_cols or [])
    return partial.groupBy(*gc, "row", "pos").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, width: int = 2048
) -> DataFrame:
    """Point-estimate counts for candidate keys against a CMS
    DataFrame: join each (key, row-hash position) to its counter, take
    the MIN across hash rows. Never over the raw data — the join right
    side is the depth×width sketch. Estimates only OVERCOUNT (collision
    mass adds); est <= true + e·N/width with prob 1-(1/2)^depth."""
    # depth inferred from the sketch itself so estimate can't drift from build
    depth_row = sketch.agg(F.max("row").alias("__maxrow"))
    cand = (
        keys.crossJoin(F.broadcast(depth_row))
        .select(
            F.col(key_col),
            F.explode(F.sequence(F.lit(0), F.col("__maxrow"))).alias("row"),
        )
        .withColumn("pos", cms_cell_pos("row", key_col, width))
    )
    hit = cand.join(sketch, ["row", "pos"], "left").select(
        key_col, F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    return hit.groupBy(key_col).agg(F.min("cnt").alias("est"))


def cms_join_size_estimate(
    sketch_a: DataFrame, sketch_b: DataFrame
) -> DataFrame:
    """Equi-join cardinality estimate from two CMS DataFrames over the
    join key: |A ⋈ B| = Σ_k cA(k)·cB(k), estimated as the MIN over
    hash rows of the counter inner product — the classic CMS
    inner-product estimator (Cormode & Muthukrishnan §4.2), and the
    join-size probe a planner runs WITHOUT touching either table
    (both operands are depth×width sketches).

    Overestimates only (collision mass is non-negative):
    exact <= est <= exact + e·N_A·N_B/width with prob 1-(1/2)^depth.
    One (row, pos) equi-join of two sketch-sized tables + a depth-row
    aggregation."""
    a = sketch_a.select("row", "pos", F.col("cnt").alias("__ca"))
    b = sketch_b.select("row", "pos", F.col("cnt").alias("__cb"))
    per_row = (
        a.join(b, ["row", "pos"])
        .groupBy("row")
        .agg(F.sum(F.col("__ca") * F.col("__cb")).alias("__ip"))
    )
    return per_row.agg(F.min("__ip").cast("long").alias("join_size_est"))


def ams_f2_audit(df: DataFrame, key_col: str, n_est: int = 16) -> DataFrame:
    """AMS second-frequency-moment sketch with its estimation-error
    audit (Alon–Matias–Szegedy, STOC 1996): F₂ = Σ_x f_x² is the
    self-join size of the key column — the quantity every join-size /
    skew estimator needs — and the AMS tug-of-war sketch estimates it
    from ``n_est`` counters Z_i = Σ_x s_i(x)·f_x with ±1 hashes s_i:
    E[Z_i²] = F₂. This op computes the sketch AND the exact answer in
    the same pass and reports the relative error — the sketch-tier
    audit alongside cms_join_size (CMS inner-product route), the way
    ann_ivf_recall audits IVF and minhash_estimate_audit audits LSH.

    Signs come from md5 parity (the sampling-tier cross-engine hash
    family — portable to any engine; production would use xxhash64).
    Everything is exact BIGINT: frequencies from one map-side-combined
    pass, each Z_i an exact signed sum computed as n_est conditional
    aggregates in a SECOND single-row reduce over the key grain (no
    fan-out explode — the estimators ride one pass), Z_i² exact, the
    mean estimate one truncating div, the median-of-estimators the
    2x central-pair sum of a sorted 16-literal array. Relative errors
    in truncating micro units. Output: 1 row (n_keys, f2_exact,
    est_mean, est_med2x, rel_err_mean_micro, rel_err_med_micro)."""
    if n_est < 2 or n_est % 2 != 0:
        raise ValueError(f"n_est must be even and >= 2, got {n_est}")
    freq = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).cast("string").alias("__x"))
        .agg(F.count("*").cast("long").alias("__f"))
    )

    def sign(i: int) -> Column:
        bit = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws("|", F.col("__x"), F.lit(str(i))).cast(
                            "binary"
                        )
                    ),
                    1, 8,
                ),
                16, 10,
            ).cast("long")
            % 2
        )
        return F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1))

    m = freq.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum(F.col("__f") * F.col("__f")).cast("long").alias("f2_exact"),
        *[
            F.sum(sign(i) * F.col("__f")).cast("long").alias(f"__z{i}")
            for i in range(n_est)
        ],
    )
    ests = ", ".join(f"__z{i} * __z{i}" for i in range(n_est))
    h = n_est // 2
    return m.selectExpr(
        "n_keys", "f2_exact",
        f"CAST(aggregate(array({ests}), 0L, (a, x) -> a + x)"
        f" div {n_est} AS BIGINT) AS est_mean",
        f"CAST(element_at(array_sort(array({ests})), {h})"
        f" + element_at(array_sort(array({ests})), {h + 1})"
        " AS BIGINT) AS est_med2x",
    ).selectExpr(
        "n_keys", "f2_exact", "est_mean", "est_med2x",
        "CASE WHEN f2_exact > 0 THEN ABS(est_mean - f2_exact) * 1000000"
        " div f2_exact END AS rel_err_mean_micro",
        "CASE WHEN f2_exact > 0 THEN ABS(est_med2x - 2 * f2_exact)"
        " * 1000000 div (2 * f2_exact) END AS rel_err_med_micro",
    )
