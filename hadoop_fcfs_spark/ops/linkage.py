"""Probabilistic record linkage: Fellegi–Sunter m/u parameter
estimation over blocked candidate pairs.

The entity-resolution layer a multi-source training-data pipeline
needs above fuzzy joins (ops/joins.fuzzy_term_join finds candidate
pairs; cross_source_duplication counts shared content): given two
views of the same population with a labeled subset (a golden-key
sample, a clerically reviewed batch), estimate per-comparison-field

  m_f = P(field f agrees | records are the same entity)
  u_f = P(field f agrees | records are different entities)

whose ratio m/u is the field's match weight — the evidence each
agreement contributes under the Fellegi–Sunter (1969) decision model.

Scale shape — the whole point of this implementation: u requires
agreement rates over NON-match pairs, which is quadratic if pairs are
materialized. They never are. Within a block, the number of A×B pairs
agreeing on field f is Σ_v cntA(block,v)·cntB(block,v) — a value-grain
product — so u comes from two grain aggregations and one grain join,
and m from the single equi-join on the ground-truth key. No pair
table exists at any point; the shuffles carry (block, value) count
rows. This is the only shape that survives a 100 TB corpus: blocking
bounds the pair universe, and counting by value-grain products avoids
enumerating it.

Reference parity: the reference has no record-linkage surface; the
nearest shape is the DataJoin tagged-join contrib
(hadoop-tools/hadoop-datajoin/src/main/java/org/apache/hadoop/contrib/
utils/join/DataJoinReducerBase.java:1) which materializes the
per-key cross product this operator exists to avoid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fs_score_pairs saturating score ceiling (micros). Each per-field
# contribution can reach 1e12 micros (m_e6=1e6 over u_e6=1) while the
# running product rescales by only 1e6 per field, so 3+ strong fields
# would blow past BIGINT (and 4+ past DECIMAL(38,0) mid-multiply)
# exactly on the strongest-link pairs — which under ANSI mode is a
# runtime throw, not a wrong number. Decisions are order-of-magnitude
# objects, so a ceiling far above any sane hi_e6 preserves semantics;
# clamping after EVERY field also bounds the intermediate product at
# cap * 1e12 = 1e27, comfortably inside DECIMAL(38,0).
_SCORE_CAP_E6 = 10**15


def fellegi_sunter_mu(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    block_col: str,
    fields: list[str],
) -> DataFrame:
    """Estimate Fellegi–Sunter m/u probabilities per comparison field.

    ``a`` and ``b`` are the two record views sharing ``key_col`` (the
    ground-truth entity key: pairs with equal keys are matches),
    ``block_col`` (the candidate-blocking key — only within-block
    pairs are candidates, the standard blocking discipline), and the
    comparison ``fields``. Matches are counted WITHIN-BLOCK — the
    truth-key join also equates the block, so a matched pair whose two
    views landed in different blocks (a corrupted blocking attribute)
    is excluded from m exactly as it is excluded from the block-pair
    universe that defines u; this keeps n_nonmatch_pairs and the
    non-match agreement counts non-negative by construction instead of
    by assumption. Agreement is strict equality: a NULL field
    value never agrees, on either the m or the u side (the value-grain
    product join drops NULL keys, and the match-side comparison
    mirrors that — the two estimates must count the same event).

    Output, one row per field: field, n_matches, n_nonmatch_pairs,
    m_e6 and u_e6 (flooring-micro agreement rates; NULL when the
    respective pair set is empty), and lr_e6 = m/u in micros (NULL
    when u = 0 — a perfect discriminator — or m undefined). Everything
    is exact BIGINT arithmetic; the only divisions are flooring
    integer divs, bit-identical across engines and partitionings."""
    from hadoop_fcfs_spark.caching import waypoint

    if not fields:
        raise ValueError("fields must be a non-empty list")
    # waypoints: each view feeds 2 + len(fields) consumers (match join,
    # block counts, one value-grain collapse per field) — without them
    # Catalyst re-derives the scan per consumer
    av = waypoint(
        a.select(
            F.col(key_col).alias("__k"), F.col(block_col).alias("__blk"),
            *[F.col(f).alias(f"__a_{f}") for f in fields],
        )
    )
    bv = waypoint(
        b.select(
            F.col(key_col).alias("__k"), F.col(block_col).alias("__blk"),
            *[F.col(f).alias(f"__b_{f}") for f in fields],
        )
    )
    # m: ONE equi-join on (truth key, block) — linear, exact agreement
    # counts, and aligned with the block-pair universe (see docstring)
    matched = av.join(bv, ["__k", "__blk"])
    m_agg = matched.agg(
        F.count("*").cast("long").alias("__nm"),
        *[
            F.sum(
                F.when(F.col(f"__a_{f}") == F.col(f"__b_{f}"), 1)
                .otherwise(0)
            ).cast("long").alias(f"__ma_{f}")
            for f in fields
        ],
    )
    # block pair universe: Σ_block nA·nB, from two block-grain counts
    blk = (
        av.groupBy("__blk").agg(F.count("*").cast("long").alias("__na"))
        .join(
            bv.groupBy("__blk").agg(
                F.count("*").cast("long").alias("__nb")
            ),
            "__blk",
        )
        .agg(F.sum(F.col("__na") * F.col("__nb")).cast("long").alias("__tp"))
    )
    # per-field within-block agreeing pairs: value-grain count products
    # (never a pair table) — Σ_{block,v} cntA·cntB
    vp_aggs = []
    for f in fields:
        ga = av.groupBy("__blk", F.col(f"__a_{f}").alias("__v")).agg(
            F.count("*").cast("long").alias("__ca")
        )
        gb = bv.groupBy("__blk", F.col(f"__b_{f}").alias("__v")).agg(
            F.count("*").cast("long").alias("__cb")
        )
        vp = ga.join(gb, ["__blk", "__v"]).agg(
            F.coalesce(F.sum(F.col("__ca") * F.col("__cb")), F.lit(0))
            .cast("long").alias("__vp")
        )
        vp_aggs.append(vp.withColumn("field", F.lit(f)))
    vps = vp_aggs[0]
    for extra in vp_aggs[1:]:
        vps = vps.unionByName(extra)
    wide = vps.crossJoin(F.broadcast(m_agg)).crossJoin(F.broadcast(blk))
    m_agree = F.lit(None).cast("long")
    for f in fields:
        m_agree = F.when(
            F.col("field") == f, F.col(f"__ma_{f}")
        ).otherwise(m_agree)
    out = wide.withColumn("__magree", m_agree).select(
        "field",
        F.col("__nm").alias("n_matches"),
        (F.col("__tp") - F.col("__nm")).alias("n_nonmatch_pairs"),
        F.col("__magree").alias("__ma"),
        (F.col("__vp") - F.col("__magree")).alias("__ua"),
    )
    return out.selectExpr(
        "field", "n_matches", "n_nonmatch_pairs",
        "CASE WHEN n_matches > 0 THEN "
        "CAST(__ma * 1000000 div n_matches AS BIGINT) END AS m_e6",
        "CASE WHEN n_nonmatch_pairs > 0 THEN "
        "CAST(__ua * 1000000 div n_nonmatch_pairs AS BIGINT) END AS u_e6",
        "CASE WHEN n_matches > 0 AND n_nonmatch_pairs > 0 "
        "AND __ua * 1000000 div n_nonmatch_pairs > 0 THEN "
        "CAST((__ma * 1000000 div n_matches) * 1000000 "
        "div (__ua * 1000000 div n_nonmatch_pairs) AS BIGINT) "
        "END AS lr_e6",
    )


def fs_score_pairs(
    pairs: DataFrame,
    mu: DataFrame,
    fields: list[str],
    lo_e6: int = 200_000,
    hi_e6: int = 50_000_000,
) -> DataFrame:
    """Fellegi–Sunter DECISION layer: score candidate pairs with the
    m/u parameters :func:`fellegi_sunter_mu` estimated and classify
    link / possible / non-link by likelihood-ratio thresholds.

    ``pairs`` carries one row per CANDIDATE pair with ``<f>_a`` and
    ``<f>_b`` columns per comparison field — candidates come from a
    blocking/LSH tier (fuzzy_term_join, minhash bands, block keys),
    never a cross product; this operator deliberately has no way to
    enumerate pairs itself. ``mu`` is fellegi_sunter_mu's output.

    Per field a pair contributes the agreement ratio m/u when the
    field agrees, or the disagreement ratio (1−m)/(1−u) when it does
    not; the pair score is the PRODUCT of contributions accumulated in
    micro units — DECIMAL(38,0) multiply + one flooring div-1e6
    rescale per field, so the value is engine- and partitioning-exact
    (documented micro quantization; FS thresholds are order-of-
    magnitude objects). The score SATURATES at ``_SCORE_CAP_E6``
    (1e15 micros, clamped after every field): per-field contributions
    reach 1e12, so an unclamped 3-strong-field product would overflow
    BIGINT on exactly the strongest links; any saturated pair is
    already far past ``hi_e6`` → 'link', so the ceiling never changes
    a decision. Degenerate parameters keep total semantics:
    NULL m/u → the field is uninformative (neutral 1e6); agreement on
    a u = 0 perfect discriminator → decisive link (flagged, score
    unchanged by that field); m = 1e6 with disagreement → contribution
    0, i.e. score 0 → non-link (a field that always agrees on matches
    just disagreed). decision: decisive_link OR score >= ``hi_e6`` →
    'link'; score <= ``lo_e6`` → 'non-link'; else 'possible'.

    Scale shape: ONE broadcast of the pivoted field-grain mu table
    (|fields| columns wide, 1 row) + per-pair expressions — cost is
    O(candidate pairs), which the blocking tier already bounded."""
    if not fields:
        raise ValueError("fields must be a non-empty list")
    if not lo_e6 < hi_e6:
        raise ValueError(f"need lo_e6 < hi_e6, got {lo_e6} >= {hi_e6}")
    if not hi_e6 < _SCORE_CAP_E6:
        raise ValueError(
            f"hi_e6 {hi_e6} must be below the score ceiling "
            f"{_SCORE_CAP_E6} or 'link' becomes unreachable"
        )
    wide = (
        mu.groupBy()
        .pivot("field", fields)
        .agg(F.first("m_e6").alias("m"), F.first("u_e6").alias("u"))
    )
    out = pairs.crossJoin(F.broadcast(wide))
    score_expr = "CAST(1000000 AS DECIMAL(38,0))"
    n_agree = F.lit(0)
    dec_link = F.lit(False)
    for f in fields:
        agree_sql = f"(`{f}_a` IS NOT NULL AND `{f}_a` = `{f}_b`)"
        neutral = f"(`{f}_m` IS NULL OR `{f}_u` IS NULL)"
        contrib = (
            f"CASE WHEN {neutral} THEN CAST(1000000 AS DECIMAL(38,0)) "
            f"WHEN {agree_sql} THEN "
            f"  CASE WHEN `{f}_u` = 0 THEN CAST(1000000 AS DECIMAL(38,0)) "
            f"       ELSE CAST(CAST(`{f}_m` AS DECIMAL(38,0)) * 1000000 "
            f"            div `{f}_u` AS DECIMAL(38,0)) END "
            f"ELSE "
            f"  CASE WHEN `{f}_u` = 1000000 THEN "
            f"         CAST(1000000 AS DECIMAL(38,0)) "
            f"       ELSE CAST(CAST(1000000 - `{f}_m` AS DECIMAL(38,0)) "
            f"            * 1000000 div (1000000 - `{f}_u`) "
            f"            AS DECIMAL(38,0)) END "
            f"END"
        )
        score_expr = (
            f"LEAST(CAST(({score_expr}) * ({contrib}) div 1000000 "
            f"AS DECIMAL(38,0)), CAST({_SCORE_CAP_E6} AS DECIMAL(38,0)))"
        )
        agree_col = F.expr(agree_sql)
        n_agree = n_agree + F.when(agree_col, 1).otherwise(0)
        dec_link = dec_link | (
            agree_col
            & F.col(f"{f}_u").isNotNull() & (F.col(f"{f}_u") == 0)
            & F.col(f"{f}_m").isNotNull()
        )
    scored = out.withColumn(
        "score_e6", F.expr(score_expr).cast("long")
    ).withColumn("n_agree", n_agree.cast("int")).withColumn(
        "decisive_link", dec_link
    )
    decision = (
        F.when(
            F.col("decisive_link") | (F.col("score_e6") >= hi_e6), "link"
        )
        .when(F.col("score_e6") <= lo_e6, "non-link")
        .otherwise("possible")
    )
    drop = [c for f in fields for c in (f"{f}_m", f"{f}_u")]
    return scored.withColumn("decision", decision).drop(*drop)
