"""Rank aggregation: reciprocal rank fusion (Cormack et al. 2009) —
the standard way to combine heterogeneous retrieval signals (lexical
BM25, embedding cosine, recency, quality priors) without score
calibration: rrf(d) = Σ_lists 1 / (k + rank_list(d)).

Scale shape: each input ranking is already top-N-bounded by its
producer (TakeOrdered); fusion is a chain of outer equi-joins on the
item id over those bounded lists — broadcastable, no data-sized
shuffle. The fused score is a FIXED-ORDER sum of per-list terms
(coalesce per list, not an aggregation over rows), so it is
deterministic bit-for-bit for any list count — rankings built from
quantized scores keep the whole pipeline engine-replayable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reciprocal_rank_fusion(
    rankings: list[DataFrame], id_col: str, k: int = 60
) -> DataFrame:
    """Fuse rankings (each: id_col + integer ``rank``, rank ≥ 1) into
    (id_col, in_lists, rrf). Items missing from a list contribute 0 for
    it; ``in_lists`` counts memberships — a common downstream filter
    (require ≥2 signals)."""
    if not rankings:
        raise ValueError("need at least one ranking")
    sides = [
        r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(k) + F.col("rank"))).alias(f"__rrf_{i}"),
        )
        for i, r in enumerate(rankings)
    ]
    joined = reduce(lambda a, b: a.join(b, id_col, "full_outer"), sides)
    terms = [F.col(f"__rrf_{i}") for i in range(len(sides))]
    rrf = reduce(lambda a, b: a + F.coalesce(b, F.lit(0.0)),
                 terms[1:], F.coalesce(terms[0], F.lit(0.0)))
    in_lists = reduce(
        lambda a, b: a + b,
        [t.isNotNull().cast("int") for t in terms],
    )
    return joined.select(
        F.col(id_col), in_lists.alias("in_lists"), rrf.alias("rrf")
    )


def diversified_topk(
    df: DataFrame,
    order_cols: list,
    k: int,
    group_col: str,
    per_group_cap: int,
) -> DataFrame:
    """Global top-k with a per-group diversity cap: at most
    ``per_group_cap`` rows from any one ``group_col`` value may occupy
    the top-k — the result-diversification rule every search/feed
    ranking applies (a plain top-k lets one hot customer/domain flood
    the list). Equivalent to: rank within group, drop rows past the
    cap, then take the global top-k of the survivors.

    Scale shape: one key-bounded per-group window (row_number, cap
    filter prunes to ≤cap rows per group) followed by a global
    sort-limit — TakeOrderedAndProject, never a global window. Order
    columns must give a total order (include a unique id) for a
    deterministic result."""
    from pyspark.sql import Window

    if k < 1 or per_group_cap < 1:
        raise ValueError(f"k and per_group_cap must be >= 1, got {k}/{per_group_cap}")
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn("__gr", F.row_number().over(w))
        .filter(F.col("__gr") <= per_group_cap)
        .drop("__gr")
        .orderBy(*order_cols)
        .limit(k)
    )


def _edge_collapse(
    pairs: DataFrame, winner_col: str, loser_col: str
) -> DataFrame:
    """Collapse the raw comparison log to the symmetric match-up grain
    (i, j, g=games, w=wins-of-i) in ONE map-side-combined exchange: the
    log is unioned in both directions FIRST, then a single groupBy sums
    — no directed-pair collapse feeding a second symmetric one.
    Separate from bradley_terry so the plan test can pin the
    single-shuffle contract (the checkpoint hides it downstream)."""
    flt = pairs.filter(
        F.col(winner_col).isNotNull() & F.col(loser_col).isNotNull()
    )
    one = F.lit(1).cast("long")
    return (
        flt.select(
            F.col(winner_col).alias("i"), F.col(loser_col).alias("j"),
            one.alias("__g"), one.alias("__w"),
        )
        .unionByName(
            flt.select(
                F.col(loser_col).alias("i"), F.col(winner_col).alias("j"),
                one.alias("__g"), F.lit(0).cast("long").alias("__w"),
            )
        )
        .groupBy("i", "j")
        .agg(F.sum("__g").alias("g"), F.sum("__w").alias("w"))
    )


def _mm_denominator(
    edges: DataFrame, p: DataFrame, carry_cols: tuple[str, ...] = ()
) -> DataFrame:
    """One MM step's denominator D_i = Σ_j g_ij·10¹²/(p_i+p_j) (exact
    integer per-edge terms): two SHUFFLE_HASH joins of node-state onto
    the edge list (never broadcast — node counts are unbounded; hash,
    not sort-merge, so the edge list is never re-sorted per iteration)
    + one map-side-combined node-grain aggregation. The j join runs
    FIRST so the i join's hash partitioning is the LAST exchange and the
    node aggregation rides it (no third edge-grain exchange).
    ``carry_cols``: node-constant columns of ``p`` echoed through the
    aggregation (max over join-replicated copies — exact), so callers
    fuse their numerator lookup into this job instead of re-joining
    node state per iteration."""
    pj = p.select(F.col("node").alias("j"), F.col("p").alias("__pj"))
    pi = p.select(
        F.col("node").alias("i"),
        F.col("p").alias("__pi"),
        *[F.col(c) for c in carry_cols],
    )
    return (
        edges.join(pj.hint("SHUFFLE_HASH"), "j")
        .join(pi.hint("SHUFFLE_HASH"), "i")
        .groupBy(F.col("i").alias("node"))
        .agg(
            F.sum(
                F.expr("g * 1000000000000 div (__pi + __pj)")
            ).alias("__d"),
            *[F.max(c).alias(c) for c in carry_cols],
        )
    )


def bradley_terry(
    pairs: DataFrame,
    winner_col: str,
    loser_col: str,
    iterations: int = 5,
) -> DataFrame:
    """Bradley–Terry preference-strength fitting by batch MM (Zermelo /
    Hunter minorization) iterations — the aggregation step that turns a
    corpus of pairwise preference judgments (RLHF comparison data,
    A/B match outcomes) into per-item strengths: P(i beats j) =
    p_i/(p_i+p_j), updated as p_i ← W_i / Σ_j g_ij/(p_i+p_j). The
    batch-parallel alternative to sequential Elo, whose result depends
    on game ORDER and so cannot be computed distributed.

    Determinism at any scale (the hits/markov discipline): strengths
    live as BIGINT micro-units. Per iteration each edge contributes
    floor(g·10¹²/(p_i+p_j)) — exact integer division — summed exactly
    per node; the update p_raw = W_i·10¹² div D_i is one more integer
    division, and the per-step max-normalization floor-quantizes the
    double ratio raw/max back to micro-units (correctly rounded,
    identical cross-engine), clamped to ≥1 micro so two all-losers who
    only played each other can never make p_i+p_j = 0. Items that
    never win converge to the 1-micro floor — the MLE boundary.

    Scale shape: ONE groupBy collapses the comparison log to the
    symmetric match-up grain (i, j, games, wins-of-i) — the raw log is
    unioned in both directions first, so there is a single
    map-side-combined exchange, not a directed-pair collapse followed
    by a symmetric one; per iteration two SHUFFLE_HASH joins of
    node-state onto that edge list (j side first, so the node
    aggregation rides the i join's partitioning — no third edge-grain
    exchange) + one node-grain aggregation that also echoes the
    carried wins/games (no per-iteration numerator join) + a broadcast
    scalar max — state stays node-shaped (never broadcast: item counts
    are unbounded in RLHF logs), the comparison log is never
    rescanned, and hash joins skip the per-iteration edge-list sorts a
    sort-merge plan would pay. Integer bounds (ANSI throws
    rather than corrupting): per-edge g < ~9.2e6 games, per-node
    W_i < ~9.2e6 wins; beyond that drop the scale to 10⁹ (milli).

    Returns (node, strength_e6, wins, games). Reference parity: the
    iterative-job chaining idiom (hadoop-mapreduce-examples PageRank-
    style driver loops re-running a join+reduce job per step)."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    edges = _edge_collapse(pairs, winner_col, loser_col).localCheckpoint(
        eager=True
    )
    wins = edges.groupBy(F.col("i").alias("node")).agg(
        F.sum("w").cast("long").alias("wins"),
        F.sum("g").cast("long").alias("games"),
    ).localCheckpoint(eager=True)
    # wins/games ride IN the node state (carried through the i-side
    # join and echoed by the denominator aggregation), so each MM step
    # is ONE job tree — the former per-iteration wins⨝d numerator join
    # (its two node-grain exchanges and stages) is fused away.
    p = wins.select(
        "node", F.lit(1_000_000).cast("long").alias("p"), "wins", "games"
    )
    for it in range(iterations):
        d = _mm_denominator(edges, p, carry_cols=("wins", "games"))
        # materialize the node-grain __raw once per iteration: it feeds
        # BOTH the broadcast scalar max and the normalized projection
        # (unmaterialized, the iteration's join tree evaluates twice),
        # and the eager checkpoint keeps lineage bounded at any
        # iteration count (node-shaped state only — never the edges)
        raw = (
            d.selectExpr(
                "node",
                "CAST((wins * 1000000000000) div __d AS BIGINT) AS __raw",
                "wins",
                "games",
            )
            .localCheckpoint(eager=True)
        )
        mx = raw.agg(F.max("__raw").alias("__mx"))
        p = raw.crossJoin(F.broadcast(mx)).select(
            "node",
            F.greatest(
                F.lit(1).cast("long"),
                F.floor(
                    F.col("__raw").cast("double")
                    / F.col("__mx").cast("double") * 1_000_000.0
                ).cast("long"),
            ).alias("p"),
            "wins",
            "games",
        )
    return p.select(
        "node", F.col("p").alias("strength_e6"), "wins", "games"
    )


def pairwise_winrates(
    df: DataFrame, winner_col: str, loser_col: str, z: float = 1.96
) -> DataFrame:
    """Per-match-up win rates with Wilson-score bounds: collapse a
    pairwise preference log to the canonical (a = smaller id,
    b = larger id) match-up grain and report a's wins, the game
    count, the exact win rate, and the Wilson 95% interval on it —
    the head-to-head QA table UNDER :func:`bradley_terry` (BT gives
    one global strength per item; this shows which specific match-ups
    carry the evidence and which are too thin to trust — a 2-0 pair
    must not read as stronger than a 48-52 one, which is exactly what
    the Wilson bound encodes at the pair grain).

    One map-side-combined aggregation of the comparison log to the
    match-up grain (edge-shaped state, the BT collapse discipline) —
    wins and games exact BIGINT, winrate_micro one exact flooring
    division, and both bounds division-only float + one sqrt in the
    flat shape the SQL mirror reproduces bit-identically (the
    wilson_conversion_bounds contract), floored to e6 with the lower
    bound clamped at 0 and the upper at 1.

    Output: (a, b, wins_a, games, winrate_micro, wilson_lo_e6,
    wilson_hi_e6)."""
    w, l = F.col(winner_col), F.col(loser_col)
    pairs = (
        df.filter(w.isNotNull() & l.isNotNull() & (w != l))
        .select(
            F.least(w, l).alias("a"),
            F.greatest(w, l).alias("b"),
            F.when(w < l, 1).otherwise(0).alias("__wa"),
        )
        .groupBy("a", "b")
        .agg(
            F.sum("__wa").cast("long").alias("wins_a"),
            F.count("*").cast("long").alias("games"),
        )
    )
    z2 = f"({z} * {z})"
    s, n = "CAST(wins_a AS DOUBLE)", "CAST(games AS DOUBLE)"
    p = f"({s} / {n})"
    center = f"({p} + {z2} / (2 * {n}))"
    margin = (
        f"({z} * sqrt({p} * (1 - {p}) / {n}"
        f" + {z2} / (4 * {n} * {n})))"
    )
    denom = f"(1 + {z2} / {n})"
    return pairs.selectExpr(
        "a", "b", "wins_a", "games",
        "CAST(wins_a * 1000000 div games AS BIGINT) AS winrate_micro",
        f"CAST(FLOOR(GREATEST(0.0, ({center} - {margin}) / {denom})"
        " * 1000000) AS BIGINT) AS wilson_lo_e6",
        f"CAST(FLOOR(LEAST(1.0, ({center} + {margin}) / {denom})"
        " * 1000000) AS BIGINT) AS wilson_hi_e6",
    )


def topk_overlap_by_period(
    df: DataFrame,
    period_col: str,
    key_col: str,
    metric_col: str,
    k: int = 10,
) -> DataFrame:
    """Top-k membership stability between ADJACENT periods: per
    integer period take the k highest-``metric_col`` keys (ties →
    lowest key, the deterministic top-k convention), then report each
    consecutive-period pair's retained count and Jaccard overlap —
    the ranking-drift monitor over any leaderboard-shaped rollup
    (trending_parts says how individual ranks MOVE; this says whether
    the SET a consumer caches is even stable — the number that
    decides cache TTLs and recrawl budgets).

    ``df`` is the (period, key, metric) rollup grain. Per-period
    top-k is a rank window PARTITIONED by period (WindowGroupLimit
    pushes the k bound into the sort, the trending_parts plan shape);
    the adjacency comparison is a self-equi-join on period+1 over the
    k·#periods surviving rows. Exact integers: common via the join
    count, jaccard_micro = common·10⁶ div (k_a + k_b − common).
    Output: one row per adjacent pair with both periods present
    (period, next_period, k_a, k_b, common, jaccard_micro)."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(period_col).orderBy(
        F.desc(metric_col), F.asc(key_col)
    )
    top = (
        df.filter(
            F.col(period_col).isNotNull()
            & F.col(key_col).isNotNull()
            & F.col(metric_col).isNotNull()
        )
        .withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= k)
        .select(
            F.col(period_col).cast("long").alias("__p"),
            F.col(key_col).alias("__k"),
        )
    )
    sizes = top.groupBy("__p").agg(F.count("*").cast("long").alias("__sz"))
    nxt = top.select((F.col("__p") - 1).alias("__p"), F.col("__k"))
    common = (
        top.join(nxt, ["__p", "__k"])
        .groupBy("__p")
        .agg(F.count("*").cast("long").alias("__common"))
    )
    pairs = (
        sizes.alias("a")
        .join(
            sizes.select(
                (F.col("__p") - 1).alias("__p"), F.col("__sz").alias("__szb")
            ).alias("b"),
            "__p",
        )
        .join(common, "__p", "left")
        .selectExpr(
            "__p AS period",
            "__p + 1 AS next_period",
            "__sz AS k_a",
            "__szb AS k_b",
            "COALESCE(__common, 0) AS common",
            "CAST(COALESCE(__common, 0) * 1000000"
            " div (__sz + __szb - COALESCE(__common, 0)) AS BIGINT)"
            " AS jaccard_micro",
        )
    )
    return pairs


# RBO@10 frozen integer weight table (p = 0.9, Webber et al. 2010):
# t_d = floor((1-p)·p^(d-1)/d · 1e9) is depth d's per-member weight;
# _RBO_SFX[r] = Σ_{d=r..10} t_d is the total weight a shared member
# first visible at depth r collects (a member with ranks ra, rb is
# inside both prefixes from depth max(ra, rb) on). _RBO_FULL is the
# identical-list total Σ_r SFX[r] — the truncated-RBO_min mass within
# depth 10 (≈0.6513 of the infinite series; the remainder is the
# unresolved tail). FROZEN INTEGER LITERALS shared verbatim with the
# SQL oracles (the knn_ndcg_labels discipline) so the transcendental
# weights are exact BIGINT arithmetic in both engines.
_RBO_SFX = (235416394, 135416395, 90416396, 63416397, 45191397,
            32069398, 22227898, 14635884, 8657173, 3874204)
_RBO_FULL = 651321536  # sum of _RBO_SFX


def rbo_topk_by_period(
    df: DataFrame,
    period_col: str,
    key_col: str,
    metric_col: str,
) -> DataFrame:
    """Rank-biased overlap (RBO@10, p = 0.9) between ADJACENT periods'
    top-10 leaderboards — the rank-WEIGHTED upgrade of
    :func:`topk_overlap_by_period` (Jaccard treats rank 1 and rank 10
    alike; RBO weights agreement geometrically toward the top, which
    is how consumers actually read a leaderboard). Truncated RBO_min
    semantics: only the visible 10 ranks score, normalized so
    identical lists = 10⁹ (rbo10_e9).

    Per-period top-10 with ranks (row_number PARTITIONED by period,
    lowest-key ties); shared members join on (period+1, key) carrying
    both ranks; each contributes the FROZEN suffix weight
    _RBO_SFX[max(ra, rb)] — exact BIGINT throughout, one final
    integer division by _RBO_FULL. Output: one row per adjacent pair
    with both periods present (period, next_period, common,
    rbo10_e9)."""
    from pyspark.sql import Window

    w = Window.partitionBy(period_col).orderBy(
        F.desc(metric_col), F.asc(key_col)
    )
    top = (
        df.filter(
            F.col(period_col).isNotNull()
            & F.col(key_col).isNotNull()
            & F.col(metric_col).isNotNull()
        )
        .withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= 10)
        .select(
            F.col(period_col).cast("long").alias("__p"),
            F.col(key_col).alias("__k"),
            F.col("__rnk"),
        )
    )
    periods = top.select("__p").distinct()
    nxt = top.select(
        (F.col("__p") - 1).alias("__p"), F.col("__k"),
        F.col("__rnk").alias("__rnkb"),
    )
    sfx = F.array(*[F.lit(int(x)).cast("long") for x in _RBO_SFX])
    shared = (
        top.join(nxt, ["__p", "__k"])
        .withColumn(
            "__w",
            F.element_at(sfx, F.greatest("__rnk", "__rnkb").cast("int")),
        )
        .groupBy("__p")
        .agg(
            F.count("*").cast("long").alias("__common"),
            F.sum("__w").cast("long").alias("__rbo"),
        )
    )
    pairs = (
        periods.join(
            periods.select((F.col("__p") - 1).alias("__p")).alias("b"), "__p"
        )
        .join(shared, "__p", "left")
        .selectExpr(
            "__p AS period",
            "__p + 1 AS next_period",
            "COALESCE(__common, 0) AS common",
            f"CAST(COALESCE(__rbo, 0) * 1000000000"
            f" div {_RBO_FULL} AS BIGINT) AS rbo10_e9",
        )
    )
    return pairs
