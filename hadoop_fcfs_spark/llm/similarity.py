"""Similarity search over embedding columns (array<float>).

Two tiers (SURVEY.md §7.2 step 6):
- `cosine_topk` — exact brute-force: broadcast the (small) query set
  against the corpus, per-query top-k via TakeOrdered-style window.
  Correctness baseline; O(|Q|·|C|) — fine when |Q| is bounded.
- `rp_lsh_topk` — random-hyperplane LSH: bucket vectors by the sign
  pattern of h pseudo-random projections (hyperplane entries are
  deterministic ±1 from xxhash64(plane, dim) — no RNG, no stored
  model), then search only within matching buckets. Sub-linear
  candidate sets at corpus scale; recall tunable via number of planes
  and multi-probe (drop-one-bit probing).

All arithmetic is double-precision Column expressions (zip_with +
aggregate) — JVM-side, no Python in the scoring loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns, in double."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_pairs(
    corpus: DataFrame, queries: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact all-pairs cosine between a query set and the corpus.
    Output: (query_id, vec_id, cos). Queries are broadcast — the corpus
    is scanned once, never shuffled."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cv"))
    # "+ 0.0" canonicalizes IEEE negative zero after rounding
    return c.join(F.broadcast(q)).select(
        "query_id", "vec_id", (F.round(cosine(F.col("__qv"), F.col("__cv")), 4) + 0.0).alias("cos")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """Per-query exact top-k by cosine (tie-break: vec_id asc)."""
    pairs = cosine_pairs(corpus, queries, id_col, vec_col)
    if not include_self:
        pairs = pairs.filter(F.col("query_id") != F.col("vec_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def mmr_rerank(
    df: DataFrame,
    query_id,
    k: int = 5,
    n_candidates: int = 10,
    lam_num: int = 7,
    lam_den: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance reranking (Carbonell & Goldstein,
    SIGIR 1998): greedily pick ``k`` of the query's ``n_candidates``
    nearest neighbors maximizing λ·rel(d) − (1−λ)·max_{s∈picked}
    sim(d, s) — the redundancy-pruning rerank every retrieval stack
    runs between ANN and the consumer (diversified_topk caps by a
    CATEGORY; MMR diversifies by actual pairwise similarity, so
    near-duplicate hits can't fill the page). λ = lam_num/lam_den;
    the argmax uses the integer-scaled score lam_num·rel −
    (lam_den−lam_num)·mm — same ordering, and it sidesteps the
    1−0.7 = 0.30000000000000004 float-literal trap an oracle would
    otherwise have to reproduce textually.

    Determinism: rel and pairwise sims are the ann_cosine_topk
    quantized cosines (ROUND 4, +0.0, id tiebreaks); every
    subsequent op is IEEE arithmetic both engines compute
    identically. Greedy selection is inherently sequential — the k
    steps are unrolled as bounded DataFrame ops over the
    n_candidates-row state (1-row argmax via orderBy-limit, max-sim
    carry via GREATEST against the picked row), per-step eager
    localCheckpoint keeping the plan flat (the rake_weights /
    bradley_terry iterative-state discipline). Nothing data-sized
    happens after the one cosine_topk scan. Output: (pos 1..k,
    id_col, rel, maxsim — NULL for pos 1)."""
    if not 1 <= k <= n_candidates:
        raise ValueError(f"need 1 <= k <= n_candidates, got {k}/{n_candidates}")
    if not 0 < lam_num <= lam_den:
        raise ValueError(f"need 0 < lam_num <= lam_den, got {lam_num}/{lam_den}")
    q = df.filter(F.col(id_col) == query_id)
    cand = (
        cosine_topk(df, q, k=n_candidates, id_col=id_col, vec_col=vec_col)
        .select(F.col("vec_id").alias("__cid"), F.col("cos").alias("rel"))
        .join(
            df.select(
                F.col(id_col).alias("__cid"), F.col(vec_col).alias("__v")
            ),
            "__cid",
        )
        .localCheckpoint(eager=True)
    )
    a = cand.select(F.col("__cid").alias("__ai"), F.col("__v").alias("__va"))
    b = cand.select(F.col("__cid").alias("__bi"), F.col("__v").alias("__vb"))
    sims = (
        a.join(F.broadcast(b), F.col("__ai") != F.col("__bi"))
        .select(
            "__ai", "__bi",
            (F.round(cosine(F.col("__va"), F.col("__vb")), 4) + 0.0)
            .alias("__s"),
        )
        .localCheckpoint(eager=True)
    )
    mu = lam_den - lam_num
    remaining = cand.select(
        "__cid", "rel", F.lit(None).cast("double").alias("__mm")
    )
    res = None
    for pos in range(1, k + 1):
        score = F.col("rel") * lam_num - F.coalesce(
            F.col("__mm") * mu, F.lit(0.0)
        )
        sel = (
            remaining.orderBy(score.desc(), F.col("__cid").asc())
            .limit(1)
            .localCheckpoint(eager=True)
        )
        row = sel.select(
            F.lit(pos).cast("int").alias("pos"),
            F.col("__cid").alias(id_col),
            "rel",
            F.col("__mm").alias("maxsim"),
        )
        res = row if res is None else res.unionByName(row)
        if pos == k:
            break
        picked = sel.select(F.col("__cid").alias("__sid"))
        remaining = (
            remaining.join(
                F.broadcast(picked), F.col("__cid") != F.col("__sid")
            )
            .join(
                sims,
                (F.col("__ai") == F.col("__cid"))
                & (F.col("__bi") == F.col("__sid")),
            )
            .select(
                "__cid", "rel", F.greatest("__mm", "__s").alias("__mm")
            )
            .localCheckpoint(eager=True)
        )
    return res


def rp_lsh_buckets(
    df: DataFrame,
    num_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane signature: bit_j = sign(Σ_d ±v[d]) where the
    ±1 pattern is xxhash64(j, d) parity — deterministic, reproducible,
    nothing to persist. Output: (id, vec, bucket:long)."""
    vec = F.col(vec_col)
    bucket = F.lit(0).cast("long")
    for j in range(num_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, d: F.when(
                    F.xxhash64(F.lit(j), d).bitwiseAND(F.lit(1)) == 1, x.cast("double")
                ).otherwise(-x.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0).cast("long"))
    return df.select(F.col(id_col).alias("vec_id"), vec.alias("embedding"), bucket.alias("bucket"))


def rp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: equi-join on LSH bucket, exact cosine within bucket.
    At corpus scale the bucket join replaces the full cross product;
    recall < 1 by construction — raise num_planes for precision of
    buckets, lower for recall, or union multi-probe buckets."""
    cb = rp_lsh_buckets(corpus, num_planes, id_col, vec_col)
    qb = rp_lsh_buckets(queries, num_planes, id_col, vec_col).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qv"), "bucket"
    )
    pairs = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            (F.round(cosine(F.col("__qv"), F.col("embedding")), 4) + 0.0).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def rp_lsh_recall_sweep(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    planes_sweep: tuple[int, ...] = (2, 4, 6, 8),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k vs num_planes curve for the RP-LSH index — the
    second index family's tuning sweep beside :func:`ivf_recall_sweep`
    (IVF dials recall with n_probe; RP-LSH dials it with plane
    count: fewer planes → coarser buckets → more candidates → higher
    recall at higher verify cost).

    Scale shape: signatures are computed ONCE at max(planes_sweep)
    bits (plane j is bucket bit j, the rp_lsh_buckets convention), so
    the p-plane bucket is just the low-p-bit mask and candidate sets
    are NESTED by construction — agreement on p+1 low bits implies
    agreement on p. Candidates are therefore generated ONCE at the
    COARSEST point (min planes, the largest candidate set — the
    honest cost of measuring recall there at all), each pair tagged
    with agree = trailing-zero count of the signature XOR; sweep
    point p keeps pairs with agree >= p and re-ranks per (p, query).
    Sweeping more plane counts adds NO corpus work. Broadcast query
    side; no cartesian. Determinism: the ann-tier @4-rounded cosine
    + vec_id tiebreak on both rankings.

    Output, ordered: (num_planes, n_queries, n_exact, n_hits,
    recall_e6) — pooled micro-average recall; n_queries counts
    queries WITH exact neighbors, recall_e6 NULL when that set is
    empty. The curve is monotone NONINCREASING in num_planes
    (candidate sets shrink)."""
    p_max = max(planes_sweep)
    p_min = min(planes_sweep)
    cb = rp_lsh_buckets(corpus, p_max, id_col, vec_col)
    qb = rp_lsh_buckets(queries, p_max, id_col, vec_col).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
        F.col("bucket").alias("__qb"),
    )
    mask_min = (1 << p_min) - 1
    pairs = (
        cb.join(
            F.broadcast(qb),
            (F.col("bucket").bitwiseAND(F.lit(mask_min)))
            == (F.col("__qb").bitwiseAND(F.lit(mask_min))),
        )
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            (F.round(cosine(F.col("__qv"), F.col("embedding")), 4) + 0.0)
            .alias("cos"),
            F.col("bucket").bitwiseXOR(F.col("__qb")).alias("__diff"),
        )
        # agree = #low bits the two signatures share = trailing zeros
        # of the XOR (p_max when identical) — bit_count((d & -d) - 1)
        .withColumn(
            "agree",
            F.when(F.col("__diff") == 0, F.lit(p_max)).otherwise(
                F.expr("bit_count((__diff & -__diff) - 1)")
            ),
        )
    )
    swept = pairs.withColumn(
        "num_planes",
        F.explode(F.array(*[F.lit(int(p)) for p in sorted(planes_sweep)])),
    ).filter(F.col("agree") >= F.col("num_planes"))
    w = Window.partitionBy("num_planes", "query_id").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    approx = (
        swept.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("num_planes", "query_id", "vec_id")
    )
    exact = cosine_topk(corpus, queries, k=k, id_col=id_col, vec_col=vec_col)
    hits = approx.join(
        exact.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_semi"
    )
    tot = exact.agg(
        F.count("*").cast("long").alias("n_exact"),
        F.countDistinct("query_id").cast("long").alias("n_queries"),
    )
    hits_np = hits.groupBy("num_planes").agg(
        F.count("*").cast("long").alias("__h")
    )
    spark = corpus.sparkSession
    plane_df = spark.createDataFrame(
        [(int(p),) for p in sorted(planes_sweep)], "num_planes int"
    )
    return (
        plane_df.crossJoin(F.broadcast(tot))
        .join(hits_np, "num_planes", "left")
        .selectExpr(
            "CAST(num_planes AS BIGINT) AS num_planes",
            "n_queries",
            "n_exact",
            "CAST(COALESCE(__h, 0) AS BIGINT) AS n_hits",
            # DECIMAL(38,0) numerator: the r13 overflow-class rule —
            # 1e6·BIGINT-count products lift uniformly (r14 ADVICE)
            "CASE WHEN n_exact > 0 THEN"
            " CAST(1000000 AS DECIMAL(38,0)) * COALESCE(__h, 0)"
            " div n_exact END AS recall_e6",
        )
        .orderBy("num_planes")
    )


def kmeans_centroids(
    df: DataFrame,
    k: int = 16,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic Lloyd's k-means over DataFrame ops: init = the k
    vectors with smallest xxhash64(id) (reproducible, data-dependent but
    partition-independent); each iteration is one broadcast (centroid
    literals) + one groupBy(avg per dimension). Driver holds only k×dim
    floats. The iteration count is fixed and small — this is an index
    build, not a convergence chase."""
    dim = len(df.select(vec_col).first()[0])
    seeds = (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(k)
        .collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in seeds]

    for _ in range(iterations):
        assigned = _assign_to_centroid(df, centroids, vec_col)
        dims = [
            F.avg(F.col(vec_col)[d].cast("double")).alias(f"d{d}") for d in range(dim)
        ]
        rows = assigned.groupBy("__centroid").agg(*dims).collect()
        new = list(centroids)
        for r in rows:
            new[r["__centroid"]] = [float(r[f"d{d}"]) for d in range(dim)]
        centroids = new
    return centroids


def _assign_to_centroid(df: DataFrame, centroids: list[list[float]], vec_col: str):
    """Nearest centroid by squared L2 — centroid literals compiled into
    the plan (broadcast-by-literal). Argmin = array_position of the
    array minimum (first position wins ties → lowest centroid index,
    deterministic). NOTE: a when()-chain fold here is exponential — each
    step embeds the running best twice (condition + otherwise), which
    at 16 centroids × 128 dims stalls analysis for minutes; the array
    form is linear in k."""
    vec = F.col(vec_col)

    def sqdist(c: list[float]) -> Column:
        arr = F.array(*[F.lit(float(x)) for x in c])
        return F.aggregate(
            F.zip_with(vec, arr, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    dist_arr = F.array(*[sqdist(c) for c in centroids])
    best_idx = (F.array_position(dist_arr, F.array_min(dist_arr)) - 1).cast("int")
    return df.withColumn("__centroid", best_idx)


def _probe_nearest_cells(df_q: DataFrame, cents, n_probe: int, vec_col: str = "__qv"):
    """Explode each query row into its n_probe nearest centroid cells
    (squared euclidean; ties break to the lowest centroid index via the
    (d, i) struct sort)."""
    vec = F.col(vec_col)
    dist_arr = F.array(
        *[
            F.aggregate(
                F.zip_with(vec, F.array(*[F.lit(float(x)) for x in c]),
                           lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for c in cents
        ]
    )
    ranked = F.transform(
        F.array_sort(
            F.zip_with(
                dist_arr,
                F.sequence(F.lit(0), F.lit(len(cents) - 1)),
                lambda d, i: F.struct(d.alias("d"), i.alias("i")),
            )
        ),
        lambda s: s["i"],
    )
    return df_q.withColumn("cell", F.explode(F.slice(ranked, 1, n_probe)))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF ANN: corpus partitioned into centroid cells (inverted file);
    each query probes its n_probe nearest cells and scores exactly
    within them. Corpus side = one assignment pass + equi-join on cell
    id; recall dial = n_probe/n_centroids. The second scale path next
    to rp_lsh_topk (SURVEY §7.2 step 6).

    `centroids` (k×dim floats) bypasses the k-means build — use a
    precomputed/externally-trained coarse quantizer; ties in both the
    assignment argmin and cell probing break to the lowest centroid
    index deterministically."""
    cents = centroids if centroids is not None else kmeans_centroids(
        corpus, n_centroids, id_col=id_col, vec_col=vec_col
    )
    cells = _assign_to_centroid(corpus, cents, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"), F.col("__centroid").alias("cell")
    )

    # queries: explode into their n_probe nearest cells
    qdf = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    probed = _probe_nearest_cells(qdf, cents, n_probe)
    pairs = (
        cells.join(F.broadcast(probed), "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            (F.round(cosine(F.col("__qv"), F.col("embedding")), 4) + 0.0).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def ivf_recall_sweep(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    probes: tuple[int, ...] = (1, 2, 4, 8),
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Recall@k vs n_probe curve for the IVF index — the tuning sweep
    that turns :func:`ivf_topk`'s single recall spot-check
    (ann_ivf_recall) into the operating-point picker an ANN deployment
    actually reads: one row per n_probe with pooled recall against the
    exact brute-force ranking, so "how many cells must I probe for
    95% recall" is one query.

    Scale shape: candidate pairs are generated ONCE at max(probes) —
    each query's probed cells carry their probe RANK (1 = nearest
    cell), the sweep is a per-candidate explode over the probe values
    with `cell_rank <= n_probe`, and per-(n_probe, query) top-k is a
    window over the already-bounded candidate set. The corpus is
    scanned once for cell assignment and once for the exact baseline;
    sweeping more operating points adds NO corpus work (candidate
    sets are nested by construction). Broadcast probe join; no
    cartesian. Determinism: @4-rounded cosine + vec_id tiebreak on
    both rankings (the ann_ivf_recall contract).

    Output, ordered: (n_probe, n_queries, n_exact, n_hits,
    recall_e6) — recall pooled over queries (micro-average);
    n_queries counts queries WITH exact neighbors (the denominator
    population), and recall_e6 is NULL when that set is empty (no
    evidence, not 0)."""
    cents = centroids if centroids is not None else kmeans_centroids(
        corpus, n_centroids, id_col=id_col, vec_col=vec_col
    )
    max_p = max(probes)
    cells = _assign_to_centroid(corpus, cents, vec_col).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        F.col("__centroid").alias("cell"),
    )
    qdf = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    # probed cells WITH their probe rank (posexplode of the ranked
    # slice — the rank is what lets one candidate pass serve every
    # sweep point)
    vec = F.col("__qv")
    dist_arr = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(float(x)) for x in c]),
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for c in cents
        ]
    )
    ranked = F.transform(
        F.array_sort(
            F.zip_with(
                dist_arr,
                F.sequence(F.lit(0), F.lit(len(cents) - 1)),
                lambda d, i: F.struct(d.alias("d"), i.alias("i")),
            )
        ),
        lambda s: s["i"],
    )
    probed = qdf.select(
        "query_id",
        "__qv",
        F.posexplode(F.slice(ranked, 1, max_p)).alias("__pos", "cell"),
    ).withColumn("cell_rank", (F.col("__pos") + 1).cast("int"))
    pairs = (
        cells.join(F.broadcast(probed), "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            "cell_rank",
            (F.round(cosine(F.col("__qv"), F.col("embedding")), 4) + 0.0)
            .alias("cos"),
        )
    )
    swept = pairs.withColumn(
        "n_probe", F.explode(F.array(*[F.lit(int(p)) for p in sorted(probes)]))
    ).filter(F.col("cell_rank") <= F.col("n_probe"))
    w = Window.partitionBy("n_probe", "query_id").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    approx = (
        swept.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("n_probe", "query_id", "vec_id")
    )
    exact = cosine_topk(corpus, queries, k=k, id_col=id_col, vec_col=vec_col)
    hits = approx.join(
        exact.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_semi"
    )
    tot = exact.agg(
        F.count("*").cast("long").alias("n_exact"),
        F.countDistinct("query_id").cast("long").alias("n_queries"),
    )
    hits_np = hits.groupBy("n_probe").agg(
        F.count("*").cast("long").alias("__h")
    )
    spark = corpus.sparkSession
    probe_df = spark.createDataFrame(
        [(int(p),) for p in sorted(probes)], "n_probe int"
    )
    return (
        probe_df.crossJoin(F.broadcast(tot))
        .join(hits_np, "n_probe", "left")
        .selectExpr(
            "CAST(n_probe AS BIGINT) AS n_probe",
            "n_queries",
            "n_exact",
            "CAST(COALESCE(__h, 0) AS BIGINT) AS n_hits",
            # NULL recall on an empty exact set (no evidence, not 0) —
            # ANSI div would otherwise throw on the zero denominator
            "CASE WHEN n_exact > 0 THEN"
            " CAST(1000000 AS DECIMAL(38,0)) * COALESCE(__h, 0)"
            " div n_exact END AS recall_e6",
        )
        .orderBy("n_probe")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.99,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: RP-LSH bucket self-join +
    exact cosine filter. Near-identical vectors agree on every
    hyperplane sign, so bucket equality has ~full recall at high
    thresholds; cost is Σ bucket², not corpus². Output:
    (vec_a, vec_b, cos) with vec_a < vec_b."""
    b = rp_lsh_buckets(df, num_planes, id_col, vec_col)
    left = b.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("__va"), "bucket")
    right = b.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("__vb"), "bucket")
    return (
        left.join(right, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            (F.round(cosine(F.col("__va"), F.col("__vb")), 4) + 0.0).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def semdedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication = k-means-cluster the embedding space, then drop every
    point that has a lower-id point in the SAME cluster with cosine >=
    ``threshold``. Returns survivors as (id_col, cell).

    The clustering is the scale trick: the quadratic pairwise step runs
    within cells only (cost Σ cell², never corpus²), and the cell
    self-join is a shuffle on the cell id that AQE skew-splits if one
    cell is huge. Keep policy here is lowest-id-wins (deterministic,
    SQL-replayable); the paper keeps the point least similar to the
    centroid — swap the ordering column to get that variant.

    Like near_dedup's greedy filter, "any lower-id neighbor" slightly
    over-removes versus greedy-chain semantics (if A~B and B~C but A!~C,
    C is still dropped when B is) — documented tradeoff, same policy as
    the text tier so the two stacks compose predictably.

    ``centroids`` bypasses the k-means build with a fixed coarse
    quantizer (k×dim floats), as in ivf_topk.
    """
    cents = centroids if centroids is not None else kmeans_centroids(
        df, n_centroids, id_col=id_col, vec_col=vec_col
    )
    cells = _assign_to_centroid(df, cents, vec_col).select(
        F.col(id_col), F.col(vec_col), F.col("__centroid").alias("cell")
    )
    left = cells.select(F.col(id_col).alias("__ida"), F.col(vec_col).alias("__va"), "cell")
    right = cells.select(F.col(id_col).alias("__idb"), F.col(vec_col).alias("__vb"), "cell")
    losers = (
        left.join(right, "cell")
        .filter(F.col("__ida") < F.col("__idb"))
        .filter((F.round(cosine(F.col("__va"), F.col("__vb")), 4) + 0.0) >= threshold)
        .select(F.col("__idb").alias(id_col))
        .distinct()
    )
    return cells.join(losers, id_col, "left_anti").select(id_col, "cell")


def label_centroids(df, id_col: str, vec_col: str, label_col: str):
    """Per-label centroid vectors as (label, pos, c) rows: posexplode +
    (label, dimension) average — dimension-sharded, so a label with a
    billion members never funnels through one task (the array-collect
    alternative would). Output feeds centroid_cosines or any per-
    dimension analysis."""
    from pyspark.sql import functions as F

    return (
        df.select(F.col(label_col).alias("label"), F.posexplode(vec_col).alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.avg("v").alias("c"))
    )


def centroid_cosines(centroids):
    """Pairwise cosine similarity between label centroids from
    label_centroids' (label, pos, c) rows: a self-join on the dimension
    index (64-row-per-label tables — trivially small after the
    aggregation) + one sum per pair. Output: (label_a, label_b,
    cos_e6) for label_a < label_b — the class-separation /
    embedding-drift report (a drifting encoder collapses or shifts
    centroid geometry long before top-k recall visibly degrades)."""
    from pyspark.sql import functions as F

    a = centroids.select(
        F.col("label").alias("label_a"), "pos", F.col("c").alias("ca")
    )
    b = centroids.select(
        F.col("label").alias("label_b"), "pos", F.col("c").alias("cb")
    )
    pairs = (
        a.join(b, "pos")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("ca") * F.col("cb")).alias("__dot"),
            F.sum(F.col("ca") * F.col("ca")).alias("__na"),
            F.sum(F.col("cb") * F.col("cb")).alias("__nb"),
        )
    )
    cos = F.col("__dot") / F.sqrt(F.col("__na") * F.col("__nb"))
    return pairs.select(
        "label_a", "label_b", F.floor(cos * 1_000_000).cast("long").alias("cos_e6")
    )


def pq_encode(df, codebooks, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Product-quantization encode: the vector splits into m subvectors;
    each maps to the index of its nearest subspace centroid (ties →
    lowest index via first-match array_position). Output:
    (id, codes array<int>) — m bytes-ish per vector instead of 4·dim,
    THE memory trick that lets an ANN index for 10^10 vectors live in
    RAM (Jégou et al., IEEE TPAMI 2011).

    ``codebooks``: list[m] of list[ksub] of list[dsub] floats. Pure
    per-row expressions (no shuffle, no UDF): m·ksub literal distance
    terms compiled into codegen.
    """
    from pyspark.sql import functions as F

    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    v = F.col(vec_col)

    def subdist(j, cent):
        sub = F.slice(v, j * dsub + 1, dsub)
        return F.aggregate(
            F.zip_with(
                sub,
                F.array(*[F.lit(float(x)) for x in cent]),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    codes = []
    for j in range(m):
        dists = F.array(*[subdist(j, codebooks[j][c]) for c in range(ksub)])
        codes.append((F.array_position(dists, F.array_min(dists)) - 1).cast("int"))
    return df.select(F.col(id_col), F.array(*codes).alias("codes"))


def pq_adc_topk(
    codes_df,
    queries,
    codebooks,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Asymmetric-distance top-k over PQ codes: each query precomputes a
    lookup table of m·ksub exact subspace distances (a per-row
    expression over the query vector), then the corpus scan is ONE
    lookup per subspace per code — no decode, no float vector reads.
    The classic IVF-ADC scan shape, minus the IVF routing (compose with
    ivf_topk's cells to get IVFADC proper).

    Queries are few → broadcast; per-query top-k is a
    WindowGroupLimit-bounded window. Output:
    (query_id, vec_id, dist_e6, rank).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    qv = F.col(vec_col)

    lut_terms = []
    for j in range(m):
        sub = F.slice(qv, j * dsub + 1, dsub)
        for c in range(ksub):
            lut_terms.append(
                F.aggregate(
                    F.zip_with(
                        sub,
                        F.array(*[F.lit(float(x)) for x in codebooks[j][c]]),
                        lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.array(*lut_terms).alias("__lut")
    )
    dist = None
    for j in range(m):
        term = F.element_at(
            F.col("__lut"),
            (F.lit(j * ksub) + F.element_at(F.col("codes"), j + 1) + 1).cast("int"),
        )
        dist = term if dist is None else dist + term
    scored = codes_df.crossJoin(F.broadcast(q)).select(
        "query_id", F.col(id_col), F.floor(dist * 1_000_000).cast("long").alias("dist_e6")
    )
    w = Window.partitionBy("query_id").orderBy("dist_e6", id_col)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "dist_e6", F.col("rank").cast("int"))
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVFADC — the composed billion-scale ANN shape (Jégou et al.):
    coarse IVF routing bounds WHICH codes each query scans (n_probe of
    n_centroids cells), PQ/ADC bounds WHAT a scan costs (one LUT lookup
    per subspace instead of a float-vector distance). The corpus is
    stored as (cell, codes) — m small ints + a cell id per vector.

    Same determinism contracts as the halves: assignment argmin and
    probe ties break to the lowest index, code ties to the lowest
    centroid. Output: (query_id, vec_id, dist_e6, rank).
    """
    from pyspark.sql import Window

    cents = centroids if centroids is not None else kmeans_centroids(
        corpus, n_centroids, id_col=id_col, vec_col=vec_col
    )
    cells = _assign_to_centroid(corpus, cents, vec_col).select(
        F.col(id_col), F.col("__centroid").alias("cell")
    )
    codes = pq_encode(corpus, codebooks, id_col=id_col, vec_col=vec_col).join(
        cells, id_col
    )

    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    qv = F.col("__qv")
    lut_terms = []
    for j in range(m):
        sub = F.slice(qv, j * dsub + 1, dsub)
        for c in range(ksub):
            lut_terms.append(
                F.aggregate(
                    F.zip_with(
                        sub,
                        F.array(*[F.lit(float(x)) for x in codebooks[j][c]]),
                        lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )
    qdf = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    probed = _probe_nearest_cells(qdf, cents, n_probe).select(
        "query_id", "cell", F.array(*lut_terms).alias("__lut")
    )

    dist = None
    for j in range(m):
        term = F.element_at(
            F.col("__lut"),
            (F.lit(j * ksub) + F.element_at(F.col("codes"), j + 1) + 1).cast("int"),
        )
        dist = term if dist is None else dist + term
    scored = codes.join(F.broadcast(probed), "cell").select(
        "query_id", F.col(id_col), F.floor(dist * 1_000_000).cast("long").alias("dist_e6")
    )
    w = Window.partitionBy("query_id").orderBy("dist_e6", id_col)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "dist_e6", F.col("rank").cast("int"))
    )


def gram_matrix(
    df: DataFrame, vec_col: str, quantize: int | None = None
) -> DataFrame:
    """Distributed Gram matrix XᵀX over an embedding column — the
    matrix-multiplication kernel (the classic MapReduce matmul example
    re-expressed as aggregation algebra): output one row per dimension
    pair (i, j, dot) with i <= j, 1-based, where
    dot = Σ_rows v[i]·v[j].

    Shape: each row's upper-triangle products are generated INSIDE the
    vector array (nested transform over the array with positional
    lambdas — one explode of d(d+1)/2 terms, no self-join), then a
    (i, j) groupBy-sum whose map-side partial IS the per-task partial
    Gram block — shuffle traffic is d² rows per task regardless of
    corpus size, the blocked-matmul contract. Feature covariance / PCA
    prep at 100 TB runs exactly like this.

    ``quantize=k`` first maps elements to floor(x·k) BIGINT — exact
    integer accumulation, reproducible across engines/partitionings
    (float sums are accumulation-order-dependent; the quantized Gram is
    the cross-engine-checkable variant, and the one to use when runs
    must be bit-identical).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    if quantize is not None:
        v = F.transform(v, lambda x: F.floor(x * quantize).cast("long"))
    base = df.select(v.alias("__v"))
    arr = F.col("__v")
    terms = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + F.lit(1), F.size(arr)),
                lambda y, jj: F.struct(
                    (i + F.lit(1)).alias("i"),
                    (i + jj + F.lit(1)).alias("j"),
                    (x * y).alias("p"),
                ),
            ),
        )
    )
    return (
        base.select(F.explode(terms).alias("t"))
        .select("t.i", "t.j", "t.p")
        .groupBy("i", "j")
        .agg(F.sum("p").alias("dot"))
    )


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-NN majority-vote classification over embeddings — the standard
    embedding-quality / label-noise probe (predict each query's label
    from its neighbors, then read the confusion structure). Output:
    (query_id, true_label, pred_label).

    Majority vote is argmax over (votes desc, label asc) — a DISCRETE
    choice, so it ranks on integer vote counts with a total tie order,
    never on raw float similarity (cosine already quantized @1e-4 in
    cosine_topk). The vote window is query-partitioned and bounded by
    the label cardinality; neighbors come from the broadcast-query
    top-k scan."""
    nb = cosine_topk(corpus, queries, k=k, id_col=id_col, vec_col=vec_col)
    labels = corpus.select(
        F.col(id_col), F.col(label_col).alias("__nb_label")
    )
    truth = queries.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("true_label")
    )
    votes = (
        nb.join(labels, id_col)
        .join(truth, "query_id")
        .groupBy("query_id", "true_label", "__nb_label")
        .agg(F.count("*").alias("__votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("__votes"), F.asc("__nb_label")
    )
    return (
        votes.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select("query_id", "true_label", F.col("__nb_label").alias("pred_label"))
    )


def kcenter_greedy(
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant: int = 1000,
) -> list[tuple[int, object, int]]:
    """Greedy k-center coreset selection (Gonzalez 1985; the facility-
    location diversity heuristic behind coreset-based training-data
    selection): start from the smallest id, then repeatedly pick the
    point FARTHEST from everything chosen so far (max min-distance,
    2-approximation of the optimal cover radius).

    Determinism design: vectors are floor-quantized to integers and
    distance is EXACT integer squared-L2, so the per-iteration argmax
    is a discrete choice over BIGINT keys with an id tiebreak — no
    float rank anywhere, any engine replays the identical selection.

    Scale shape: the corpus stays distributed; each iteration is ONE
    narrow column update (min of previous mindist and distance to the
    newly chosen center, whose 64 quantized coordinates ship as
    literals — no join, no shuffle) + a TakeOrdered(1) argmax. Driver
    state is k rows (the k-means-centroid precedent);
    localCheckpoint per iteration keeps the k actions from re-running
    the whole history.

    Returns [(rank, chosen_id, mindist_when_chosen)] with rank
    1..min(k, n_points) — when k exceeds the corpus size the complete
    cover is returned rather than failing mid-loop; the seed's mindist
    is 0 by convention. Raises ValueError on an empty corpus."""
    from hadoop_fcfs_spark.ops.sort import top_k

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q = corpus.select(
        F.col(id_col).alias("__id"),
        F.transform(
            F.col(vec_col), lambda x: F.floor(x * quant).cast("long")
        ).alias("__v"),
    ).localCheckpoint()
    seeds = top_k(q, 1, F.asc("__id")).collect()
    if not seeds:
        raise ValueError("kcenter_greedy: empty corpus")
    seed = seeds[0]
    chosen = [(1, seed["__id"], 0)]

    def dist_to(vec: list) -> F.Column:
        lit = F.array(*[F.lit(int(x)) for x in vec])
        return F.aggregate(
            F.zip_with(F.col("__v"), lit, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    state = q.withColumn("__md", dist_to(seed["__v"])).localCheckpoint()
    for rank in range(2, k + 1):
        rows = top_k(
            state.filter(~F.col("__id").isin([c[1] for c in chosen])),
            1,
            F.desc("__md"),
            F.asc("__id"),
        ).collect()
        if not rows:
            # k exceeds the number of distinct points: every point is
            # already a center — return the complete cover (radius 0)
            # instead of dying on an exhausted argmax mid-loop
            break
        far = rows[0]
        chosen.append((rank, far["__id"], far["__md"]))
        state = state.withColumn(
            "__md", F.least(F.col("__md"), dist_to(far["__v"]))
        ).localCheckpoint()
    return chosen


def mutual_topk_pairs(topk: DataFrame, rank_col: str = "rank") -> DataFrame:
    """Reciprocal nearest-neighbor pairs from ANY per-query ranking
    table shaped (query_id, vec_id, cos, rank) — keep (a, b) iff b is
    a's rank-1 neighbor AND a is b's rank-1 neighbor. The mutual-NN
    criterion is the classic high-precision duplicate/translation-pair
    filter (a one-directional top-1 is often a hub; reciprocity kills
    hub matches). Composes with exact ``cosine_topk`` or any ANN tier
    output (IVF/LSH/PQ) — the scale path is whatever produced the
    ranking; this step is two projections of the rank-1 rows and ONE
    equi-join on the pair key, emitted once with doc_a < doc_b."""
    r1 = topk.filter(F.col(rank_col) == 1).select(
        F.col("query_id").alias("doc_a"),
        F.col("vec_id").alias("doc_b"),
        "cos",
    )
    rev = r1.select(
        F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
    )
    return (
        r1.join(rev, ["doc_a", "doc_b"], "left_semi")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "cos")
    )


def gram_power_iteration(
    df: DataFrame,
    vec_col: str,
    iterations: int = 3,
    quantize: int = 1000,
    scale_div: int = 1000,
) -> DataFrame:
    """Top principal direction of the embedding corpus by power
    iteration on the quantized Gram matrix — the PCA/whitening first
    step (and the dominant-direction drift probe: anisotropic
    embedding corpora concentrate along one direction; comparing this
    vector across snapshots is the cheap detector). Returns the
    e6-quantized max-normalized eigenvector estimate after
    ``iterations`` matvec steps from the all-ones start.

    Scale shape: the ONLY corpus-sized pass is :func:`gram_matrix`
    (blocked matmul, d²-bounded shuffle) — materialized once behind an
    eager localCheckpoint; every iteration after it is a d²-edge ×
    d-node join (Spark broadcasts the node side) + one map-side-
    combined node aggregation, with the node state localCheckpointed
    per step so the plan stays O(1) across iterations — the
    bradley_terry node-shaped-state discipline, nothing data-sized
    ever recomputes. Exact arithmetic: Gram entries are exact BIGINT,
    down-scaled by TRUNCATING integer division (Spark ``div`` —
    which is what DuckDB's integer ``//`` does too, measured on
    negatives: −5//2 = −2; do NOT use the pmod floor idiom here, it
    would diverge on negative Gram entries); each matvec is an
    exact BIGINT Σ g·p with documented bound d·max|g|·10⁶ < 2⁶³
    (raise ``scale_div`` when the corpus grows past it — it throws,
    not corrupts, beyond); normalization is ONE double division of
    exact integers + floor (bit-identical cross-engine, the BT
    normalization contract).

    Output: (dim, component_e6), d rows, 1-based dims."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    g = gram_matrix(df, vec_col, quantize=quantize)
    up = g.selectExpr(
        "i", "j", f"CAST(dot div {int(scale_div)} AS BIGINT) AS g"
    )
    # localCheckpoint, not persist: the per-iteration loop below must
    # start each step from a lineage-truncated plan or the nested
    # join/agg tree grows per iteration until planning itself OOMs
    # (the bradley_terry/hits/kcore iterative-state contract).
    edges = (
        up.filter("i < j")
        .selectExpr("j AS i", "i AS j", "g")
        .unionByName(up)
        .localCheckpoint(eager=True)
    )
    v = (
        edges.select("i").distinct()
        .select(F.col("i").alias("node"), F.lit(1000000).cast("long").alias("p"))
    )
    for _ in range(iterations):
        u = (
            edges.join(
                v.select(F.col("node").alias("j"), F.col("p").alias("__pj")),
                "j",
            )
            .groupBy(F.col("i").alias("node"))
            .agg(F.sum(F.col("g") * F.col("__pj")).cast("long").alias("__u"))
        )
        m = u.agg(F.max(F.abs(F.col("__u"))).alias("__m"))
        v = (
            u.crossJoin(F.broadcast(m))
            .selectExpr(
                "node",
                "CASE WHEN __m > 0 THEN CAST(FLOOR(CAST(__u AS DOUBLE)"
                " / CAST(__m AS DOUBLE) * 1000000) AS BIGINT)"
                " ELSE CAST(0 AS BIGINT) END AS p",
            )
            .localCheckpoint(eager=True)
        )
    return v.selectExpr("node AS dim", "p AS component_e6")


def kmeans_lloyd_exact(
    df: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 1000,
) -> DataFrame:
    """Lloyd's k-means with every number exact — the value-oracled
    twin of :func:`kmeans_centroids` (which averages in floats and is
    therefore only reachable through downstream gates like semdedup).
    Vectors floor-quantize to 1/``quantize`` units (BIGINT); init
    centroids are the ``k`` lowest-id vectors (reproducible without
    hashing — the oracle replays it as a ROW_NUMBER over id); each of
    ``iterations`` Lloyd steps assigns by exact integer squared-L2
    argmin (ties → lowest cell index) and recomputes centroids as
    TRUNCATING integer division of exact dimension sums (toward zero,
    matching DuckDB ``//`` — Python ``//`` floors and would drift on
    negative sums, measured); an emptied cell keeps its previous
    centroid. Output: one final assignment pass under the last
    centroids → (cell, n, inertia) per non-empty cell, inertia the
    exact BIGINT sum of member squared distances.

    Scale shape (the kmeans_centroids contract, kept): per iteration
    ONE data pass — centroids ride a 1-row broadcast array column
    (NOT k·dim literals: literal trees re-pay ~seconds of Catalyst
    planning every iteration, measured; the broadcast keeps the plan
    text iteration-invariant), the update is a dimension-sharded
    (cell, dim) aggregation producing k·dim integers, and the driver
    holds only k·dim ints per round (bounded round trips ∝
    iterations, the BPE-merges discipline).
    Nothing data-sized shuffles; no window anywhere. Integer bounds
    (ANSI throws): per-row distance d·(2·q·max|x|)² < 2⁶³ and
    dimension sums n·q·max|x| < 2⁶³ — comfortable at any corpus that
    fits an engine.

    Reference parity: the reference's iterative-driver idiom (chained
    MapReduce jobs reusing DistributedCache for model state, e.g.
    hadoop-mapreduce-examples' iterative pi/pentomino drivers) is this
    loop's ancestor; the broadcast centroid row plays the
    DistributedCache role."""
    if k < 1 or iterations < 0:
        raise ValueError(f"need k >= 1, iterations >= 0; got {k}, {iterations}")
    q, cents = _lloyd_quantize_fit(
        df, k, iterations, id_col, vec_col, quantize
    )
    if not cents:
        return q.sparkSession.createDataFrame(
            [], "cell int, n long, inertia long"
        )
    return (
        _with_dist_array(q, cents)
        .withColumn(
            "__cell",
            (F.array_position(F.col("__da"), F.array_min("__da")) - 1).cast("int"),
        )
        .withColumn("__d", F.array_min("__da"))
        .groupBy(F.col("__cell").alias("cell"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("__d").cast("long").alias("inertia"),
        )
    )


def kmeans_assignments(
    df: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 1000,
) -> DataFrame:
    """The (id, cell) assignment table under the exact-Lloyd fit —
    the same :func:`kmeans_lloyd_exact` replay (shared
    _lloyd_quantize_fit, so the per-cell gates and any
    assignment-grain consumer cannot drift) exposed at row grain for
    partition-comparison QA (ARI against labels, cross-run stability)
    and downstream routing. Output: (id_col, cell)."""
    q, cents = _lloyd_quantize_fit(df, k, iterations, id_col, vec_col, quantize)
    if not cents:
        return q.sparkSession.createDataFrame([], f"{id_col} long, cell int")
    return (
        _with_dist_array(q, cents)
        .withColumn(
            "__cell",
            (F.array_position(F.col("__da"), F.array_min("__da")) - 1).cast("int"),
        )
        .select(F.col("__id").alias(id_col), F.col("__cell").alias("cell"))
    )


def _with_dist_array(q: DataFrame, cents: list[list[int]]) -> DataFrame:
    """Attach __da = array of exact-BIGINT squared L2 distances from
    __q to each centroid (argmin = array_position of array_min,
    lowest cell wins ties). Centroids ride a 1-ROW BROADCAST as an
    array<array<bigint>> column, NOT as literals: with k·dim literal
    expressions the Catalyst tree is rebuilt and re-codegen'd every
    iteration (measured: ~2-4 s of pure planning per pass at k=8,
    dim=64 — data-size-independent but paid per round); with the
    broadcast the expression is ONE transform lambda whose generated
    code is identical across iterations, only the broadcast DATA
    changes. Still zero shuffle of the corpus — the
    broadcast-nested-loop join moves k·dim ints."""
    spark = q.sparkSession
    centrow = spark.createDataFrame(
        [([list(int(x) for x in c) for c in cents],)],
        "__cents array<array<bigint>>",
    )
    sq = F.transform(
        F.col("__cents"),
        lambda c: F.aggregate(
            F.zip_with(F.col("__q"), c, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    return q.crossJoin(F.broadcast(centrow)).withColumn("__da", sq).drop(
        "__cents"
    )


def _lloyd_quantize_fit(
    df: DataFrame,
    k: int,
    iterations: int,
    id_col: str,
    vec_col: str,
    quantize: int,
):
    """Shared exact-Lloyd fit (see kmeans_lloyd_exact for semantics):
    returns the checkpointed quantized corpus and the final integer
    centroids. k·dim driver ints per iteration, one data pass each."""
    q = df.select(
        F.col(id_col).alias("__id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * quantize).cast("long"),
        ).alias("__q"),
    ).localCheckpoint(eager=True)  # quantized corpus reused every pass

    seeds = q.orderBy("__id").limit(k).collect()
    cents: list[list[int]] = [list(r["__q"]) for r in seeds]
    if not cents:
        return q, cents

    def _tdiv(a: int, b: int) -> int:
        # truncate toward zero (DuckDB //, Spark div); Python // floors
        return abs(a) // b if a >= 0 else -(abs(a) // b)

    for _ in range(iterations):
        assigned = _with_dist_array(q, cents).withColumn(
            "__cell",
            (F.array_position(F.col("__da"), F.array_min("__da")) - 1).cast("int"),
        )
        # dimension-sharded update (the label_centroids idiom): k·dim
        # summary rows instead of a dim-wide aggregate — the plan stays
        # small and identical across iterations, and no single task
        # ever reduces more than one (cell, dim) stripe
        rows = (
            assigned.select("__cell", F.posexplode("__q").alias("__pos", "__v"))
            .groupBy("__cell", "__pos")
            .agg(
                F.sum("__v").cast("long").alias("__s"),
                F.count("*").cast("long").alias("__cnt"),
            )
            .collect()
        )
        new = [list(c) for c in cents]
        for r in rows:
            new[r["__cell"]][r["__pos"]] = _tdiv(r["__s"], r["__cnt"])
        cents = new
    return q, cents


def kmeans_silhouette(
    df: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 1000,
) -> DataFrame:
    """Per-cell simplified silhouette of the exact-Lloyd clustering —
    the quality loop over :func:`kmeans_lloyd_exact` (inertia says how
    tight cells are; silhouette says whether points sit closer to
    their OWN centroid than to the runner-up — the number that says
    "k is wrong" or "two cells should merge" before a curation step
    trusts the cells). Simplified silhouette (Hruschka et al. 2004)
    measures against CENTROIDS, not all points — the O(n·k) variant
    that scales; this implementation further uses SQUARED distances
    so every per-point score is exact integer arithmetic:
    s = (b₂ − a₂)·10⁶ div max(a₂, b₂) with a₂ = own-centroid sqdist
    (the argmin), b₂ = runner-up sqdist (array_sort[1] — equal-
    distance ties give s = 0, honestly ambiguous). Cell rollup is
    Σs div n — exact BIGINT end to end, no double ever aggregated
    across rows.

    Same scale shape as the fit: ONE extra data pass with centroid
    literals; rollup map-side combined. Output: (cell, n,
    mean_sil_micro) per non-empty cell; since assignment IS the
    argmin, per-point scores live in [0, 10⁶] — values near 0 mean
    boundary points (the runner-up centroid is about as close), the
    merge-these-cells signal."""
    q, cents = _lloyd_quantize_fit(
        df, k, iterations, id_col, vec_col, quantize
    )
    if not cents:
        return q.sparkSession.createDataFrame(
            [], "cell int, n long, mean_sil_micro long"
        )
    if len(cents) < 2:
        raise ValueError("silhouette needs k >= 2 cells")
    scored = (
        _with_dist_array(q, cents)
        .withColumn(
            "__cell",
            (F.array_position(F.col("__da"), F.array_min("__da")) - 1).cast("int"),
        )
        .withColumn("__sorted", F.array_sort("__da"))
        .selectExpr(
            "__cell",
            "__sorted[0] AS __a2",
            "__sorted[1] AS __b2",
        )
        .selectExpr(
            "__cell",
            "CASE WHEN GREATEST(__a2, __b2) > 0 THEN"
            " (__b2 - __a2) * 1000000 div GREATEST(__a2, __b2)"
            " ELSE CAST(0 AS BIGINT) END AS __s",
        )
    )
    return (
        scored.groupBy(F.col("__cell").alias("cell"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("__s").cast("long").alias("__ssum"),
        )
        .selectExpr(
            "cell", "n",
            "CAST(__ssum div n AS BIGINT) AS mean_sil_micro",
        )
    )


def pc_projection_outliers(
    df: DataFrame,
    k: int = 10,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 1000,
    scale_div: int = 1000,
) -> DataFrame:
    """Top-|projection| outliers along the corpus's dominant principal
    direction — the actionable surface over
    :func:`gram_power_iteration` (the direction alone is a drift
    probe; the documents that EXTREMIZE it are what you actually
    inspect: in an anisotropic embedding corpus they are the
    cluster-of-everything axis riders — near-duplicates, templated
    boilerplate, encoder pathologies).

    The direction is fitted by the exact power iteration (same
    parameters), its d e6-quantized components collected to the
    driver (d ints — bounded, the kmeans-centroid class of collect),
    and broadcast back as a 1-row array column (the kmeans planning
    lesson: data, not literals). Each document's projection is then
    ONE zip_with/aggregate over its milli-quantized vector — exact
    BIGINT Σ q_d·p_d, zero shuffle — and the top-k by |projection|
    (ties → lowest id) is a TakeOrdered. Bound: d·q·max|x|·10⁶ < 2⁶³
    (comfortable at any embedding dim). Output: k rows
    (vec_id, projection), projection in milli·e6 units."""
    pc = gram_power_iteration(
        df, vec_col, iterations=iterations, quantize=quantize,
        scale_div=scale_div,
    ).orderBy("dim").collect()
    comps = [int(r["component_e6"]) for r in pc]
    if not comps:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, projection long"
        )
    spark = df.sparkSession
    pcrow = spark.createDataFrame([(comps,)], "__pc array<bigint>")
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * quantize).cast("long"),
    )
    proj = F.aggregate(
        F.zip_with(F.col("__qv"), F.col("__pc"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        df.select(F.col(id_col), qv.alias("__qv"))
        .crossJoin(F.broadcast(pcrow))
        .select(F.col(id_col), proj.alias("projection"))
        .orderBy(F.abs(F.col("projection")).desc(), F.col(id_col).asc())
        .limit(k)
    )


def pq_distortion_audit(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ quantization-distortion audit: for every (query, doc) pair,
    compare the ADC approximate distance (the number pq_adc_topk
    ranks by) against the exact squared L2, and roll up mean/max
    RELATIVE distortion — the measured-error QA loop that completes
    the approximation tier (ann_ivf_recall audits IVF routing,
    minhash_estimate_audit audits the signature estimator, this
    audits the codebook: a distortion creeping up means the codebook
    no longer fits the corpus and recall will follow it down).

    Queries are few → broadcast (the cosine_pairs shape): the corpus
    is scanned once against per-query LUTs; the exact distance is the
    same per-subspace fold ADC uses, evaluated on the raw subvectors
    instead of codewords — identical accumulation ORDER (j then
    within-subspace left-to-right), so the two numbers differ only by
    quantization, never float ordering. Per pair the relative
    distortion floor(|adc − exact|/exact · 10⁶) is an exact integer
    (pairs with exact = 0 are excluded — relative error is undefined
    at zero and those pairs are exact matches anyway); mean = sum div
    count. Output: 1 row (n_pairs, mean_rel_distortion_micro,
    max_rel_distortion_micro)."""
    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    codes = pq_encode(corpus, codebooks, id_col=id_col, vec_col=vec_col)
    docs = corpus.select(
        F.col(id_col).alias("__did"), F.col(vec_col).alias("__dv")
    ).join(codes.select(F.col(id_col).alias("__did"), "codes"), "__did")

    qv = F.col(vec_col)
    lut_terms = []
    for j in range(m):
        sub = F.slice(qv, j * dsub + 1, dsub)
        for c in range(ksub):
            lut_terms.append(
                F.aggregate(
                    F.zip_with(
                        sub,
                        F.array(*[F.lit(float(x)) for x in codebooks[j][c]]),
                        lambda a, b: (a.cast("double") - b)
                        * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )
    q = queries.select(
        F.col(id_col).alias("__qid"),
        F.array(*lut_terms).alias("__lut"),
        qv.alias("__qv"),
    )
    pairs = docs.crossJoin(F.broadcast(q))
    adc = None
    exact = None
    for j in range(m):
        a_term = F.element_at(
            F.col("__lut"),
            (F.lit(j * ksub) + F.element_at(F.col("codes"), j + 1) + 1)
            .cast("int"),
        )
        e_term = F.aggregate(
            F.zip_with(
                F.slice(F.col("__qv"), j * dsub + 1, dsub),
                F.slice(F.col("__dv"), j * dsub + 1, dsub),
                lambda a, b: (a.cast("double") - b.cast("double"))
                * (a.cast("double") - b.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        adc = a_term if adc is None else adc + a_term
        exact = e_term if exact is None else exact + e_term
    scored = pairs.select(
        adc.alias("__adc"), exact.alias("__exact")
    ).filter(F.col("__exact") > 0).select(
        F.floor(
            F.abs(F.col("__adc") - F.col("__exact"))
            / F.col("__exact")
            * 1_000_000
        ).cast("long").alias("__rd")
    )
    return scored.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("__rd").alias("__srd"),
        F.max("__rd").cast("long").alias("max_rel_distortion_micro"),
    ).selectExpr(
        "n_pairs",
        "CASE WHEN n_pairs > 0 THEN CAST(__srd div n_pairs AS BIGINT)"
        " END AS mean_rel_distortion_micro",
        "max_rel_distortion_micro",
    )
