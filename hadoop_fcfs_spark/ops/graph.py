"""Iterative graph analytics as DataFrame algebra: PageRank and
multi-source BFS hop levels.

Companion to the label-propagation connected components in
llm/dedup.py (the other iterative-tier operator). Each PageRank
iteration is two co-partitioned equi-joins + one aggregation — rank
mass flows src→dst along edges — so an iteration costs what one
big join costs, and the rank state is one row per NODE (never
edge-shaped). The iteration count is fixed and small (power iteration
converges geometrically at rate ~damping); this is an analytics
rollup, not a convergence chase.

Scale notes:
  - The edge table shuffles once per iteration (hash on src for the
    rank join, then on dst for the aggregation). On a real cluster,
    pre-partition edges by src and persist — every iteration reuses
    the layout (Pregel's edge-cut, expressed as a Spark partitioning).
  - Hub skew (a node with millions of in-edges) lands on the dst
    aggregation — a sum, map-side combined; AQE splits the rest.
  - Lineage doubles per iteration; ``checkpoint_every`` truncates with
    localCheckpoint like llm.dedup.connected_components does.
  - Dangling nodes (no out-edges): ``dangling="redistribute"`` adds the
    standard per-iteration dangling-sum term (their rank mass teleports
    uniformly), keeping ranks summing to 1. The term is ONE scalar
    aggregate over node-shaped state, broadcast back — no extra
    edge-sized work. ``dangling="none"`` keeps the classic simplification
    (ranks sum < 1 when danglers exist).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 5,
    damping: float = 0.85,
    checkpoint_every: int = 3,
    dangling: str = "none",
) -> DataFrame:
    """Weighted PageRank over an edge list. Returns (node, rank).

    Transition mass from a node splits across its out-edges
    proportionally to ``weight`` (uniformly when None). Node set =
    distinct src ∪ dst; rank init = 1/N; per iteration
    rank(v) = (1-damping)/N + damping·(Σ_{u→v} rank(u)·w_norm(u,v)
    [+ dangling_mass/N when dangling="redistribute"]).
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if dangling not in ("none", "redistribute"):
        raise ValueError(f"dangling must be 'none' or 'redistribute', got {dangling!r}")
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    ew = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))
    # per-source normalized transition weights via groupBy + join, not a
    # window partitioned by src: a hub with 1e8 out-edges would put its
    # whole edge list through ONE window task, while the aggregation
    # partial-combines map-side and the join is AQE-skew-splittable
    from hadoop_fcfs_spark.caching import waypoint

    out_mass = ew.groupBy("src").agg(F.sum("w").alias("__wsum"))
    # the normalized edge table and the node set are consumed EVERY
    # iteration (and the node set three more times: count, rank init,
    # dangling anti-join) — without the waypoints each consumer re-runs
    # the raw edge scan + normalization shuffle per iteration (r14
    # class sweep; the markov_stationary precedent in this file)
    norm = waypoint(
        ew.join(out_mass, "src").select(
            "src", "dst", (F.col("w") / F.col("__wsum")).alias("wn")
        )
    )
    nodes = waypoint(
        ew.select(F.col("src").alias("node"))
        .unionByName(ew.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()  # one scalar over the cached node set
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    teleport = (1.0 - damping) / n

    dang = None
    if dangling == "redistribute":
        # node-shaped, deterministic, reused every iteration
        dang = nodes.join(
            out_mass.select(F.col("src").alias("node")), "node", "left_anti"
        ).localCheckpoint(eager=True)

    for i in range(iterations):
        contrib = (
            norm.join(ranks, norm.src == ranks.node)
            .select("dst", (F.col("rank") * F.col("wn")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        incoming = F.coalesce(F.col("c"), F.lit(0.0))
        new_ranks = nodes.join(contrib, nodes.node == contrib.dst, "left")
        if dang is not None:
            # dangling mass this iteration: one scalar agg over node-shaped
            # state, broadcast back as a 1-row cross join (the scalar-join
            # pattern, never edge-sized)
            dsum = ranks.join(dang, "node", "left_semi").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
            )
            new_ranks = new_ranks.crossJoin(F.broadcast(dsum))
            incoming = incoming + F.col("__dm") / F.lit(float(n))
        ranks = new_ranks.select(
            "node",
            (F.lit(teleport) + F.lit(damping) * incoming).alias("rank"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def bfs_levels(
    edges: DataFrame,
    sources: list,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 3,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from any source node,
    bounded at ``max_hops``. Returns (node, hops) for reached nodes only.

    Per iteration: frontier ⋈ edges (hash join on src) → candidate
    nodes → anti-join against the visited set → new frontier. State is
    node-shaped (visited + frontier); the edge table shuffles once per
    hop on the join key — pre-partition edges by src on a real cluster
    and every hop reuses the layout. Frontier-based, so each node enters
    the join exactly once over the whole run (not once per iteration) —
    the textbook level-synchronous BFS as DataFrame algebra.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    if not sources:
        raise ValueError("sources must be non-empty")
    spark = edges.sparkSession
    from hadoop_fcfs_spark.caching import waypoint

    # the deduped edge table is joined EVERY hop — without the waypoint
    # each hop re-runs the raw scan AND the distinct's shuffle (r14
    # class sweep; pagerank/markov precedent)
    e = waypoint(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    )
    visited = spark.createDataFrame(
        [(s, 0) for s in sources], ["node", "hops"]
    ).distinct()
    frontier = visited.select("node")
    for hop in range(1, max_hops + 1):
        nxt = (
            e.join(frontier, e.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        if not nxt.take(1):
            break
        visited = visited.unionByName(nxt.withColumn("hops", F.lit(hop)))
        frontier = nxt
        if checkpoint_every and hop % checkpoint_every == 0 and hop < max_hops:
            visited = visited.localCheckpoint(eager=True)
            frontier = frontier.localCheckpoint(eager=True)
    return visited


def sssp(
    edges: DataFrame,
    sources: list,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    max_iters: int = 3,
) -> DataFrame:
    """Single-source (multi-source) shortest paths over NON-NEGATIVE
    integer edge weights: bounded Bellman–Ford as DataFrame algebra —
    the weighted upgrade of ``bfs_levels`` (reference analog: the
    iterative MR shortest-path pattern, one relax job per round, from
    Lin & Dyer ch.5 — each round is a join+min-merge here, not a full
    MR job).

    Per iteration: dist ⋈ edges on the source key → candidate
    (dst, dist+w) rows → union with current dists → min-merge
    (groupBy.min — map-side combined). Early-exits when an iteration
    improves nothing, and since min-merge is monotone, running fewer or
    extra iterations past convergence never changes distances — a
    fixed-k unrolled oracle matches whenever k bounds the convergence
    round. State stays node-shaped; the edge table shuffles on the join
    key each round (pre-partition edges by ``src`` on a cluster and
    every round reuses the layout). Integer weights keep min-merge
    ties exact across engines. Returns (node, dist) for reached nodes.
    """
    if max_iters < 0:
        raise ValueError(f"max_iters must be >= 0, got {max_iters}")
    if not sources:
        raise ValueError("sources must be non-empty")
    spark = edges.sparkSession
    from hadoop_fcfs_spark.caching import waypoint

    # joined every relaxation round — cache the projection so rounds
    # re-read the materialized edges, not the raw upstream lineage
    e = waypoint(
        edges.select(
            F.col(src).alias("__es"), F.col(dst).alias("__ed"),
            F.col(weight).cast("long").alias("__ew"),
        )
    )
    dist = spark.createDataFrame([(s, 0) for s in sources], ["node", "dist"])
    dist = dist.groupBy("node").agg(F.min("dist").alias("dist"))
    for _ in range(max_iters):
        cand = e.join(dist, e.__es == dist.node).select(
            F.col("__ed").alias("node"),
            (F.col("dist") + F.col("__ew")).alias("dist"),
        )
        merged = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        improved = merged.join(
            dist.withColumnRenamed("dist", "__old"), "node", "left"
        ).filter(F.col("__old").isNull() | (F.col("dist") < F.col("__old")))
        dist = merged
        if not improved.take(1):
            break
    return dist


def markov_stationary(
    edges: DataFrame,
    iters: int = 10,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    scale: int = 10**12,
) -> DataFrame:
    """Stationary distribution of the Markov chain defined by integer
    transition counts — power iteration as relational algebra (the
    PageRank kernel without teleportation, for chains that are already
    ergodic; what "where does the user funnel settle" asks of an
    event-transition matrix).

    Determinism design: π lives in integer ``scale`` units and each
    matvec term is ``π_i · c_ij div r_i`` — EXACT integer arithmetic
    end to end, so the per-state sums are order-independent and any
    engine replays the identical trajectory (a float matvec sums
    partial products in engine-specific order and drifts at the ulp
    per iteration). The div floor leaks ≤1 unit per term per round —
    bounded by states²·iters, invisible at scale=1e12.

    Scale shape: state is one row per node; each iteration is a join
    on the transition table + a map-side-combined sum (the PageRank
    loop shape); localCheckpoint per round bounds lineage. Requires
    every reachable state to have outgoing transitions (r_i > 0).

    Overflow bound: the matvec term multiplies BEFORE dividing, so it
    needs ``max(c_ij) · scale < 2⁶³`` — at the default scale=1e12 that
    is max transition count < ~9.2e6 (ANSI Spark throws
    ARITHMETIC_OVERFLOW past it, it does not wrap). For heavier chains
    pass a smaller ``scale``; precision degrades only in the floor
    leak, which stays ≤ states²·iters units. Returns (node, pi) in
    scale units after ``iters`` rounds from the uniform start."""
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    e = edges.select(
        F.col(src).alias("__i"), F.col(dst).alias("__j"),
        F.col(weight).cast("long").alias("__c"),
    )
    from hadoop_fcfs_spark.caching import waypoint

    rowsum = e.groupBy("__i").agg(F.sum("__c").alias("__r"))
    et = waypoint(e.join(rowsum, "__i"))
    states = et.select(F.col("__i").alias("node")).union(
        et.select(F.col("__j").alias("node"))
    ).distinct()
    n = states.count()  # #states scalar — bounded by the state space
    pi = states.withColumn("pi", F.lit(scale // max(n, 1)).cast("long"))
    for _ in range(iters):
        pi = (
            et.join(pi, et.__i == pi.node)
            .select(
                F.col("__j").alias("node"),
                F.expr("pi * __c div __r").alias("__t"),
            )
            .groupBy("node")
            .agg(F.sum("__t").cast("long").alias("pi"))
            .localCheckpoint(eager=True)
        )
    return pi


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 20,
) -> DataFrame:
    """k-core decomposition by iterative peeling (Seidman's degeneracy
    peel — the community-density filter and the standard preprocessing
    step before expensive graph kernels): repeatedly delete every node
    whose UNDIRECTED degree is below k until none remains; survivors
    plus their within-core degrees are the k-core.

    Per round: one degree aggregation (map-side combined) over the live
    edge table, one weak-node filter, two anti-joins to drop edges
    touching weak nodes — edge-shaped state, no windows, localCheckpoint
    per round (bounded lineage). Peeling is MONOTONE (nodes only ever
    leave), so running extra rounds past the fixpoint changes nothing —
    a fixed-R unrolled oracle matches whenever R bounds convergence.
    NOTE: the OPERATOR's bound is ``max_rounds`` (default 20, early-exit
    on fixpoint); the `copurchase_kcore` GATE's oracle is unrolled at a
    fixed 8 rounds — that 8 is a property of the gate, not of this
    operator (convergence probed <=5 rounds at sf0.001/0.01/0.1; a data
    change needing >8 peels would fail the GATE while the engine stays
    right — an intentional tripwire).
    Returns (node, degree) for k-core members; empty if the core is
    empty."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    und = (
        edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .unionByName(
            edges.select(F.col(dst).alias("x"), F.col(src).alias("y"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        deg = und.groupBy("x").agg(F.count("*").alias("__deg"))
        weak = deg.filter(F.col("__deg") < k).select("x")
        if not weak.take(1):
            break
        und = (
            und.join(weak, "x", "left_anti")
            .join(weak.withColumnRenamed("x", "y"), "y", "left_anti")
            .select("x", "y")
            .localCheckpoint(eager=True)
        )
    return und.groupBy(F.col("x").alias("node")).agg(
        F.count("*").cast("long").alias("degree")
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst", orient: str = "degree"
) -> DataFrame:
    """Exact per-node triangle counts — the third classic iterative-era
    graph kernel next to PageRank and BFS (and a staple Hadoop-era
    MapReduce benchmark: Cohen, "Graph Twiddling in a MapReduce World",
    CiSE 2009 — the wedge-close algorithm below is that paper's
    two-round shape as two DataFrame joins).

    Edges are treated as undirected; self-loops and duplicates are
    dropped. Each triangle is materialized exactly once by giving every
    edge a single orientation along a total node order, then closing
    wedges: fwd(u,v) ⋈ fwd(v,w) gives each wedge once, and a semi-join
    against fwd(u,w) keeps the closed ones.

    ``orient="degree"``: orient along (degree, node) — the standard
    skew-killer. A hub of degree d oriented by node id could anchor
    O(d²) wedges; ordering by degree bounds every node's forward
    out-degree by O(sqrt(m)) (arboricity argument), so wedge counts —
    the only superlinear term — stay balanced no matter how skewed the
    degree distribution is. ``orient="id"`` keeps the naive order (same
    answer; useful for oracles).

    Returns (node, n_triangles) for nodes in >= 1 triangle.
    """
    if orient not in ("degree", "id"):
        raise ValueError(f"orient must be 'degree' or 'id', got {orient!r}")
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    if orient == "degree":
        deg = (
            und.select(F.col("a").alias("node"))
            .unionByName(und.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        da = deg.select(F.col("node").alias("a"), F.col("deg").alias("__da"))
        db = deg.select(F.col("node").alias("b"), F.col("deg").alias("__db"))
        lt = (F.col("__da") < F.col("__db")) | (
            (F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))
        )
        fwd = (
            und.join(da, "a")
            .join(db, "b")
            .select(
                F.when(lt, F.col("a")).otherwise(F.col("b")).alias("u"),
                F.when(lt, F.col("b")).otherwise(F.col("a")).alias("v"),
            )
        )
    else:
        fwd = und.select(F.col("a").alias("u"), F.col("b").alias("v"))
    # wedge u→v→w, closed by forward edge u→w (semi-join: existence only)
    e2 = fwd.select(F.col("u").alias("v"), F.col("v").alias("w"))
    wedges = fwd.join(e2, "v").select("u", "v", "w")
    closer = fwd.select(F.col("u").alias("__cu"), F.col("v").alias("__cw"))
    tri = wedges.join(
        closer,
        (F.col("u") == F.col("__cu")) & (F.col("w") == F.col("__cw")),
        "left_semi",
    )
    nodes = (
        tri.select(F.col("u").alias("node"))
        .unionByName(tri.select(F.col("v").alias("node")))
        .unionByName(tri.select(F.col("w").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count("*").alias("n_triangles"))


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Local clustering coefficient per node: lcc(v) = 2·T(v) /
    (deg(v)·(deg(v)−1)) on the undirected simple graph — the
    how-cliquish-is-this-neighborhood score that turns
    :func:`triangle_count`'s raw counts into a comparable 0..1
    quantity (a hub in 10 triangles may be far LESS clustered than a
    degree-3 node in 3): the standard small-world / community-
    tightness diagnostic, and the per-node table under the global
    average clustering coefficient.

    Exact: T(v) and deg(v) are exact BIGINTs (triangles via
    triangle_count's skew-safe degree orientation), lcc_e6 is ONE
    truncating integer division — no floats. Nodes with deg < 2 have
    no defined coefficient and are excluded; triangle-free nodes of
    deg ≥ 2 report 0 (they are the interesting low end — a LEFT join
    against the triangle table, not an inner).

    Scale shape: degree is one map-side-combined pass over the
    deduped edge set; everything superlinear lives inside
    triangle_count's bounded-wedge machinery. Output: (node, deg,
    n_triangles, lcc_e6)."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
        .filter(F.col("deg") >= 2)
    )
    tri = triangle_count(edges, src, dst)
    return (
        deg.join(tri, "node", "left")
        .selectExpr(
            "node", "deg",
            "COALESCE(n_triangles, 0) AS n_triangles",
            "(2 * COALESCE(n_triangles, 0) * 1000000)"
            " div (deg * (deg - 1)) AS lcc_e6",
        )
    )


def partition_modularity(
    edges: DataFrame,
    membership: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    comm_col: str = "community",
) -> DataFrame:
    """Newman modularity of a GIVEN partition over an undirected
    simple graph, per community — the quality score under every
    community detector (label_propagation finds communities; this
    says whether a partition actually concentrates edges inside its
    parts, chance-corrected by degree): Q = Σ_c [L_c/m −
    (D_c/2m)²]. Scoring an EXTERNAL partition (regions, org charts,
    shard maps) against the graph is the same computation — that is
    the assortativity-as-modularity audit.

    Exact: per community the 4m²-scaled contribution q4m2 = 4m·L_c −
    D_c² is a BIGINT (positive = denser than the degree-preserving
    null model), and q_contrib_micro = q4m2·1e6 div 4m² its
    truncating micro share — Q itself is Σ q4m2 / 4m², reportable
    without any float. Nodes missing from ``membership`` drop with
    their edges' intra-count (NULL communities never match); an
    edge between two communities counts in neither L_c but in both
    D_c — the standard accounting.

    Scale shape: one dedup pass over edges, two membership joins
    (community tables are node-grain — broadcastable next to any
    real edge set), map-side-combined community rollups. Output per
    community: (community, n_nodes, deg_tot, m_in, q4m2,
    q_contrib_micro)."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    memb = membership.select(
        F.col(node_col).alias("__node"), F.col(comm_col).alias("__comm")
    ).filter(F.col("__node").isNotNull() & F.col("__comm").isNotNull())
    ma = memb.select(
        F.col("__node").alias("a"), F.col("__comm").alias("__ca")
    )
    mb = memb.select(
        F.col("__node").alias("b"), F.col("__comm").alias("__cb")
    )
    tagged = und.join(F.broadcast(ma), "a").join(F.broadcast(mb), "b")
    m_df = und.agg(F.count("*").cast("long").alias("__m"))
    lin = (
        tagged.filter(F.col("__ca") == F.col("__cb"))
        .groupBy(F.col("__ca").alias("__comm"))
        .agg(F.count("*").cast("long").alias("m_in"))
    )
    deg = (
        und.select(F.col("a").alias("__node"))
        .unionByName(und.select(F.col("b").alias("__node")))
        .groupBy("__node")
        .agg(F.count("*").cast("long").alias("__deg"))
    )
    dtot = (
        deg.join(F.broadcast(memb), "__node")
        .groupBy("__comm")
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.sum("__deg").cast("long").alias("deg_tot"),
        )
    )
    return (
        dtot.join(lin, "__comm", "left")
        .crossJoin(F.broadcast(m_df))
        .selectExpr(
            "__comm AS community", "n_nodes", "deg_tot",
            "COALESCE(m_in, 0) AS m_in",
            "4 * __m * COALESCE(m_in, 0) - deg_tot * deg_tot AS q4m2",
            "CASE WHEN __m > 0 THEN"
            " (4 * __m * COALESCE(m_in, 0) - deg_tot * deg_tot) * 1000000"
            " div (4 * __m * __m) END AS q_contrib_micro",
        )
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iterations: int = 4,
) -> DataFrame:
    """Synchronous weighted label propagation (Raghavan et al. 2007)
    community detection: every node starts as its own community; each
    iteration it adopts the label with the highest incident edge-weight
    among its neighbors (tie → MIN label, so a fixed iteration count is
    fully deterministic — no RNG, no visit-order dependence).

    Scale shape: edges are symmetrized once (union + groupBy); each
    iteration is one edge⋈label join and THREE aggregations — vote
    sums, per-node max, then min-label-at-max — never a per-node
    window, so a hub's degree-sized vote list stays inside partial
    aggregation instead of one task. Label state is node-shaped;
    lineage truncated per iteration (localCheckpoint). Weights should
    be INTEGERS (quantize money to cents): the argmax is a discrete
    choice and float vote sums are accumulation-order-nondeterministic.

    Output: (node, community). Isolated nodes keep their own label."""
    e = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d"), F.col(weight).alias("w")
    ).filter(F.col("s") != F.col("d"))
    sym = (
        e.unionByName(e.select(F.col("d").alias("s"), F.col("s").alias("d"), "w"))
        .groupBy("s", "d")
        .agg(F.sum("w").alias("w"))
    )
    nodes = sym.select(F.col("s").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("community")).localCheckpoint()
    for _ in range(iterations):
        votes = (
            sym.join(labels, sym.d == labels.node)
            .groupBy(F.col("s").alias("n"), "community")
            .agg(F.sum("w").alias("__wv"))
        )
        best = votes.groupBy("n").agg(F.max("__wv").alias("__mw"))
        new = (
            votes.join(best, "n")
            .filter(F.col("__wv") == F.col("__mw"))
            .groupBy("n")
            .agg(F.min("community").alias("__new"))
        )
        labels = (
            nodes.join(new, nodes.node == F.col("n"), "left")
            .select(
                "node",
                F.coalesce(F.col("__new"), F.col("node")).alias("community"),
            )
            .localCheckpoint()
        )
    return labels


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 4,
) -> DataFrame:
    """HITS (Kleinberg): hub and authority scores by alternating power
    iteration — hubs point AT good authorities, authorities are pointed
    at BY good hubs. The directed-graph complement to PageRank (which
    mixes both roles into one score): on a trade graph, hub = big
    buyer-side nation, authority = big supplier-side nation.

    Determinism at any scale: scores live as BIGINT micro-units.
    auth_raw(v) = Σ hub_m(u)·w over in-edges is an EXACT integer sum
    (order-independent, unlike float accumulation); the per-step
    max-normalization floor-quantizes the double ratio raw/max back to
    micro-units (division + multiply + floor, each correctly rounded —
    identical cross-engine). Per iteration: two edge joins + two
    aggregations + two scalar maxes (broadcast scalar-join pattern, as
    pagerank's dangling mass); state stays node-shaped.

    Integer bound (ANSI throws rather than corrupting): per-node
    Σ_in w · 1e6 < 2^63 → weighted in/out-degree < ~9.2e12. Returns
    (node, hub_e6, auth_e6); nodes with no out-edges get hub 0, no
    in-edges auth 0."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    w = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    # zero/NULL-weight edges carry no mass AND would let max(raw) reach 0,
    # turning the normalization into an ANSI 0/0 — drop them up front
    # (an all-degenerate edge list then yields an empty result, not a
    # throw)
    ew = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
    ).filter(F.col("w") > 0)
    nodes = (
        ew.select(F.col("src").alias("node"))
        .unionByName(ew.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    hub = nodes.withColumn("hub_m", F.lit(1_000_000).cast("long"))

    def _norm(df: DataFrame, raw: str, out: str) -> DataFrame:
        mx = df.agg(F.max(raw).alias("__mx"))
        return df.crossJoin(F.broadcast(mx)).select(
            "node",
            F.floor(
                F.col(raw).cast("double") / F.col("__mx").cast("double")
                * 1_000_000.0
            ).cast("long").alias(out),
        )

    auth = None
    for i in range(iterations):
        araw = (
            ew.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("hub_m") * F.col("w")).alias("__raw"))
        )
        araw = nodes.join(araw, "node", "left").select(
            "node", F.coalesce("__raw", F.lit(0)).cast("long").alias("__raw")
        )
        auth = _norm(araw, "__raw", "auth_m")
        hraw = (
            ew.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum(F.col("auth_m") * F.col("w")).alias("__raw"))
        )
        hraw = nodes.join(hraw, "node", "left").select(
            "node", F.coalesce("__raw", F.lit(0)).cast("long").alias("__raw")
        )
        hub = _norm(hraw, "__raw", "hub_m")
        if (i + 1) % 2 == 0 and i + 1 < iterations:
            hub = hub.localCheckpoint(eager=True)
            auth = auth.localCheckpoint(eager=True)
    return hub.join(auth, "node").select(
        "node",
        F.col("hub_m").alias("hub_e6"),
        F.col("auth_m").alias("auth_e6"),
    )
