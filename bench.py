#!/usr/bin/env python
"""BENCH harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q": sec, ...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full compute, no
driver collect). Baseline context: BASELINE.md — the reference's
per-node sort throughput is ≈12 MB/s (2009 hardware); these numbers
are recorded per-round as BENCH_r{N}.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from hadoop_fcfs_spark.registry import all_queries  # noqa: E402
from hadoop_fcfs_spark.session import get_spark  # noqa: E402
from hadoop_fcfs_spark.tables import t  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family — scan+agg, big join, global
# sort, shuffle-heavy text agg, sub-quadratic dedup, ANN, windows, plus
# the composed training-data pipeline and the packing prefix-sum (r2),
# the exact-substring span tier (r3), BM25 retrieval scoring (r4), the
# prefix-filter exact set-similarity join (r4 cont.), and the r4-final
# DSIR selection + sparse TF-IDF cosine join (hashed-feature scoring
# and the inverted-index similarity join are distinct shuffle shapes
# from everything above), and the composed LLM-pipeline flagship
# corpus_pipeline_v4 (dedup -> DSIR top-k -> source accounting, r5).
HEADLINE = [
    "pricing_summary",
    "join_multiway",
    "wordcount",
    "window_analytics",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "value_histogram",
    "corpus_pipeline",
    "sequence_packing",
    "duplicate_spans",
    "bm25_retrieval",
    "jaccard_prefix_dedup",
    "dsir_selection",
    "tfidf_cosine_topk",
    # r9: corpus_pipeline_v4/v5 RETIRED from the headline set (gates
    # remain registered and driver-sampled) — v6/v7 compose the same
    # stage fragments (_v5_stages), so five pipeline generations was
    # ~3.6 s/run of redundant signal; BASELINE.md records the trim.
    # r5 continuation: temporal-split train/predict/score loop — the
    # model-eval shuffle shape (shared user-key window feeding both
    # halves + broadcast model) none of the entries above exercises
    "markov_next_event_eval",
    # r6: the pipeline flagship grown an export last mile — v5's chain
    # (quality -> survivorship dedup -> temperature mix) + md5-shuffled
    # shard assignment and per-shard manifest; replaces nothing, v5
    # stays for the stage-level comparison (v6 ≈ v5 + one rollup)
    "corpus_pipeline_v6",
    # r6: the rank-grain eval shape (grain collapse -> ONE
    # global_running_sum range pass -> scalar reduce) — the shuffle
    # pattern under the whole two-sample/AUC stats tier, previously
    # unrepresented in the perf record
    "roc_auc_orderstatus",
    # r7: the iterative node-state join shape (per-round join + agg +
    # localCheckpoint cadence) — the one flagship shuffle pattern with
    # no perf record until now, and the shape most sensitive to
    # lineage/caching regressions. bradley_terry collapses the
    # comparison log ONCE then iterates on supplier-grain state.
    "bradley_terry_suppliers",
    # r7: the driver-state iterative shape (broadcast centroid row +
    # one data pass per round + k*dim driver ints) —
    # complements bradley_terry's node-state-JOIN iteration; this is
    # the broadcast-by-literal iteration every index build (IVF,
    # semdedup quantizers) rides, previously unrepresented.
    "kmeans_embedding_cells",
    # r7 cont.: the global-running-MAX two-level shape (range partition
    # -> local prefix max -> per-partition summary offsets broadcast) on
    # the raw events arrival order, feeding a grouped rollup — the
    # sequential-semantics replay pattern (watermark/high-water-mark
    # scans) whose shuffle profile (ONE range exchange over data rows)
    # no other entry exercises.
    "watermark_late_audit",
    # r8: the longest composed publish chain (v6's quality -> dedup ->
    # temperature mix -> shard manifest, plus a per-shard KS
    # distribution-QA stage before publish) — the deepest shared-CTE
    # reuse in the repo and the shape most exposed to replay drift;
    # promoted per VERDICT r7 #7 (precedent: v6 in r6).
    "corpus_pipeline_v7",
]


def total_order_sort_bench(spark, sf_dir):
    """TeraSort-shaped: global total-order sort of lineitem by a
    compound key (RangePartitioner sample+route, SURVEY §2.5)."""
    li = t(spark, sf_dir, "lineitem")
    return li.orderBy("l_shipdate", "l_orderkey", "l_linenumber")


def terasort_bench(spark, sf_dir):
    """The reference's own benchmark (Gray sort, BASELINE.md): generate
    2M 100-byte-ish records, total-order sort on the 10-byte binary key."""
    from hadoop_fcfs_spark.bench.tera import teragen, terasort

    return terasort(teragen(spark, 2_000_000))


def run(spark, name, fn, repeats: int = 2) -> float:
    """Steady-state wall clock: min of `repeats` runs (single-run numbers
    swing 2-6× on GC/JIT noise at this small scale; min-of-N is the
    stable estimator of the plan's actual cost). When the samples
    disagree by >10% a third tie-break run is taken (VERDICT r7 #3:
    back-to-back full-bench runs on a quiet box differed by 16% with
    zero code changes — one extra sample on the noisy entries halves the
    adjudication burden at ~zero cost on the quiet ones).

    The cache is cleared before EACH repeat: operators that persist
    internal waypoints (minhash signature index, corpus_pipeline) would
    otherwise serve repeat 2 from the round-1 cache and the min would
    measure a warm rerun, not the query. Within-run reuse (one
    materialization feeding several consumers) is the legitimate thing
    being measured; cross-run cache hits are not."""
    from hadoop_fcfs_spark.caching import release_waypoints

    def one_sample() -> float:
        release_waypoints()  # drop tracked operator waypoints explicitly
        spark.catalog.clearCache()
        start = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - start

    samples = [one_sample() for _ in range(repeats)]
    if max(samples) > 1.10 * min(samples):
        samples.append(one_sample())
    return round(min(samples), 3)


WARMUP_SF = "/root/testdata/sf0.001"


def main() -> None:
    # Load sentinel (VERDICT r5 #3): two consecutive rounds of +13-14%
    # driver-bench drift were manually triaged as machine load — record
    # 1/5/15-min loadavg before and after so the artifact itself carries
    # the evidence next time.
    load_before = [round(x, 2) for x in os.getloadavg()]
    spark = get_spark("bench")
    queries = {name: spec.spark_fn for name, spec in all_queries().items()}

    # JVM/codegen warmup outside the timed region: run the same plans
    # once at sf0.001 (300× smaller inputs — JITs the scan/agg/join/window
    # codegen paths without touching the benchmark data), MRBench-style
    # steady-state measurement (reference MRBench.java:41 averages loops).
    spark.range(1_000_000).select(F.sum("id")).collect()
    for name in HEADLINE:
        queries[name](spark, WARMUP_SF).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = run(spark, name, queries[name])
    timings["total_order_sort"] = run(spark, "total_order_sort", total_order_sort_bench)
    timings["terasort_2m"] = run(spark, "terasort_2m", terasort_bench)

    # TestDFSIO parity (jobclient/src/test/.../fs/TestDFSIO.java:87):
    # bulk write + read-back wall clock. ~45 MB of lineitem columns
    # round-tripped through parquet in a temp dir (distributed write,
    # distributed read, noop sink) — the storage-path throughput probe.
    import shutil
    import tempfile

    io_dir = tempfile.mkdtemp(prefix="dfsio_")
    try:
        li = t(spark, SF_DIR, "lineitem")
        s = time.perf_counter()
        li.write.mode("overwrite").parquet(f"{io_dir}/out")
        w = time.perf_counter() - s
        s = time.perf_counter()
        spark.read.parquet(f"{io_dir}/out").write.format("noop").mode("overwrite").save()
        r = time.perf_counter() - s
        timings["dfsio_write"] = round(w, 3)
        timings["dfsio_read"] = round(r, 3)
    finally:
        shutil.rmtree(io_dir, ignore_errors=True)

    # MRBench parity: small-job latency (tiny end-to-end jobs, mean of 5)
    lat = []
    for _ in range(5):
        s = time.perf_counter()
        spark.range(1000).groupBy((F.col("id") % 10).alias("k")).count().write.format(
            "noop"
        ).mode("overwrite").save()
        lat.append(time.perf_counter() - s)
    timings["mrbench_small_job_mean"] = round(sum(lat) / len(lat), 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline query wall-clock at sf (noop sink, local)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "loadavg_before": load_before,
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
