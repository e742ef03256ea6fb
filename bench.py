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
# sort, shuffle-heavy text agg, sub-quadratic dedup, ANN, windows.
HEADLINE = [
    "pricing_summary",
    "join_multiway",
    "wordcount",
    "window_analytics",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "value_histogram",
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


def run(spark, name, fn) -> float:
    start = time.perf_counter()
    df = fn(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - start, 3)


def main() -> None:
    spark = get_spark("bench")
    # JVM/codegen warmup outside the timed region
    spark.range(1_000_000).select(F.sum("id")).collect()

    queries = {name: spec.spark_fn for name, spec in all_queries().items()}
    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = run(spark, name, queries[name])
    timings["total_order_sort"] = run(spark, "total_order_sort", total_order_sort_bench)
    timings["terasort_2m"] = run(spark, "terasort_2m", terasort_bench)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline query wall-clock at sf (noop sink, local)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
