#!/usr/bin/env python
"""Dump explain("formatted") for named registry queries to plans/rN/.

Usage:
    python scripts/dump_plan.py r17 before dsir_selection corpus_pipeline_v4 ...

Writes plans/<round>/<query>_<tag>.txt per query (the judge checks plan
claims against these files). Uses the same session defaults as bench.py
(local[$SPARK_GRAFT_CPUS], sf dir from $SPARK_GRAFT_SF_DIR).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_fcfs_spark.caching import release_waypoints  # noqa: E402
from hadoop_fcfs_spark.registry import all_queries  # noqa: E402
from hadoop_fcfs_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    rnd, tag, *names = sys.argv[1:]
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plan")
    qs = dict(all_queries())
    for name in names:
        df = qs[name].spark_fn(spark, SF_DIR)
        text = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({text.count('Exchange (')} Exchange, {text.count('Scan parquet')} parquet scans)")
        release_waypoints()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
