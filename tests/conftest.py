from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Must be set BEFORE importing hadoop_fcfs_spark.session: its module-level
# DEFAULT_CPUS binds the env var at import time (ADVICE r01 — a setdefault
# inside the fixture ran too late and tests silently used 32 partitions).
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from hadoop_fcfs_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    # Fewer threads/partitions for test latency; prod default is env-driven.
    s = get_spark("hadoop_fcfs_spark-tests", master="local[8]")
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        path = os.path.join(SF_ORACLE, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
