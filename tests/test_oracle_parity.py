"""Replicates the driver's correctness gate locally: run every registered
query on Spark at sf0.01 and compare row-count + values against its DuckDB
oracle (order-insensitive, column-name-sorted), mirroring the driver's
CORRECTNESS check."""

from __future__ import annotations

import math

import pytest

from hadoop_fcfs_spark.registry import all_queries
from tests.conftest import SF_ORACLE

QUERIES = all_queries()


def _normalize(rows, columns):
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def canon(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            # cheap canonical form tolerant of float formatting differences
            return f"{v:.6g}"
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    spec = QUERIES[name]
    sdf = spec.spark_fn(spark, SF_ORACLE)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    if spec.oracle is None:
        assert len(spark_rows) >= 0  # rows-only smoke, mirrors driver's weak check
        return

    rel = duck.execute(spec.oracle)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(duck_rows, duck_cols)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")
