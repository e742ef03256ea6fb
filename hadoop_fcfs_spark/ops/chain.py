"""Pipeline composition helpers.

Parity targets (SURVEY.md §2.6):
- ``ChainMapper``/``ChainReducer`` (reference
  ``mr-core/mapreduce/lib/chain/ChainMapper.java:84``,
  ``ChainReducer.java:88``): run ``[MAP+ / REDUCE MAP*]`` inside one
  job with no intermediate I/O. In Spark, chained narrow
  transformations are pipelined by Catalyst into one stage
  automatically — `chain` is a readability helper, not machinery.
- ``JobControl``/``ControlledJob``
  (``mr-core/mapreduce/lib/jobcontrol/JobControl.java:57``): a DAG of
  dependent jobs. A Spark program IS a lazy DAG; multi-action
  orchestration is plain Python ordering — `run_stages` names the
  stages and runs their actions in dependency order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def chain(df: DataFrame, *stages: Callable[[DataFrame], DataFrame]) -> DataFrame:
    """Compose DataFrame→DataFrame transforms left to right. All narrow
    steps fuse into a single whole-stage-codegen span — the reference's
    'no intermediate HDFS write' property is the default here."""
    for stage in stages:
        df = stage(df)
    return df


def run_stages(stages: list[tuple[str, Callable[[], None]]]) -> list[str]:
    """JobControl parity: named actions executed in dependency order
    (the list IS the topological order). Returns completed stage names;
    raises on first failure, leaving the remainder un-run — matching
    JobControl's FAILED/DEPENDENT_FAILED state semantics."""
    done: list[str] = []
    for name, action in stages:
        action()
        done.append(name)
    return done
