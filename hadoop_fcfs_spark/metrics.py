"""Job counters.

Parity target: MapReduce Counters (reference
``mr-core/mapreduce/Counter.java:38``; counters updated from task
contexts and aggregated by the AM). Spark-native replacements:

- ``observe()`` — exactly-once aggregate metrics attached to a
  DataFrame, collected when the action completes. Preferred: unlike MR
  counters, retried tasks can't double-count (SURVEY §7.3 documents
  this as an intentional improvement).
- accumulators — for imperative code inside Python UDFs (at-least-once
  on retry, like MR counters actually behaved).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Observation


def counted(df: DataFrame, name: str, **counters: Column) -> tuple[DataFrame, Observation]:
    """Attach named counters to a DataFrame; read them after an action.

    >>> df, obs = counted(df, "job", n_rows=F.count(F.lit(1)),
    ...                   bad=F.sum(F.when(F.col("x").isNull(), 1).otherwise(0)))
    >>> df.write...   # any action
    >>> obs.get["n_rows"]
    """
    obs = Observation(name)
    exprs = [expr.alias(alias) for alias, expr in counters.items()]
    return df.observe(obs, *exprs), obs


def records_counter(df: DataFrame, name: str = "records") -> tuple[DataFrame, Observation]:
    """The ubiquitous MAP_INPUT_RECORDS-style counter."""
    return counted(df, name, count=F.count(F.lit(1)))
