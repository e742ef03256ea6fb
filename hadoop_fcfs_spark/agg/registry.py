"""Descriptor-driven aggregate framework.

Parity target: the ``mapreduce.lib.aggregate`` package (reference
``mr-core/mapreduce/lib/aggregate/ValueAggregatorJob.java:63``; type
registry ``ValueAggregatorBaseDescriptor.java:39-53``). The reference
drives a generic mapper/combiner/reducer from descriptor strings like
``"LongValueSum:<id>\\t<value>"``; here each descriptor type maps to a
Column expression and one ``groupBy().agg(*exprs)`` runs them all —
partial (map-side combine) and final aggregation are automatic in
HashAggregateExec.

Descriptor types (all from ``ValueAggregatorBaseDescriptor``):
  LongValueSum   (`LongValueSum.java:33`)   → sum(cast long)
  DoubleValueSum (`DoubleValueSum.java:34`) → sum(cast double)
  LongValueMax/Min (`LongValueMax.java:33` …) → max/min(cast long)
  StringValueMax/Min (`StringValueMax.java` …) → max/min(string)
  ValueHistogram (`ValueHistogram.java:38`)  → see histogram.py
  UniqValueCount (`UniqValueCount.java:35`)  → exact distinct, capped
                   variant, and approx_count_distinct for huge keys

User-defined aggregators (``UserDefinedValueAggregatorDescriptor.java:41``)
→ register a Callable returning a Column, or a pandas_udf GROUPED_AGG.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _long(c: Column) -> Column:
    return c.cast("long")


AGGREGATORS: dict[str, Callable[[Column], Column]] = {
    "LongValueSum": lambda c: F.sum(_long(c)),
    "DoubleValueSum": lambda c: F.sum(c.cast("double")),
    "LongValueMax": lambda c: F.max(_long(c)),
    "LongValueMin": lambda c: F.min(_long(c)),
    "StringValueMax": lambda c: F.max(c.cast("string")),
    "StringValueMin": lambda c: F.min(c.cast("string")),
    "UniqValueCount": lambda c: F.countDistinct(c),
}


def register_aggregator(name: str, fn: Callable[[Column], Column]) -> None:
    """UserDefinedValueAggregatorDescriptor parity: plug in a new
    aggregator by name."""
    AGGREGATORS[name] = fn


def uniq_value_count_capped(c: Column, max_items: int) -> Column:
    """UniqValueCount with the reference's ``maxNumItems`` cap
    (`UniqValueCount.java:35`): counts distinct values but saturates at
    the cap. collect_set is bounded by the cap only in the reference;
    here we cap after the exact set — for genuinely huge cardinality use
    `approx_uniq_value_count`."""
    return F.least(F.countDistinct(c), F.lit(max_items)).cast("long")


def approx_uniq_value_count(c: Column, rsd: float = 0.05) -> Column:
    """HyperLogLog++ distinct — the 100 TB-scale path where an exact
    distinct would shuffle every value."""
    return F.approx_count_distinct(c, rsd)


def aggregate(
    df: DataFrame,
    group_cols: list[str],
    descriptors: list[tuple[str, str, str]],
) -> DataFrame:
    """Run a descriptor list: each item = (aggregator_type, input_col,
    output_alias). One shuffle total, map-side partials included."""
    exprs = []
    for agg_type, col_name, alias in descriptors:
        try:
            fn = AGGREGATORS[agg_type]
        except KeyError:
            raise ValueError(f"unknown aggregator type: {agg_type!r}") from None
        exprs.append(fn(F.col(col_name)).alias(alias))
    return df.groupBy(*group_cols).agg(*exprs)
