"""Stream-stream joins with event-time bounds — the attribution shape
(purchase ⋈ preceding clicks) as a reusable operator, including the
LEFT OUTER variant whose unmatched rows can only be emitted once the
watermark proves no match can still arrive.

State-size contract (the 100 TB concern for joins that never finish):
both sides are watermarked and the join condition carries an explicit
event-time band, so Spark can drop join state older than
watermark − band instead of buffering the streams forever. An outer
stream-stream join WITHOUT both of these is an unbounded-state bug,
not an operator.

Reference analog: none in MapReduce (batch reduce-side join re-run per
window was the era's workaround); this is net-new Structured Streaming
surface like the rest of §2.7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join two watermarked streams on ``key`` where the right event
    falls in [left_ts − lookback, left_ts]. Column names must be
    disjoint apart from ``key``, which must be named ``{key}`` on the
    left and ``r_{key}`` on the right (stream-stream joins need
    distinct column names; the caller controls projection).

    how='inner' emits matches as they arrive; how='left_outer' also
    emits left rows with NULL right columns once the watermark passes
    their match window — exactly-once late-attribution semantics."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported join type {how!r}")
    cond = F.expr(
        f"{key} = r_{key} AND {right_ts} >= {left_ts} - INTERVAL {lookback} "
        f"AND {right_ts} <= {left_ts}"
    )
    return left.withWatermark(left_ts, watermark).join(
        right.withWatermark(right_ts, watermark), cond, how
    )
