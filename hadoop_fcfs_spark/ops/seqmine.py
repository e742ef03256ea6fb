"""Sequential pattern mining over event streams: the "what do users do
next" workload — top navigation paths, funnel discovery input, Markov
chain estimation at n > 2 (ops/ queries event_transitions is the n=2
case).

Scale shape: sessions are numbered with the lag+cumsum gap split
(user-bounded windows, one shuffle on the user key), n-grams come from
LEAD within (user, session) — the same partition, NO second shuffle
(Catalyst reuses the user-key exchange for both window layers), and
the path counts partial-aggregate map-side. Top-k is TakeOrdered —
never a full sort of the path space.

Reference analog: secondary sort (user, ts) + per-reducer sliding
window over the value stream — the canonical MapReduce sequence
pattern (mr-core/.../mapreduce/lib/partition/
KeyFieldBasedPartitioner.java grouping idiom).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def session_ngram_paths(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    step_col: str,
    order_tiebreak: str | Column,
    n: int = 3,
    gap_minutes: int = 30,
) -> DataFrame:
    """Count length-``n`` step sequences that occur CONSECUTIVELY inside
    a session (sessions split on gaps > gap_minutes, ordered by
    (ts, tiebreak) so ties can't flip paths between runs or engines).
    Output: step_1..step_n + path_count.
    """
    w_user = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    us = F.unix_micros(F.col(ts_col))
    gap_us = us - F.lag(us).over(w_user)
    is_new = F.when(
        gap_us.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), 1
    ).otherwise(0)
    sess = events.withColumn("__sid", F.sum(is_new).over(w_user))
    w_sess = Window.partitionBy(user_col, "__sid").orderBy(ts_col, order_tiebreak)
    steps = sess.select(
        F.col(step_col).alias("step_1"),
        *[
            F.lead(step_col, i).over(w_sess).alias(f"step_{i + 1}")
            for i in range(1, n)
        ],
    ).filter(F.col(f"step_{n}").isNotNull())
    return steps.groupBy(*[f"step_{i + 1}" for i in range(n)]).agg(
        F.count("*").alias("path_count")
    )
