"""Batch sessionization and a custom stateful streaming operator.

- ``sessionize``: the classic lag+cumsum gap split — pure window
  functions, SQL-oracle-able, one shuffle on the user key.
- ``running_counts_stateful``: applyInPandasWithState example — the
  escape hatch for stateful logic that session_window/window can't
  express (reference parity: there is none; Mapper/Reducer state was
  per-task only).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame, user_col: str, ts_col: str, gap_minutes: int = 30
) -> DataFrame:
    """Split each user's event stream into sessions separated by gaps
    > gap_minutes. Output: one row per session with start/end/count.

    session boundary: gap from previous event > threshold → cumsum of
    boundary flags numbers the sessions per user."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # microsecond-precision gap (casting timestamp→long would truncate
    # to seconds and disagree with the oracle at sub-second boundaries)
    us = F.unix_micros(F.col(ts_col))
    gap_us = us - F.lag(us).over(w)
    is_new = F.when(gap_us.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    with_sess = events.withColumn("__new", is_new).withColumn(
        "session_id", F.sum("__new").over(w)
    )
    return with_sess.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("sess_start"),
        F.max(ts_col).alias("sess_end"),
        F.count("*").alias("n_events"),
    )


def running_counts_stateful(stream_df: DataFrame, key_col: str) -> DataFrame:
    """Custom stateful streaming operator: running per-key event count
    maintained in explicit state (applyInPandasWithState). Emits one
    updated row per key per micro-batch."""
    from pyspark.sql.streaming.state import GroupState

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({key_col: [key[0]], "running_count": [n]})

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} string, running_count long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def user_stats_stateful(stream_df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Custom stateful operator on the MODERN transformWithState API
    (Spark 4.x StatefulProcessor): per-key running (count, sum, max)
    kept in a ValueState and re-emitted each micro-batch. The successor
    surface to applyInPandasWithState — typed named state, timers, TTL —
    shown here as the engine's template for arbitrary keyed streaming
    state (reference parity: none; MR state was per-task only).

    NOTE: the transformWithState state-server protocol requires
    google.protobuf at runtime (absent in this container — the pytest
    skips itself there); applyInPandasWithState
    (running_counts_stateful) is the dependency-free fallback."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "stats", "n long, total double, mx double"
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, total, mx = (
                self._state.get() if self._state.exists() else (0, 0.0, None)
            )
            for pdf in rows:
                vals = pdf[value_col].astype(float)
                n += len(pdf)
                total += float(vals.sum())
                m = float(vals.max()) if len(vals) else None
                mx = m if mx is None else (m if m is not None and m > mx else mx)
            self._state.update((n, total, mx))
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    return stream_df.groupBy(key_col).transformWithStateInPandas(
        UserStats(),
        outputStructType=f"{key_col} string, n_events long, total_value double, max_value double",
        outputMode="Update",
        timeMode="None",
    )
