"""Custom stateful streaming operators via ``applyInPandasWithState``.

Beyond the reference (which has no stream operators — SURVEY §2.9): an
example of arbitrary per-key state on an unbounded stream, the Spark
building block for operators the built-in windowing can't express.

``stream_sessionize``: per-key session aggregation with an inactivity-gap
timeout. State = the open session (start, last_ts, count); a session is
emitted when the gap to the next event exceeds ``gap`` or the state times
out. Batch-mode ``applyInPandas`` variant included for symmetric testing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("user_id long, session_start timestamp, session_end timestamp, "
                 "n_events long")
STATE_SCHEMA = "start long, last long, n long"


def _sessionize_fn(gap_seconds: int, use_timeout: bool):
    gap_us = gap_seconds * 1_000_000

    def fn(key, batches: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if use_timeout and state.hasTimedOut:
            (start, last, n) = state.get
            state.remove()
            yield pd.DataFrame({"user_id": [user_id],
                                "session_start": [pd.Timestamp(start, unit="us")],
                                "session_end": [pd.Timestamp(last, unit="us")],
                                "n_events": [n]})
            return
        ts_us = []
        for pdf in batches:
            ts_us.extend((pdf["ts"].astype("int64") // 1000).tolist())
        if not ts_us:
            return
        ts_us.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts_us[0], ts_us[0], 0
        out = []
        for t in ts_us:
            if t - last > gap_us:
                out.append((user_id, start, last, n))
                start, n = t, 0
            last = t
            n += 1
        state.update((start, last, n))
        if use_timeout:
            state.setTimeoutDuration(gap_seconds * 1000)
        if out:
            yield pd.DataFrame({
                "user_id": [o[0] for o in out],
                "session_start": [pd.Timestamp(o[1], unit="us") for o in out],
                "session_end": [pd.Timestamp(o[2], unit="us") for o in out],
                "n_events": [o[3] for o in out]})

    return fn


def stream_sessionize(stream_df: DataFrame, gap: str = "30 minutes",
                      use_timeout: bool = False):
    """events(ts, user_id, ...) stream -> closed-session rows.

    ``use_timeout=True`` additionally closes idle sessions via
    ProcessingTimeTimeout — correct for production, but note the engine then
    schedules periodic empty batches to fire timeouts, so a synchronous
    ``processAllAvailable()`` drain never settles; the default (data-driven
    close: a session ends when a later event arrives past the gap) is
    deterministic for batch-drain tests."""
    gap_s = int(pd.Timedelta(gap).total_seconds())
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if use_timeout
               else GroupStateTimeout.NoTimeout)
    return (stream_df
            .groupBy("user_id")
            .applyInPandasWithState(_sessionize_fn(gap_s, use_timeout),
                                    OUTPUT_SCHEMA, STATE_SCHEMA, "append",
                                    timeout))
