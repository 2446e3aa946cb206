"""Shared one-pass runtime for the bounded streaming gate queries.

A Structured Streaming query — even a one-batch ``availableNow`` over 10k
rows — pays ~0.8-1.5 s of fixed startup: stream thread, micro-batch
planning, offset/commit WAL, one state-store instance per shuffle
partition, and (for ``applyInPandasWithState``) a Python worker spin-up.
That cost is harness, not plan: the windowed-agg and sessionize plans
themselves are milliseconds at gate scale.

This module amortizes it without changing what is verified:

* both gate streams (windowed resample + stateful sessionize) run
  CONCURRENTLY in one pass, so the fixed startup is paid once in
  wall-clock, not per query;
* they run on a CLONED SparkSession (shared SparkContext, independent SQL
  conf) pinned to 1 shuffle partition — one state store instead of 32 —
  with a unique checkpoint dir on tmpfs when available;
* results are cached per (sf_dir): the per-query callables return the
  cached memory-sink frame, so a gate/bench run that invokes both queries
  pays the streaming machinery once, and a harness that calls
  :func:`prewarm` at startup overlaps it with its other work entirely.

The computed values are identical to running each stream alone (same
bounded input, same operators — pinned by the DuckDB value oracles of
``stream_resample`` / ``stream_sessionize`` and tests/test_streaming.py).
"""

from __future__ import annotations

import os
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOCK = threading.Lock()
_RESULTS: dict[str, dict] = {}       # sf_dir -> {"resample": df, "sessionize": df}
_EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                  "event_type string, value double, props string")


def _ckpt_dir() -> str:
    base = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    if base is None:
        import tempfile
        base = tempfile.gettempdir()
    return os.path.join(base, "asdb_stream_gate", uuid.uuid4().hex)


def _events_stream(session: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a bounded stream. Declaring ``ts timestamp``
    coerces TIMESTAMP(NANOS) to µs directly — the same truncation as the
    batch loader / DuckDB's CAST."""
    import os

    from arcticdb_spark.sources.tables import ensure_session_conf
    ensure_session_conf(session)
    path = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(path):
        # multi-file table (directory layout, e.g. the sf1 dataset): point
        # the stream at the directory itself — a pathGlobFilter of
        # "events.parquet" matches LEAF file names, so it would silently
        # select ZERO of the part-*.parquet files (found by the sf1
        # oracle sweep: stream queries returned empty)
        return (session.readStream
                .schema(_EVENTS_SCHEMA)
                .parquet(path))
    return (session.readStream
            .schema(_EVENTS_SCHEMA)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir))


def _drain(agg: DataFrame, mode: str, name: str) -> None:
    q = (agg.writeStream.outputMode(mode).format("memory")
         .queryName(name)
         .option("checkpointLocation", _ckpt_dir())
         .trigger(availableNow=True).start())
    try:
        q.awaitTermination()
    finally:
        q.stop()


def _compute(spark: SparkSession, sf_dir: str) -> dict:
    from arcticdb_spark.streaming.ingest import stream_resample
    from arcticdb_spark.streaming.stateful import stream_sessionize
    # cloned session: independent SQL conf — 1 shuffle partition means one
    # state store for these 10k-row bounded streams instead of 32, without
    # touching concurrently-running batch queries on the main session
    sess = spark.newSession()
    sess.conf.set("spark.sql.shuffle.partitions", "1")

    rs_name = "gate_rs_" + uuid.uuid4().hex[:12]
    ss_name = "gate_ss_" + uuid.uuid4().hex[:12]

    def run_resample():
        agg = stream_resample(_events_stream(sess, sf_dir), "ts", "1 hour",
                              {"n": ("value", "count"),
                               "s": ("value", "sum")})
        _drain(agg, "complete", rs_name)

    def run_sessionize():
        ev = _events_stream(sess, sf_dir).filter(F.col("user_id") < 40)
        sess_df = stream_sessionize(ev.select("user_id", "ts"),
                                    gap="30 minutes")
        _drain(sess_df, "append", ss_name)

    errs: list[BaseException] = []

    def guard(fn):
        def inner():
            try:
                fn()
            except BaseException as e:   # surfaced to the caller below
                errs.append(e)
        return inner

    threads = [threading.Thread(target=guard(fn), daemon=True)
               for fn in (run_resample, run_sessionize)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errs:
        raise errs[0]
    return {"resample": sess.table(rs_name),
            "sessionize": sess.table(ss_name)}


def reset() -> None:
    """Drop the memoized gate results so the next ``gate_results`` call
    recomputes from the parquet inputs. The bench calls this at the start
    of every timing pass and charges the recomputation to a dedicated
    timed line — no untimed computation may feed a bench line."""
    with _LOCK:
        _RESULTS.clear()


def gate_results(spark: SparkSession, sf_dir: str) -> dict:
    """Both streaming gate results for ``sf_dir``, computed once (both
    streams in one concurrent pass) and cached for the process lifetime."""
    with _LOCK:
        if sf_dir not in _RESULTS:
            _RESULTS[sf_dir] = _compute(spark, sf_dir)
        return _RESULTS[sf_dir]


def prewarm(spark: SparkSession, sf_dir: str) -> None:
    """Kick off the one-pass computation on a daemon thread so a harness
    can overlap the streaming fixed costs with its other startup/queries.
    Failures are swallowed here — the blocking path in gate_results will
    re-raise them on actual use."""
    def run():
        try:
            gate_results(spark, sf_dir)
        except Exception:
            with _LOCK:
                _RESULTS.pop(sf_dir, None)   # let the sync path retry/raise
    threading.Thread(target=run, daemon=True).start()
