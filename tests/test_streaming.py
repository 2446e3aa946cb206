"""Streaming ingestion: readStream -> staging -> finalize (reference §2.9
semantics), plus watermark-windowed resample-on-stream."""

import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow


from arcticdb_spark.streaming.ingest import stream_resample, stream_stage


def test_stream_stage_and_finalize(spark, tmp_lib, tmp_path):
    # source parquet dir acting as the tick stream
    src = str(tmp_path / "ticks_src")
    pdf = pd.DataFrame({"ts": pd.date_range("2024-01-01", periods=100, freq="1min"),
                        "price": [100.0 + i for i in range(100)]})
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)

    stream = (spark.readStream
              .schema("ts timestamp, price double")
              .parquet(src))
    stream_stage(tmp_lib, "ticks", stream)
    m = tmp_lib.finalize_staged_data("ticks", mode="write", sort=True)
    assert m.version == 0
    out = tmp_lib.read("ticks").toPandas().sort_values("ts")
    assert len(out) == 100
    assert out["price"].iloc[0] == 100.0


def test_stream_resample_windowed(spark, tmp_path):
    src = str(tmp_path / "ev_src")
    pdf = pd.DataFrame({"ts": pd.date_range("2024-01-01", periods=120, freq="1min"),
                        "value": [float(i) for i in range(120)]})
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("ts timestamp, value double").parquet(src)
    agg = stream_resample(stream, "ts", "1 hour", {"n": ("value", "count"),
                                                   "s": ("value", "sum")})
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("resampled").start())
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM resampled ORDER BY ts").toPandas()
    finally:
        q.stop()
    assert len(out) == 2
    assert out["n"].tolist() == [60, 60]
    assert out["s"].tolist() == [sum(range(60)), sum(range(60, 120))]


def test_stream_resample_late_data_dropped(spark, tmp_path):
    """Append-mode watermark semantics: a row arriving after the watermark
    has passed its window is dropped (late-data handling the reference
    addresses bitemporally via update(); the stream path drops per
    watermark contract)."""
    src = str(tmp_path / "late_src")
    import os
    os.makedirs(src, exist_ok=True)
    b1 = pd.DataFrame({"ts": pd.date_range("2024-01-01 00:00", periods=120, freq="1min"),
                       "value": [1.0] * 120})
    spark.createDataFrame(b1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("ts timestamp, value double").parquet(src)
    agg = stream_resample(stream, "ts", "1 hour", {"n": ("value", "count")},
                          watermark="10 minutes")
    q = (agg.writeStream.outputMode("append").format("memory")
         .queryName("late_resampled").start())
    try:
        q.processAllAvailable()
        # batch 2: one late row in the already-closed [00:00, 01:00) window
        # plus a fresh row far ahead that advances the watermark
        b2 = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 00:30",
                                                 "2024-01-01 05:00"]),
                           "value": [99.0, 1.0]})
        spark.createDataFrame(b2).write.mode("append").parquet(src)
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM late_resampled ORDER BY ts").toPandas()
    finally:
        q.stop()
    closed = out[out["ts"] == pd.Timestamp("2024-01-01 00:00")]
    # the late 00:30 row did NOT re-open or inflate the emitted window
    assert closed["n"].tolist() == [60]


def test_stream_dedup_across_batches(spark, tmp_path):
    """One row per normalized fingerprint survives (which copy inside a
    micro-batch is arbitrary); copies arriving in a LATER micro-batch are
    always dropped (state-store memory across batches)."""
    from arcticdb_spark.streaming.ingest import stream_dedup
    src = str(tmp_path / "docs_src")
    import os
    os.makedirs(src, exist_ok=True)
    b1 = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": ["alpha doc", "beta doc", "Alpha  DOC"]})
    spark.createDataFrame(b1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (stream_dedup(stream).writeStream.outputMode("append")
         .format("memory").queryName("dedup_stream").start())
    try:
        q.processAllAvailable()
        # batch 2: one cross-batch duplicate of doc 1, one new doc
        b2 = pd.DataFrame({"doc_id": [3, 4],
                           "text": ["beta doc", "gamma doc"]})
        spark.createDataFrame(b2).write.mode("append").parquet(src)
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM dedup_stream").toPandas()
    finally:
        q.stop()
    kept = sorted(out["doc_id"].tolist())
    # 2 normalizes to doc 0's fingerprint -> exactly one of {0, 2} survives;
    # 3 duplicates doc 1 CROSS-batch -> always dropped; 4 is new
    assert len(kept) == 3
    assert 1 in kept and 4 in kept and 3 not in kept
    assert (0 in kept) != (2 in kept)
    assert "__fp__" not in out.columns


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Watermarked variant: bounded state, duplicates inside the horizon
    dropped."""
    from arcticdb_spark.streaming.ingest import stream_dedup
    src = str(tmp_path / "docs_wm_src")
    import os
    os.makedirs(src, exist_ok=True)
    b1 = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:01",
                              "2024-01-01 00:02"]),
        "doc_id": [0, 1, 2],
        "text": ["alpha doc", "alpha doc", "beta doc"]})
    spark.createDataFrame(b1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        "ts timestamp, doc_id long, text string").parquet(src)
    q = (stream_dedup(stream, ts_col="ts", watermark="1 hour")
         .writeStream.outputMode("append")
         .format("memory").queryName("dedup_wm_stream").start())
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM dedup_wm_stream").toPandas()
    finally:
        q.stop()
    kept = sorted(out["doc_id"].tolist())
    # docs 0 and 1 share a fingerprint: exactly one survives (which copy
    # within a micro-batch is arbitrary, per dropDuplicates); 2 is unique
    assert len(kept) == 2 and 2 in kept
    assert (0 in kept) != (1 in kept)
