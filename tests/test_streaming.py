"""Streaming ingestion: readStream -> staging -> finalize (reference §2.9
semantics), plus watermark-windowed resample-on-stream."""

import pandas as pd
import pytest

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
