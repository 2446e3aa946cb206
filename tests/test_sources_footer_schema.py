"""The footer-derived explicit read schema (sources.tables._footer_read_schema)
must be EXACTLY what Spark's own parquet inference produces — per table, per
SF — or load_table would silently change query result types. Also pins the
fallback behavior for layouts the fast path must not touch."""

import os

import pytest

from arcticdb_spark.sources import tables as tb

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                       "/root/testdata/sf0.1") if os.path.isdir(d)]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_footer_schema_matches_inference(spark, sf_dir):
    tb.ensure_session_conf(spark)
    checked = 0
    for name in tb.TABLES:
        path = f"{sf_dir}/{name}.parquet"
        if not os.path.isfile(path):
            continue
        fast = tb._footer_read_schema(path)
        assert fast is not None, f"{name}: fast path unexpectedly ineligible"
        inferred = spark.read.parquet(path).schema
        assert fast == inferred, (
            f"{name}@{sf_dir}: footer schema {fast.json()} != "
            f"inferred {inferred.json()}")
        checked += 1
    assert checked > 0


def test_footer_schema_directory_falls_back(tmp_path, spark):
    # directory layouts must return None (partition discovery stays Spark's)
    d = tmp_path / "t.parquet"
    d.mkdir()
    spark.range(10).coalesce(1).write.mode("overwrite").parquet(str(d))
    assert tb._footer_read_schema(str(d)) is None


def test_footer_schema_unknown_type_falls_back(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    p = str(tmp_path / "u64.parquet")
    pq.write_table(pa.table({"u": pa.array([1, 2], type=pa.uint64())}), p)
    assert tb._footer_read_schema(p) is None


def test_load_table_results_unchanged(spark):
    # end-to-end: the frame loaded via the fast path equals a plain
    # inference read, values included
    sf_dir = SF_DIRS[0]
    for name in ("events", "embeddings", "lineitem"):
        via_fast = tb.load_table(spark, sf_dir, name)
        plain = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        assert via_fast.schema == plain.schema or name == "events"
        a = via_fast.orderBy(via_fast.columns[0]).collect()
        b = plain
        if name == "events":
            from pyspark.sql import functions as F
            from pyspark.sql import types as T
            if isinstance(plain.schema["ts"].dataType, T.LongType):
                b = plain.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000")))
        b = b.orderBy(b.columns[0]).collect()
        assert a == b
