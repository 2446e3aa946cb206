"""Nanosecond-exact index round-trips (SURVEY §7(d)).

The reference's index is int64 ns since epoch (reference
cpp/arcticdb/entity/types.hpp:73 NANOSECONDS_UTC64); these cases pin that a
sub-µs DatetimeIndex survives write -> read -> slice -> append -> update
exactly. Ports the intent of the reference's ns-precision coverage
(python/tests/unit/arcticdb/version_store/test_arrow.py ns cases and the
date_range boundary tests) against the LONG-ns physical representation.
"""

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.catalog import SortingException

BASE = 1_700_000_000_000_000_000  # ns epoch, mid-µs values below


def _ns_frame(n=10, start=BASE, step=1):
    idx = pd.DatetimeIndex(np.arange(start, start + n * step, step,
                                     dtype=np.int64).view("M8[ns]"))
    return pd.DataFrame({"v": np.arange(float(n))}, index=idx)


def test_ns_roundtrip_exact(tmp_lib):
    # 1ns-apart rows inside one µs: a µs-physical store would collapse them
    pdf = _ns_frame(10, step=1)
    tmp_lib.write("t", pdf)
    back = tmp_lib.read("t", output_format="pandas")
    assert back.index.equals(pdf.index)
    assert back.index.asi8.tolist() == pdf.index.asi8.tolist()
    pd.testing.assert_frame_equal(back, pdf)


def test_ns_spark_view_is_us_truncated(tmp_lib):
    tmp_lib.write("t", _ns_frame(4, start=BASE + 999, step=1))
    sdf = tmp_lib.read("t")
    assert dict(sdf.dtypes)["ts"] == "timestamp"
    vals = sorted(r[0] for r in sdf.select("ts").collect())
    # floor to µs: 999..1002ns -> all in the same or next µs
    assert [pd.Timestamp(v).value for v in vals] == [
        (BASE + 999 + i) // 1000 * 1000 for i in range(4)]


def test_ns_spark_ns_output(tmp_lib):
    tmp_lib.write("t", _ns_frame(5))
    sns = tmp_lib.read("t", output_format="spark-ns")
    assert dict(sns.dtypes)["ts"] == "bigint"
    vals = sorted(r[0] for r in sns.select("ts").collect())
    assert vals == [BASE + i for i in range(5)]


def test_ns_date_range_sub_us_boundaries(tmp_lib):
    tmp_lib.write("t", _ns_frame(10, step=1))
    got = tmp_lib.read(
        "t", date_range=(pd.Timestamp(BASE + 3), pd.Timestamp(BASE + 7)),
        output_format="pandas")
    assert got.index.asi8.tolist() == [BASE + i for i in range(3, 8)]
    # open ends
    lo_only = tmp_lib.read("t", date_range=(pd.Timestamp(BASE + 8), None),
                           output_format="pandas")
    assert lo_only.index.asi8.tolist() == [BASE + 8, BASE + 9]


def test_ns_date_range_clause_sub_us(tmp_lib):
    from arcticdb_spark.query import QueryBuilder
    tmp_lib.write("t", _ns_frame(10, step=1))
    q = QueryBuilder()
    q = q.date_range((pd.Timestamp(BASE + 2), pd.Timestamp(BASE + 4)))
    out = tmp_lib.read("t", query_builder=q, output_format="pandas")
    assert out.index.asi8.tolist() == [BASE + 2, BASE + 3, BASE + 4]


def test_ns_append_strictly_after_1ns(tmp_lib):
    tmp_lib.write("t", _ns_frame(5))
    tmp_lib.append("t", _ns_frame(2, start=BASE + 5))
    back = tmp_lib.read("t", output_format="pandas")
    assert back.index.asi8.tolist() == [BASE + i for i in range(7)]
    # 1ns-before-max overlap rejected (µs physical could not even see this;
    # the equal-boundary append stays accepted per the reference semantics)
    with pytest.raises(SortingException):
        tmp_lib.append("t", _ns_frame(1, start=BASE + 5))


def test_ns_update_range_surgery_sub_us(tmp_lib):
    tmp_lib.write("t", _ns_frame(10))
    up = pd.DataFrame({"v": [100.0, 101.0]},
                      index=pd.DatetimeIndex(
                          np.array([BASE + 4, BASE + 5],
                                   dtype=np.int64).view("M8[ns]")))
    tmp_lib.update("t", up)
    back = tmp_lib.read("t", output_format="pandas")
    assert back.index.asi8.tolist() == [BASE + i for i in range(10)]
    assert back["v"].tolist() == [0.0, 1.0, 2.0, 3.0, 100.0, 101.0,
                                  6.0, 7.0, 8.0, 9.0]


def test_ns_delete_data_in_range_sub_us(tmp_lib):
    tmp_lib.write("t", _ns_frame(10))
    tmp_lib.delete_data_in_range(
        "t", (pd.Timestamp(BASE + 2), pd.Timestamp(BASE + 3)))
    back = tmp_lib.read("t", output_format="pandas")
    assert back.index.asi8.tolist() == [BASE, BASE + 1] + [
        BASE + i for i in range(4, 10)]


def test_ns_arrow_output(tmp_lib):
    import pyarrow as pa
    tmp_lib.write("t", _ns_frame(4))
    # an UNNAMED index surfaces as __index__ in arrow output (reference
    # test_arrow_normalization.py contract)
    tbl = tmp_lib.read("t", output_format="arrow").sort_by("__index__")
    assert tbl.schema.field("__index__").type == pa.timestamp("ns")
    assert tbl.column("__index__").cast("int64").to_pylist() == [
        BASE + i for i in range(4)]


def test_ns_nat_roundtrip(tmp_lib):
    idx = pd.DatetimeIndex([pd.Timestamp(BASE), pd.NaT,
                            pd.Timestamp(BASE + 1)])
    pdf = pd.DataFrame({"v": [1.0, 2.0, 3.0]}, index=idx)
    # a NaT makes the index non-monotonic -> native-API validate off
    tmp_lib.write("t", pdf, validate_index=False)
    back = tmp_lib.read("t", output_format="pandas")
    assert back.index.isna().sum() == 1
    assert sorted(back.index.dropna().asi8.tolist()) == [BASE, BASE + 1]


def test_ns_tz_aware_index_exact(tmp_lib):
    # tz-aware ns index: UTC ns physical + zone restore, still ns-exact
    idx = pd.DatetimeIndex(
        np.arange(BASE, BASE + 3, dtype=np.int64).view("M8[ns]"),
        tz="UTC").tz_convert("America/New_York")
    pdf = pd.DataFrame({"v": [1.0, 2.0, 3.0]}, index=idx)
    tmp_lib.write("t", pdf)
    back = tmp_lib.read("t", output_format="pandas")
    assert str(back.index.tz) == "America/New_York"
    assert back.index.asi8.tolist() == [BASE, BASE + 1, BASE + 2]


def test_ns_multiindex_level0(tmp_lib):
    lvl0 = pd.DatetimeIndex(
        np.arange(BASE, BASE + 4, dtype=np.int64).view("M8[ns]"))
    mi = pd.MultiIndex.from_arrays([lvl0, ["a", "b", "a", "b"]],
                                   names=["ts", "k"])
    pdf = pd.DataFrame({"v": [1.0, 2.0, 3.0, 4.0]}, index=mi)
    tmp_lib.write("t", pdf)
    back = tmp_lib.read("t", output_format="pandas")
    assert back.index.get_level_values(0).asi8.tolist() == [
        BASE + i for i in range(4)]
    assert list(back.index.get_level_values(1)) == ["a", "b", "a", "b"]


def test_ns_spark_frame_write_long_index(tmp_lib, spark):
    # a LONG column explicitly designated as the index is ns since epoch
    # (the reference's index type) — distributed ns ingestion path
    sdf = spark.createDataFrame(
        [(BASE + i, float(i)) for i in range(6)], "ts long, v double")
    tmp_lib.write("t", sdf, index_column="ts")
    got = tmp_lib.read(
        "t", date_range=(pd.Timestamp(BASE + 1), pd.Timestamp(BASE + 3)),
        output_format="spark-ns")
    assert sorted(r["ts"] for r in got.collect()) == [BASE + 1, BASE + 2,
                                                      BASE + 3]


def test_ns_spark_frame_write_timestamp_index(tmp_lib, spark):
    # µs Spark timestamps convert exactly (×1000) and read back identically
    sdf = spark.sql(
        "SELECT timestamp_micros(1700000000000000 + id) AS ts, "
        "CAST(id AS DOUBLE) AS v FROM range(5)")
    tmp_lib.write("t", sdf)
    back = tmp_lib.read("t")
    vals = sorted(r["ts"] for r in back.collect())
    assert [pd.Timestamp(v).value for v in vals] == [
        1_700_000_000_000_000_000 + i * 1000 for i in range(5)]


def test_ns_staged_finalize_exact(tmp_lib):
    tmp_lib.write("t", _ns_frame(3), staged=True)
    tmp_lib.stage("t", _ns_frame(3, start=BASE + 3))
    tmp_lib.sort_and_finalize_staged_data("t")
    # round 7: stage sidecars carry the DatetimeIndex restore info, so the
    # finalized symbol's pandas output re-promotes the ns-exact INDEX like
    # a direct write would (previously ts stayed a raw column)
    back = tmp_lib.read("t", output_format="pandas")
    assert back.index.asi8.tolist() == [BASE + i for i in range(6)]
    ns = tmp_lib.read("t", output_format="spark-ns")
    assert sorted(r["ts"] for r in ns.collect()) == [BASE + i
                                                     for i in range(6)]


def test_ns_sort_index_preserves_ns(tmp_lib):
    # out-of-order ns data -> UNSORTED -> sort_index repairs at ns fidelity
    idx = pd.DatetimeIndex(np.array(
        [BASE + 2, BASE, BASE + 1], dtype=np.int64).view("M8[ns]"))
    tmp_lib.write("t", pd.DataFrame({"v": [2.0, 0.0, 1.0]}, index=idx),
                  validate_index=False)
    tmp_lib.sort_index("t")
    back = tmp_lib.read("t", output_format="pandas")
    assert back.index.asi8.tolist() == [BASE, BASE + 1, BASE + 2]
    assert back["v"].tolist() == [0.0, 1.0, 2.0]


def test_ns_resample_uses_exact_ns(tmp_lib):
    # rows 999,999,999ns and 1,000,000,001ns straddle the 1s bucket edge
    # by 1ns each side
    idx = pd.DatetimeIndex(np.array(
        [999_999_999, 1_000_000_001], dtype=np.int64).view("M8[ns]"))
    tmp_lib.write("t", pd.DataFrame({"v": [1.0, 2.0]}, index=idx))
    from arcticdb_spark.query import QueryBuilder
    q = QueryBuilder().resample("1s").agg({"v": "sum"})
    out = tmp_lib.read("t", query_builder=q, output_format="pandas")
    assert out["v"].tolist() == [1.0, 2.0]  # two buckets, one row each


def test_ns_columns_selection_keeps_ns(tmp_lib):
    pdf = _ns_frame(5)
    pdf["w"] = pdf["v"] * 2
    tmp_lib.write("t", pdf)
    back = tmp_lib.read("t", columns=["w"], output_format="pandas")
    assert back.index.asi8.tolist() == [BASE + i for i in range(5)]
    assert list(back.columns) == ["w"]


def test_ns_footer_stats_are_exact_ns(tmp_lib):
    tmp_lib.write("t", _ns_frame(5))
    m = tmp_lib._load_manifest("t", 0)
    assert m.ts_min == BASE and m.ts_max == BASE + 4


def test_ns_merge_experimental_on_ns_key(tmp_lib):
    tmp_lib.write("t", _ns_frame(4))
    src = pd.DataFrame({"v": [40.0]},
                       index=pd.DatetimeIndex(
                           np.array([BASE + 2],
                                    dtype=np.int64).view("M8[ns]")))
    tmp_lib.merge_experimental("t", src)
    back = tmp_lib.read("t", output_format="pandas")
    assert back.loc[pd.Timestamp(BASE + 2), "v"] == 40.0
    assert len(back) == 4


def test_ns_description_reports_logical_type(tmp_lib):
    tmp_lib.write("t", _ns_frame(3))
    d = tmp_lib.get_description("t")
    idx_field = [f for f in d["schema"]["fields"] if f["name"] == "ts"][0]
    assert idx_field["type"] == "timestamp_ns"
    info = tmp_lib.get_info("t")
    assert "timestamp_ns" in info["dtype"]
    # exact ns range straight from footer stats
    assert d["ts_min"] == BASE and d["ts_max"] == BASE + 2


def test_arrow_ns_index_write_exact(tmp_lib):
    # Arrow input with a timestamp[ns] index column: stored as exact LONG
    # ns (reference arrow writes keep ns)
    import pyarrow as pa
    tbl = pa.table({
        "ts": pa.array([BASE + i for i in range(5)], pa.int64())
                 .cast(pa.timestamp("ns")),
        "v": pa.array([float(i) for i in range(5)], pa.float64())})
    tmp_lib.write("t", tbl)
    got = tmp_lib.read("t", output_format="spark-ns")
    assert sorted(r["ts"] for r in got.collect()) == [BASE + i
                                                      for i in range(5)]
    back = tmp_lib.read("t", output_format="arrow").sort_by("ts")
    import pyarrow as pa2
    assert back.schema.field("ts").type == pa2.timestamp("ns")


def test_arrow_nat_sentinel_becomes_null(tmp_lib):
    # reference test_arrow_read.py NaT-sentinel case: int64-min inside a
    # ns timestamp column is NaT -> null, alongside genuine Arrow nulls
    import pyarrow as pa
    sent = -9223372036854775808
    ts = pa.array([pd.Timestamp("2025-01-01").value, sent, None, sent,
                   pd.Timestamp("2025-01-02").value, None],
                  type=pa.int64()).cast(pa.timestamp("ns"))
    tbl = pa.table({"x": ts, "y": pa.array([1, 2, 3, 4, 5, 6])})
    tmp_lib.write("arrow", tbl)
    result = tmp_lib.read("arrow", output_format="arrow").sort_by("y")
    assert result.column("x").is_null().to_pylist() == [
        False, True, True, True, False, True]


def test_pandas_index_column_ignored(tmp_lib):
    # reference test_arrow_pandas_interop.py
    # test_write_pandas_df_with_specified_index_column: "index_column value
    # should be ignored when writing as pandas" — the frame's own index wins
    pdf = pd.DataFrame({"col": [0, 1]})
    tmp_lib.write("sym", pdf, index_column="col")
    m = tmp_lib._load_manifest("sym", 0)
    assert m.index_column is None
    back = tmp_lib.read("sym", output_format="pandas")
    pd.testing.assert_frame_equal(back, pdf)
    # a datetime-indexed pandas frame still gets ITS index, not index_column
    pdf2 = pd.DataFrame({"col": [0, 1]},
                        index=pd.DatetimeIndex(
                            np.array([BASE, BASE + 1],
                                     dtype=np.int64).view("M8[ns]"),
                            name="ts"))
    tmp_lib.write("sym2", pdf2, index_column="col")
    m2 = tmp_lib._load_manifest("sym2", 0)
    assert m2.index_column == "ts"
    back2 = tmp_lib.read("sym2", output_format="pandas")
    assert back2.index.asi8.tolist() == [BASE, BASE + 1]


def test_arrow_update_onto_ns_symbol(tmp_lib):
    # reference test_arrow_pandas_interop.py test_update_arrow_with_pandas
    # (the working direction): arrow correction updates a pandas-written
    # ns symbol on the exact ns key
    import pyarrow as pa
    pdf = _ns_frame(4)
    tmp_lib.write("t", pdf)
    up = pa.table({
        "ts": pa.array([BASE + 2], pa.int64()).cast(pa.timestamp("ns")),
        "v": pa.array([42.0], pa.float64())})
    tmp_lib.update("t", up)
    back = tmp_lib.read("t", output_format="pandas")
    assert back["v"].tolist() == [0.0, 1.0, 42.0, 3.0]
    assert back.index.asi8.tolist() == [BASE + i for i in range(4)]


def test_ns_sub_us_resample_rejected(tmp_lib):
    # µs bucket labels cannot express sub-µs buckets — loud rejection, not
    # silently colliding labels (aggregate on spark-ns longs instead)
    tmp_lib.write("t", _ns_frame(10))
    from arcticdb_spark.query import QueryBuilder
    q = QueryBuilder().resample("100ns").agg({"v": "sum"})
    with pytest.raises(Exception, match="finer than 1µs|not a fixed"):
        tmp_lib.read("t", query_builder=q)
    # the spark-ns path expresses it exactly
    from pyspark.sql import functions as F
    ns = tmp_lib.read("t", output_format="spark-ns")
    out = (ns.groupBy((F.col("ts") - F.pmod(F.col("ts"), F.lit(5)))
                      .alias("bucket_ns"))
             .agg(F.sum("v").alias("v")).orderBy("bucket_ns").collect())
    assert [r["v"] for r in out] == [10.0, 35.0]  # 0+1+2+3+4, 5..9
