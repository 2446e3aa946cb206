"""tz-aware DatetimeIndex / column round-trip, modeled on the reference's
norm-meta tz handling (``_normalization.py:399-409`` records
``index_norm.tz`` at write; ``:461-462`` restores with
``tz_localize("UTC").tz_convert(tz)``), plus the pandas-output index
re-promotion it implies (``_index_from_records``, ``:450-463``).

Physical storage is naive UTC (Spark/parquet timestamps are UTC instants);
the zone lives in norm_meta only.
"""
import numpy as np
import pandas as pd
import pytest


def test_tz_aware_index_roundtrip(tmp_lib):
    idx = pd.date_range("2024-01-01 09:30", periods=5, freq="1h",
                        tz="America/New_York", name="ts")
    df = pd.DataFrame({"v": np.arange(5.0)}, index=idx)
    tmp_lib.write("sym", df)
    out = tmp_lib.read("sym", output_format="pandas")
    assert isinstance(out.index, pd.DatetimeIndex)
    assert str(out.index.tz) == "America/New_York"
    pd.testing.assert_frame_equal(df, out, check_freq=False)


def test_naive_index_restored_as_index(tmp_lib):
    idx = pd.date_range("2024-01-01", periods=4, name="ts")
    df = pd.DataFrame({"v": [1.0, 2.0, 3.0, 4.0]}, index=idx)
    tmp_lib.write("sym", df)
    out = tmp_lib.read("sym", output_format="pandas")
    assert isinstance(out.index, pd.DatetimeIndex)
    assert out.index.tz is None
    pd.testing.assert_frame_equal(df, out, check_freq=False)


def test_unnamed_index_restores_none_name(tmp_lib):
    idx = pd.date_range("2024-01-01", periods=3)
    df = pd.DataFrame({"v": [1.0, 2.0, 3.0]}, index=idx)
    assert df.index.name is None
    tmp_lib.write("sym", df)
    out = tmp_lib.read("sym", output_format="pandas")
    assert out.index.name is None
    pd.testing.assert_frame_equal(df, out, check_freq=False)


def test_tz_aware_index_date_range_read(tmp_lib):
    idx = pd.date_range("2024-01-01", periods=10, freq="1D",
                        tz="Europe/London", name="ts")
    df = pd.DataFrame({"v": np.arange(10.0)}, index=idx)
    tmp_lib.write("sym", df)
    sub = tmp_lib.read(
        "sym",
        date_range=(pd.Timestamp("2024-01-03"), pd.Timestamp("2024-01-05")),
        output_format="pandas")
    assert str(sub.index.tz) == "Europe/London"
    assert list(sub["v"]) == [2.0, 3.0, 4.0]


def test_tz_aware_data_column_roundtrip(tmp_lib):
    df = pd.DataFrame({
        "when": pd.date_range("2024-06-01", periods=3, tz="Asia/Tokyo"),
        "v": [1.0, 2.0, 3.0]})
    tmp_lib.write("sym", df)
    out = tmp_lib.read("sym", output_format="pandas")
    assert str(out["when"].dt.tz) == "Asia/Tokyo"
    pd.testing.assert_frame_equal(df, out.reset_index(drop=True))


def test_tz_aware_multiindex_level(tmp_lib):
    lvl0 = pd.date_range("2024-01-01", periods=4, tz="US/Pacific", name="dt")
    mi = pd.MultiIndex.from_arrays([lvl0, [0, 1, 0, 1]],
                                   names=["dt", "level"])
    df = pd.DataFrame({"a": np.arange(4)}, index=mi)
    tmp_lib.write("sym", df)
    out = tmp_lib.read("sym", output_format="pandas").sort_index()
    assert str(out.index.get_level_values("dt").tz) == "US/Pacific"
    pd.testing.assert_frame_equal(df.sort_index(), out, check_freq=False)


def test_tz_aware_series_roundtrip(tmp_lib):
    s = pd.Series([1.5, 2.5], name="px",
                  index=pd.date_range("2024-01-01", periods=2,
                                      tz="UTC", name="ts"))
    tmp_lib.write("sym", s)
    out = tmp_lib.read("sym", output_format="pandas")
    assert isinstance(out, pd.Series)
    assert str(out.index.tz) == "UTC"
    pd.testing.assert_series_equal(s, out, check_freq=False)


def test_fixed_offset_tz_roundtrip(tmp_lib):
    idx = pd.date_range("2024-01-01", periods=3, tz="UTC+05:30", name="ts")
    df = pd.DataFrame({"v": [1.0, 2.0, 3.0]}, index=idx)
    tmp_lib.write("sym", df)
    out = tmp_lib.read("sym", output_format="pandas")
    # same instants, same offset
    assert list(out.index) == list(idx)


def test_tz_spark_output_is_utc_instants(tmp_lib):
    # Spark-format reads expose naive-UTC timestamps (session tz is UTC)
    idx = pd.DatetimeIndex([pd.Timestamp("2024-01-01 12:00",
                                         tz="America/New_York")], name="ts")
    df = pd.DataFrame({"v": [1.0]}, index=idx)
    tmp_lib.write("sym", df)
    row = tmp_lib.read("sym").collect()[0]
    assert row["ts"] == pd.Timestamp("2024-01-01 17:00")  # 12:00 EST = 17:00 UTC
