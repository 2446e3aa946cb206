"""Port of the reference's test_engine.py (TimeFrame write/read with
date_range + column selection) and test_polars_set_sorted.py (polars
output carries the SORTED_ASC/DESC flag on the index column; skipped when
polars is absent)."""

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.catalog import Arctic
from arcticdb_spark.timeframe import TimeFrame


@pytest.fixture()
def lib(spark, tmp_path):
    return Arctic(str(tmp_path), spark).create_library("eng")


@pytest.fixture()
def tiny_lib(spark, tmp_path):
    return Arctic(str(tmp_path), spark).create_library("eng_tiny",
                                                       rows_per_file=3)


@pytest.mark.parametrize("cols", [("a",), ("b",), ("c",), ("a", "c"),
                                  ("a", "b", "c")])
@pytest.mark.parametrize("tsbounds", [(0, 1), (0, 5), (1, 3), (2, 4),
                                      (4, 5)])
def test_partial_write_read(tiny_lib, cols, tsbounds):
    """Port of test_engine.py test_partial_write_read:67-83: a TimeFrame
    roundtrips through write; date_range + column reads equal tsloc
    slices of the original."""
    tz = "America/New_York"
    dtidx = pd.date_range("2019-02-06 11:43", periods=6).tz_localize(tz)
    a = np.arange(dtidx.shape[0])
    tf = TimeFrame(dtidx.values, columns_names=["a", "b", "c"],
                   columns_values=[a, a + a, a * 10])
    tiny_lib.write("XXX", tf)
    dtr = (dtidx[tsbounds[0]], dtidx[tsbounds[1]])
    got = tiny_lib.read("XXX", date_range=dtr, columns=list(cols),
                        output_format="pandas")
    rtf = tf.tsloc[dtr[0]:dtr[1]]
    names, values = zip(*[(c, v) for c, v in
                          zip(rtf.columns_names, rtf.columns_values)
                          if c in cols])
    expected = TimeFrame(rtf.times, list(names), list(values))
    assert isinstance(got, TimeFrame)
    assert expected == got


def test_timeframe_full_roundtrip(lib):
    dtidx = pd.date_range("2020-01-01", periods=10)
    tf = TimeFrame(dtidx.values, ["x"], [np.arange(10.0)])
    lib.write("tf", tf)
    assert lib.read("tf", output_format="pandas") == tf
    # spark output stays a frame (distributed consumers)
    assert lib.read("tf").count() == 10


def test_timeframe_validation():
    """TimeFrame constructor contract (_common.py:38-55)."""
    times = pd.date_range("2020-01-01", periods=3).values
    with pytest.raises(TypeError):
        TimeFrame([1, 2, 3], ["a"], [np.arange(3)])
    with pytest.raises(ValueError):
        TimeFrame(times, ["a", "b"], [np.arange(3)])
    with pytest.raises(ValueError):
        TimeFrame(times, ["a"], [np.arange(4)])
    tf = TimeFrame(times, ["a"], [np.arange(3)])
    assert tf.issorted
    np.testing.assert_array_equal(tf.iloc[1].times, times[1:2])
    assert tf.iloc[0:2, "a"].columns_names == ["a"]


def test_non_contiguous_columns(lib):
    """Port of test_partial_write_non_contiguous:86-103: a pivoted frame
    (sparse, NaN-filled) roundtrips."""
    idx = np.arange(0, 10)
    data = {"x": np.arange(10, 20, dtype=np.int64),
            "y": np.arange(20, 30, dtype=np.int64),
            "z": np.arange(30, 40, dtype=np.int64)}
    df_orig = pd.DataFrame(data=data, index=idx)
    df = df_orig.pivot(index="y", values="x", columns="z")
    df.columns = [str(c) for c in df.columns]  # int col names stringify
    lib.write("XXX", df)
    got = lib.read("XXX", output_format="pandas")
    np.testing.assert_array_equal(got.values, df.values)


# ---- polars set_sorted flag (test_polars_set_sorted.py) ----

def _pl():
    return pytest.importorskip("polars", reason="polars not installed here")


def test_sorted_flag_on_datetime_index(lib):
    _pl()
    df = pd.DataFrame({"val": np.arange(10)},
                      index=pd.date_range("2024-01-01", periods=10,
                                          freq="h"))
    lib.write("sym", df)
    result = lib.read("sym", output_format="polars")
    assert result["__index__"].flags["SORTED_ASC"] is True
    assert result["__index__"].flags["SORTED_DESC"] is False


def test_sorted_flag_on_named_datetime_index(lib):
    _pl()
    df = pd.DataFrame({"val": np.arange(10)},
                      index=pd.date_range("2024-01-01", periods=10,
                                          freq="h", name="timestamp"))
    lib.write("sym", df)
    result = lib.read("sym", output_format="polars")
    assert result["timestamp"].flags["SORTED_ASC"] is True


def test_no_sorted_flag_on_range_index(lib):
    _pl()
    df = pd.DataFrame({"val": np.arange(10)})
    lib.write("sym", df)
    result = lib.read("sym", output_format="polars")
    for col in result.columns:
        assert result[col].flags["SORTED_ASC"] is False


def test_value_columns_not_sorted(lib):
    _pl()
    df = pd.DataFrame({"sorted_val": np.arange(10),
                       "another": np.arange(10)},
                      index=pd.date_range("2024-01-01", periods=10,
                                          freq="h"))
    lib.write("sym", df)
    result = lib.read("sym", output_format="polars")
    assert result["__index__"].flags["SORTED_ASC"] is True
    assert result["sorted_val"].flags["SORTED_ASC"] is False
    assert result["another"].flags["SORTED_ASC"] is False
