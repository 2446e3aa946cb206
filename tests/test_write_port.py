"""Ported from the reference's
``python/tests/unit/arcticdb/version_store/test_write.py``: sortedness
reporting (non-timestamp indexes are UNKNOWN and never validate-raise),
bool-named columns/indexes rejected atomically, bool multiindex level
names normalized to strings, fortran-style string columns starting with
None round-trip through write/append/update."""
import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.catalog import (ArcticException, SchemaException,
                                    UnsortedDataException)


def test_write_ascending_sorted_dataframe(tmp_lib):
    df = pd.DataFrame({"c": np.arange(20, dtype=np.int64)},
                      index=np.arange(0, 20))
    tmp_lib.write("s", df)
    assert df.index.is_monotonic_increasing
    assert tmp_lib.get_info("s")["sorted"] == "UNKNOWN"


def test_write_descending_sorted_dataframe(tmp_lib):
    df = pd.DataFrame({"c": np.arange(20, dtype=np.int64)},
                      index=np.flip(np.arange(0, 20), 0))
    tmp_lib.write("s", df)
    assert tmp_lib.get_info("s")["sorted"] == "UNKNOWN"


def test_write_unsorted_sorted_dataframe(tmp_lib):
    df = pd.DataFrame({"c": np.arange(20, dtype=np.int64)},
                      index=np.roll(np.arange(0, 20), 3))
    tmp_lib.write("s", df)
    assert tmp_lib.get_info("s")["sorted"] == "UNKNOWN"


def test_write_unknown_sorted_dataframe(tmp_lib):
    tmp_lib.write_pickle("s", 1)
    assert tmp_lib.get_info("s")["sorted"] == "UNKNOWN"


def test_write_not_sorted_exception(tmp_lib):
    dtidx = np.roll(pd.date_range(pd.Timestamp("2020-01-01"), periods=20),
                    3)
    df = pd.DataFrame({"c": np.arange(20, dtype=np.int64)}, index=dtidx)
    assert not df.index.is_monotonic_increasing
    with pytest.raises(UnsortedDataException):
        tmp_lib.write("s", df, validate_index=True)


def test_write_not_sorted_multi_index_exception(tmp_lib):
    dtidx = np.roll(pd.date_range(pd.Timestamp("2020-01-01"), periods=20),
                    3)
    df = pd.DataFrame(
        {"c": np.arange(20, dtype=np.int64)},
        index=pd.MultiIndex.from_arrays([dtidx, np.arange(20)],
                                        names=["datetime", "level"]))
    with pytest.raises(UnsortedDataException):
        tmp_lib.write("s", df, validate_index=True)


@pytest.mark.parametrize("index_type", ["range", "int64"])
@pytest.mark.parametrize("is_sorted", [True, False])
@pytest.mark.parametrize("validate_index", [True, False])
def test_write_non_timestamp_index(tmp_lib, index_type, is_sorted,
                                   validate_index):
    # non-timestamp indexes NEVER raise on validate_index and report
    # UNKNOWN regardless of their actual order
    shift = 0 if is_sorted else 3
    if index_type == "range":
        idx = np.roll(pd.RangeIndex(0, 20, 1), shift)
    else:
        idx = np.roll(pd.Index(range(20), dtype=np.int64), shift)
    df = pd.DataFrame({"c": np.arange(20, dtype=np.int64)}, index=idx)
    assert df.index.is_monotonic_increasing == is_sorted
    tmp_lib.write("s", df, validate_index=validate_index)
    assert tmp_lib.get_info("s")["sorted"] == "UNKNOWN"


def test_write_bool_named_columns(tmp_lib):
    df = pd.DataFrame({True: [1, 2, 3]},
                      index=pd.date_range("2020-01-01", periods=3))
    with pytest.raises(ArcticException):
        tmp_lib.write("bad", df)
    assert tmp_lib.list_symbols() == []
    assert tmp_lib.has_symbol("bad") is False


@pytest.mark.parametrize(
    "idx", [pd.date_range("2020-01-01", periods=3),
            pd.RangeIndex(start=0, stop=3, step=1)])
def test_write_bool_named_index(tmp_lib, idx):
    df = pd.DataFrame({"col": [1, 2, 3]}, index=idx)
    df.index.name = True
    with pytest.raises(ArcticException):
        tmp_lib.write("bad", df)
    assert tmp_lib.list_symbols() == []


@pytest.mark.parametrize(
    "idx", [pd.date_range("2020-01-01", periods=3),
            pd.RangeIndex(start=0, stop=3, step=1)])
@pytest.mark.parametrize("idx_names", [["index", True], [True, "index"]])
def test_write_bool_named_multi_index(tmp_lib, idx, idx_names):
    df = pd.DataFrame({"col": [1, 2, 3]},
                      index=pd.MultiIndex.from_arrays([idx, idx],
                                                      names=idx_names))
    tmp_lib.write("s", df)
    # bool level names are normalized to strings
    df.index.names = [str(n) for n in idx_names]
    out = tmp_lib.read("s", output_format="pandas")
    pd.testing.assert_frame_equal(out, df, check_freq=False)


@pytest.mark.parametrize("first", [None, np.nan])
def test_write_fortran_style_data_starting_with_none(tmp_lib, first):
    data = np.array([[first, "string"], ["aaa", "bbb"], ["ccc", "ddd"]])
    df0 = pd.DataFrame(data, columns=["a", "b"],
                       index=pd.date_range("2025-01-01", periods=3))
    tmp_lib.write("f", df0)
    out = tmp_lib.read("f", output_format="pandas")
    pd.testing.assert_frame_equal(out, df0, check_freq=False)

    df1 = pd.DataFrame(data, columns=["a", "b"],
                       index=pd.date_range("2025-01-04", periods=3))
    tmp_lib.append("f", df1)
    out = tmp_lib.read("f", output_format="pandas")
    pd.testing.assert_frame_equal(out, pd.concat([df0, df1]),
                                  check_freq=False)

    data_update = np.array([[first, "string"], ["aaa", "bbb"]])
    df2 = pd.DataFrame(data_update, columns=["a", "b"],
                       index=pd.date_range("2025-01-02", periods=2))
    tmp_lib.update("f", df2)
    res_data = np.array(
        [[first, "string"], [first, "string"], ["aaa", "bbb"],
         [first, "string"], ["aaa", "bbb"], ["ccc", "ddd"]])
    res = pd.DataFrame(res_data, columns=["a", "b"],
                       index=pd.date_range("2025-01-01", periods=6))
    out = tmp_lib.read("f", output_format="pandas")
    pd.testing.assert_frame_equal(out, res, check_freq=False)
