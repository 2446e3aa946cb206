"""Port of the reference's integration test_finalize_staged_data.py:
staged upcast chains under dynamic schema, unsorted-chunk rejection at
stage/finalize time, and the write/append mode spellings."""

import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow


from arcticdb_spark.catalog import (Arctic, ArcticException,
                                    UnsortedDataException)


@pytest.fixture()
def lib(spark, tmp_path):
    return Arctic(str(tmp_path), spark).create_library("fs")


@pytest.fixture()
def dyn_lib(spark, tmp_path):
    return Arctic(str(tmp_path), spark).create_library("fsd",
                                                       dynamic_schema=True)


def construct_sample_array(numpy_type):
    """Port of construct_sample_array:45-56 (min/max/mid per type)."""
    if "str" in str(numpy_type):
        return ["ABCDEFG", None, ""]
    if "bool" in str(numpy_type):
        return np.array([True, False, True], dtype=numpy_type)
    func = np.finfo if "float" in str(numpy_type) else np.iinfo
    return np.array([func(numpy_type).min, func(numpy_type).max,
                     func(numpy_type).max / 2], dtype=numpy_type)


def sample_dataframe(start_date, *arr):
    """Port of sample_dataframe:59-74."""
    date_range = pd.date_range(start=start_date, periods=len(arr[0]),
                               freq="D")
    return pd.DataFrame({f"NUMBER{i}": a for i, a in enumerate(arr)},
                        index=date_range)


def test_finalize_with_upcast_type(dyn_lib):
    """Port of test_finalize_with_upcast_type:179-241: each staged chunk
    redefines columns at a wider type; finalize(APPEND) promotes and every
    original extreme value survives under the final type."""
    lib = dyn_lib
    symbol = "symbol"
    arr_a = [construct_sample_array(t) for t in (np.uint8, np.uint16,
                                                 np.int32, np.float32)]
    arr_b = [construct_sample_array(t) for t in (np.int8, np.int16,
                                                 np.float32, np.float64)]
    arr_c = [construct_sample_array(t) for t in (np.int8, np.int16,
                                                 np.int32, np.int64)]
    starts = ["2020-1-1", "2020-3-1", "2020-4-1", "2020-5-1"]
    frames = [sample_dataframe(s, a, b, c)
              for s, a, b, c in zip(starts, arr_a, arr_b, arr_c)]
    lib.write(symbol, frames[0])
    for f in frames[1:]:
        lib.write(symbol, f, staged=True)
    lib.finalize_staged_data(symbol, mode="append")
    result = lib.read(symbol, output_format="pandas")
    assert len(result) == 12
    for name, arrs, final in (("NUMBER0", arr_a, np.float32),
                              ("NUMBER1", arr_b, np.float64),
                              ("NUMBER2", arr_c, np.int64)):
        expected = np.concatenate([np.asarray(a, dtype=final)
                                   for a in arrs])
        np.testing.assert_array_equal(result[name].to_numpy(dtype=final),
                                      expected)


@pytest.mark.parametrize("mode", ["write", "append"])
@pytest.mark.parametrize("validate_index", [True, False])
def test_finalize_with_unsorted_indexes(dyn_lib, mode, validate_index):
    """Port of test_finalize_with_unsorted_indexes:253-281: unsorted
    chunks never finalize — rejected at stage time with validation on,
    at finalize time otherwise; the stored version stays untouched."""
    lib = dyn_lib
    symbol = "symbol"
    df = sample_dataframe("2020-1-1", [1, 2, 3])
    df_unsorted = pd.concat([sample_dataframe(s, [4]) for s in
                             ("2020-2-2", "2010-1-2", "2026-1-2",
                              "2021-1-2")])
    lib.write(symbol, df)
    if validate_index:
        with pytest.raises(UnsortedDataException):
            lib.write(symbol, df_unsorted, staged=True,
                      validate_index=True)
        with pytest.raises(ArcticException):
            # nothing staged -> E_NO_STAGED_SEGMENTS
            lib.finalize_staged_data(symbol, mode=mode,
                                     validate_index=False)
    else:
        lib.write(symbol, df_unsorted, staged=True, validate_index=False)
        with pytest.raises(UnsortedDataException):
            lib.finalize_staged_data(symbol, mode=mode,
                                     validate_index=False)
    result = lib.read(symbol, output_format="pandas")
    pd.testing.assert_frame_equal(df, result, check_freq=False)


@pytest.mark.parametrize("mode", ["write", "WRITE", None])
def test_finalize_staged_data_mode_write(lib, mode):
    """Port of test_finalize_staged_data_mode_write:465-476: mode=None
    defaults to WRITE; the staged data replaces the stored version."""
    symbol = "symbol"
    df_initial = sample_dataframe("2020-1-1", [1, 2, 3], [4, 5, 6])
    df_staged = sample_dataframe("2020-1-4", [7, 8, 9], [9, 9, 9])
    lib.write(symbol, df_initial)
    lib.write(symbol, df_staged, staged=True)
    pd.testing.assert_frame_equal(lib.read(symbol, output_format="pandas"),
                                  df_initial, check_freq=False)
    lib.finalize_staged_data(symbol, mode=mode)
    pd.testing.assert_frame_equal(lib.read(symbol, output_format="pandas"),
                                  df_staged, check_freq=False)


@pytest.mark.parametrize("mode", ["append", "APPEND"])
def test_finalize_staged_data_mode_append(lib, mode):
    """Port of test_finalize_staged_data_mode_append:479-491."""
    symbol = "symbol"
    df_initial = sample_dataframe("2020-1-1", [1, 2, 3], [4, 5, 6])
    df_staged = sample_dataframe("2020-1-4", [7, 8, 9], [10, 11, 12])
    lib.write(symbol, df_initial)
    lib.write(symbol, df_staged, staged=True)
    lib.finalize_staged_data(symbol, mode=mode)
    expected = pd.concat([df_initial, df_staged])
    pd.testing.assert_frame_equal(lib.read(symbol, output_format="pandas"),
                                  expected, check_freq=False)


def test_finalize_staged_data_long_scenario(lib):
    """Port of test_finalize_staged_data_long_scenario:427-461 (scaled):
    many staged chunks finalize(APPEND) with every chunk's head/tail row
    readable by exact-timestamp date_range afterwards."""
    rng = np.random.default_rng(9)
    symbol = "symbol"
    pos = 0

    def chunk(n):
        nonlocal pos
        idx = pd.date_range("2020-01-01", periods=pos + n, freq="s")[pos:]
        pos += n
        return pd.DataFrame({"v": rng.random(n)}, index=idx)

    first = chunk(99)
    lib.write(symbol, first, prune_previous_versions=True)
    samples = [first.head(1), first.tail(1)]
    for size in (90, 111, 100, 97, 105):
        df = chunk(size)
        lib.write(symbol, df, validate_index=True, staged=True)
        samples.extend([df.head(1), df.tail(1)])
    lib.finalize_staged_data(symbol, mode="append")
    cached = pd.concat(samples)
    for ts, expected in cached.iterrows():
        got = lib.read(symbol, date_range=(ts, ts), output_format="pandas")
        assert len(got) == 1
        pd.testing.assert_series_equal(expected, got.iloc[0])
