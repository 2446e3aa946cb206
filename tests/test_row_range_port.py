"""Port of the reference's test_row_range.py and test_bool_isolated.py.

row_range follows pandas iloc semantics (negative, open-ended, clamped,
inverted) through read(row_range=), QueryBuilder().row_range() and
batch_read (generic_row_range_test:21-38, test_row_range_open_ended:
106-135); pickled symbols reject row_range (test_row_range_pickled_symbol:
97-103). test_bool_isolated.py pins ns-precision date_range reads of a
bool column comparing arrow and pandas outputs (:26-44)."""

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.catalog import Arctic, ArcticException
from arcticdb_spark.query import QueryBuilder


@pytest.fixture()
def lib(spark, tmp_path):
    # tiny segments like lmdb_version_store_tiny_segment (row size 2)
    return Arctic(str(tmp_path), spark).create_library("rr", rows_per_file=2)


def generic_row_range_test(lib, symbol, df, start_row, end_row):
    """Port of generic_row_range_test:21-38."""
    lib.write(symbol, df)
    expected = df.iloc[start_row:end_row]
    received = lib.read(symbol, row_range=(start_row, end_row),
                        output_format="pandas")
    q = QueryBuilder().row_range((start_row, end_row))
    via_qb = lib.read(symbol, query_builder=q, output_format="pandas")
    np.testing.assert_array_equal(expected, received)
    np.testing.assert_array_equal(expected, via_qb)

    expected = df.iloc[-end_row:-start_row]
    received = lib.read(symbol, row_range=(-end_row, -start_row),
                        output_format="pandas")
    q = QueryBuilder().row_range((-end_row, -start_row))
    via_qb = lib.read(symbol, query_builder=q, output_format="pandas")
    np.testing.assert_array_equal(expected, received)
    np.testing.assert_array_equal(expected, via_qb)


def _one_col_df(n=10):
    return pd.DataFrame({"x": np.arange(n, dtype=np.int64)})


@pytest.mark.parametrize("start_row,end_row,name", [
    (3, 2, "start_gt_end"),          # test_row_range_start_row_greater...
    (2, 2, "zero_num_rows"),         # test_row_range_zero_num_rows
    (2, 3, "one_num_rows"),          # test_row_range_one_num_rows
    (2, 4, "segment_boundary"),      # test_row_range_segment_boundary
    (3, 7, "multiple_segments"),     # test_row_range_multiple_segments
    (0, 10, "all_rows"),             # test_row_range_all_rows
    (5, 15, "past_end"),             # test_row_range_past_end
])
def test_row_range_cases(lib, start_row, end_row, name):
    generic_row_range_test(lib, f"rr_{name}", _one_col_df(), start_row,
                           end_row)


def test_row_range_with_column_filter(lib):
    """Port of test_row_range_with_column_filter:82-94."""
    df = pd.DataFrame({"x": np.arange(10), "y": np.arange(10, 20),
                       "z": np.arange(20, 30)})
    lib.write("colfilter", df)
    got = lib.read("colfilter", row_range=(5, 8), columns=["x", "z"],
                   output_format="pandas")
    np.testing.assert_array_equal(df.filter(items=["x", "z"]).iloc[5:8], got)


def test_row_range_pickled_symbol(lib):
    """Port of test_row_range_pickled_symbol:97-103."""
    lib.write_pickle("pickled", list(range(100)))
    assert lib.is_symbol_pickled("pickled")
    with pytest.raises(ArcticException):
        lib.read("pickled", row_range=(1, 2))


@pytest.mark.parametrize("row_range,lo,hi", [
    ((-5, None), 95, 100), ((5, None), 5, 100), ((0, None), 0, 100),
    ((None, -5), 0, 95), ((None, 5), 0, 5), ((None, 0), 0, 0),
    ((None, None), 0, 100), ((5, 3), 0, 0),
])
@pytest.mark.parametrize("api", ["query_builder", "read", "read_batch"])
def test_row_range_open_ended(spark, tmp_path, api, row_range, lo, hi):
    """Port of test_row_range_open_ended:106-135."""
    lib = Arctic(str(tmp_path), spark).create_library("rr_open")
    df = pd.DataFrame({"a": np.arange(100)})
    lib.write("sym", df)
    if api == "query_builder":
        q = QueryBuilder().row_range(row_range)
        got = lib.read("sym", query_builder=q, output_format="pandas")
    elif api == "read":
        got = lib.read("sym", row_range=row_range, output_format="pandas")
    else:
        # v1 batch_read returns a dict keyed by symbol, VersionedItem.data
        got = lib.batch_read(["sym"], row_ranges=[row_range])["sym"].data
    expected = pd.DataFrame({"a": np.arange(lo, hi)})
    np.testing.assert_array_equal(expected["a"], got["a"])


@pytest.mark.parametrize("dynamic_schema", [True, False])
@pytest.mark.parametrize("rng", [(0, 0), (0, 1), (2, 3), (5, 6), (6, 6)])
def test_bool_only_ns_date_range(spark, tmp_path, dynamic_schema, rng):
    """Port of test_bool_isolated.py test_bool_only:26-44: a bool-only
    frame on a ns-resolution index; arrow and pandas outputs of the same
    ns date_range agree."""
    lib = Arctic(str(tmp_path), spark).create_library(
        f"bools_{dynamic_schema}", rows_per_file=2,
        dynamic_schema=dynamic_schema)
    df = pd.DataFrame(
        {"col_bool": [True, False, True, True, False, False, False]},
        index=pd.date_range(pd.Timestamp(0), freq="ns", periods=7))
    sym = "bool_only"
    lib.write(sym, df)
    date_range = (pd.Timestamp(rng[0]), pd.Timestamp(rng[1]))
    expected = lib.read(sym, date_range=date_range, output_format="pandas")
    arrow = lib.read(sym, date_range=date_range, output_format="arrow")
    actual = arrow.to_pandas()
    if len(actual.columns) and actual.columns[0] != "col_bool":
        actual = actual.set_index(actual.columns[0])
        actual.index = pd.to_datetime(actual.index)
    assert len(expected) == len(actual)
    np.testing.assert_array_equal(expected["col_bool"].to_numpy(),
                                  actual["col_bool"].to_numpy())


def test_string_roundtrip_tiny_segments(lib):
    """Port of test_string_dedup.py test_string_dedup_basic:46-56 (the
    string-pool memory-size assertion is storage-model-specific; parquet
    dictionary encoding plays that role here — the pinned behavior is the
    roundtrip and the tolerated optimise_string_memory kwarg)."""
    rng = np.random.default_rng(5)
    strings = [f"s{i:02d}" for i in range(100)]
    df = pd.DataFrame(
        {c: rng.choice(strings, 200) for c in
         ["col1", "col2", "col3", "col4"]},
        index=pd.date_range("2000-01-01", periods=200, freq="s"))
    lib.write("strings", df)
    with_opt = lib.read("strings", optimise_string_memory=True,
                        output_format="pandas")
    without = lib.read("strings", optimise_string_memory=False,
                       output_format="pandas")
    assert np.array_equal(df, with_opt)
    assert np.array_equal(df, without)
