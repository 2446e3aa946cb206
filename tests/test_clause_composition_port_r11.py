"""Ported from the reference's test_query_builder.py pairwise clause
compositions not already pinned by test_clause_composition.py: every
pair runs through the versioned read path with a pandas oracle, in both
clause and read-kwarg spellings where the reference parametrizes them."""
import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.query import QueryBuilder


@pytest.fixture()
def ts_lib(tmp_lib):
    df = pd.DataFrame({"col": np.arange(1, 11)},
                      index=pd.date_range("2000-01-01", periods=10))
    tmp_lib.write("sym", df)
    return tmp_lib, df


def _read(lib, q, **kw):
    return lib.read("sym", query_builder=q, output_format="pandas", **kw)


@pytest.mark.parametrize("use_date_range_clause", [True, False])
def test_date_range_then_date_range(ts_lib, use_date_range_clause):
    lib, df = ts_lib
    first = (pd.Timestamp("2000-01-02"), pd.Timestamp("2000-01-09"))
    second = (pd.Timestamp("2000-01-07"), pd.Timestamp("2000-01-08"))
    q = QueryBuilder()
    if use_date_range_clause:
        q = q.date_range(first)
    q = q.date_range(second)
    received = (_read(lib, q) if use_date_range_clause
                else _read(lib, q, date_range=first))
    pd.testing.assert_frame_equal(df.query("col in [7, 8]"), received,
                                  check_freq=False)


@pytest.mark.parametrize("use_date_range_clause", [True, False])
def test_date_range_then_row_range(ts_lib, use_date_range_clause):
    lib, df = ts_lib
    dr = (pd.Timestamp("2000-01-02"), pd.Timestamp("2000-01-09"))
    q = QueryBuilder()
    if use_date_range_clause:
        q = q.date_range(dr)
    q = q.row_range((1, 7))
    received = (_read(lib, q) if use_date_range_clause
                else _read(lib, q, date_range=dr))
    pd.testing.assert_frame_equal(df.iloc[2:8], received, check_freq=False)


def test_date_range_then_filter(ts_lib):
    lib, df = ts_lib
    dr = (pd.Timestamp("2000-01-02"), pd.Timestamp("2000-01-09"))
    q = QueryBuilder().date_range(dr)
    q = q[q["col"] > 5]
    expected = df.loc[dr[0]:dr[1]].query("col > 5")
    pd.testing.assert_frame_equal(expected, _read(lib, q),
                                  check_freq=False)


def test_date_range_then_project(ts_lib):
    lib, df = ts_lib
    dr = (pd.Timestamp("2000-01-02"), pd.Timestamp("2000-01-09"))
    q = QueryBuilder().date_range(dr)
    q = q.apply("new", q["col"] * 3)
    expected = df.loc[dr[0]:dr[1]].copy()
    expected["new"] = expected["col"] * 3
    pd.testing.assert_frame_equal(expected, _read(lib, q),
                                  check_freq=False)


def test_date_range_then_groupby(tmp_lib):
    df = pd.DataFrame(
        {"g": ["a", "b", "a", "b", "a", "b", "a", "b", "a", "b"],
         "col": np.arange(1, 11)},
        index=pd.date_range("2000-01-01", periods=10))
    tmp_lib.write("sym", df)
    dr = (pd.Timestamp("2000-01-02"), pd.Timestamp("2000-01-09"))
    q = QueryBuilder().date_range(dr).groupby("g").agg({"col": "sum"})
    received = _read(tmp_lib, q).sort_index()
    expected = df.loc[dr[0]:dr[1]].groupby("g").agg({"col": "sum"})
    pd.testing.assert_frame_equal(expected, received, check_dtype=False)


def test_empty_date_range_then_groupby(tmp_lib):
    # reference: empty result still carries the groupby OUTPUT shape —
    # key on the index (named), agg column present
    df = pd.DataFrame(
        {"col1": ["a", "b", "c", "a", "b", "c", "a", "b", "c", "d"],
         "col2": [1, 2, 3, 2, 1, 3, 1, 1, 3, 4]},
        index=pd.date_range("2000-01-01", periods=10))
    tmp_lib.write("sym", df)
    dr = (pd.Timestamp("2000-01-04 12:00:00"),
          pd.Timestamp("2000-01-04 13:00:00"))
    q = QueryBuilder().date_range(dr).groupby("col1").agg({"col2": "sum"})
    received = _read(tmp_lib, q)
    assert not len(received)
    assert received.index.name == "col1"
    assert received.columns.tolist() == ["col2"]


@pytest.mark.parametrize("use_row_range_clause", [True, False])
def test_row_range_then_date_range(ts_lib, use_row_range_clause):
    lib, df = ts_lib
    dr = (pd.Timestamp("2000-01-03"), pd.Timestamp("2000-01-06"))
    q = QueryBuilder()
    if use_row_range_clause:
        q = q.row_range((1, 8))
    q = q.date_range(dr)
    received = (_read(lib, q) if use_row_range_clause
                else _read(lib, q, row_range=(1, 8)))
    expected = df.iloc[1:8].loc[dr[0]:dr[1]]
    pd.testing.assert_frame_equal(expected, received, check_freq=False)


def test_row_range_then_filter(ts_lib):
    lib, df = ts_lib
    q = QueryBuilder().row_range((1, 8))
    q = q[q["col"] > 4]
    expected = df.iloc[1:8].query("col > 4")
    pd.testing.assert_frame_equal(expected, _read(lib, q),
                                  check_freq=False)


def test_row_range_then_resample(ts_lib):
    lib, df = ts_lib
    q = QueryBuilder().row_range((1, 9)).resample("2D").agg({"col": "sum"})
    received = _read(lib, q)
    expected = df.iloc[1:9].resample("2D", origin="epoch").agg({"col": "sum"})
    received.index.name = expected.index.name
    pd.testing.assert_frame_equal(expected, received, check_dtype=False,
                                  check_freq=False)


def test_filter_then_date_range(ts_lib):
    lib, df = ts_lib
    q = QueryBuilder()
    q = q[q["col"] != 5]
    q = q.date_range((pd.Timestamp("2000-01-03"),
                      pd.Timestamp("2000-01-08")))
    expected = df.query("col != 5").loc["2000-01-03":"2000-01-08"]
    pd.testing.assert_frame_equal(expected, _read(lib, q),
                                  check_freq=False)


def test_project_then_date_range(ts_lib):
    lib, df = ts_lib
    q = QueryBuilder()
    q = q.apply("new", q["col"] + 100)
    q = q.date_range((pd.Timestamp("2000-01-03"),
                      pd.Timestamp("2000-01-08")))
    expected = df.copy()
    expected["new"] = expected["col"] + 100
    expected = expected.loc["2000-01-03":"2000-01-08"]
    pd.testing.assert_frame_equal(expected, _read(lib, q),
                                  check_freq=False)


def test_groupby_then_project(tmp_lib):
    df = pd.DataFrame(
        {"g": ["a", "b"] * 5, "col": np.arange(1, 11, dtype=np.int64)},
        index=pd.date_range("2000-01-01", periods=10))
    tmp_lib.write("sym", df)
    q = QueryBuilder().groupby("g").agg({"col": "sum"})
    q = q.apply("doubled", q["col"] * 2)
    received = _read(tmp_lib, q).sort_index()
    expected = df.groupby("g").agg({"col": "sum"})
    expected["doubled"] = expected["col"] * 2
    pd.testing.assert_frame_equal(expected, received, check_dtype=False)


def test_resample_then_filter(ts_lib):
    lib, df = ts_lib
    q = QueryBuilder().resample("2D").agg({"col": "sum"})
    q = q[q["col"] > 7]
    received = _read(lib, q)
    # origin="epoch": the engine anchors buckets at the epoch like
    # the reference (pandas defaults to start_day)
    expected = df.resample("2D", origin="epoch").agg({"col": "sum"})
    expected = expected[expected["col"] > 7]
    received.index.name = expected.index.name
    pd.testing.assert_frame_equal(expected, received, check_dtype=False,
                                  check_freq=False)
