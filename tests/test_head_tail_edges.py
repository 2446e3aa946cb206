"""head/tail edge semantics ported from the reference's
``python/tests/unit/arcticdb/version_store/test_head.py`` / ``test_tail.py``:
zero, negative, and beyond-length row counts follow pandas exactly, through
both the Library API and leading QueryBuilder clauses.
"""
import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.query import QueryBuilder


@pytest.fixture()
def sym(tmp_lib):
    pdf = pd.DataFrame({"x": np.arange(10, dtype=np.int64)})
    tmp_lib.write("s", pdf)
    return tmp_lib, pdf


NS = [0, 1, 2, 7, 10, 11, -1, -7, -10, -11]


@pytest.mark.parametrize("n", NS)
def test_library_head(sym, n):
    lib, pdf = sym
    got = sorted(r["x"] for r in lib.head("s", n).collect())
    assert got == pdf.head(n)["x"].tolist()


@pytest.mark.parametrize("n", NS)
def test_library_tail(sym, n):
    lib, pdf = sym
    got = sorted(r["x"] for r in lib.tail("s", n).collect())
    assert got == sorted(pdf.tail(n)["x"].tolist())


@pytest.mark.parametrize("n", NS)
def test_clause_head(sym, n):
    lib, pdf = sym
    q = QueryBuilder().head(n)
    got = sorted(r["x"] for r in lib.read("s", query_builder=q).collect())
    assert got == pdf.head(n)["x"].tolist()


@pytest.mark.parametrize("n", NS)
def test_clause_tail(sym, n):
    lib, pdf = sym
    q = QueryBuilder().tail(n)
    got = sorted(r["x"] for r in lib.read("s", query_builder=q).collect())
    assert got == sorted(pdf.tail(n)["x"].tolist())


def test_head_tail_unmanaged_frame(spark):
    # clause kernels on a raw Spark frame (no manifest totals available)
    pdf = pd.DataFrame({"ts": pd.date_range("2024-01-01", periods=10),
                        "x": np.arange(10, dtype=np.int64)})
    df = spark.createDataFrame(pdf)
    for n in NS:
        out = QueryBuilder(index_column="ts").head(n).to_df(df)
        assert sorted(r["x"] for r in out.collect()) == pdf.head(n)["x"].tolist(), f"head({n})"
        out = QueryBuilder(index_column="ts").tail(n).to_df(df)
        assert (sorted(r["x"] for r in out.collect())
                == sorted(pdf.tail(n)["x"].tolist())), f"tail({n})"


def test_head_with_column_selection(sym):
    lib, pdf = sym
    out = lib.head("s", 5, columns=["x"])
    assert out.columns == ["x"] and out.count() == 5


def test_head_tail_pickled_symbol_raises(tmp_lib):
    # reference test_head_pickled_symbol / test_tail_pickled_symbol
    from arcticdb_spark.catalog import ArcticException
    tmp_lib.write_pickle("pk", list(range(100)))
    assert tmp_lib.is_symbol_pickled("pk")
    with pytest.raises(ArcticException):
        tmp_lib.head("pk")
    with pytest.raises(ArcticException):
        tmp_lib.tail("pk")


@pytest.mark.parametrize("n", range(6))
def test_dynamic_schema_head(spark, tmp_path, n):
    # reference test_dynamic_schema_head: head over an epoch-added column
    # set returns min(n, total) rows with the UNION of columns
    from arcticdb_spark.catalog import Arctic
    lib = Arctic(str(tmp_path), spark).create_library(
        "dyn", dynamic_schema=True)
    lib.write("sym", pd.DataFrame({"a": [1, 2]}))
    lib.append("sym", pd.DataFrame({"b": [5, 6]}))
    result = lib.head("sym", n=n, output_format="pandas")
    assert len(result) == min(n, 4)
    assert set(result.columns) == {"a", "b"}


def test_date_range_on_non_datetime_symbol_raises(tmp_lib):
    # reference test_read_date_range_not_date_time_dataframe
    from arcticdb_spark.catalog import ArcticException
    df = pd.DataFrame({"c": np.arange(20, dtype=np.int64)},
                      index=np.arange(0, 20))
    tmp_lib.write("s", df)
    with pytest.raises(ArcticException):
        tmp_lib.read("s", date_range=(pd.Timestamp("2019-01-03"),
                                      pd.Timestamp("2019-01-06")))


def test_date_range_on_unsorted_multiindex_raises(tmp_lib):
    # reference test_read_unsorted_date_range_dataframe_multi_index:
    # the unsorted multiindex WRITES (validate_index off), reports
    # UNSORTED, and date_range reads raise
    from arcticdb_spark.catalog import UnsortedDataException
    dtidx1 = np.roll(pd.date_range("2019-01-01", periods=20), 3)
    df = pd.DataFrame(
        {"c": np.arange(20, dtype=np.int64)},
        index=pd.MultiIndex.from_arrays([dtidx1, np.roll(np.arange(20), 3)],
                                        names=["datetime", "level"]))
    tmp_lib.write("s", df, validate_index=False)
    assert tmp_lib.get_info("s")["sorted"] == "UNSORTED"
    with pytest.raises(UnsortedDataException):
        tmp_lib.read("s", date_range=(pd.Timestamp("2019-01-03"),
                                      pd.Timestamp("2019-01-06")))
