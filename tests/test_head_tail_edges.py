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
