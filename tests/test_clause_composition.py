"""Pairwise clause-composition semantics ported from the reference's
``python/tests/unit/arcticdb/version_store/test_query_builder.py``
(the *_then_* matrix). pandas is the oracle throughout.
"""
import pickle

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.expr import ExpressionError
from arcticdb_spark.query import QueryBuilder

N = 24


@pytest.fixture()
def sym(tmp_lib):
    pdf = pd.DataFrame(
        {"v": np.arange(N, dtype="float64"),
         "k": [("x", "y", "z")[i % 3] for i in range(N)]},
        index=pd.date_range("2024-01-01", periods=N, freq="1h", name="ts"))
    tmp_lib.write("s", pdf)
    return tmp_lib, pdf


def _read(lib, q):
    out = lib.read("s", query_builder=q, output_format="pandas")
    # pandas output re-promotes a surviving ts index column (reference
    # behavior); this matrix asserts against flat columns, so demote it back
    if out.index.name is not None:
        out = out.reset_index()
    return out


def test_groupby_then_head_orders_by_key(sym):
    # reference test_querybuilder_groupby_then_*: groupby output is indexed
    # by the group key; head(2) returns the first 2 groups in key order
    lib, pdf = sym
    q = QueryBuilder().groupby("k").agg({"v": "sum"}).head(2)
    out = _read(lib, q).sort_values("k")
    exp = pdf.groupby("k")["v"].sum().head(2)
    assert out["k"].tolist() == list(exp.index)
    assert out["v"].tolist() == list(exp)


def test_groupby_then_filter_project(sym):
    # reference test_querybuilder_groupby_then_filter / _then_project
    lib, pdf = sym
    q = QueryBuilder().groupby("k").agg({"v": "sum"})
    q = q[q["v"] > 85.0]
    q = q.apply("double", q["v"] * 2)
    out = _read(lib, q).sort_values("k")
    exp = pdf.groupby("k")["v"].sum()
    exp = exp[exp > 85.0]
    assert out["k"].tolist() == list(exp.index)
    assert out["double"].tolist() == list(exp * 2)


def test_groupby_then_groupby(sym):
    # reference test_querybuilder_groupby_then_groupby
    lib, pdf = sym
    q = QueryBuilder().groupby("k").agg({"v": "sum"})
    q = q.apply("big", q["v"] > 90.0).groupby("big").agg({"v": "mean"})
    out = _read(lib, q).sort_values("big").reset_index(drop=True)
    g = pdf.groupby("k")["v"].sum().reset_index()
    g["big"] = g["v"] > 90.0
    exp = g.groupby("big")["v"].mean().reset_index()
    assert out["big"].tolist() == exp["big"].tolist()
    assert np.allclose(out["v"], exp["v"])


def test_resample_then_row_range_and_filter(sym):
    # reference test_querybuilder_resample_then_row_range / _then_filter
    lib, pdf = sym
    q = QueryBuilder().resample("4h").agg({"v": "sum"}).row_range((1, 3))
    out = _read(lib, q).sort_values("ts")
    exp = pdf.resample("4h")["v"].sum().iloc[1:3]
    assert list(out["ts"]) == list(exp.index)
    assert out["v"].tolist() == list(exp)

    q = QueryBuilder().resample("4h").agg({"v": "sum"})
    q = q[q["v"] > 40.0]
    out = _read(lib, q)
    exp = pdf.resample("4h")["v"].sum()
    exp = exp[exp > 40.0]
    assert sorted(out["v"].tolist()) == sorted(exp.tolist())


def test_resample_then_resample(sym):
    # reference test_querybuilder_resample_then_resample
    lib, pdf = sym
    q = QueryBuilder().resample("2h").agg({"v": "sum"})
    q = q.resample("8h").agg({"v": "sum"})
    out = _read(lib, q).sort_values("ts")
    exp = pdf.resample("2h")["v"].sum().resample("8h").sum()
    assert out["v"].tolist() == list(exp)


def test_resample_then_date_range(sym):
    # reference test_querybuilder_resample_then_date_range
    lib, pdf = sym
    lo = pd.Timestamp("2024-01-01 08:00")
    q = QueryBuilder().resample("4h").agg({"v": "sum"}).date_range((lo, None))
    out = _read(lib, q).sort_values("ts")
    exp = pdf.resample("4h")["v"].sum()
    exp = exp[exp.index >= lo]
    assert out["v"].tolist() == list(exp)


def test_date_range_after_groupby_raises(sym):
    # index after a groupby is the (string) group key: date_range must
    # refuse rather than implicitly cast
    lib, _ = sym
    q = QueryBuilder().groupby("k").agg({"v": "sum"})
    q = q.date_range((pd.Timestamp("2024-01-01"), None))
    with pytest.raises(ExpressionError):
        _read(lib, q)


def test_row_range_then_row_range(sym):
    # reference test_querybuilder_row_range_then_row_range: second range is
    # relative to the first's output
    lib, pdf = sym
    q = QueryBuilder().row_range((2, 14)).row_range((3, 6))
    out = _read(lib, q).sort_values("ts")
    exp = pdf.iloc[2:14].iloc[3:6]
    assert out["v"].tolist() == list(exp["v"])


def test_date_range_then_row_range(sym):
    # reference test_querybuilder_date_range_then_row_range
    lib, pdf = sym
    lo, hi = pd.Timestamp("2024-01-01 03:00"), pd.Timestamp("2024-01-01 20:00")
    q = QueryBuilder().date_range((lo, hi)).row_range((2, 5))
    out = _read(lib, q).sort_values("ts")
    exp = pdf[(pdf.index >= lo) & (pdf.index <= hi)].iloc[2:5]
    assert out["v"].tolist() == list(exp["v"])


def test_querybuilder_pickling_all_clauses(sym):
    # reference test_querybuilder_pickle / test_querybuilder_pickling_all_clauses
    lib, pdf = sym
    q = QueryBuilder()
    q = q.date_range((pd.Timestamp("2024-01-01 01:00"), None))
    q = q[q["v"] > 2.0]
    q = q.apply("p", q["v"] * 2)
    q = q.resample("4h").agg({"p": "sum"})
    q = q.row_range((0, 4))
    q2 = pickle.loads(pickle.dumps(q))
    a = _read(lib, q).sort_values("ts").reset_index(drop=True)
    b = _read(lib, q2).sort_values("ts").reset_index(drop=True)
    assert a.equals(b)


def test_getitem_idempotency(sym):
    # reference test_querybuilder_getitem_idempotency: building an
    # expression without attaching it doesn't mutate the builder
    lib, pdf = sym
    q = QueryBuilder()
    expr = q["v"] > 5.0   # built but not attached
    assert len(q._clauses) == 0
    q = q[expr]
    assert len(q._clauses) == 1
    out = _read(lib, q)
    assert len(out) == (pdf["v"] > 5.0).sum()
