"""Property-based PIPELINE parity vs pandas: random clause chains
(filter -> project -> groupby-agg / positional tail) applied through
QueryBuilder and replicated step-by-step in pandas. The reference's
hypothesis suites cover operators in isolation; the composed chain pins
clause-boundary semantics (positions after filters, NaN-key drops after
projections, aggregation over projected columns)."""

import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow

from hypothesis import HealthCheck, given, settings, strategies as st

from arcticdb_spark.query import QueryBuilder

N = 48


@st.composite
def frames(draw):
    n = draw(st.integers(10, N))
    rng = np.random.default_rng(draw(st.integers(0, 2**16)))
    ts = pd.date_range("2024-01-01", periods=n, freq="1h")
    a = rng.integers(-50, 50, n).astype("int64")
    b = rng.uniform(-10, 10, n)
    b = np.where(rng.random(n) < 0.2, np.nan, b)
    k = rng.choice(["x", "y", "z"], n)
    return pd.DataFrame({"ts": ts, "a": a, "b": b, "k": k})


_spark = None


@pytest.fixture(autouse=True, scope="module")
def _init(spark):
    global _spark
    _spark = spark


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(pdf=frames(), thresh=st.integers(-30, 30),
       agg=st.sampled_from(["sum", "mean", "min", "max", "count"]))
def test_filter_project_groupby_chain(pdf, thresh, agg):
    df = _spark.createDataFrame(pdf)
    q = QueryBuilder()
    q = q[q["a"] > thresh]
    q = q.apply("c", q["b"] * 2 + q["a"])
    q = q.groupby("k").agg({"c": agg})
    out = q.to_df(df).toPandas().sort_values("k").reset_index(drop=True)

    p = pdf[pdf["a"] > thresh].copy()
    p["c"] = p["b"] * 2 + p["a"]
    if agg == "count":
        # pandas/reference semantics: count non-NaN values, but the group
        # itself survives (all-NaN group -> 0), pinned by the reference's
        # test_aggregate_float_columns_with_nans "only nans" group
        exp = p.groupby("k")["c"].count()
    else:
        exp = getattr(p.groupby("k")["c"], agg)()
        if agg == "sum":
            # reference 0-fills all-NaN sum groups, pandas sum already does
            exp = p.groupby("k")["c"].sum()
    exp = exp.reset_index().sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == exp["k"].tolist()
    got = out["c"].astype("float64").values
    want = exp["c"].astype("float64").values
    assert np.allclose(got, want, equal_nan=True)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(pdf=frames(), thresh=st.integers(-30, 30), n_head=st.integers(1, 12))
def test_filter_then_head_positions(pdf, thresh, n_head):
    """Positional clauses act on the FILTERED frame (pandas iloc model)."""
    df = _spark.createDataFrame(pdf)
    q = QueryBuilder()
    q = q[q["a"] > thresh]
    q = q.head(n_head)
    out = q.to_df(df, index_column="ts").toPandas().sort_values("ts")
    exp = pdf[pdf["a"] > thresh].head(n_head)
    assert len(out) == len(exp)
    assert out["a"].tolist() == exp["a"].tolist()


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(pdf=frames(), lo=st.integers(0, 20), width=st.integers(1, 15))
def test_project_then_row_range(pdf, lo, width):
    df = _spark.createDataFrame(pdf)
    q = QueryBuilder()
    q = q.apply("c", q["a"] + 1)
    q = q.row_range((lo, lo + width))
    out = q.to_df(df, index_column="ts").toPandas().sort_values("ts")
    exp = pdf.assign(c=pdf["a"] + 1).iloc[lo:lo + width]
    assert out["c"].tolist() == exp["c"].tolist()


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(pdf=frames(), thresh=st.integers(-30, 30))
def test_filter_then_tail_negative_range(pdf, thresh):
    df = _spark.createDataFrame(pdf)
    q = QueryBuilder()
    q = q[q["a"] > thresh]
    q = q.tail(5)
    out = q.to_df(df, index_column="ts").toPandas().sort_values("ts")
    exp = pdf[pdf["a"] > thresh].tail(5)
    assert out["a"].tolist() == exp["a"].tolist()


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(pdf=frames(),
       chain=st.lists(st.sampled_from(
           ["filter", "project", "date_range", "row_range", "head", "tail"]),
           min_size=1, max_size=3),
       thresh=st.integers(-30, 30),
       lo_i=st.integers(0, 20), width=st.integers(1, 15),
       n_pos=st.integers(0, 12))
def test_random_clause_chains(pdf, chain, thresh, lo_i, width, n_pos):
    """Random 1-3 clause chains vs a step-by-step pandas replica — pins
    composition semantics beyond the enumerated pairwise matrix (positions
    rebased after filters, index threading, inclusive date_range)."""
    df = _spark.createDataFrame(pdf)
    q = QueryBuilder(index_column="ts")
    p = pdf.copy()
    for kind in chain:
        if kind == "filter":
            q = q[q["a"] > thresh]
            p = p[p["a"] > thresh]
        elif kind == "project":
            q = q.apply("c", q["a"] * 2)
            p = p.assign(c=p["a"] * 2)
        elif kind == "date_range":
            lo = pdf["ts"].iloc[0] + pd.Timedelta(hours=lo_i)
            hi = lo + pd.Timedelta(hours=width)
            q = q.date_range((lo, hi))
            p = p[(p["ts"] >= lo) & (p["ts"] <= hi)]
        elif kind == "row_range":
            q = q.row_range((lo_i, lo_i + width))
            p = p.iloc[lo_i:lo_i + width]
        elif kind == "head":
            q = q.head(n_pos)
            p = p.head(n_pos)
        elif kind == "tail":
            q = q.tail(n_pos)
            p = p.tail(n_pos)
    out = q.to_df(df).toPandas()
    assert len(out) == len(p), (chain, len(out), len(p))
    assert sorted(out["a"].tolist()) == sorted(p["a"].tolist()), chain
