"""Property-based expression/groupby parity vs pandas — mirrors the
reference's hypothesis suites (test_filtering_hypothesis.py,
test_aggregation_hypothesis.py), bounded for CI speed."""

import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow

from hypothesis import HealthCheck, given, settings, strategies as st

from arcticdb_spark.query import QueryBuilder

N = 40


@st.composite
def frames(draw):
    n = draw(st.integers(8, N))
    rng = np.random.default_rng(draw(st.integers(0, 2**16)))
    a = rng.integers(-50, 50, n).astype("int64")
    b = rng.uniform(-10, 10, n)
    nan_mask = rng.random(n) < 0.25
    b = np.where(nan_mask, np.nan, b)
    k = rng.choice(["x", "y", "z", None], n, p=[0.4, 0.3, 0.2, 0.1])
    return pd.DataFrame({"a": a, "b": b, "k": k})


_spark = None


@pytest.fixture(autouse=True, scope="module")
def _init(spark):
    global _spark
    _spark = spark


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(pdf=frames(), thresh=st.integers(-40, 40))
def test_filter_gt_matches_pandas(pdf, thresh):
    df = _spark.createDataFrame(pdf)
    q = QueryBuilder()
    out = q[q["b"] > float(thresh) / 4].to_df(df).toPandas()
    # pandas: NaN > x is False -> excluded, same as reference NaN==missing
    expect = pdf[pdf["b"] > thresh / 4]
    assert len(out) == len(expect)
    assert sorted(out["a"]) == sorted(expect["a"])


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(pdf=frames())
def test_arith_projection_matches_pandas(pdf):
    df = _spark.createDataFrame(pdf)
    q = QueryBuilder()
    q = q.apply("c", (q["a"] * 2 + q["b"]) / 3)
    out = q.to_df(df).toPandas()
    expect = (pdf["a"] * 2 + pdf["b"]) / 3
    # NaN stays NaN through arithmetic on both sides
    assert np.allclose(out["c"].values, expect.values, equal_nan=True)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(pdf=frames())
def test_groupby_sum_mean_matches_pandas(pdf):
    df = _spark.createDataFrame(pdf)
    q = QueryBuilder().groupby("k").agg({"s": ("b", "sum"), "m": ("b", "mean"),
                                         "n": ("b", "count")})
    out = q.to_df(df).toPandas().set_index("k").sort_index()
    # pandas oracle: dropna group keys, NaN-skipping aggs; sum of an all-NaN
    # group is 0.0 on both sides (reference get_default_value semantics)
    g = pdf.groupby("k", dropna=True)["b"]
    expect = pd.DataFrame({"s": g.sum(), "m": g.mean(), "n": g.count()}).sort_index()
    assert list(out.index) == list(expect.index)
    assert (out["n"].values == expect["n"].values).all()
    assert np.allclose(out["s"].values, expect["s"].values)
    m_ok = np.isclose(out["m"].values, expect["m"].values) | (
        out["m"].isna().values & expect["m"].isna().values)
    assert m_ok.all()


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(pdf=frames(), vals=st.lists(st.sampled_from(["x", "y", "z", "w"]),
                                   min_size=1, max_size=3, unique=True))
def test_isin_matches_pandas(pdf, vals):
    df = _spark.createDataFrame(pdf)
    q = QueryBuilder()
    out = q[q["k"].isin(*vals)].to_df(df).toPandas()
    expect = pdf[pdf["k"].isin(vals)]
    assert len(out) == len(expect)


def test_agg_type_matrix_rejected(spark):
    pdf = pd.DataFrame({"k": ["a", "b"], "s": ["p", "q"],
                        "ts2": pd.date_range("2024-01-01", periods=2)})
    df = spark.createDataFrame(pdf)
    q = QueryBuilder().groupby("k").agg({"x": ("s", "sum")})
    with pytest.raises(Exception):
        q.to_df(df)
    q2 = QueryBuilder().groupby("k").agg({"x": ("ts2", "sum")})
    with pytest.raises(Exception):
        q2.to_df(df)
    # strings DO support count/first/last
    q3 = QueryBuilder().groupby("k").agg({"n": ("s", "count")})
    assert q3.to_df(df).count() == 2
