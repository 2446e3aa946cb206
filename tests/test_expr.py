"""Expression semantics vs the reference rules (SURVEY §2.2) with pandas as
oracle — modeled on reference test_filtering.py / test_projection.py."""

import math

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.expr import ExpressionError, where
from arcticdb_spark.query import QueryBuilder, col


@pytest.fixture(scope="module")
def nan_df(spark):
    pdf = pd.DataFrame({
        "a": [1.0, np.nan, 3.0, -4.5, np.nan],
        "b": [10, 20, 30, 40, 50],
        "s": ["x", "y", None, "x", "z"],
        "flag": [True, False, True, None, False],
    })
    return spark.createDataFrame(pdf), pdf


def run(q, df):
    return q.to_df(df).toPandas()


def test_nan_is_null_in_filters(nan_df):
    df, pdf = nan_df
    q = QueryBuilder()
    out = run(q[q["a"] > 0], df)
    # NaN rows excluded (reference NaN ≡ missing), like pandas
    assert sorted(out["b"]) == [10, 30]


def test_isnull_matches_nan(nan_df):
    df, pdf = nan_df
    q = QueryBuilder()
    out = run(q[q["a"].isnull()], df)
    assert sorted(out["b"]) == [20, 50]
    q2 = QueryBuilder()
    out2 = run(q2[q2["a"].notnull()], df)
    assert sorted(out2["b"]) == [10, 30, 40]


def test_div_always_double(spark):
    pdf = pd.DataFrame({"i": [1, 2, 7], "j": [2, 4, 2]})
    df = spark.createDataFrame(pdf)
    q = QueryBuilder()
    out = run(q.apply("d", q["i"] / q["j"]), df)
    assert out["d"].dtype == np.float64
    assert out["d"].tolist() == [0.5, 0.5, 3.5]


def test_arith_promotion_and_pow(spark):
    pdf = pd.DataFrame({"i": [2, 3], "f": [0.5, 1.5]})
    df = spark.createDataFrame(pdf)
    q = QueryBuilder()
    q = q.apply("s", q["i"] + q["f"]).apply("p", q["i"] ** 2) \
         .apply("m", q["i"] * 3).apply("neg", -q["i"]).apply("ab", abs(-q["f"]))
    out = run(q, df)
    assert out["s"].tolist() == [2.5, 4.5]
    assert out["p"].tolist() == [4.0, 9.0]
    assert out["m"].tolist() == [6, 9]
    assert out["neg"].tolist() == [-2, -3]
    assert out["ab"].tolist() == [0.5, 1.5]


def test_string_ordering_rejected(nan_df):
    df, _ = nan_df
    q = QueryBuilder()
    with pytest.raises(ExpressionError):
        q[q["s"] < "y"].to_df(df)


def test_string_equality_and_isin(nan_df):
    df, _ = nan_df
    q = QueryBuilder()
    out = run(q[q["s"] == "x"], df)
    assert sorted(out["b"]) == [10, 40]
    q2 = QueryBuilder()
    out2 = run(q2[q2["s"].isin("x", "z")], df)
    assert sorted(out2["b"]) == [10, 40, 50]
    q3 = QueryBuilder()
    out3 = run(q3[q3["s"].isnotin("x", "z")], df)
    # missing is a member of no set: isnotin retains the null row (reference
    # test_filter_isin_with_nan_in_set / _nat_in_set semantics)
    assert sorted(out3["b"]) == [20, 30]


def test_eq_list_means_isin(nan_df):
    df, _ = nan_df
    q = QueryBuilder()
    out = run(q[q["s"] == ["x", "z"]], df)
    assert sorted(out["b"]) == [10, 40, 50]


def test_regex_match_is_search(nan_df):
    df, _ = nan_df
    q = QueryBuilder()
    out = run(q[q["s"].regex_match("x|z")], df)
    assert sorted(out["b"]) == [10, 40, 50]


def test_ternary_where(nan_df):
    df, _ = nan_df
    q = QueryBuilder()
    out = run(q.apply("w", where(q["b"] >= 30, q["b"], -q["b"])), df)
    assert out["w"].tolist() == [-10, -20, 30, 40, 50]


def test_bool_combinators_and_xor(nan_df):
    df, _ = nan_df
    q = QueryBuilder()
    out = run(q[(q["b"] > 15) & ~(q["b"] > 45)], df)
    assert sorted(out["b"]) == [20, 30, 40]
    q2 = QueryBuilder()
    out2 = run(q2[(q2["b"] > 25) ^ (q2["b"] > 35)], df)
    assert sorted(out2["b"]) == [30]


def test_truth_value_raises():
    q = QueryBuilder()
    with pytest.raises(ExpressionError):
        bool(q["a"] > 1)


def test_unknown_column_raises(nan_df):
    df, _ = nan_df
    q = QueryBuilder()
    with pytest.raises(ExpressionError):
        q[q["nope"] > 1].to_df(df)


def test_timestamp_comparison(spark):
    pdf = pd.DataFrame({"ts": pd.date_range("2024-01-01", periods=5, freq="D"),
                        "v": range(5)})
    df = spark.createDataFrame(pdf)
    q = QueryBuilder()
    out = run(q[q["ts"] >= pd.Timestamp("2024-01-03")], df)
    assert sorted(out["v"]) == [2, 3, 4]
