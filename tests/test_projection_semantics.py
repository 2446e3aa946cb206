"""Projection (apply) semantics ported from the reference's
``test_projection.py``: string/timestamp operand rejection, pow rules,
fixed-value projection, dynamic-schema projection over NULL-backfilled
columns."""

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.catalog import Arctic
from arcticdb_spark.expr import ExpressionError
from arcticdb_spark.query import QueryBuilder


def run(q, df):
    return q.to_df(df).toPandas()


@pytest.fixture(scope="module")
def proj_df(spark):
    return spark.createDataFrame(pd.DataFrame({
        "num": [1, 2, 3],
        "f": [1.5, 2.5, 3.5],
        "s": ["a", "b", "c"],
        "t": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03"])}))


class TestOperandRejection:
    def test_string_binary_arithmetic_raises(self, proj_df):
        """Reference test_project_string_binary_arithmetic."""
        for build in [lambda q: q.apply("r", q["s"] + q["num"]),
                      lambda q: q.apply("r", q["num"] * q["s"]),
                      lambda q: q.apply("r", q["s"] + "suffix")]:
            q = QueryBuilder()
            with pytest.raises(ExpressionError):
                build(q).to_df(proj_df).collect()

    def test_string_unary_arithmetic_raises(self, proj_df):
        """Reference test_project_string_unary_arithmetic."""
        q = QueryBuilder()
        with pytest.raises(ExpressionError):
            q.apply("r", abs(q["s"])).to_df(proj_df).collect()
        q2 = QueryBuilder()
        with pytest.raises(ExpressionError):
            q2.apply("r", -q2["s"]).to_df(proj_df).collect()

    @pytest.mark.parametrize("op", ["__add__", "__sub__", "__mul__",
                                    "__truediv__"])
    def test_datetime_arithmetic_raises(self, proj_df, op):
        """Intended reference behaviour (test_project_datetime_col_with_
        numeric_scalar + mirrors, xfail-pinned as raising): timestamps are
        not arithmetic operands."""
        q = QueryBuilder()
        with pytest.raises(ExpressionError):
            q.apply("r", getattr(q["t"], op)(1)).to_df(proj_df).collect()
        q2 = QueryBuilder()
        with pytest.raises(ExpressionError):
            q2.apply("r", getattr(q2["num"], op)(
                pd.Timestamp("2024-01-01"))).to_df(proj_df).collect()
        q3 = QueryBuilder()
        with pytest.raises(ExpressionError):
            q3.apply("r", getattr(q3["t"], op)(q3["num"])
                     ).to_df(proj_df).collect()

    def test_abs_neg_datetime_raises(self, proj_df):
        """Reference test_project_abs_datetime_col / _neg_datetime_col."""
        q = QueryBuilder()
        with pytest.raises(ExpressionError):
            q.apply("r", abs(q["t"])).to_df(proj_df).collect()
        q2 = QueryBuilder()
        with pytest.raises(ExpressionError):
            q2.apply("r", -q2["t"]).to_df(proj_df).collect()


class TestPow:
    def test_pow_int_exponent_is_float64(self, proj_df):
        """Signed-exponent pow promotes to float64 (reference
        test_project_pow_col_value INT_POW_INT_VAL leg)."""
        q = QueryBuilder()
        out = run(q.apply("r", q["num"] ** 2), proj_df)
        assert out["r"].dtype == np.float64
        assert out["r"].tolist() == [1.0, 4.0, 9.0]

    def test_pow_negative_exponent(self, proj_df):
        q = QueryBuilder()
        out = run(q.apply("r", q["num"] ** -1), proj_df)
        assert np.allclose(out["r"], [1.0, 0.5, 1 / 3])

    def test_pow_col_col(self, proj_df):
        q = QueryBuilder()
        out = run(q.apply("r", q["num"] ** q["num"]), proj_df)
        assert out["r"].tolist() == [1.0, 4.0, 27.0]

    def test_pow_string_raises(self, proj_df):
        """Reference test_project_pow_string_raises."""
        q = QueryBuilder()
        with pytest.raises(ExpressionError):
            q.apply("r", q["num"] ** q["s"]).to_df(proj_df).collect()
        q2 = QueryBuilder()
        with pytest.raises(ExpressionError):
            q2.apply("r", q2["s"] ** q2["num"]).to_df(proj_df).collect()

    def test_pow_float_exponent_raises(self, proj_df):
        """Reference test_project_pow_float_exponent_raises."""
        q = QueryBuilder()
        with pytest.raises(ExpressionError):
            q.apply("r", q["num"] ** q["f"]).to_df(proj_df).collect()
        q2 = QueryBuilder()
        with pytest.raises(ExpressionError):
            q2.apply("r", q2["num"] ** np.float64(2.0)
                     ).to_df(proj_df).collect()

    def test_pow_float_base_int_exponent_ok(self, proj_df):
        """Reference test_project_pow_float_base: float ** int -> float64."""
        q = QueryBuilder()
        out = run(q.apply("r", q["f"] ** 2), proj_df)
        assert np.allclose(out["r"], [2.25, 6.25, 12.25])


class TestFixedValueAndDynamic:
    def test_project_fixed_value(self, proj_df):
        """Reference test_project_fixed_value: broadcast constant column."""
        q = QueryBuilder()
        out = run(q.apply("const", 7), proj_df)
        assert out["const"].tolist() == [7, 7, 7]

    def test_project_dynamic_null_backfilled(self, spark, tmp_path):
        """Reference test_project_dynamic: projecting over a column a later
        append introduced — earlier rows are NULL and propagate NULL through
        the arithmetic (reference backfills 0 for dense compute but emits
        missing on output; NULL-through matches its visible result for
        floats)."""
        lib = Arctic(str(tmp_path), spark).create_library(
            "dyn", dynamic_schema=True)
        lib.write("sym", pd.DataFrame({
            "ts": pd.date_range("2024-01-01", periods=2, freq="h"),
            "a": [1.0, 2.0]}))
        lib.append("sym", pd.DataFrame({
            "ts": pd.date_range("2024-01-02", periods=2, freq="h"),
            "a": [3.0, 4.0], "b": [10.0, 20.0]}))
        q = QueryBuilder()
        q = q.apply("r", q["a"] + q["b"])
        out = (lib.read("sym", query_builder=q, output_format="pandas")
               .sort_values("ts").reset_index(drop=True))
        assert out["r"].isna().tolist() == [True, True, False, False]
        assert out["r"].dropna().tolist() == [13.0, 24.0]

    def test_project_column_not_present_raises(self, proj_df):
        """Reference test_project_column_not_present (static schema)."""
        q = QueryBuilder()
        with pytest.raises(ExpressionError):
            q.apply("r", q["missing"] + 1).to_df(proj_df).collect()
