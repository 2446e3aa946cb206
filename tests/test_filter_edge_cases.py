"""Filtering edge cases ported from the reference's ``test_filtering.py``:
missing-value set membership, cross-kind comparison rejection, string
escaping, clashing values. Pandas is the oracle where the reference asserts
values; rejection cases pin the UserInputException analogue
(ExpressionError)."""

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.expr import ExpressionError
from arcticdb_spark.query import QueryBuilder


def run(q, df):
    return q.to_df(df).toPandas()


@pytest.fixture(scope="module")
def float_nan_df(spark):
    # NOTE: use a mid-row NaN so Spark keeps the float column nullable
    pdf = pd.DataFrame({"a": [1.0, np.nan, 3.0]})
    return spark.createDataFrame(pdf)


class TestMissingInSetMembership:
    """Reference test_filter_isin_with_nan_in_set / _with_nat_in_set: a
    missing value (NaN/NaT/None) is a member of NO set — stripped from the
    set; missing rows never match isin and always survive isnotin."""

    def test_isin_with_nan_in_set(self, float_nan_df):
        q = QueryBuilder()
        out = run(q[q["a"].isin([np.nan, 3.0])], float_nan_df)
        assert out["a"].tolist() == [3.0]

    def test_isnotin_with_nan_in_set(self, float_nan_df):
        q = QueryBuilder()
        out = run(q[q["a"].isnotin([np.nan, 3.0])], float_nan_df)
        got = sorted(out["a"].tolist(), key=lambda v: (v != v, v))
        assert got[0] == 1.0 and len(got) == 2 and got[1] != got[1]  # NaN kept

    def test_isin_with_nat_in_set(self, spark):
        pdf = pd.DataFrame({"a": [pd.Timestamp("2024-01-01"), pd.NaT,
                                  pd.Timestamp("2024-01-03")]})
        df = spark.createDataFrame(pdf)
        q = QueryBuilder()
        out = run(q[q["a"].isin([pd.NaT, pd.Timestamp("2024-01-03")])], df)
        assert out["a"].tolist() == [pd.Timestamp("2024-01-03")]
        q2 = QueryBuilder()
        out2 = run(q2[q2["a"].isnotin([pd.NaT, pd.Timestamp("2024-01-03")])],
                   df)
        vals = out2["a"].tolist()
        assert pd.Timestamp("2024-01-01") in vals and len(vals) == 2
        assert any(v is pd.NaT for v in vals)  # NaT row kept

    def test_empty_set(self, float_nan_df):
        q = QueryBuilder()
        assert len(run(q[q["a"].isin([])], float_nan_df)) == 0
        q2 = QueryBuilder()
        assert len(run(q2[q2["a"].isnotin([])], float_nan_df)) == 3

    def test_ndarray_set(self, spark):
        """Reference accepts 1D ndarrays (and empty typed arrays —
        test_filter_numeric_isnotin_hashing_overflow)."""
        df = spark.createDataFrame(pd.DataFrame({"a": [1, 2, 3]}))
        q = QueryBuilder()
        out = run(q[q["a"].isin(np.array([2, 3], dtype=np.int64))], df)
        assert sorted(out["a"]) == [2, 3]
        q2 = QueryBuilder()
        out2 = run(q2[q2["a"].isnotin(np.array([], dtype=np.uint8))], df)
        assert sorted(out2["a"]) == [1, 2, 3]


class TestCrossKindRejection:
    """Reference test_filter_string_number_comparison /
    _bool_nonbool_comparison / _string_number_set_membership: cross-kind
    comparisons raise instead of silently casting."""

    @pytest.fixture(scope="class")
    def df(self, spark):
        return spark.createDataFrame(pd.DataFrame({
            "a": [0], "b": ["hello"], "f": [True]}))

    @pytest.mark.parametrize("build", [
        lambda q: q[q["a"] == "0"],
        lambda q: q[q["b"] == 0],
        lambda q: q[q["a"] == q["b"]],
        lambda q: q["0" == q["a"]],
        lambda q: q[0 == q["b"]],
        lambda q: q[q["b"] == q["a"]],
        lambda q: q[q["f"] == q["b"]],      # bool vs string col
        lambda q: q[q["f"] == q["a"]],      # bool vs numeric col
        lambda q: q[q["f"] == "test"],      # bool vs string value
        lambda q: q[q["f"] == 0],           # bool vs numeric value
        lambda q: q[q["b"] == True],        # noqa: E712 string vs bool value
        lambda q: q[q["a"] == True],        # noqa: E712 numeric vs bool value
    ], ids=["int-strval", "str-intval", "int-strcol", "strval-int",
            "intval-str", "str-intcol", "bool-strcol", "bool-intcol",
            "bool-strval", "bool-intval", "str-boolval", "int-boolval"])
    def test_comparison_raises(self, df, build):
        q = QueryBuilder()
        with pytest.raises(ExpressionError):
            build(q).to_df(df).collect()

    def test_set_membership_raises(self, df):
        q = QueryBuilder()
        with pytest.raises(ExpressionError):
            q[q["a"].isin(["0"])].to_df(df).collect()
        q2 = QueryBuilder()
        with pytest.raises(ExpressionError):
            q2[q2["b"].isin([0])].to_df(df).collect()

    def test_datetime_numeric_membership_raises(self, spark):
        """Intended reference behaviour (test_filter_datetime_against_
        numeric_isin and its mirror are xfail-pinned as raising)."""
        df = spark.createDataFrame(pd.DataFrame(
            {"t": [pd.Timestamp(0), pd.Timestamp(1)], "n": [0, 1]}))
        q = QueryBuilder()
        with pytest.raises(ExpressionError):
            q[q["t"].isin([pd.Timestamp(1).value])].to_df(df).collect()
        q2 = QueryBuilder()
        with pytest.raises(ExpressionError):
            q2[q2["n"].isin([pd.Timestamp(1)])].to_df(df).collect()

    def test_bool_bool_comparisons_allowed(self, spark):
        """Reference test_filter_bool_column_comparison: all six comparators
        work between bools (False < True)."""
        pdf = pd.DataFrame({"a": [True, False]})
        df = spark.createDataFrame(pdf)
        for op in ["__eq__", "__ne__", "__lt__", "__le__", "__gt__",
                   "__ge__"]:
            for val in [True, False]:
                q = QueryBuilder()
                out = run(q[getattr(q["a"], op)(val)], df)
                expect = pdf[getattr(pdf["a"], op)(val)]
                assert sorted(out["a"]) == sorted(expect["a"]), (op, val)


class TestStringEscaping:
    """Reference test_filter_string_backslash / _single_quote."""

    def test_backslash(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"a": ["", "\\"]}))
        q = QueryBuilder()
        out = run(q[q["a"] == "\\"], df)
        assert out["a"].tolist() == ["\\"]

    def test_single_quote(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"a": ["", "'"]}))
        q = QueryBuilder()
        out = run(q[q["a"] == "'"], df)
        assert out["a"].tolist() == ["'"]


class TestClashingValues:
    """Reference test_filter_clashing_values: equal-looking values in an int
    and a string column don't cross-contaminate, and isin on each column
    matches only its own kind."""

    def test_clashing(self, spark):
        pdf = pd.DataFrame({"a": [10, 11, 12],
                            "b": ["10", "11", "12"]})
        df = spark.createDataFrame(pdf)
        q = QueryBuilder()
        out = run(q[q["a"].isin([10, 12])], df)
        assert sorted(out["b"]) == ["10", "12"]
        q2 = QueryBuilder()
        out2 = run(q2[q2["b"].isin(["11"])], df)
        assert out2["a"].tolist() == [11]


class TestNonesAndNansRetainedInStringColumn:
    """Reference test_filter_nones_and_nans_retained_in_string_column:
    filtering on another column keeps missing strings intact."""

    def test_retained(self, spark):
        pdf = pd.DataFrame({
            "filter_column": [1, 2, 1, 2, 1, 2],
            "string_column": ["1", "2", np.nan, "4", None, "6"]})
        df = spark.createDataFrame(pdf)
        q = QueryBuilder()
        out = run(q[q["filter_column"] == 1], df).reset_index(drop=True)
        assert len(out) == 3
        assert out["string_column"][0] == "1"
        assert out["string_column"][1] is None or pd.isna(
            out["string_column"][1])
        assert out["string_column"][2] is None or pd.isna(
            out["string_column"][2])


class TestNaTComparisons:
    """Ported reference test_query_builder_nat.py: NaT/missing in
    comparisons follows pandas — EQ/orderings FALSE, NE TRUE."""

    def _df(self, spark):
        import pandas as pd
        pdf = pd.DataFrame({
            "col": [pd.Timestamp("2020-01-01"), pd.NaT,
                    pd.Timestamp("2025-01-01"), pd.Timestamp("2025-06-01")]})
        return spark.createDataFrame(pdf), pdf

    @pytest.mark.parametrize("expr_fn, pd_fn", [
        (lambda q: q["col"] == pd.NaT, lambda d: d["col"] == pd.NaT),
        (lambda q: q["col"] != pd.NaT, lambda d: d["col"] != pd.NaT),
        (lambda q: q["col"] > pd.Timestamp("2024-01-01"),
         lambda d: d["col"] > pd.Timestamp("2024-01-01")),
        (lambda q: q["col"] <= pd.Timestamp("2024-01-01"),
         lambda d: d["col"] <= pd.Timestamp("2024-01-01")),
    ], ids=["eq_nat", "ne_nat", "gt_ts", "le_ts"])
    def test_filter_nat_values(self, spark, expr_fn, pd_fn):
        df, pdf = self._df(spark)
        q = QueryBuilder()
        out = q[expr_fn(q)].to_df(df)
        assert out.count() == int(pd_fn(pdf).sum())

    def test_filter_nat_col_col(self, spark):
        import pandas as pd
        pdf = pd.DataFrame({
            "a": [pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-02"),
                  pd.NaT, pd.NaT, pd.Timestamp("2024-01-05")],
            "b": [pd.Timestamp("2024-01-01"), pd.NaT,
                  pd.NaT, pd.Timestamp("2024-01-04"), pd.Timestamp("2024-01-06")]})
        df = spark.createDataFrame(pdf)
        for fn in (lambda x: x["a"] == x["b"], lambda x: x["a"] != x["b"]):
            q = QueryBuilder()
            assert q[fn(q)].to_df(df).count() == int(fn(pdf).sum())

    def test_ne_string_none_kept(self, spark):
        """Reference test_filter_stringpool...: df[a != 'row2'] keeps None."""
        import pandas as pd
        pdf = pd.DataFrame({"a": ["row1", "row2", None, None, "row5"]})
        df = spark.createDataFrame(pdf)
        q = QueryBuilder()
        out = q[q["a"] != "row2"].to_df(df)
        assert out.count() == 4  # row1, None, None, row5

    def test_ne_float_nan_kept(self, spark):
        import numpy as np
        import pandas as pd
        pdf = pd.DataFrame({"a": [1.0, np.nan, 2.0]})
        df = spark.createDataFrame(pdf)
        q = QueryBuilder()
        assert q[q["a"] != 2.0].to_df(df).count() == 2   # 1.0 and NaN
        q2 = QueryBuilder()
        assert q2[q2["a"] == 2.0].to_df(df).count() == 1


def test_filter_categorical_column_works(tmp_lib):
    # reference test_filter_categorical raises UserInputException (its
    # engine stores integer codes); we store decoded values, so the same
    # query just WORKS — documented improvement over the reference
    df = pd.DataFrame({"a": pd.Categorical(["hello", "hi", "hello"])})
    tmp_lib.write("sym", df)
    q = QueryBuilder()
    q = q[q["a"] == "hi"]
    out = tmp_lib.read("sym", query_builder=q, output_format="pandas")
    assert out["a"].tolist() == ["hi"]


def test_filter_datetime_timezone_aware_literal(tmp_lib):
    # reference test_filter_datetime_timezone_aware: a tz-aware literal
    # compares as its UTC instant against tz-aware stored data
    df = pd.DataFrame(
        {"a": pd.date_range("2000-01-01", periods=10,
                            tz="Europe/Amsterdam")})
    tmp_lib.write("sym", df)
    ts = pd.Timestamp("2000-01-05", tz="GMT")
    q = QueryBuilder()
    q = q[q["a"] < ts]
    out = tmp_lib.read("sym", query_builder=q, output_format="pandas")
    exp = df[df["a"] < ts]
    assert len(out) == len(exp)


def test_filter_clashing_values_across_types(tmp_lib):
    # reference test_filter_clashing_values: int 11 and string "11" in
    # different columns never cross-match
    df = pd.DataFrame({"a": [10, 11, 12], "b": ["11", "12", "13"]})
    tmp_lib.write("sym", df)
    q = QueryBuilder()
    q = q[(q["a"] == 11) | (q["b"] == "11")]
    out = tmp_lib.read("sym", query_builder=q, output_format="pandas")
    assert sorted(out["a"].tolist()) == [10, 11]
