"""Aggregation semantics ported from the reference's ``test_aggregation.py``
with pandas as the oracle: bool sums, timestamp means, missing keys dropped,
sum-of-nothing = 0, per-type output dtypes, named aggs, and dynamic-schema
groupbys over NULL-backfilled columns.

Deviation (documented): a group whose aggregation column is entirely
missing yields NULL for min/max (Spark/ANSI-SQL semantics) where the
reference's sparse backfill manufactures a typed default (0 / False / NaT —
``test_extremum_aggregation_with_missing_aggregation_column``). sum keeps
the reference's 0-for-empty behaviour, which pandas also uses.
"""

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.catalog import Arctic
from arcticdb_spark.query import QueryBuilder


def run(q, df):
    return q.to_df(df).toPandas()


class TestAggregators:
    def test_sum_aggregation(self, spark):
        pdf = pd.DataFrame({"g": ["g1", "g1", "g1", "g2", "g2"],
                            "to_sum": [1, 1, 2, 2, 2]})
        q = QueryBuilder().groupby("g").agg({"to_sum": "sum"})
        out = run(q, spark.createDataFrame(pdf)).sort_values("g")
        assert out["to_sum"].tolist() == [4, 4]

    def test_sum_aggregation_bool(self, spark):
        """Reference test_sum_aggregation_bool: bools sum as ints."""
        pdf = pd.DataFrame({
            "g": ["0", "0", "0", "1", "1", "2", "2", "3", "4"],
            "b": [True, False, True, True, True, False, False, True, False]})
        q = QueryBuilder().groupby("g").agg({"b": "sum"})
        out = run(q, spark.createDataFrame(pdf)).sort_values("g")
        expect = pdf.groupby("g")["b"].sum()
        assert out["b"].tolist() == expect.tolist() == [2, 2, 0, 1, 0]

    def test_mean_aggregation_bool(self, spark):
        pdf = pd.DataFrame({"g": ["a", "a", "b"], "b": [True, False, True]})
        q = QueryBuilder().groupby("g").agg({"b": "mean"})
        out = run(q, spark.createDataFrame(pdf)).sort_values("g")
        assert out["b"].tolist() == [0.5, 1.0]

    def test_mean_aggregation_timestamp(self, spark):
        """Reference test_mean_aggregation_timestamp: mean of a timestamp
        column is a timestamp (exact micros averaging)."""
        pdf = pd.DataFrame({
            "g": ["1", "1", "2", "2", "3"],
            "t": pd.to_datetime(["2024-01-01", "2024-01-03",
                                 "2020-06-01", "2020-06-05",
                                 "1999-12-31"])})
        q = QueryBuilder().groupby("g").agg({"t": "mean"})
        out = run(q, spark.createDataFrame(pdf)).sort_values("g")
        expect = pdf.groupby("g")["t"].mean()
        assert pd.api.types.is_datetime64_any_dtype(out["t"])
        got = pd.to_datetime(out["t"]).dt.tz_localize(None).tolist()
        assert got == expect.dt.as_unit("us").tolist()

    def test_mean_of_int_is_float(self, spark):
        pdf = pd.DataFrame({"g": ["a", "a", "b"], "v": [1, 2, 2]})
        q = QueryBuilder().groupby("g").agg({"v": "mean"})
        out = run(q, spark.createDataFrame(pdf)).sort_values("g")
        assert out["v"].dtype == np.float64
        assert out["v"].tolist() == [1.5, 2.0]

    def test_sum_promotes_to_widest(self, spark):
        """Reference test_sum_aggregation_type: int sums land on int64,
        float sums on float64, regardless of input width."""
        pdf = pd.DataFrame({"g": ["a", "a"],
                            "i8": np.array([100, 27], dtype=np.int8),
                            "f4": np.array([1.5, 2.5], dtype=np.float32)})
        q = QueryBuilder().groupby("g").agg({"i8": "sum", "f4": "sum"})
        out = run(q, spark.createDataFrame(pdf))
        assert out["i8"].dtype == np.int64 and out["i8"][0] == 127
        assert out["f4"].dtype == np.float64 and out["f4"][0] == 4.0

    def test_count_is_nonnull_count(self, spark):
        pdf = pd.DataFrame({"g": ["a", "a", "b"],
                            "v": [1.0, np.nan, 3.0]})
        q = QueryBuilder().groupby("g").agg({"v": "count"})
        out = run(q, spark.createDataFrame(pdf)).sort_values("g")
        assert out["v"].tolist() == [1, 1]  # NaN not counted

    def test_first_last_skip_missing(self, spark):
        """Reference test_first_aggregation / test_last_aggregation: first/
        last return the first/last NON-MISSING value in index order."""
        pdf = pd.DataFrame({
            "ts": pd.date_range("2024-01-01", periods=6, freq="h"),
            "g": ["a", "a", "a", "b", "b", "b"],
            "v": [np.nan, 2.0, 3.0, 4.0, 5.0, np.nan]})
        df = spark.createDataFrame(pdf)
        q = QueryBuilder().groupby("g").agg({"v": "first"})
        out = run(q, df).sort_values("g")
        assert out["v"].tolist() == [2.0, 4.0]
        q2 = QueryBuilder().groupby("g").agg({"v": "last"})
        out2 = run(q2, df).sort_values("g")
        assert out2["v"].tolist() == [3.0, 5.0]


class TestGroupingKeys:
    def test_nones_and_nans_in_string_grouping_column(self, spark):
        """Reference test_aggregation_with_nones_and_nans_in_string_grouping_
        column: missing keys are dropped (pandas dropna=True)."""
        pdf = pd.DataFrame({
            "g": ["g1", "g2", "g1", None, np.nan, "g2",
                  None, None, np.nan, np.nan, None, np.nan],
            "v": np.arange(12)})
        q = QueryBuilder().groupby("g").agg({"v": "sum"})
        out = run(q, spark.createDataFrame(pdf)).sort_values("g")
        expect = pdf.groupby("g")["v"].sum()   # dropna=True default
        assert out["g"].tolist() == ["g1", "g2"]
        assert out["v"].tolist() == expect.tolist()

    def test_nan_float_grouping_keys_dropped(self, spark):
        """Reference test_group_on_float_column_with_nans."""
        pdf = pd.DataFrame({"g": [1.0, np.nan, 1.0, 2.0, np.nan],
                            "v": [10, 20, 30, 40, 50]})
        q = QueryBuilder().groupby("g").agg({"v": "sum"})
        out = run(q, spark.createDataFrame(pdf)).sort_values("g")
        assert out["g"].tolist() == [1.0, 2.0]
        assert out["v"].tolist() == [40, 40]

    def test_group_column_not_present_raises(self, spark):
        from arcticdb_spark.expr import ExpressionError
        df = spark.createDataFrame(pd.DataFrame({"a": [1]}))
        q = QueryBuilder().groupby("missing").agg({"a": "sum"})
        with pytest.raises(ExpressionError):
            q.to_df(df).collect()

    def test_string_agg_matrix_rejected(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"g": ["a"], "s": ["x"]}))
        for how in ("sum", "mean", "min", "max"):
            q = QueryBuilder().groupby("g").agg({"s": how})
            with pytest.raises(Exception):
                q.to_df(df).collect()

    def test_timestamp_sum_rejected(self, spark):
        df = spark.createDataFrame(pd.DataFrame(
            {"g": ["a"], "t": [pd.Timestamp("2024-01-01")]}))
        q = QueryBuilder().groupby("g").agg({"t": "sum"})
        with pytest.raises(Exception):
            q.to_df(df).collect()


class TestDynamicSchemaAggregation:
    """Reference test_sum_aggregation_dynamic / test_segment_without_
    aggregation_column: groupby over a symbol whose later appends added the
    aggregation column — earlier rows read as NULL and are skipped (sum
    treats them as 0)."""

    def test_sum_over_null_backfilled_column(self, spark, tmp_path):
        lib = Arctic(str(tmp_path), spark).create_library(
            "dyn", dynamic_schema=True)
        lib.write("sym", pd.DataFrame({
            "ts": pd.date_range("2024-01-01", periods=3, freq="h"),
            "g": ["a", "b", "a"]}))
        lib.append("sym", pd.DataFrame({
            "ts": pd.date_range("2024-01-02", periods=3, freq="h"),
            "g": ["a", "b", "c"], "v": [1.0, 2.0, 3.0]}))
        q = QueryBuilder().groupby("g").agg({"v": "sum"})
        out = (lib.read("sym", query_builder=q, output_format="pandas")
               .sort_index())   # group key is the index like the reference
        # group "a": one real value 1.0 + one NULL-backfilled row -> 1.0;
        # sum-of-nothing stays 0 per the reference's SumAggregator default
        assert out.index.tolist() == ["a", "b", "c"]
        assert out["v"].tolist() == [1.0, 2.0, 3.0]

    def test_sum_group_with_no_values_is_zero(self, spark, tmp_path):
        lib = Arctic(str(tmp_path), spark).create_library(
            "dyn2", dynamic_schema=True)
        lib.write("sym", pd.DataFrame({
            "ts": pd.date_range("2024-01-01", periods=2, freq="h"),
            "g": ["only_nulls", "only_nulls"]}))
        lib.append("sym", pd.DataFrame({
            "ts": pd.date_range("2024-01-02", periods=1, freq="h"),
            "g": ["real"], "v": [7.0]}))
        q = QueryBuilder().groupby("g").agg({"v": "sum"})
        out = (lib.read("sym", query_builder=q, output_format="pandas")
               .sort_index())   # group key is the index like the reference
        assert out["v"].tolist() == [0.0, 7.0]


class TestNamedAggs:
    def test_named_agg_two_outputs_one_input(self, spark):
        """Reference test_named_agg: {'out': ('in', 'agg')} form producing
        several outputs from one input column."""
        pdf = pd.DataFrame({"g": ["a", "a", "b"], "v": [1.0, 5.0, 4.0]})
        q = QueryBuilder().groupby("g").agg(
            {"v_max": ("v", "max"), "v_mean": ("v", "mean")})
        out = run(q, spark.createDataFrame(pdf)).sort_values("g")
        assert out["v_max"].tolist() == [5.0, 4.0]
        assert out["v_mean"].tolist() == [3.0, 4.0]


def test_group_empty_symbol_keeps_schema(tmp_lib):
    # reference test_group_empty_dataframe: grouping an empty symbol
    # returns an empty result that still carries the agg column
    import pandas as pd
    from arcticdb_spark.query import QueryBuilder
    tmp_lib.write("sym", pd.DataFrame({"grouping_column": pd.Series([], dtype=str),
                                       "to_count": pd.Series([], dtype="float64")}))
    q = QueryBuilder().groupby("grouping_column").agg({"to_count": "count"})
    out = tmp_lib.read("sym", query_builder=q)
    assert out.count() == 0
    assert "to_count" in out.columns


def test_group_pickled_symbol_raises(tmp_lib):
    # reference test_group_pickled_symbol: pickled symbols reject queries
    import pytest
    from arcticdb_spark.catalog import ArcticException
    from arcticdb_spark.query import QueryBuilder
    tmp_lib.write_pickle("sym", list(range(100)))
    assert tmp_lib.is_symbol_pickled("sym")
    q = QueryBuilder().groupby("grouping_column").agg({"to_mean": "mean"})
    with pytest.raises(ArcticException):
        tmp_lib.read("sym", query_builder=q)


def test_sum_aggregation_bool(tmp_lib):
    # reference test_sum_aggregation_bool: bool sums as the count of True
    import pandas as pd
    from arcticdb_spark.query import QueryBuilder
    df = pd.DataFrame(
        {"grouping_column": ["0", "0", "0", "1", "1", "2", "2", "3", "4"],
         "to_sum": [True, False, True, True, True, False, False, True,
                    False]})
    tmp_lib.write("s", df)
    q = QueryBuilder().groupby("grouping_column").agg(
        {"to_sum": ("to_sum", "sum")})
    out = (tmp_lib.read("s", query_builder=q, output_format="pandas")
           .sort_values("grouping_column"))
    assert out["to_sum"].tolist() == [2, 2, 0, 1, 0]


def test_mean_aggregation_timestamp(tmp_lib):
    # reference test_mean_aggregation_timestamp — µs-scale values (our
    # datetime DATA columns are µs precision, documented ns->µs
    # truncation; the ns-exact path is the index)
    import pandas as pd
    from arcticdb_spark.query import QueryBuilder
    us = 1000  # microsecond in ns
    df = pd.DataFrame(
        {"grouping_column": ["0", "0", "1", "1"],
         "to_mean": [pd.Timestamp(0), pd.Timestamp(4 * us),
                     pd.Timestamp(10 * us), pd.Timestamp(20 * us)]})
    tmp_lib.write("s", df)
    q = QueryBuilder().groupby("grouping_column").agg(
        {"to_mean": ("to_mean", "mean")})
    out = (tmp_lib.read("s", query_builder=q, output_format="pandas")
           .sort_values("grouping_column"))
    assert out["to_mean"].tolist() == [pd.Timestamp(2 * us),
                                       pd.Timestamp(15 * us)]


def test_max_minus_one(tmp_lib):
    import pandas as pd
    from arcticdb_spark.query import QueryBuilder
    tmp_lib.write("s", pd.DataFrame({"grouping_column": ["thing"],
                                     "to_max": [-1]}))
    q = QueryBuilder().groupby("grouping_column").agg(
        {"to_max": ("to_max", "max")})
    out = tmp_lib.read("s", query_builder=q, output_format="pandas")
    assert out["to_max"].tolist() == [-1]


def test_group_pickled_symbol_raises(tmp_lib):
    import pytest as _pytest
    from arcticdb_spark.catalog import ArcticException
    from arcticdb_spark.query import QueryBuilder
    tmp_lib.write_pickle("pk", list(range(100)))
    q = QueryBuilder().groupby("grouping_column").agg(
        {"to_mean": ("to_mean", "mean")})
    with _pytest.raises(ArcticException):
        tmp_lib.read("pk", query_builder=q)


def test_group_column_not_present_raises(tmp_lib):
    import numpy as np
    import pandas as pd
    import pytest as _pytest
    from arcticdb_spark.expr import ExpressionError
    from arcticdb_spark.query import QueryBuilder
    tmp_lib.write("s", pd.DataFrame({"a": np.arange(2)}))
    q = QueryBuilder().groupby("grouping_column").agg(
        {"to_mean": ("a", "mean")})
    with _pytest.raises(ExpressionError):
        tmp_lib.read("s", query_builder=q)
