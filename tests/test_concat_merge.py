"""ConcatClause / MergeUpdateClause semantics (FIXTURES F5/F6 shapes)."""

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.operators.concat import concat, promote_types
from arcticdb_spark.operators.merge_update import merge_update
from pyspark.sql import types as T


def test_promote_types():
    assert promote_types(T.IntegerType(), T.LongType()) == T.LongType()
    # int32 + float32 -> float64: float32 can't hold every int32 (reference
    # test_type_promotion_int32_and_float32_up_to_float64)
    assert promote_types(T.IntegerType(), T.FloatType()) == T.DoubleType()
    # ints <=16 bit fit exactly in float32 and stay there (reference
    # test_type_promotion_ints_and_floats_up_to_float32)
    assert promote_types(T.ShortType(), T.FloatType()) == T.FloatType()
    assert promote_types(T.ByteType(), T.FloatType()) == T.FloatType()
    assert promote_types(T.LongType(), T.FloatType()) == T.DoubleType()
    assert promote_types(T.NullType(), T.StringType()) == T.StringType()
    with pytest.raises(TypeError):
        promote_types(T.StringType(), T.LongType())


def test_concat_outer_backfill_and_promotion(spark):
    a = spark.createDataFrame(pd.DataFrame({
        "ts": pd.date_range("2025-01-01", periods=3, freq="D"),
        "col1": [1.0, 2.0, 3.0], "col2": np.array([1, 2, 3], dtype="int64")}))
    b = spark.createDataFrame(
        pd.DataFrame({"ts": pd.date_range("2025-01-02", periods=3, freq="D"),
                      "col2": np.array([7, 8, 9], dtype="int32"),
                      "col3": ["x", "y", "z"]}),
        schema="ts timestamp, col2 int, col3 string")
    out = concat([a, b], join="outer")
    assert set(out.columns) == {"ts", "col1", "col2", "col3"}
    assert dict(out.dtypes)["col2"] == "bigint"  # int32 promoted to int64
    pdf = out.toPandas()
    assert len(pdf) == 6
    assert pdf["col1"].isna().sum() == 3  # backfilled
    assert pdf["col3"].isna().sum() == 3


def test_concat_inner_common_columns(spark):
    a = spark.createDataFrame(pd.DataFrame({"x": [1], "y": [2.0], "z": ["a"]}))
    b = spark.createDataFrame(pd.DataFrame({"x": [3], "y": [4.0], "w": [True]}))
    out = concat([a, b], join="inner")
    assert out.columns == ["x", "y"]
    assert out.count() == 2


def test_merge_update_only(spark):
    t = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3], "v": [10.0, 20.0, 30.0]}))
    s = spark.createDataFrame(pd.DataFrame({"k": [2, 9], "v": [99.0, 77.0]}))
    out = merge_update(t, s, on=["k"], upsert=False).toPandas().set_index("k").sort_index()
    assert out.index.tolist() == [1, 2, 3]  # no insert
    assert out.loc[2, "v"] == 99.0
    assert out.loc[1, "v"] == 10.0


def test_merge_upsert(spark):
    t = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": [10.0, 20.0]}))
    s = spark.createDataFrame(pd.DataFrame({"k": [2, 5], "v": [99.0, 50.0]}))
    out = merge_update(t, s, on=["k"], upsert=True).toPandas().set_index("k").sort_index()
    assert out.index.tolist() == [1, 2, 5]
    assert out.loc[2, "v"] == 99.0
    assert out.loc[5, "v"] == 50.0


def test_concat_outer_int_columns_fill_zero(spark):
    """Reference test_symbol_concatenation.py:180-195: outer concat of
    frames with disjoint INT columns fills the holes with 0 (the
    default_initialize rule), keeping exact int dtype — not NULL/NaN."""
    a = spark.createDataFrame(
        pd.DataFrame({"col1": np.arange(3, dtype="int64"),
                      "col2": np.arange(3, 6, dtype="int64")}))
    b = spark.createDataFrame(
        pd.DataFrame({"col2": np.arange(6, 9, dtype="int64"),
                      "col3": np.arange(9, 12, dtype="int64")}))
    out = concat([a, b], join="outer").toPandas()
    assert out["col1"].tolist() == [0, 1, 2, 0, 0, 0]
    assert out["col3"].tolist() == [0, 0, 0, 9, 10, 11]
    assert out["col1"].dtype == "int64" and out["col3"].dtype == "int64"


def test_concat_outer_bool_fills_false_float_fills_nan(spark):
    a = spark.createDataFrame(pd.DataFrame({"k": [1, 2]}))
    b = spark.createDataFrame(
        pd.DataFrame({"k": [3], "flag": [True], "x": [1.5]}))
    out = concat([a, b], join="outer").toPandas().sort_values("k")
    assert out["flag"].tolist() == [False, False, True]
    assert out["x"].isna().tolist() == [True, True, False]
