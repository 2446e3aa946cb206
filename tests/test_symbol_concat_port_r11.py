"""Ported from the reference's
``python/tests/unit/arcticdb/version_store/test_symbol_concatenation.py``
(round-11 batch): integer columns under an outer join 0-backfill and STAY
integer (reference sparse_utils non-nullable layout), dynamic-schema
symbols whose appends added columns concat correctly (per-symbol outer
backfill happens BEFORE the cross-symbol join), and date_range reads
compose with concat."""
import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.lazy import concat


def test_symbol_concat_integer_columns_outer_join(tmp_lib):
    df_0 = pd.DataFrame({
        "col1": np.arange(5, dtype=np.int64),
        "col2": np.arange(5, 10, dtype=np.int64),
        "col3": np.arange(10, 15, dtype=np.int64),
        "col4": np.arange(15, 20, dtype=np.int64),
        "col5": np.arange(20, 25, dtype=np.int64)})
    df_1 = pd.DataFrame({
        "col7": np.arange(25, 30, dtype=np.int64),
        "col5": np.arange(30, 35, dtype=np.int64),
        "col3": np.arange(35, 40, dtype=np.int64),
        "col1": np.arange(40, 45, dtype=np.int64),
        "col6": np.arange(45, 50, dtype=np.int64)})
    tmp_lib.write("sym0", df_0)
    tmp_lib.write("sym1", df_1)
    received = concat(tmp_lib.read_batch(["sym0", "sym1"], lazy=True),
                      join="outer").collect(output_format="pandas")
    expected = pd.concat([df_0, df_1], join="outer")
    expected.index = pd.RangeIndex(len(expected))
    expected = expected.fillna(0).astype(np.int64)
    received = received.reindex(columns=expected.columns)
    pd.testing.assert_frame_equal(expected, received)


@pytest.mark.parametrize("join", ["inner", "outer"])
def test_symbol_concat_dynamic_schema_missing_columns(spark, tmp_path,
                                                      join):
    from arcticdb_spark.catalog import Arctic
    lib = Arctic(str(tmp_path), spark).create_library(
        "dyncat", dynamic_schema=True)
    df_0 = pd.DataFrame({"col1": np.arange(5, dtype=np.float64),
                         "col2": np.arange(5, 10, dtype=np.float64),
                         "col3": np.arange(10, 15, dtype=np.float64)})
    df_1 = pd.DataFrame({"col2": np.arange(15, 20, dtype=np.float64),
                         "col3": np.arange(15, 20, dtype=np.float64),
                         "col4": np.arange(20, 25, dtype=np.float64)})
    df_2 = pd.DataFrame({"col1": np.arange(25, 30, dtype=np.float64),
                         "col4": np.arange(30, 35, dtype=np.float64),
                         "col5": np.arange(35, 40, dtype=np.float64)})
    df_3 = pd.DataFrame({"col4": np.arange(40, 45, dtype=np.float64),
                         "col5": np.arange(45, 50, dtype=np.float64),
                         "col6": np.arange(50, 55, dtype=np.float64)})
    lib.write("sym0", df_0)
    lib.append("sym0", df_1)
    lib.write("sym1", df_2)
    lib.append("sym1", df_3)
    received = concat(lib.read_batch(["sym0", "sym1"], lazy=True),
                      join=join).collect(output_format="pandas")
    expected = pd.concat(
        [pd.concat([df_0, df_1], join="outer"),
         pd.concat([df_2, df_3], join="outer")], join=join)
    expected.index = pd.RangeIndex(len(expected))
    received = received.reindex(columns=expected.columns)
    pd.testing.assert_frame_equal(expected, received)


@pytest.mark.parametrize("join", ["inner", "outer"])
def test_symbol_concat_with_date_range(tmp_lib, join):
    # reference test_symbol_concat_with_date_range: per-symbol date_range
    # reads compose with the cross-symbol concat
    idx0 = pd.date_range("2025-01-01", periods=10)
    idx1 = pd.date_range("2025-02-01", periods=10)
    df_0 = pd.DataFrame({"col": np.arange(10, dtype=np.float64)},
                        index=idx0)
    df_1 = pd.DataFrame({"col": np.arange(10, 20, dtype=np.float64)},
                        index=idx1)
    tmp_lib.write("sym0", df_0)
    tmp_lib.write("sym1", df_1)
    lazy0 = tmp_lib.read("sym0", lazy=True,
                         date_range=(pd.Timestamp("2025-01-03"),
                                     pd.Timestamp("2025-01-06")))
    lazy1 = tmp_lib.read("sym1", lazy=True,
                         date_range=(pd.Timestamp("2025-02-05"),
                                     pd.Timestamp("2025-02-08")))
    received = concat([lazy0, lazy1], join).collect(
        output_format="pandas")
    expected = pd.concat([df_0.loc["2025-01-03":"2025-01-06"],
                          df_1.loc["2025-02-05":"2025-02-08"]])
    expected.index.name = None
    pd.testing.assert_frame_equal(expected, received, check_freq=False)
