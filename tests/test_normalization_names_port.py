"""Ported from the reference's
``python/tests/unit/arcticdb/version_store/test_normalization.py``:
None / duplicate column names round-trip in static schema (rejected for
dynamic schema), None-vs-"None" stay distinct, and empty-string series /
index names round-trip verbatim."""
import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.catalog import Arctic, ArcticException


def test_none_in_columns_names(tmp_lib):
    df = pd.DataFrame(data={None: [1.2, 2.2], "None": [2.3, 3.5]},
                      index=[pd.Timestamp(0), pd.Timestamp(1)])
    tmp_lib.write("s", df)
    pd.testing.assert_frame_equal(
        tmp_lib.read("s", output_format="pandas"), df)
    df2 = pd.DataFrame(data={None: [5.2, 6.2], "None": [1.3, 5.5]},
                       index=[pd.Timestamp(2), pd.Timestamp(3)])
    tmp_lib.append("s", df2)
    pd.testing.assert_frame_equal(
        tmp_lib.read("s", output_format="pandas"), pd.concat((df, df2)))


def test_same_columns_names(tmp_lib):
    df = pd.DataFrame(
        data={"test": [1.2, 2.2], "test2": [2.3, 3.5],
              "test3": [2.5, 8.5], "test4": [9.3, 1.5]},
        index=[pd.Timestamp(0), pd.Timestamp(1)])
    df.columns = ["test", None, "test", None]
    tmp_lib.write("s", df)
    pd.testing.assert_frame_equal(
        tmp_lib.read("s", output_format="pandas"), df)
    df2 = pd.DataFrame(
        data={"test": [2.2, 5.2], "test2": [1.3, 8.5],
              "test3": [2.5, 11.5], "test4": [12.3, 51.5]},
        index=[pd.Timestamp(2), pd.Timestamp(3)])
    df2.columns = ["test", None, "test", None]
    tmp_lib.append("s", df2)
    pd.testing.assert_frame_equal(
        tmp_lib.read("s", output_format="pandas"), pd.concat((df, df2)))

    x = pd.DataFrame([[1, 2], [3, 4]], columns=[0, 0])
    tmp_lib.write("s", x)
    pd.testing.assert_frame_equal(
        tmp_lib.read("s", output_format="pandas"), x)


def test_columns_names_dynamic_schema_rejects_dupes(spark, tmp_path):
    lib = Arctic(str(tmp_path), spark).create_library(
        "dyn", dynamic_schema=True)
    # None vs "None" are distinct names -> fine under dynamic schema
    df = pd.DataFrame(data={None: [1.2, 2.2], "None": [2.3, 3.5]},
                      index=[pd.Timestamp(0), pd.Timestamp(1)])
    lib.write("s", df)
    pd.testing.assert_frame_equal(lib.read("s", output_format="pandas"),
                                  df)
    # duplicate names raise under dynamic schema (name-matched appends)
    bad = pd.DataFrame(
        data={"test": [1.2], "test2": [2.3], "test3": [2.5],
              "test4": [9.3]})
    bad.columns = ["test", None, "test", None]
    with pytest.raises(ArcticException):
        lib.write("s2", bad)


@pytest.mark.parametrize("name", (None, "", "non_empty"))
def test_roundtrip_series_name(tmp_lib, name):
    series = pd.Series(np.arange(1), name=name)
    tmp_lib.write("s", series)
    out = tmp_lib.read("s", output_format="pandas")
    pd.testing.assert_series_equal(out, series)


@pytest.mark.parametrize("name", (None, "", "non_empty"))
def test_roundtrip_index_name(tmp_lib, name):
    df = pd.DataFrame({"col": [0]}, index=[pd.Timestamp(0)])
    df.index.name = name
    tmp_lib.write("s", df)
    out = tmp_lib.read("s", output_format="pandas")
    pd.testing.assert_frame_equal(out, df)
