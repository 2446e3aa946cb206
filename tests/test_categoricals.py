"""pandas Categorical round-trip, ported from the reference's
``tests/integration/arcticdb/version_store/test_categorical.py`` and the
normalization in ``_normalization.py:230-236`` (store categories in norm
meta) / ``:1203-1217`` (restore CategoricalDtype on read).

Spark-first deviation: we store decoded VALUES (parquet dictionary-encodes
them) rather than integer codes, so Spark-format reads and query_builder
filters see real values; the pandas output path re-categorizes exactly
(category order and unobserved categories included).
"""
import datetime

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.catalog import ArcticDbNotYetImplemented


def test_categorical(tmp_lib):
    c = pd.Categorical(["a", "b", "c", "a", "b", "c"])
    df = pd.DataFrame({"int": np.arange(6), "cat": c})
    tmp_lib.write("sym", df)
    read_df = tmp_lib.read("sym", output_format="pandas")
    assert not tmp_lib.is_symbol_pickled("sym")
    assert read_df.cat.dtype == "category"


def test_categorical_multiple_col(tmp_lib):
    c = pd.Categorical(["a", "b", "c", "a", "b", "c"])
    c1 = pd.Categorical(["a", "b", "b", "a", "b", "c"])
    df = pd.DataFrame({"int": np.arange(6), "cat1": c, "cat2": c1})
    tmp_lib.write("sym", df)
    read_df = tmp_lib.read("sym", output_format="pandas")
    assert read_df.cat1.dtype == "category"
    assert read_df.cat2.dtype == "category"
    assert list(read_df.cat1) == list(c)
    assert list(read_df.cat2) == list(c1)
    pd.testing.assert_frame_equal(df, read_df.reset_index(drop=True))


def test_categorical_multiple_col_read_subset(tmp_lib):
    c = pd.Categorical(["a", "b", "c", "a", "b", "c"])
    c1 = pd.Categorical(["a", "b", "b", "a", "b", "c"])
    df = pd.DataFrame({"int": np.arange(6), "cat1": c, "cat2": c1})
    tmp_lib.write("sym", df)
    read_df = tmp_lib.read("sym", columns=["cat1"], output_format="pandas")
    assert read_df.cat1.dtype == "category"
    assert list(read_df.cat1) == list(c)
    pd.testing.assert_frame_equal(df[["cat1"]], read_df.reset_index(drop=True))


def test_categorical_with_none(tmp_lib):
    c = pd.Categorical(["a", "b", "c", "a", "b", "c", None])
    df = pd.DataFrame({"int": np.arange(7), "cat": c})
    tmp_lib.write("sym", df)
    read_df = tmp_lib.read("sym", output_format="pandas")
    assert read_df.cat.dtype == "category"
    pd.testing.assert_frame_equal(df, read_df.reset_index(drop=True))


def test_categorical_empty(tmp_lib):
    df = pd.DataFrame({"cat": pd.Categorical([])})
    tmp_lib.write("sym", df)
    read_df = tmp_lib.read("sym", output_format="pandas")
    assert isinstance(read_df.index, pd.RangeIndex)
    assert read_df.cat.dtype == "category"
    pd.testing.assert_frame_equal(df, read_df)


def test_categorical_with_integers(tmp_lib):
    c = pd.Categorical(np.arange(6))
    df = pd.DataFrame({"int": np.arange(6), "cat_int": c})
    tmp_lib.write("sym", df)
    read_df = tmp_lib.read("sym", output_format="pandas")
    assert read_df.cat_int.dtype == "category"
    pd.testing.assert_frame_equal(df, read_df.reset_index(drop=True))


def test_categorical_with_integers_and_strings(tmp_lib):
    c = pd.Categorical(np.arange(6))
    c1 = pd.Categorical(["a", "b", "b", "a", "b", "c"])
    df = pd.DataFrame({"int": np.arange(6), "cat_int": c, "cat_str": c1})
    tmp_lib.write("sym", df)
    read_df = tmp_lib.read("sym", output_format="pandas")
    assert read_df.cat_int.dtype == "category"
    assert read_df.cat_str.dtype == "category"
    pd.testing.assert_frame_equal(df, read_df.reset_index(drop=True))


def test_categorical_int_with_none(tmp_lib):
    # int categories + missing: physical column degrades to float64 but the
    # restored categorical matches codes/categories exactly
    c = pd.Categorical([1, 2, None, 1])
    df = pd.DataFrame({"cat": c})
    tmp_lib.write("sym", df)
    read_df = tmp_lib.read("sym", output_format="pandas")
    pd.testing.assert_frame_equal(df, read_df.reset_index(drop=True))


def test_categorical_unobserved_categories_preserved(tmp_lib):
    # dtype equality includes categories never present in the data
    dtype = pd.CategoricalDtype(categories=["x", "y", "z"])
    df = pd.DataFrame({"cat": pd.Series(["x", "x", "y"], dtype=dtype)})
    tmp_lib.write("sym", df)
    read_df = tmp_lib.read("sym", output_format="pandas")
    assert read_df.cat.dtype == dtype
    pd.testing.assert_frame_equal(df, read_df.reset_index(drop=True))


def test_categorical_batch_write(tmp_lib):
    symbols = ["bw1", "bw2"]
    dfs = [pd.DataFrame({"a": ["hello", "hi", "hello"]}, dtype="category"),
           pd.DataFrame({"b": ["hello", "hi", "hello"]})]
    tmp_lib.write_batch([(s, d) for s, d in zip(symbols, dfs)])
    for sym, df in zip(symbols, dfs):
        pd.testing.assert_frame_equal(
            tmp_lib.read(sym, output_format="pandas").reset_index(drop=True),
            df)


def test_categorical_append_raises(tmp_lib):
    original = pd.DataFrame({"a": ["hello", "hi", "hello"]}, dtype="category")
    tmp_lib.write("sym", original)
    appended = pd.DataFrame({"a": ["hi", "hi", "hello"]}, dtype="category")
    with pytest.raises(ArcticDbNotYetImplemented):
        tmp_lib.append("sym", appended)
    # plain-frame append to a categorical symbol is equally rejected: the
    # appended rows would bypass the stored category list
    with pytest.raises(ArcticDbNotYetImplemented):
        tmp_lib.append("sym", pd.DataFrame({"a": ["new"]}))


def test_categorical_update_raises(tmp_lib):
    idx = pd.date_range("2024-01-01", periods=3, name="ts")
    original = pd.DataFrame(
        {"a": pd.Categorical(["hello", "hi", "hello"])}, index=idx)
    tmp_lib.write("sym", original)
    updated = pd.DataFrame(
        {"a": pd.Categorical(["hi", "hi", "hello"])}, index=idx)
    with pytest.raises(ArcticDbNotYetImplemented):
        tmp_lib.update("sym", updated)


def test_categorical_series(tmp_lib):
    s = pd.Series(["hello", "hi", "hello"], dtype="category", name="s")
    tmp_lib.write("sym", s)
    out = tmp_lib.read("sym", output_format="pandas")
    assert isinstance(out, pd.Series)
    assert out.dtype == "category"
    assert list(out) == ["hello", "hi", "hello"]
    with pytest.raises(ArcticDbNotYetImplemented):
        tmp_lib.append("sym", pd.Series(["hi"], dtype="category", name="s"))


def test_categorical_ts_indexed_roundtrip(tmp_lib):
    idx = pd.date_range("2024-01-01", periods=4, name="ts")
    df = pd.DataFrame({"cat": pd.Categorical(["a", "b", "a", "c"]),
                       "v": [1.0, 2.0, 3.0, 4.0]}, index=idx)
    tmp_lib.write("sym", df)
    out = tmp_lib.read("sym", output_format="pandas")
    assert isinstance(out.index, pd.DatetimeIndex)  # index re-promoted
    assert out.cat.dtype == "category"
    assert list(out.cat) == ["a", "b", "a", "c"]
    # date_range reads keep the categorical dtype
    sub = tmp_lib.read("sym",
                       date_range=(idx[1], idx[2]),
                       output_format="pandas")
    assert sub.cat.dtype == "category"
    assert list(sub.cat) == ["b", "a"]


def test_categorical_float_categories_rejected(tmp_lib):
    c = pd.Categorical([1.5, 2.5, 1.5])
    with pytest.raises(ArcticDbNotYetImplemented):
        tmp_lib.write("sym", pd.DataFrame({"cat": c}))


def test_categorical_spark_output_shows_values(tmp_lib):
    # Spark-format read of a categorical symbol returns decoded values
    df = pd.DataFrame({"cat": pd.Categorical(["a", "b", "a"])})
    tmp_lib.write("sym", df)
    out = tmp_lib.read("sym")
    assert out.schema["cat"].dataType.simpleString() == "string"
    assert sorted(r["cat"] for r in out.collect()) == ["a", "a", "b"]
