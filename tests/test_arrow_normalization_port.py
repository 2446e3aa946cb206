"""Port of the reference's test_arrow_normalization.py: the ARROW output
contract. Index columns surface under the user's name when named, else
``__index__`` (single) / ``__index_level_N__`` (MultiIndex level N);
clashes resolve by underscore-wrapping; duplicate data columns come back
``col``, ``_col_``, ``__col__``; tz-aware indexes/columns are
``timestamp[ns, tz]``. Adaptation: the reference compares through its
assert_frame_equal_with_arrow helper — here the column names/types are
asserted directly and values through to_pandas."""

import copy

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from arcticdb_spark.catalog import Arctic


@pytest.fixture()
def lib(spark, tmp_path):
    return Arctic(str(tmp_path), spark).create_library("an")


def generic_arrow_norm_test(lib, sym, pandas_object, expected_columns,
                            expected_types=None):
    """Port of generic_arrow_norm_test:13-26 (names + types + values)."""
    lib.write(sym, pandas_object)
    table = lib.read(sym, output_format="arrow")
    assert table.column_names == expected_columns, table.column_names
    if expected_types is not None:
        for i, expected_type in enumerate(expected_types):
            assert table.schema.field(i).type == expected_type, (
                i, table.schema.field(i).type)
    # values survive: compare the data columns POSITIONALLY (duplicate
    # labels make df[col] ambiguous)
    df = pd.DataFrame(pandas_object)
    got = table.to_pandas()
    n_index = len(expected_columns) - len(df.columns)
    for i in range(len(df.columns)):
        np.testing.assert_array_equal(
            df.iloc[:, i].to_numpy(),
            got[expected_columns[n_index + i]].to_numpy())


@pytest.mark.parametrize("index", [None,
                                   pd.RangeIndex(start=0, step=2, stop=4)])
@pytest.mark.parametrize("index_name", [None, "my index"])
@pytest.mark.parametrize("col_name", ["col", "my index"])
def test_range_index(lib, index, index_name, col_name):
    """Port of test_range_index:29-35: a RangeIndex never materializes."""
    df = pd.DataFrame({col_name: [0, 1]}, index=index)
    df.index.name = index_name
    generic_arrow_norm_test(lib, "test_range_index", df, [col_name])


@pytest.mark.parametrize("col_name", ["col", 5])
@pytest.mark.parametrize("duplicate", [True, False])
def test_duplicate_and_special_col_names(lib, col_name, duplicate):
    """Port of test_duplicate_and_special_col_names:38-47 (None and ""
    column names are rejected by this engine's v2-strict name validation —
    documented deviation in test_normalization_names_port)."""
    columns = [col_name, "y"]
    expected_columns = [f"{col_name}", "y"]
    if duplicate:
        columns.append(col_name)
        expected_columns.append(f"_{col_name}_")
    df = pd.DataFrame(np.zeros((1, len(columns))), columns=columns)
    generic_arrow_norm_test(lib, "dup_special", df, expected_columns)


@pytest.mark.parametrize("columns", [["col"], ["index"],
                                     ["__index__", "__index__"]])
def test_unnamed_timeseries_index(lib, columns):
    """Port of test_unnamed_timeseries_index:62-73."""
    df = pd.DataFrame(np.zeros((1, len(columns))), columns=columns,
                      index=[pd.Timestamp(0)])
    index_column_name = ("__index__" if "__index__" not in columns
                         else "___index___")
    expected_columns = [index_column_name]
    taken = set(expected_columns)
    for column in columns:
        while column in taken:
            column = f"_{column}_"
        taken.add(column)
        expected_columns.append(column)
    generic_arrow_norm_test(lib, "unnamed_ts", df, expected_columns)


@pytest.mark.parametrize("index_name", ["index", "__index__", "ts"])
def test_named_timeseries_index_no_clash(lib, index_name):
    """Port of test_named_timeseries_index_no_clash:76-82."""
    df = pd.DataFrame(np.zeros((1, 1)), columns=["col"],
                      index=[pd.Timestamp(0)])
    df.index.name = index_name
    generic_arrow_norm_test(lib, "named_ts", df, [index_name, "col"])


@pytest.mark.parametrize("index_name", ["index", "__index__", "ts"])
def test_named_timeseries_index_clash(lib, index_name):
    """Port of test_named_timeseries_index_clash:85-91: the named index
    keeps its name; clashing data columns wrap."""
    columns = [index_name, index_name, f"_{index_name}_"]
    df = pd.DataFrame(np.zeros((1, len(columns))), columns=columns,
                      index=[pd.Timestamp(0)])
    df.index.name = index_name
    expected = [index_name, f"_{columns[0]}_", f"__{columns[1]}__",
                f"__{columns[2]}__"]
    generic_arrow_norm_test(lib, "named_ts_clash", df, expected)


@pytest.mark.parametrize("columns", [
    ["col"], ["index"], ["__index_level_0__"],
    ["__index_level_0__", "__index_level_0__"],
    ["__index_level_0__", "__index_level_1__"],
])
def test_unnamed_multiindex(lib, columns):
    """Port of test_unnamed_multiindex:106-128."""
    columns = list(columns)
    df = pd.DataFrame(
        np.zeros((1, len(columns))), columns=columns,
        index=pd.MultiIndex.from_product([[pd.Timestamp(0)], ["id"]]))
    index_column_names = ["__index_level_0__", "__index_level_1__"]
    if index_column_names[0] in columns:
        index_column_names[0] = f"_{index_column_names[0]}_"
    if index_column_names[1] in columns:
        index_column_names[1] = f"_{index_column_names[1]}_"
    if columns == ["__index_level_0__", "__index_level_0__"]:
        columns[-1] = f"__{columns[-1]}__"
    expected_columns = index_column_names + columns
    generic_arrow_norm_test(lib, "unnamed_mi", df, expected_columns)


@pytest.mark.parametrize("index_column_names", [["my name", None],
                                                [None, "my name"]])
@pytest.mark.parametrize("columns", [["col"], ["index"],
                                     ["__index_level_0__"]])
def test_partially_named_multiindex(lib, index_column_names, columns):
    """Port of test_partially_named_multiindex:131-166 (representative
    column sets)."""
    df = pd.DataFrame(
        np.zeros((1, len(columns))), columns=columns,
        index=pd.MultiIndex.from_product([[pd.Timestamp(0)], ["id"]],
                                         names=index_column_names))
    expected = copy.deepcopy(index_column_names)
    for i in range(len(index_column_names)):
        expected[i] = (f"__index_level_{i}__"
                       if index_column_names[i] is None
                       else index_column_names[i])
    if expected[0] in columns and index_column_names[0] is None:
        expected[0] = f"_{expected[0]}_"
    if expected[1] in columns and index_column_names[1] is None:
        expected[1] = f"_{expected[1]}_"
    expected += list(columns)
    generic_arrow_norm_test(lib, "partial_mi", df, expected)


@pytest.mark.parametrize("index_names", [["level 1", "level 2"],
                                         ["index", "__index__"],
                                         ["__index__", "index"]])
def test_named_multiindex_no_clash(lib, index_names):
    """Port of test_named_multiindex_no_clash:169-177."""
    df = pd.DataFrame(
        np.zeros((1, 1)), columns=["col"],
        index=pd.MultiIndex.from_product([[pd.Timestamp(0)], ["id"]],
                                         names=index_names))
    generic_arrow_norm_test(lib, "named_mi", df, index_names + ["col"])


def test_named_multiindex_duplicates_in_level_names(lib):
    """Port of test_named_multiindex_duplicates_in_level_names:180-193."""
    df = pd.DataFrame(
        np.zeros((1, 1)), columns=["col"],
        index=pd.MultiIndex.from_product([[pd.Timestamp(0)], ["id"]],
                                         names=["level", "level"]))
    generic_arrow_norm_test(lib, "dup_levels", df,
                            ["level", "_level_", "col"])


@pytest.mark.parametrize("columns", [["level 1"], ["level 2"],
                                     ["level 1", "level 2"],
                                     ["level 1", "level 1"]])
def test_named_multiindex_duplicates_in_columns(lib, columns):
    """Port of test_named_multiindex_duplicates_in_columns:196-213."""
    index_names = ["level 1", "level 2"]
    df = pd.DataFrame(
        np.zeros((1, len(columns))), columns=columns,
        index=pd.MultiIndex.from_product([[pd.Timestamp(0)], ["id"]],
                                         names=index_names))
    expected = list(index_names)
    taken = set(expected)
    for col in columns:
        while col in taken:
            col = f"_{col}_"
        expected.append(col)
        taken.add(col)
    generic_arrow_norm_test(lib, "dup_cols_mi", df, expected)


def test_index_with_timezone(lib):
    """Port of test_index_with_timezone:232-243."""
    df = pd.DataFrame(
        {"col": np.arange(10, dtype=np.int64)},
        index=pd.date_range(pd.Timestamp(year=2025, month=1, day=1,
                                         tz="America/New_York"), periods=10))
    generic_arrow_norm_test(lib, "tz_index", df, ["__index__", "col"],
                            [pa.timestamp("ns", "America/New_York"),
                             pa.int64()])


def test_multi_index_with_tz(lib):
    """Port of test_multi_index_with_tz:246-261 (string level is plain
    utf8 here — Spark's Arrow bridge emits string, not large_string)."""
    df = pd.DataFrame(
        {"col": np.arange(10, dtype=np.int64)},
        index=[
            [chr(ord("a") + i // 5) for i in range(10)],
            [pd.Timestamp(year=2025, month=1, day=1 + i % 5,
                          tz="America/Los_Angeles") for i in range(10)],
        ])
    df.index.names = ["index1", "index2"]
    lib.write("mi_tz", df)
    table = lib.read("mi_tz", output_format="arrow")
    assert table.column_names == ["index1", "index2", "col"]
    assert table.schema.field(1).type == pa.timestamp(
        "ns", "America/Los_Angeles")
    assert table.schema.field(2).type == pa.int64()


def test_series_basic(lib):
    """Port of test_series_basic:281-285."""
    series = pd.Series(np.arange(10, dtype=np.int64), name="my series",
                       index=pd.RangeIndex(start=3, step=5, stop=53))
    lib.write("series_basic", series)
    table = lib.read("series_basic", output_format="arrow")
    assert table.column_names == ["my series"]
    assert table.column(0).to_pylist() == list(range(10))


def test_series_with_index(lib):
    """Port of test_series_with_index:288-300."""
    series = pd.Series(
        np.arange(10, dtype=np.int64), name="my series",
        index=pd.date_range(pd.Timestamp(year=2025, month=1, day=1,
                                         tz="Europe/London"), periods=10))
    lib.write("series_idx", series)
    table = lib.read("series_idx", output_format="arrow")
    assert table.column_names == ["__index__", "my series"]
    assert table.schema.field(0).type == pa.timestamp("ns", "Europe/London")
    assert table.schema.field(1).type == pa.int64()


def test_read_pickled(lib):
    """Port of test_read_pickled:303-309: pickled objects ignore the
    output format (this engine's write() follows the v2 contract and
    rejects arbitrary objects — write_pickle is the fallback)."""
    obj = {"a": ["b", "c"], "x": 122.3}
    lib.write_pickle("pickled_obj", obj)
    assert lib.read("pickled_obj", output_format="arrow") == obj
