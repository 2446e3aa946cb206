"""Array-valued columns, ported from the reference's
``test_array_column_type.py`` TestArrays/TestFailure intent (the reference
marks the whole file skip — "Arrays occasionally raise segfault"; the
Spark engine supports them natively as ``array<T>`` parquet columns, so we
pin the semantics the reference intended).
"""
import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.catalog import ArcticException


def _col(out):
    return [None if v is None else list(v) for v in out["col1"]]


@pytest.fixture(params=("int32", "float32", "int64", "float64"))
def array_type(request):
    yield request.param


def test_single_array(tmp_lib, array_type):
    df = pd.DataFrame({"col1": [np.array([1, 2, 3]).astype(array_type)]})
    tmp_lib.write("sym", df)
    out = tmp_lib.read("sym", output_format="pandas")
    assert _col(out) == [[1, 2, 3]]


def test_differently_shaped_rows(tmp_lib, array_type):
    df = pd.DataFrame({"col1": [np.array([1, 2, 3]).astype(array_type),
                                np.array([1]).astype(array_type),
                                np.array([1, 2, 3, 4]).astype(array_type),
                                np.array([2, 4]).astype(array_type)]})
    tmp_lib.write("sym", df)
    out = tmp_lib.read("sym", output_format="pandas")
    assert _col(out) == [[1, 2, 3], [1], [1, 2, 3, 4], [2, 4]]


def test_rows_can_be_none(tmp_lib, array_type):
    df = pd.DataFrame(
        {"col1": [None, np.array([1, 2]).astype(array_type), None]})
    tmp_lib.write("sym", df)
    out = tmp_lib.read("sym", output_format="pandas")
    assert _col(out) == [None, [1, 2], None]


def test_can_contain_nan(tmp_lib):
    df = pd.DataFrame({"col1": [np.array([np.nan, float("nan")])]})
    tmp_lib.write("sym", df)
    out = tmp_lib.read("sym", output_format="pandas")
    vals = list(out["col1"].iloc[0])
    assert len(vals) == 2 and all(np.isnan(v) for v in vals)


def test_can_append(tmp_lib, array_type):
    df = pd.DataFrame({"col1": [np.array([1, 2, 3]).astype(array_type)]})
    tmp_lib.write("sym", df)
    app = pd.DataFrame({"col1": [np.array([10]).astype(array_type),
                                 np.array([20, 30, 40, 50]).astype(array_type)]})
    tmp_lib.append("sym", app)
    out = tmp_lib.read("sym", output_format="pandas")
    assert _col(out) == [[1, 2, 3], [10], [20, 30, 40, 50]]


def test_empty_array_can_coexist_with_nonempty(tmp_lib, array_type):
    df = pd.DataFrame({"col1": [np.array([]).astype(array_type),
                                np.array([1, 2, 3, 4, 5]).astype(array_type),
                                np.array([]).astype(array_type)]})
    tmp_lib.write("sym", df)
    out = tmp_lib.read("sym", output_format="pandas")
    assert _col(out) == [[], [1, 2, 3, 4, 5], []]
