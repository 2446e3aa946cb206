"""Ported from the reference's
``python/tests/unit/arcticdb/version_store/test_read_index.py``
TestBasicReadIndex / TestReadIndexAsOf / TestReadIndexRowRange:
``read(sym, columns=[])`` returns an EMPTY frame carrying the fully
restored index — RangeIndex (with start/step), DatetimeIndex, MultiIndex
(every demoted level force-included), composed with head / tail /
row_range / date_range and as_of version / snapshot travel."""
import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.query import QueryBuilder

INDEXES = [
    pd.RangeIndex(start=0, stop=10),
    pd.RangeIndex(start=0, stop=10, step=2),
    pd.RangeIndex(start=5, stop=25, step=5),
    pd.date_range(start="01/01/2024", end="01/10/2024"),
    pd.MultiIndex.from_arrays(
        [pd.date_range(start="01/01/2024", end="01/10/2024"),
         pd.RangeIndex(start=0, stop=10)],
        names=["datetime", "level"]),
]
IDS = ["range-0-10", "range-0-10..2", "range-5-25..5", "daterange",
       "multi-daterange-range"]


@pytest.fixture(params=INDEXES, ids=IDS)
def index(request):
    return request.param


class TestBasicReadIndex:
    def test_read_index_columns(self, tmp_lib, index):
        df = pd.DataFrame({"col": range(0, len(index))}, index=index)
        tmp_lib.write("sym", df)
        result = tmp_lib.read("sym", columns=[], output_format="pandas")
        assert result.index.equals(index)
        assert result.empty

    def test_read_index_multiple_columns(self, tmp_lib, index):
        col1 = list(range(0, len(index)))
        df = pd.DataFrame({"col": col1, "col2": [2 * i for i in col1],
                           "col3": col1}, index=index)
        tmp_lib.write("sym", df)
        result = tmp_lib.read("sym", columns=[], output_format="pandas")
        assert result.index.equals(index)
        assert result.empty

    @pytest.mark.parametrize("n", [3, -3])
    def test_read_index_columns_head(self, tmp_lib, index, n):
        df = pd.DataFrame({"col": range(0, len(index))}, index=index)
        tmp_lib.write("sym", df)
        q = QueryBuilder().head(n)
        result = tmp_lib.read("sym", columns=[], query_builder=q,
                              output_format="pandas")
        assert result.index.equals(df.head(n).index)
        assert result.empty

    @pytest.mark.parametrize("n", [3, -3])
    def test_read_index_columns_tail(self, tmp_lib, index, n):
        df = pd.DataFrame({"col": range(0, len(index))}, index=index)
        tmp_lib.write("sym", df)
        q = QueryBuilder().tail(n)
        result = tmp_lib.read("sym", columns=[], query_builder=q,
                              output_format="pandas")
        assert result.index.equals(df.tail(n).index)
        assert result.empty


class TestReadIndexAsOf:
    def test_as_of_version(self, tmp_lib):
        idx0 = pd.date_range("2024-01-01", periods=5)
        idx1 = pd.date_range("2024-01-06", periods=3)
        tmp_lib.write("sym", pd.DataFrame({"col": range(5)}, index=idx0))
        tmp_lib.append("sym", pd.DataFrame({"col": range(3)}, index=idx1))
        r0 = tmp_lib.read("sym", as_of=0, columns=[],
                          output_format="pandas")
        assert r0.index.equals(idx0) and r0.empty
        r1 = tmp_lib.read("sym", as_of=1, columns=[],
                          output_format="pandas")
        assert r1.index.equals(idx0.append(idx1)) and r1.empty

    def test_as_of_snapshot(self, tmp_lib):
        idx0 = pd.date_range("2024-01-01", periods=5)
        tmp_lib.write("sym", pd.DataFrame({"col": range(5)}, index=idx0))
        tmp_lib.snapshot("snap")
        tmp_lib.write("sym", pd.DataFrame(
            {"col": range(2)}, index=pd.date_range("2025-01-01", periods=2)))
        r = tmp_lib.read("sym", as_of="snap", columns=[],
                         output_format="pandas")
        assert r.index.equals(idx0) and r.empty


class TestReadIndexSlicing:
    def test_row_range(self, tmp_lib, index):
        df = pd.DataFrame({"col": range(0, len(index))}, index=index)
        tmp_lib.write("sym", df)
        result = tmp_lib.read("sym", row_range=(2, 6), columns=[],
                              output_format="pandas")
        assert result.index.equals(df.iloc[2:6].index)
        assert result.empty

    def test_date_range(self, tmp_lib):
        idx = pd.date_range("2024-01-01", periods=10)
        df = pd.DataFrame({"col": range(10)}, index=idx)
        tmp_lib.write("sym", df)
        result = tmp_lib.read(
            "sym",
            date_range=(pd.Timestamp("2024-01-03"),
                        pd.Timestamp("2024-01-07")),
            columns=[], output_format="pandas")
        assert result.index.equals(idx[2:7])
        assert result.empty

    def test_date_range_open_ends(self, tmp_lib):
        idx = pd.date_range("2024-01-01", periods=10)
        tmp_lib.write("sym", pd.DataFrame({"col": range(10)}, index=idx))
        left = tmp_lib.read("sym",
                            date_range=(None, pd.Timestamp("2024-01-04")),
                            columns=[], output_format="pandas")
        assert left.index.equals(idx[:4]) and left.empty
        right = tmp_lib.read("sym",
                             date_range=(pd.Timestamp("2024-01-08"), None),
                             columns=[], output_format="pandas")
        assert right.index.equals(idx[7:]) and right.empty
