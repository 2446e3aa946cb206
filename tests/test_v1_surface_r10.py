"""Round-10 v1/experimental API-surface parity: the remaining public
NativeVersionStore/Library methods found by an AST diff against the
reference (batch_read_metadata_multi, batch_read_and_join, trim,
parse_list_of_symbols, *_column_stats_experimental)."""
import numpy as np
import pandas as pd
import pytest


def _df(n=6, start="2024-01-01", mul=1):
    return pd.DataFrame(
        {"a": np.arange(n, dtype="int64") * mul,
         "b": np.arange(n, dtype="float64") * mul},
        index=pd.date_range(start, periods=n, freq="1h"))


class TestBatchReadMetadataMulti:
    def test_duplicate_symbols_multiple_versions(self, tmp_lib):
        # reference _store.py:1728: duplicates allowed, one dict per
        # symbol keyed by version, data=None
        tmp_lib.write("s1", _df(), metadata={"v": 0})
        tmp_lib.write("s1", _df(mul=2), metadata={"v": 1})
        tmp_lib.write("s2", _df(), metadata={"x": 9})
        out = tmp_lib.batch_read_metadata_multi(["s1", "s1", "s2"],
                                                as_ofs=[0, 1, None])
        assert set(out) == {"s1", "s2"}
        assert set(out["s1"]) == {0, 1}
        assert out["s1"][0].metadata == {"v": 0}
        assert out["s1"][1].metadata == {"v": 1}
        assert out["s2"][0].metadata == {"x": 9}
        assert out["s1"][0].data is None

    def test_missing_symbol_raises(self, tmp_lib):
        from arcticdb_spark.catalog import NoSuchVersionException
        with pytest.raises(NoSuchVersionException):
            tmp_lib.batch_read_metadata_multi(["nope"])


class TestBatchReadAndJoin:
    def test_concat_with_per_symbol_ranges(self, tmp_lib):
        from arcticdb_spark.query import QueryBuilder
        tmp_lib.write("a", _df(6))
        tmp_lib.write("b", _df(6, start="2024-02-01", mul=10))
        q = QueryBuilder().concat("outer")
        out = tmp_lib.batch_read_and_join(
            ["a", "b"], q, columns=[["a"], ["a"]])
        assert out.count() == 12
        assert "a" in out.columns and "b" not in out.columns


class TestMiscSurface:
    def test_trim_noop(self, tmp_lib):
        assert tmp_lib.trim() is None

    def test_parse_list_of_symbols(self, tmp_lib):
        class Req:
            def __init__(self, symbol, as_of):
                self.symbol, self.as_of = symbol, as_of
        syms, as_ofs = tmp_lib.parse_list_of_symbols(
            ["x", Req("y", 3), "z"])
        assert syms == ["x", "y", "z"]
        assert as_ofs == [None, 3, None]


class TestColumnStatsExperimental:
    def test_roundtrip(self, tmp_lib):
        tmp_lib.write("s", _df(20))
        tmp_lib.create_column_stats_experimental("s")
        info = tmp_lib.get_column_stats_info_experimental("s")
        # every eligible numeric data column, not the index
        assert info == {"a": {"MINMAX"}, "b": {"MINMAX"}}
        tbl = tmp_lib.read_column_stats_experimental("s")
        assert tbl.num_rows >= 1
        assert "v_a__minmax_min" in tbl.column_names
        mins = [v for v in tbl.column("v_a__minmax_min").to_pylist()
                if v is not None]
        assert min(mins) == 0
        tmp_lib.drop_column_stats_experimental("s")
        assert tmp_lib.get_column_stats_info_experimental("s") == {}

    def test_merges_with_existing(self, tmp_lib):
        tmp_lib.write("s", _df(10))
        tmp_lib.create_column_stats("s", ["a"])
        tmp_lib.create_column_stats_experimental("s")
        info = tmp_lib.get_column_stats_info_experimental("s")
        assert set(info) == {"a", "b"}
