"""Lazy symbol concatenation ported from the reference's
``python/tests/unit/arcticdb/version_store/test_symbol_concatenation.py``.
"""
import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.catalog import (NoSuchVersionException, SchemaException)
from arcticdb_spark.lazy import concat
from arcticdb_spark.query import QueryBuilder


def _ts_df(start, n, cols, name="ts"):
    data = {c: np.arange(i, i + n, dtype=np.float64)
            for i, c in enumerate(cols)}
    df = pd.DataFrame(data, index=pd.date_range(start, periods=n))
    df.index.name = name
    return df


def test_symbol_concat_basic_chained_clauses(tmp_lib):
    # reference test_symbol_concat_basic / test_symbol_concat_querybuilder_syntax
    lib = tmp_lib
    lib.write("s0", _ts_df("2024-01-01", 4, ["col1", "col2"]))
    lib.write("s1", _ts_df("2024-02-01", 4, ["col1", "col2"]))
    lazy = concat(lib.read_batch(["s0", "s1"], lazy=True), "outer")
    lazy = lazy[lazy["col1"] > 0.5]
    out = lazy.collect(output_format="pandas").sort_values("ts")
    exp = pd.concat([_ts_df("2024-01-01", 4, ["col1", "col2"]),
                     _ts_df("2024-02-01", 4, ["col1", "col2"])])
    exp = exp[exp["col1"] > 0.5]
    assert len(out) == len(exp)
    assert np.allclose(out["col1"].to_numpy(), exp["col1"].to_numpy())


def test_symbol_concat_inner_outer_columns(tmp_lib):
    # reference test_symbol_concat_different_column_sets
    lib = tmp_lib
    lib.write("s0", _ts_df("2024-01-01", 3, ["col1", "col2"]))
    lib.write("s1", _ts_df("2024-02-01", 3, ["col1", "col3"]))
    outer = concat(lib.read_batch(["s0", "s1"], lazy=True), "outer").collect(
        output_format="pandas")
    # the ts index is re-promoted on pandas output (round 10, like a
    # single read); data columns union/intersect
    assert outer.index.name == "ts"
    assert set(outer.columns) == {"col1", "col2", "col3"}
    assert outer["col2"].isna().sum() == 3
    inner = concat(lib.read_batch(["s0", "s1"], lazy=True), "inner").collect(
        output_format="pandas")
    assert set(inner.columns) == {"col1"}
    assert len(inner) == 6


def test_symbol_concat_differently_named_ts_index(tmp_lib):
    # reference test_symbol_concat_differently_named_timeseries: mismatched
    # index names demote to the unnamed convention ("ts")
    lib = tmp_lib
    lib.write("s0", _ts_df("2024-01-01", 2, ["col1"], name="t_a"))
    lib.write("s1", _ts_df("2024-02-01", 2, ["col1"], name="t_b"))
    out = concat(lib.read_batch(["s0", "s1"], lazy=True)).collect(
        output_format="pandas")
    # mismatched names: index restored UNNAMED (round 10)
    assert out.index.name is None
    assert len(out) == 4
    # identical names survive
    lib.write("s2", _ts_df("2024-03-01", 2, ["col1"], name="t_a"))
    out = concat(lib.read_batch(["s0", "s2"], lazy=True)).collect(
        output_format="pandas")
    assert out.index.name == "t_a"


def test_symbol_concat_differently_named_multiindexes(tmp_lib):
    # reference test_symbol_concat_differently_named_multiindexes
    lib = tmp_lib

    def mk(l0, l1):
        return pd.DataFrame(
            {"col1": np.arange(4, dtype=np.float64)},
            index=pd.MultiIndex.from_product(
                [pd.date_range("2025-01-01", periods=2), ["x", "y"]],
                names=[l0, l1]))

    lib.write("m0", mk("dt", "hello"))
    lib.write("m1", mk("dt", "goodbye"))
    out = concat(lib.read_batch(["m0", "m1"], lazy=True)).collect(
        output_format="pandas")
    # level 0 names agree -> kept; level 1 differ -> unnamed
    assert list(out.index.names) == ["dt", None]
    assert len(out) == 8

    lib.write("m2", mk("dt", "hello"))
    out = concat(lib.read_batch(["m0", "m2"], lazy=True)).collect(
        output_format="pandas")
    assert list(out.index.names) == ["dt", "hello"]


def test_symbol_concat_incompatible_indexes(tmp_lib):
    # reference test_symbol_concat_symbols_with_different_indexes
    lib = tmp_lib
    lib.write("range_sym", pd.DataFrame({"col": [0.0]}))
    lib.write("ts_sym", _ts_df("2024-01-01", 1, ["col"]))
    lib.write("mi_sym", pd.DataFrame(
        {"col": [0.0, 1.0]},
        index=pd.MultiIndex.from_arrays(
            [pd.date_range("2024-01-01", periods=2), [0, 1]],
            names=["datetime", "level"])))
    for pair in (["range_sym", "ts_sym"], ["ts_sym", "range_sym"],
                 ["range_sym", "mi_sym"], ["mi_sym", "ts_sym"]):
        with pytest.raises(SchemaException):
            concat(lib.read_batch(pair, lazy=True)).collect()


def test_symbol_concat_non_existent_symbol(tmp_lib):
    # reference test_symbol_concat_non_existent_symbol / _version_of_symbol
    lib = tmp_lib
    lib.write("s0", _ts_df("2024-01-01", 1, ["col"]))
    with pytest.raises(NoSuchVersionException):
        concat(lib.read_batch(["s0", "nope"], lazy=True)).collect()
    # deleted symbol: no live versions
    lib.write("dead", _ts_df("2024-01-01", 1, ["col"]))
    lib.delete("dead")
    with pytest.raises(NoSuchVersionException):
        concat(lib.read_batch(["s0", "dead"], lazy=True)).collect()
    # snapshot that doesn't exist
    from arcticdb_spark.catalog import ReadRequest
    reqs = ["s0", ReadRequest("s0", as_of="no-such-snap")]
    with pytest.raises(NoSuchVersionException):
        concat(lib.read_batch(reqs, lazy=True)).collect()


def test_symbol_concat_pickled_data(tmp_lib):
    # reference test_symbol_concat_pickled_data
    lib = tmp_lib
    lib.write("s0", _ts_df("2024-01-01", 1, ["col"]))
    lib.write_pickle("pkl", {"hi", "there"})
    with pytest.raises(SchemaException):
        concat(lib.read_batch(["s0", "pkl"], lazy=True)).collect()


def test_symbol_concat_with_per_symbol_clauses(tmp_lib):
    # reference test_symbol_concat_complex: per-symbol clause chains apply
    # before the concat
    lib = tmp_lib
    lib.write("s0", _ts_df("2024-01-01", 10, ["col1"]))
    lib.write("s1", _ts_df("2024-02-01", 10, ["col1"]))
    lazies = lib.read_batch(["s0", "s1"], lazy=True)
    l0, l1 = lazies[0], lazies[1]
    l0 = l0[l0["col1"] > 2.0]
    l1 = l1[l1["col1"] < 5.0]
    out = concat([l0, l1]).collect(output_format="pandas")
    assert len(out) == 7 + 5


def test_symbol_concat_non_existent_version_of_symbol(tmp_lib):
    # reference test_symbol_concat_non_existent_version_of_symbol: a
    # deleted version / wrong snapshot in any leg raises at collect()
    from arcticdb_spark.catalog import ReadRequest
    lib = tmp_lib
    lib.write("s0", pd.DataFrame({"col": [0]}))
    lib.snapshot("snap")
    lib.write("del", pd.DataFrame({"col": [0]}))
    lib.delete("del")
    with pytest.raises(NoSuchVersionException):
        concat(lib.read_batch(["s0", "del"], lazy=True)).collect()
    lib.write("del", pd.DataFrame({"col": [0]}))
    reqs = [ReadRequest("s0"), ReadRequest("del", as_of=0)]
    with pytest.raises(NoSuchVersionException):
        concat(lib.read_batch(reqs, lazy=True)).collect()
    reqs = [ReadRequest("s0"), ReadRequest("del", as_of="snap")]
    with pytest.raises(NoSuchVersionException):
        concat(lib.read_batch(reqs, lazy=True)).collect()
    reqs = [ReadRequest("s0"), ReadRequest("del", as_of="no-such-snap")]
    with pytest.raises(NoSuchVersionException):
        concat(lib.read_batch(reqs, lazy=True)).collect()


def test_symbol_concat_type_promotion(tmp_lib):
    # reference test_symbol_concat_type_promotion (sampled pairs)
    # uint8 arrives as int64 (documented Arrow/Spark widening — see
    # test_type_promotion.py header), so its concat promotion lands on
    # int64 instead of the reference's int16
    for first, second, want in [("int32", "int64", "int64"),
                                ("int64", "float64", "float64"),
                                ("uint8", "int16", "int64")]:
        df0 = pd.DataFrame({"col": np.arange(1, dtype=np.dtype(first))})
        df1 = pd.DataFrame({"col": np.arange(1, dtype=np.dtype(second))})
        tmp_lib.write("p0", df0)
        tmp_lib.write("p1", df1)
        out = concat(tmp_lib.read_batch(["p0", "p1"], lazy=True)).collect(
            output_format="pandas")
        expected = pd.concat([df0, df1])
        expected.index = pd.RangeIndex(len(expected))
        assert out["col"].tolist() == expected["col"].tolist()
        assert str(out["col"].dtype) == want, (first, second)


def test_symbol_concat_empty_column_intersection(tmp_lib):
    # reference test_symbol_concat_empty_column_intersection: inner join
    # of disjoint column sets -> no columns; outer join -> union
    idx = pd.date_range("2025-01-01", periods=5)
    df0 = pd.DataFrame({c: np.arange(5, dtype=np.float64)
                        for c in ("col1", "col2", "col3")}, index=idx)
    df1 = pd.DataFrame({c: np.arange(5, dtype=np.float64)
                        for c in ("col4", "col5", "col6")}, index=idx)
    tmp_lib.write("e0", df0)
    tmp_lib.write("e1", df1)
    inner = concat(tmp_lib.read_batch(["e0", "e1"], lazy=True),
                   join="inner").collect(output_format="pandas")
    assert not len(inner.columns)
    outer = concat(tmp_lib.read_batch(["e0", "e1"], lazy=True),
                   join="outer").collect(output_format="pandas")
    assert list(outer.columns) == ["col1", "col2", "col3",
                                   "col4", "col5", "col6"]
    assert len(outer) == 10
