"""LazyDataFrame / output formats / batch API parity."""

import pandas as pd
import pytest


def _frame(start, periods, off=0):
    # DatetimeIndex frame (ts DATA columns are no longer index-sniffed)
    return pd.DataFrame(
        {"v": [float(i + off) for i in range(periods)]},
        index=pd.date_range(start, periods=periods, freq="1h", name="ts"))


def test_lazy_read_chain(tmp_lib):
    tmp_lib.write("sym", _frame("2024-01-01", 50))
    lf = tmp_lib.read("sym", lazy=True)
    lf = lf[lf["v"] >= 10]
    lf = lf.apply("v2", lf["v"] * 2)
    out = lf.collect().toPandas()
    assert len(out) == 40
    assert (out["v2"] == out["v"] * 2).all()


def test_lazy_collection_concat(tmp_lib):
    from arcticdb_spark.lazy import LazyDataFrameCollection, concat
    tmp_lib.write("a", _frame("2024-01-01", 5))
    tmp_lib.write("b", _frame("2024-01-01", 7, off=100))
    coll = LazyDataFrameCollection([tmp_lib.read("a", lazy=True),
                                    tmp_lib.read("b", lazy=True)])
    u = concat(coll)  # reference: returns a lazy frame; collect() runs it
    assert u.collect().count() == 12


def test_output_formats(tmp_lib):
    tmp_lib.write("sym", _frame("2024-01-01", 10))
    pdf = tmp_lib.read("sym", output_format="pandas")
    assert isinstance(pdf, pd.DataFrame) and len(pdf) == 10
    arrow = tmp_lib.read("sym", output_format="arrow")
    import pyarrow as pa
    assert isinstance(arrow, pa.Table) and arrow.num_rows == 10
    with pytest.raises(Exception):
        tmp_lib.read("sym", output_format="polars")


def test_batch_variants(tmp_lib):
    tmp_lib.write_batch([("a", _frame("2024-01-01", 5)),
                         ("b", _frame("2024-01-01", 5))])
    tmp_lib.append_batch([("a", _frame("2024-01-02", 3))])
    assert tmp_lib.read("a").count() == 8
    tmp_lib.update_batch([("b", _frame("2024-01-01 02:00", 2, off=50))])
    out = tmp_lib.read("b").toPandas()
    assert sorted(out["v"])[-2:] == [50.0, 51.0]
    assert [m.metadata
            for m in tmp_lib.read_metadata_batch(["a", "b"])] \
        == [None, None]
    tmp_lib.delete_batch(["a"])
    assert tmp_lib.list_symbols() == ["b"]


def test_lazy_pickling_roundtrip(tmp_lib, spark):
    """Reference test_lazy_dataframe.py::test_lazy_pickling — a lazy read
    with clauses survives pickle before collect."""
    import pickle
    import pandas as pd
    df = pd.DataFrame({"ts": pd.date_range("2024-01-01", periods=10, freq="1h"),
                       "v": [float(i) for i in range(10)]})
    tmp_lib.write("s", df)
    lz = tmp_lib.read("s", lazy=True)
    lz = lz[lz["v"] >= 5.0]
    restored = pickle.loads(pickle.dumps(lz))
    out = restored.collect().toPandas()
    assert sorted(out["v"]) == [5.0, 6.0, 7.0, 8.0, 9.0]
    # the original still collects too
    assert lz.collect().count() == 5


def test_lazy_apply_project_chain(tmp_lib, spark):
    import pandas as pd
    df = pd.DataFrame({"ts": pd.date_range("2024-01-01", periods=4, freq="1h"),
                       "v": [1.0, 2.0, 3.0, 4.0]})
    tmp_lib.write("s", df)
    lz = tmp_lib.read("s", lazy=True)
    lz = lz.apply("dbl", lz["v"] * 2)
    out = lz.collect().toPandas()
    assert list(out["dbl"]) == [2.0, 4.0, 6.0, 8.0]


def test_collection_split(tmp_lib):
    # reference LazyDataFrameCollection.split (library.py:616): back to
    # per-symbol LazyDataFrames with their clause chains intact
    import pandas as pd
    from arcticdb_spark.lazy import LazyDataFrame
    for s in ("a", "b"):
        tmp_lib.write(s, pd.DataFrame(
            {"v": [1.0, 2.0, 3.0]},
            index=pd.date_range("2024-01-01", periods=3, name="ts")))
    coll = tmp_lib.read_batch(["a", "b"], lazy=True)
    parts = coll.split()
    assert len(parts) == 2
    assert all(isinstance(p, LazyDataFrame) for p in parts)
    outs = [p.collect() for p in parts]
    assert all(o.count() == 3 for o in outs)


def test_collect_schema(tmp_lib):
    # reference test_collect_schema.py: schema without executing — honors
    # as_of, snapshots, column selection and the clause chain
    import pandas as pd
    from pyspark.sql import types as T
    df0 = pd.DataFrame({"a": [1], "b": [1.5]},
                       index=pd.date_range("2024-01-01", periods=1, name="ts"))
    tmp_lib.write("sym", df0)
    tmp_lib.snapshot("snap")
    df1 = pd.DataFrame({"c": ["x"]},
                       index=pd.date_range("2024-01-02", periods=1, name="ts"))
    tmp_lib.write("sym", df1)

    s_latest = tmp_lib.read("sym", lazy=True).collect_schema()
    assert [f.name for f in s_latest.fields] == ["ts", "c"]
    s_v0 = tmp_lib.read("sym", as_of=0, lazy=True).collect_schema()
    assert [f.name for f in s_v0.fields] == ["ts", "a", "b"]
    assert isinstance(s_v0["a"].dataType, T.LongType)
    assert isinstance(s_v0["b"].dataType, T.DoubleType)
    s_snap = tmp_lib.read("sym", as_of="snap", lazy=True).collect_schema()
    assert [f.name for f in s_snap.fields] == ["ts", "a", "b"]
    # column selection narrows it (index force-included)
    s_cols = tmp_lib.read("sym", as_of=0, columns=["b"],
                          lazy=True).collect_schema()
    assert [f.name for f in s_cols.fields] == ["ts", "b"]
    # clause chain: a projection shows up in the schema
    ldf = tmp_lib.read("sym", as_of=0, lazy=True)
    ldf = ldf.apply("double_a", ldf["a"] * 2)
    assert "double_a" in [f.name for f in ldf.collect_schema().fields]


def test_collect_schema_with_projection_and_columns(tmp_lib):
    # reference test_collect_schema.py test_collect_schema_with_query /
    # _column_filtering: the pending clause chain and column selection
    # shape the schema without executing
    import pyarrow as pa
    import numpy as np
    tbl = pa.table({"col1": pa.array([0, 1], pa.int64()),
                    "col2": pa.array([1.5, 2.5], pa.float32()),
                    "col3": pa.array([2, 3], pa.int8())})
    tmp_lib.write("s", tbl)
    lazy = tmp_lib.read("s", lazy=True)
    lazy["new_col"] = lazy["col1"] * 2
    sch = lazy.collect_schema()
    names = [f.name for f in sch.fields]
    assert names == ["col1", "col2", "col3", "new_col"]
    types = {f.name: f.dataType.simpleString() for f in sch.fields}
    assert types["new_col"] == "bigint" and types["col2"] == "float" \
        and types["col3"] == "tinyint"
    sel = tmp_lib.read("s", columns=["col2", "col3"], lazy=True)
    assert [f.name for f in sel.collect_schema().fields] == ["col2", "col3"]


def test_collect_schema_opaque_symbols_raise(tmp_lib):
    # reference: SchemaException for pickled / recursive symbols
    import pandas as pd
    import numpy as np
    import pytest
    from arcticdb_spark.catalog import ArcticException
    tmp_lib.write_pickle("p", "blah")
    with pytest.raises(ArcticException):
        tmp_lib.read("p", lazy=True).collect_schema()
    df = pd.DataFrame({"c": np.arange(3, dtype=np.int64)})
    tmp_lib.write("r", {"a": df, "b": df}, recursive_normalizers=True)
    with pytest.raises(ArcticException):
        tmp_lib.read("r", lazy=True).collect_schema()


def test_collect_after_version_deleted_raises(tmp_lib):
    # reference test_collect_schema_and_collect_version_deleted: a lazy
    # frame whose symbol is deleted before collect raises cleanly
    import pandas as pd
    import numpy as np
    import pytest
    from arcticdb_spark.catalog import NoSuchVersionException
    tmp_lib.write("d", pd.DataFrame({"c": np.arange(3, dtype=np.int64)}))
    lazy = tmp_lib.read("d", lazy=True)
    lazy.collect_schema()
    tmp_lib.delete("d")
    with pytest.raises(NoSuchVersionException):
        lazy.collect()


def test_lazy_concat_differently_named_ts_indexes(tmp_lib):
    # reference test_symbol_concat_differently_named_timeseries: symbols
    # whose ts indexes have different names still concat; the unified
    # index lands under the engine's common physical name
    import pandas as pd
    from arcticdb_spark import concat
    df0 = pd.DataFrame({"col1": [1.0]},
                       index=pd.DatetimeIndex([pd.Timestamp(0)], name="tsA"))
    df1 = pd.DataFrame({"col1": [2.0]},
                       index=pd.DatetimeIndex([pd.Timestamp(1)], name="tsB"))
    tmp_lib.write("s0", df0)
    tmp_lib.write("s1", df1)
    out = concat(tmp_lib.read_batch(["s0", "s1"], lazy=True),
                 "outer").collect()
    pdf = out.toPandas() if hasattr(out, "toPandas") else out
    assert sorted(pdf["col1"].tolist()) == [1.0, 2.0]
    assert len(pdf) == 2


def test_lazy_concat_missing_symbol_raises_at_collect(tmp_lib):
    # reference test_symbol_concat_non_existent_symbol: lazy construction
    # is cheap; the missing symbol surfaces at collect()
    import pandas as pd
    import pytest
    from arcticdb_spark import concat
    from arcticdb_spark.catalog import NoSuchVersionException
    tmp_lib.write("s0", pd.DataFrame({"col": [0]}))
    lazy = concat(tmp_lib.read_batch(["s0", "nope"], lazy=True))
    with pytest.raises(NoSuchVersionException):
        lazy.collect()
    # deleted symbol behaves the same (no live versions)
    tmp_lib.write("gone", pd.DataFrame({"col": [0]}))
    tmp_lib.delete("gone")
    with pytest.raises(NoSuchVersionException):
        concat(tmp_lib.read_batch(["s0", "gone"], lazy=True)).collect()


def test_lazy_collect_multiple_times(tmp_lib):
    # reference test_lazy_collect_multiple_times: collect() is idempotent,
    # and a clause added BETWEEN collects applies only to later collects
    import numpy as np
    import pandas as pd
    idx = pd.DatetimeIndex(np.array([0, 1, 2, 3, 1000, 1001],
                                    dtype="datetime64[ns]"), name="ts")
    df = pd.DataFrame({"col": np.arange(6, dtype=np.int64)}, index=idx)
    tmp_lib.write("s", df)
    lazy_df = tmp_lib.read("s", lazy=True).resample("us").agg(
        {"col": ("col", "sum")})
    r0 = lazy_df.collect().toPandas().sort_values("ts").reset_index(drop=True)
    r1 = lazy_df.collect().toPandas().sort_values("ts").reset_index(drop=True)
    pd.testing.assert_frame_equal(r0, r1)
    assert r0["col"].tolist() == [6, 9]
    lazy_df["new_col"] = lazy_df["col"] * 3
    r2 = lazy_df.collect().toPandas().sort_values("ts").reset_index(drop=True)
    assert r2["new_col"].tolist() == [18, 27]
    assert "new_col" not in r0.columns


def test_lazy_collect_twice_with_date_range(tmp_lib):
    # reference test_lazy_collect_twice_with_date_range: the read kwargs
    # survive across collects
    import numpy as np
    import pandas as pd
    df = pd.DataFrame({"col1": np.arange(10, dtype=np.int64),
                       "col2": np.arange(100, 110, dtype=np.int64)},
                      index=pd.date_range("2000-01-01", periods=10,
                                          name="ts"))
    tmp_lib.write("s", df)
    dr = (pd.Timestamp("2000-01-03"), pd.Timestamp("2000-01-07"))
    lazy_df = tmp_lib.read("s", date_range=dr, lazy=True)
    expected = tmp_lib.read("s", date_range=dr, output_format="pandas")
    for _ in range(2):
        got = lazy_df.collect()
        pdf = got.toPandas().set_index("ts").sort_index()
        assert pdf["col1"].tolist() == expected["col1"].tolist()
