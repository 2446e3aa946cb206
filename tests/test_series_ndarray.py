"""Series and ndarray normalization ported from the reference's
``_normalization.py`` SeriesNormalizer / NdArrayNormalizer behavior
(pinned by test_write.py test_write_numpy_array, test_append.py
test_append_numpy_array, and the Series round-trip tests).
"""
import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.catalog import ArcticException


def test_series_roundtrip_named(tmp_lib):
    s = pd.Series([1.0, 2.0, 3.0], name="prices",
                  index=pd.date_range("2024-01-01", periods=3, name="ts"))
    tmp_lib.write("s", s)
    out = tmp_lib.read("s", output_format="pandas")
    assert isinstance(out, pd.Series)
    assert out.name == "prices"
    assert out.sort_index().tolist() == [1.0, 2.0, 3.0]
    assert out.index.name == "ts"
    # not pickled — it's a real columnar symbol
    assert not tmp_lib.is_symbol_pickled("s")
    assert not tmp_lib.will_item_be_pickled(s)


def test_series_roundtrip_unnamed(tmp_lib):
    s = pd.Series(["a", "b", "c"])
    tmp_lib.write("s", s)
    out = tmp_lib.read("s", output_format="pandas")
    assert isinstance(out, pd.Series)
    assert out.name is None
    assert sorted(out.tolist()) == ["a", "b", "c"]


def test_series_append(tmp_lib):
    s1 = pd.Series([1.0, 2.0], name="v",
                   index=pd.date_range("2024-01-01", periods=2, name="ts"))
    s2 = pd.Series([3.0, 4.0], name="v",
                   index=pd.date_range("2024-02-01", periods=2, name="ts"))
    tmp_lib.write("s", s1)
    tmp_lib.append("s", s2)
    out = tmp_lib.read("s", output_format="pandas")
    assert isinstance(out, pd.Series)
    assert out.sort_index().tolist() == [1.0, 2.0, 3.0, 4.0]


def test_ndarray_roundtrip_1d(tmp_lib):
    arr = np.arange(1000, dtype=np.int64)
    tmp_lib.write("a", arr)
    out = tmp_lib.read("a", output_format="pandas")
    assert isinstance(out, np.ndarray)
    assert out.dtype == np.int64
    assert np.array_equal(out, arr)
    assert not tmp_lib.will_item_be_pickled(arr)


def test_ndarray_roundtrip_2d(tmp_lib):
    arr = np.arange(60, dtype=np.float64).reshape(12, 5)
    tmp_lib.write("a", arr)
    out = tmp_lib.read("a", output_format="pandas")
    assert out.shape == (12, 5)
    assert np.array_equal(out, arr)


def test_ndarray_append(tmp_lib):
    # reference test_append_numpy_array
    tmp_lib.write("a", np.arange(10, dtype=np.float64))
    tmp_lib.append("a", np.arange(10, 24, dtype=np.float64))
    out = tmp_lib.read("a", output_format="pandas")
    assert np.array_equal(out, np.arange(24, dtype=np.float64))
    # 2d: trailing dims must match
    tmp_lib.write("b", np.zeros((3, 4)))
    tmp_lib.append("b", np.ones((2, 4)))
    out = tmp_lib.read("b", output_format="pandas")
    assert out.shape == (5, 4) and out[3:].sum() == 8
    with pytest.raises(ArcticException):
        tmp_lib.append("b", np.ones((2, 3)))
    with pytest.raises(ArcticException):
        tmp_lib.append("b", np.ones((2, 4), dtype=np.int64))


def test_ndarray_rejects_queries(tmp_lib):
    from arcticdb_spark.query import QueryBuilder
    tmp_lib.write("a", np.arange(10))
    with pytest.raises(ArcticException):
        tmp_lib.read("a", row_range=(0, 3))
    q = QueryBuilder()
    with pytest.raises(ArcticException):
        tmp_lib.read("a", query_builder=q[q["ndarray"] > 3])


def test_series_in_recursive_structure(tmp_lib):
    payload = {"frame": pd.DataFrame({"x": [1, 2]}),
               "series": pd.Series([5.0], name="s"),
               "arr": np.arange(4)}
    tmp_lib.write("rec", payload, recursive_normalizers=True)
    out = tmp_lib.read("rec", output_format="pandas")
    assert isinstance(out["series"], pd.Series)
    assert np.array_equal(out["arr"], np.arange(4))
    assert out["frame"]["x"].tolist() == [1, 2]


def test_arrow_table_write_roundtrip(tmp_lib):
    # reference test_arrow_writes.py test_basic_write / _strings / _with_index
    import pyarrow as pa
    tbl = pa.table({
        "ts": pa.array(pd.date_range("2024-01-01", periods=4)),
        "v": pa.array([1.5, 2.5, 3.5, 4.5]),
        "s": pa.array(["a", "b", None, "d"])})
    tmp_lib.write("t", tbl, index_column="ts")
    out = tmp_lib.read("t", output_format="arrow")
    assert out.num_rows == 4
    assert set(out.column_names) == {"ts", "v", "s"}
    pdf = tmp_lib.read("t", output_format="pandas").sort_values("ts")
    assert pdf["v"].tolist() == [1.5, 2.5, 3.5, 4.5]
    # date_range works because ts was declared as the index column
    got = tmp_lib.read("t", date_range=(pd.Timestamp("2024-01-02"),
                                        pd.Timestamp("2024-01-03")))
    assert got.count() == 2


def test_arrow_record_batch_and_zero_rows(tmp_lib):
    import pyarrow as pa
    rb = pa.record_batch({"x": pa.array([1, 2, 3], type=pa.int64())})
    tmp_lib.write("rb", rb)
    assert tmp_lib.read("rb").count() == 3
    # zero-row table keeps its schema (reference test_write_zero_row_table)
    empty = pa.table({"x": pa.array([], type=pa.int64()),
                      "y": pa.array([], type=pa.string())})
    tmp_lib.write("z", empty)
    out = tmp_lib.read("z")
    assert out.count() == 0
    assert set(out.columns) == {"x", "y"}


def test_non_string_column_names(tmp_lib):
    # reference _check_valid_name (_normalization.py:511): column names
    # must be str or int — int names round-trip as ints, bool raises
    # (bool is a subclass of int, checked explicitly; pinned upstream by
    # test_write.py test_write_bool_named_columns), float/tuple raise.
    from arcticdb_spark.catalog import ArcticException
    df = pd.DataFrame({1: [1, 2], 7: [5.0, 6.0]})
    tmp_lib.write("b", df)
    out = tmp_lib.read("b", output_format="pandas")
    assert list(out.columns) == [1, 7]
    assert out[1].tolist() == [1, 2]
    # spark output keeps the stringified physical names
    assert set(tmp_lib.read("b").columns) == {"1", "7"}
    for bad in ({True: [1, 2]}, {2.5: [1, 2]}, {("a", "b"): [1, 2]}):
        with pytest.raises(ArcticException, match="str or int"):
            tmp_lib.write("bad", pd.DataFrame(bad))
    assert not tmp_lib.has_symbol("bad")
    # duplicate names round-trip in static schema (round 10, reference
    # test_normalization.py test_same_columns_names)
    dup = pd.DataFrame([[1, 2]], columns=["x", "x"])
    tmp_lib.write("d", dup)
    out = tmp_lib.read("d", output_format="pandas")
    assert list(out.columns) == ["x", "x"]
    assert out.values.tolist() == [[1, 2]]


def test_mixed_type_object_column_rejected(tmp_lib):
    # reference test_string.py test_mixed_types_errors: str+int object
    # columns raise instead of silently stringifying
    from arcticdb_spark.catalog import ArcticException
    with pytest.raises(ArcticException, match="mixes strings"):
        tmp_lib.write("m", pd.DataFrame({"col": ["a", 1, 2.5]}))
    # pure-string object columns (with missing) still work
    tmp_lib.write("s", pd.DataFrame({"col": ["a", None, "c"]}))
    assert tmp_lib.read("s").count() == 3
    # numeric object columns coerce numerically, not to strings
    tmp_lib.write("n", pd.DataFrame({"col": pd.Series([1, 2.5], dtype=object)}))
    out = tmp_lib.read("n", output_format="pandas")
    assert out["col"].tolist() == [1.0, 2.5]


def test_ndarray_append_prunes_and_empty(tmp_lib):
    # advisor round-4: prune_previous_versions was silently ignored on the
    # ndarray append path, and an empty-array append crashed on zero-row
    # schema inference
    arr = np.arange(6, dtype=np.int64)
    tmp_lib.write("a", arr)
    tmp_lib.append("a", np.arange(6, 10, dtype=np.int64),
                   prune_previous_versions=True)
    vers = [v["version"] for v in tmp_lib.list_versions("a")]
    assert vers == [1]
    out = tmp_lib.read("a", output_format="pandas")
    assert out.tolist() == list(range(10))
    # empty append: no-op rows, still a new version, shape unchanged on axis0
    tmp_lib.append("a", np.array([], dtype=np.int64))
    out2 = tmp_lib.read("a", output_format="pandas")
    assert out2.tolist() == list(range(10))


def test_read_incomplete_rejects_unsupported_params(tmp_lib):
    # advisor round-4: read(incomplete=True) silently dropped row_range /
    # with_row_ids / lazy — now an explicit error
    df = pd.DataFrame({"v": [1.0, 2.0]},
                      index=pd.date_range("2024-01-01", periods=2, name="ts"))
    tmp_lib.write("s", df)
    with pytest.raises(ArcticException, match="incomplete"):
        tmp_lib.read("s", row_range=(0, 1), incomplete=True)
    with pytest.raises(ArcticException, match="incomplete"):
        tmp_lib.read("s", with_row_ids=True, incomplete=True)
    with pytest.raises(ArcticException, match="incomplete"):
        tmp_lib.read("s", lazy=True, incomplete=True)


def test_list_versions_snapshot_row_schema(tmp_lib):
    # advisor round-4: the snapshot branch omitted 'date'/'rows' keys
    df = pd.DataFrame({"v": [1.0, 2.0, 3.0]},
                      index=pd.date_range("2024-01-01", periods=3, name="ts"))
    tmp_lib.write("s", df)
    tmp_lib.snapshot("snap1")
    rows = tmp_lib.list_versions(snapshot="snap1")
    assert len(rows) == 1
    r = rows[0]
    assert set(r) == {"symbol", "version", "date", "rows", "snapshots",
                      "deleted"}
    assert r["rows"] == 3 and r["snapshots"] == ["snap1"]


def test_series_append_different_name_throws(tmp_lib):
    # reference test_append.py
    # test_append_series_with_different_column_name_throws
    from arcticdb_spark.catalog import SchemaException
    s1 = pd.Series([1.0, 2.0], name="name_1",
                   index=pd.date_range("2024-01-01", periods=2, name="ts"))
    s2 = pd.Series([3.0, 4.0], name="name_2",
                   index=pd.date_range("2024-02-01", periods=2, name="ts"))
    tmp_lib.write("s", s1)
    with pytest.raises(SchemaException, match="name_1"):
        tmp_lib.append("s", s2)
    # same-name append still fine
    tmp_lib.append("s", s2.rename("name_1"))
    out = tmp_lib.read("s", output_format="pandas")
    assert out.tolist() == [1.0, 2.0, 3.0, 4.0]
