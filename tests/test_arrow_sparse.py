"""Sparse (nullable) columns through Arrow input/output, ported from the
reference's ``test_arrow_sparse.py`` core cases: null patterns must survive
write -> row_range/date_range/filter -> arrow read for int64 / float64 /
bool / string columns, plus sparse append/update round-trips.

Spark-first: nullability is native (parquet definition levels); arrow
tables convert directly both ways, so int64-with-null stays int64 — no
dense/zero backfill anywhere.
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from arcticdb_spark.query import QueryBuilder

INT = [1, None, 2, None, 3, 4, None, None, None, None, None, 5, 6, 7, 8]
FLT = [None, 1.0, None, 2.0, None, None, None, 3.0, None, None, 4.0, None,
       None, 5.0, None]
BOO = [True, None, False, None, True, None, None, None, True, False, None,
       True, False, True, None]
STR = [None, "a", None, "b", None, "c", None, None, None, None, None, None,
       "d", "e", "f"]
N = 15


def _table():
    return pa.table({
        "ts": pa.array(pd.date_range("2024-01-01", periods=N), pa.timestamp("us")),
        "int_col": pa.array(INT, pa.int64()),
        "float_col": pa.array(FLT, pa.float64()),
        "bool_col": pa.array(BOO, pa.bool_()),
        "str_col": pa.array(STR, pa.string()),
    })


@pytest.fixture()
def sparse_lib(tmp_lib):
    tmp_lib.write("sym", _table(), index_column="ts")
    return tmp_lib


def test_sparse_arrow_roundtrip(sparse_lib):
    out = sparse_lib.read("sym", output_format="arrow")
    out = out.sort_by("ts")
    assert out.schema.field("int_col").type == pa.int64()
    assert out.column("int_col").to_pylist() == INT
    assert out.column("float_col").to_pylist() == FLT
    assert out.column("bool_col").to_pylist() == BOO
    assert out.column("str_col").to_pylist() == STR


@pytest.mark.parametrize("start,width", [(0, 5), (3, 7), (10, 5), (14, 1),
                                         (5, 0)])
def test_sparse_arrow_row_range(sparse_lib, start, width):
    out = sparse_lib.read("sym", row_range=(start, start + width),
                          output_format="arrow").sort_by("ts")
    assert out.column("int_col").to_pylist() == INT[start:start + width]
    assert out.column("str_col").to_pylist() == STR[start:start + width]


def test_sparse_arrow_date_range(sparse_lib):
    out = sparse_lib.read(
        "sym",
        date_range=(pd.Timestamp("2024-01-03"), pd.Timestamp("2024-01-08")),
        output_format="arrow").sort_by("ts")
    assert out.column("int_col").to_pylist() == INT[2:8]
    assert out.column("bool_col").to_pylist() == BOO[2:8]


def test_filter_isnull_notnull(sparse_lib):
    q = QueryBuilder()
    q = q[q["int_col"].isnull()]
    out = sparse_lib.read("sym", query_builder=q, output_format="pandas")
    assert len(out) == INT.count(None)
    q = QueryBuilder()
    q = q[q["str_col"].notnull()]
    out = sparse_lib.read("sym", query_builder=q, output_format="pandas")
    assert sorted(out["str_col"]) == sorted(s for s in STR if s is not None)


def test_filter_on_sparse_values(sparse_lib):
    q = QueryBuilder()
    q = q[q["int_col"] > 4]
    out = sparse_lib.read("sym", query_builder=q, output_format="pandas")
    assert sorted(out["int_col"]) == [5, 6, 7, 8]
    q = QueryBuilder()
    q = q[q["str_col"].isin(["a", "f", "zzz"])]
    out = sparse_lib.read("sym", query_builder=q, output_format="pandas")
    assert sorted(out["str_col"]) == ["a", "f"]


def test_filter_combined_sparse_columns(sparse_lib):
    # rows where BOTH sparse columns are present
    q = QueryBuilder()
    q = q[q["int_col"].notnull() & q["float_col"].notnull()]
    out = sparse_lib.read("sym", query_builder=q, output_format="pandas")
    exp = [i for i in range(N) if INT[i] is not None and FLT[i] is not None]
    assert len(out) == len(exp)


def test_sparse_append_roundtrip(tmp_lib):
    tmp_lib.write("sym", _table(), index_column="ts")
    app = pa.table({
        "ts": pa.array(pd.date_range("2024-02-01", periods=3),
                       pa.timestamp("us")),
        "int_col": pa.array([None, 9, None], pa.int64()),
        "float_col": pa.array([6.0, None, None], pa.float64()),
        "bool_col": pa.array([None, None, True], pa.bool_()),
        "str_col": pa.array(["g", None, None], pa.string()),
    })
    tmp_lib.append("sym", app)
    out = tmp_lib.read("sym", output_format="arrow").sort_by("ts")
    assert out.num_rows == N + 3
    assert out.column("int_col").to_pylist() == INT + [None, 9, None]
    assert out.column("str_col").to_pylist() == STR + ["g", None, None]


def test_sparse_update_roundtrip(tmp_lib):
    tmp_lib.write("sym", _table(), index_column="ts")
    upd = pa.table({
        "ts": pa.array(pd.date_range("2024-01-05", periods=2),
                       pa.timestamp("us")),
        "int_col": pa.array([None, 100], pa.int64()),
        "float_col": pa.array([50.0, None], pa.float64()),
        "bool_col": pa.array([None, False], pa.bool_()),
        "str_col": pa.array([None, "upd"], pa.string()),
    })
    tmp_lib.update("sym", upd)
    out = tmp_lib.read("sym", output_format="arrow").sort_by("ts")
    ints = out.column("int_col").to_pylist()
    assert out.num_rows == N
    assert ints[:4] == INT[:4]
    assert ints[4:6] == [None, 100]
    assert ints[6:] == INT[6:]
    assert out.column("str_col").to_pylist()[5] == "upd"


def test_arrow_read_empty_symbol(tmp_lib):
    # reference test_arrow_read.py test_read_empty / _with_columns: an
    # empty symbol reads as a 0-row arrow table with the full schema
    df = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                       "b": pd.Series([], dtype="float64")})
    tmp_lib.write("sym", df)
    t = tmp_lib.read("sym", output_format="arrow")
    assert t.num_rows == 0
    assert set(t.schema.names) >= {"a", "b"}
    t2 = tmp_lib.read("sym", columns=["b"], output_format="arrow")
    assert t2.num_rows == 0 and "b" in t2.schema.names


def test_arrow_read_column_filtering(tmp_lib):
    # reference test_column_filtering: arrow output honors the column
    # subset (plus force-included index)
    idx = pd.date_range("2024-01-01", periods=4, name="ts")
    df = pd.DataFrame({"a": [1, 2, 3, 4], "b": [1.5, 2.5, 3.5, 4.5],
                       "c": list("wxyz")}, index=idx)
    tmp_lib.write("sym", df)
    t = tmp_lib.read("sym", columns=["c"], output_format="arrow")
    assert set(t.schema.names) == {"ts", "c"}
    assert t.sort_by("ts").column("c").to_pylist() == list("wxyz")


def test_arrow_read_strings_with_missing(tmp_lib):
    # reference test_strings_with_nones_and_nans (NaN ≡ missing here)
    df = pd.DataFrame({"s": ["a", None, "c", None]})
    tmp_lib.write("sym", df)
    t = tmp_lib.read("sym", output_format="arrow")
    vals = t.column("s").to_pylist()
    assert sorted(v for v in vals if v is not None) == ["a", "c"]
    assert vals.count(None) == 2


def test_arrow_write_index_column_true(tmp_lib):
    """Reference Arrow contract (test_arrow_writes.py, library.py
    ``index_column: bool``): True designates the FIRST column as the
    timeseries index — date_range reads prune on it."""
    import pandas as pd
    import pyarrow as pa
    t = pa.table({
        "ts": pa.Array.from_pandas(pd.date_range("2025-01-01", periods=4),
                                   type=pa.timestamp("ns")),
        "col0": pa.array([0, 1, 2, 3], pa.int64()),
    })
    tmp_lib.write("s", t, index_column=True)
    assert tmp_lib.read("s").count() == 4
    got = tmp_lib.read("s", date_range=(pd.Timestamp("2025-01-02"),
                                        pd.Timestamp("2025-01-03")))
    assert got.count() == 2
    # staged arrow chunks with index_column=True finalize onto the index
    t2 = pa.table({
        "ts": pa.Array.from_pandas(pd.date_range("2025-02-01", periods=2),
                                   type=pa.timestamp("ns")),
        "col0": pa.array([7, 8], pa.int64()),
    })
    tmp_lib.stage("u", t2, index_column=True)
    tmp_lib.sort_and_finalize_staged_data("u")
    assert tmp_lib.read("u").count() == 2
    assert tmp_lib.get_info("u")["sorted"] == "ASCENDING"
