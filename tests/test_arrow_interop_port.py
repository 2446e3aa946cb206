"""Ported (shape) from the reference's arrow write/read interop tests
(``test_arrow_writes.py`` / ``test_arrow_pandas_interop.py``): an
arrow-written symbol reads back in every output format — arrow output
keeps exact ns timestamps, pandas output re-promotes the index column to
a named DatetimeIndex like a pandas write would (round-11 fix), and the
timestamp-unit upcasts are exact."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_arrow_write_pandas_read_promotes_index(tmp_lib):
    t = pa.table({"ts": pa.array([1, 2, 3], pa.timestamp("ns")),
                  "v": pa.array([1.0, 2.0, 3.0])})
    tmp_lib.write("a", t, index_column=True)
    back = tmp_lib.read("a", output_format="pandas")
    assert str(back.index.dtype) == "datetime64[ns]"
    assert back.index.name == "ts"
    assert back.index.asi8.tolist() == [1, 2, 3]   # exact ns
    assert back.columns.tolist() == ["v"]


def test_arrow_write_arrow_read_exact_ns(tmp_lib):
    vals = [1, 10 ** 18 + 1, 10 ** 18 + 999_999_999]
    t = pa.table({"ts": pa.array(vals, pa.timestamp("ns")),
                  "v": pa.array([1.0, 2.0, 3.0])})
    tmp_lib.write("a", t, index_column=True)
    out = tmp_lib.read("a", output_format="arrow")
    assert out.schema.field("ts").type == pa.timestamp("ns")
    assert out.column("ts").cast(pa.int64()).to_pylist() == vals


@pytest.mark.parametrize("unit", ["s", "ms", "us"])
def test_arrow_non_ns_units_upcast_exactly(tmp_lib, unit):
    # reference test_write_with_non_nanosecond_time_types
    t = pa.table({"ts": pa.array([1, 2, 3], pa.timestamp(unit)),
                  "v": pa.array([1.0, 2.0, 3.0])})
    tmp_lib.write("a", t, index_column=True)
    back = tmp_lib.read("a", output_format="pandas")
    mult = {"s": 10 ** 9, "ms": 10 ** 6, "us": 10 ** 3}[unit]
    assert back.index.asi8.tolist() == [1 * mult, 2 * mult, 3 * mult]
    assert back.index.name == "ts"


def test_arrow_nat_sentinel_reads_null(tmp_lib):
    # int64-min inside a ns timestamp is the NaT sentinel -> missing
    t = pa.table({"ts": pa.array([1, np.iinfo(np.int64).min, 3],
                                 pa.timestamp("ns")),
                  "v": pa.array([1.0, 2.0, 3.0])})
    tmp_lib.write("a", t, index_column=True, validate_index=False)
    back = tmp_lib.read("a", output_format="pandas")
    assert back.index.isna().sum() == 1


def test_arrow_write_unindexed(tmp_lib):
    # no timestamp field, index_column left False: rowcount symbol
    t = pa.table({"a": pa.array([1, 2, 3], pa.int64()),
                  "b": pa.array(["x", "y", "z"])})
    tmp_lib.write("a", t)
    back = tmp_lib.read("a", output_format="pandas")
    assert back["a"].tolist() == [1, 2, 3]
    assert back["b"].tolist() == ["x", "y", "z"]
    assert isinstance(back.index, pd.RangeIndex)
