"""Ported from the reference's
``python/tests/unit/arcticdb/test_append_and_defrag.py``: the
exponential-defrag idempotent appender — ladder generation, rewrite-point
selection, the documented slice-structure walk, and idempotency."""
import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.catalog import Arctic
from arcticdb_spark.operators.append_defrag import (
    append_and_defrag_idempotent, generate_date_to_read_from,
    generate_levels)


def test_generate_levels():
    assert generate_levels(64, 2) == [64, 32, 16, 8, 4, 2]
    assert generate_levels(64, 4) == [64, 16, 4]
    assert generate_levels(5_000, 2) == [5_000, 2_500, 1_250, 625, 312,
                                         156, 78, 39, 19, 9, 4, 2]
    assert generate_levels(5_000, 10) == [5_000, 500, 50, 5]
    assert generate_levels(5_000, 5) == [5_000, 1_000, 200, 40, 8]


def test_generate_date_to_read_from():
    t1, t2 = pd.Timestamp("2025-01-01"), pd.Timestamp("2025-01-02")
    f = generate_date_to_read_from
    assert f([t1], [0], [99], 1, [100], 1) == t1
    assert f([t1], [0], [99], 1, [1000, 100], 1) == t1
    assert f([t1, t2], [0, 50], [50, 99], 1, [100], 1) == t1
    assert f([t1, t2], [0, 50], [50, 99], 1, [1000, 100], 1) == t1
    assert f([t1], [0], [99], 99, [100], 1) == t1
    assert f([t1], [0], [100], 1, [100], 1) is None
    assert f([t1, t2], [0, 100], [100, 109], 1, [100, 10], 1) == t2
    assert f([t1, t2], [0, 100], [100, 109], 42, [100, 50, 10], 1) == t2


@pytest.fixture()
def defrag_lib(spark, tmp_path):
    # reference example: rows_per_segment=64, factor=4 -> ladder [64,16,4]
    return Arctic(str(tmp_path), spark).create_library(
        "defrag", rows_per_file=64)


def _slices(lib, sym):
    idx = lib.read_index(sym)
    return [(int(s), int(e)) for s, e in zip(idx["start_row"],
                                             idx["end_row"])]


def test_basic_flow_single_symbol(defrag_lib):
    """The docstring walk from the reference utility: appending 4 rows at
    a time with factor=4 produces the documented slice ladder, ending in
    ONE 0-64 slice at iteration 14."""
    lib = defrag_lib
    sym, factor, rows = "test", 4, 4
    ts = pd.Timestamp("2026-01-01")
    df = pd.DataFrame({"col": np.arange(rows)}, index=rows * [ts])
    append_and_defrag_idempotent(lib, [(sym, df)], factor)
    assert _slices(lib, sym) == [(0, 4)]
    # idempotent: same data again is a no-op (no new version)
    v_before = lib.read_metadata(sym).version
    append_and_defrag_idempotent(lib, [(sym, df)], factor)
    assert lib.read_metadata(sym).version == v_before

    expected_walk = [
        [(0, 4), (4, 8)],
        [(0, 4), (4, 8), (8, 12)],
        [(0, 16)],
        [(0, 16), (16, 20)],
        [(0, 16), (16, 20), (20, 24)],
        [(0, 16), (16, 20), (20, 24), (24, 28)],
        [(0, 16), (16, 32)],
        [(0, 16), (16, 32), (32, 36)],
        [(0, 16), (16, 32), (32, 36), (36, 40)],
        [(0, 16), (16, 32), (32, 36), (36, 40), (40, 44)],
        [(0, 16), (16, 32), (32, 48)],
        [(0, 16), (16, 32), (32, 48), (48, 52)],
        [(0, 16), (16, 32), (32, 48), (48, 52), (52, 56)],
        [(0, 16), (16, 32), (32, 48), (48, 52), (52, 56), (56, 60)],
        [(0, 64)],
    ]
    for i, expected in enumerate(expected_walk):
        ts += pd.Timedelta(1, unit="days")
        df = pd.DataFrame({"col": np.arange(rows)}, index=rows * [ts])
        append_and_defrag_idempotent(lib, [(sym, df)], factor)
        assert _slices(lib, sym) == expected, f"iteration {i}"
    # data integrity after all the splicing
    out = lib.read(sym, output_format="pandas")
    assert len(out) == 64
    assert out["col"].tolist() == list(np.tile(np.arange(rows), 16))


def test_multi_symbol(defrag_lib):
    lib = defrag_lib
    ts = pd.Timestamp("2026-01-01")
    items = [(f"s{i}", pd.DataFrame({"col": [i, i]}, index=2 * [ts]))
             for i in range(3)]
    append_and_defrag_idempotent(lib, items, factor=4)
    assert sorted(lib.list_symbols()) == ["s0", "s1", "s2"]
    for i in range(3):
        assert lib.get_num_rows(f"s{i}") == 2


def test_bad_args(defrag_lib):
    from arcticdb_spark.exceptions import ArcticException
    df = pd.DataFrame({"col": [1]}, index=[pd.Timestamp("2026-01-01")])
    with pytest.raises(ArcticException):
        append_and_defrag_idempotent(defrag_lib, [("s", df)], factor=1)
    with pytest.raises(ArcticException):
        append_and_defrag_idempotent(defrag_lib, [("s", df)], factor=2,
                                     threshold=0)


# --- defrag_timeseries (reference util/defrag_timeseries.py) ---

def _generic_defrag_test(lib, sym):
    rows_per_slice = lib.rows_per_file
    expected = lib.read(sym, output_format="pandas")
    total_rows = len(expected)
    from arcticdb_spark.operators.append_defrag import defrag_timeseries
    defrag_timeseries(lib, sym)
    out = lib.read(sym, output_format="pandas")
    pd.testing.assert_frame_equal(expected, out, check_freq=False)
    num_segments = len(lib.read_index(sym))
    assert num_segments == ((total_rows // rows_per_slice)
                            + (1 if total_rows % rows_per_slice else 0))


def test_defrag_timeseries_basic(defrag_lib):
    lib, sym = defrag_lib, "basic"
    lib.write(sym, pd.DataFrame({"col": [0, 1]},
                                index=pd.date_range("2025-01-01", periods=2)))
    lib.append(sym, pd.DataFrame({"col": [2, 3]},
                                 index=pd.date_range("2025-01-03", periods=2)))
    _generic_defrag_test(lib, sym)


def test_defrag_timeseries_partially_compacted(spark, tmp_path):
    import random
    lib = Arctic(str(tmp_path), spark).create_library("d", rows_per_file=10)
    sym = "partial"
    index_0 = pd.date_range("2025-01-01", periods=37)
    lib.write(sym, pd.DataFrame(
        {"col0": np.arange(37, dtype=np.int64)}, index=index_0))
    start = index_0[-1] + pd.Timedelta(days=1)
    rng = random.Random(7)
    for _ in range(10):
        n = rng.randint(1, 4)
        lib.append(sym, pd.DataFrame(
            {"col0": np.arange(n, dtype=np.int64)},
            index=pd.date_range(start, periods=n)))
        start += pd.Timedelta(days=n)
    _generic_defrag_test(lib, sym)
    # fully-compacted leading slices were never rewritten (still version 0
    # files): the defrag touched only the tail
    idx = lib.read_index(sym)
    assert (idx["end_row"] - idx["start_row"]).iloc[:3].tolist() == [10, 10, 10]


@pytest.mark.parametrize("num_rows", [37, 40])
def test_defrag_timeseries_no_op(spark, tmp_path, num_rows):
    lib = Arctic(str(tmp_path), spark).create_library("d", rows_per_file=10)
    sym = "noop"
    lib.write(sym, pd.DataFrame(
        {"col0": np.arange(num_rows, dtype=np.int64)},
        index=pd.date_range("2025-01-01", periods=num_rows)))
    _generic_defrag_test(lib, sym)
    assert lib.read_metadata(sym).version == 0  # no new version
