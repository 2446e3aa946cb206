"""Ported from the reference's
``python/tests/unit/arcticdb/version_store/test_deletion_batch.py``:
batch_delete_versions semantics — per-symbol version lists, snapshot
pins surviving the batch, input validation (UserInputException /
ValueError / TypeError BEFORE any delete), DataError entries with
E_NO_SUCH_VERSION / MISSING_DATA for per-symbol failures, tombstone
behavior, and batch_delete_symbols."""
import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.catalog import NoSuchVersionException, UserInputException
from arcticdb_spark.exceptions import ErrorCategory, ErrorCode


def _df(tag):
    return pd.DataFrame({tag: np.arange(10, dtype="int64")})


def _write3(lib, symbols):
    for sym in symbols:
        lib.write(sym, _df("x"))
        lib.write(sym, _df("y"))
        lib.write(sym, _df("z"))


def test_batch_delete_versions_basic(tmp_lib):
    symbols = ["sym1", "sym2", "sym3"]
    _write3(tmp_lib, symbols)
    for sym in symbols:
        assert len(tmp_lib.list_versions(sym)) == 3
    res = tmp_lib.batch_delete_versions(symbols, [[0, 1]] * 3)
    assert res == [None, None, None]
    for sym in symbols:
        assert len(tmp_lib.list_versions(sym)) == 1
        out = tmp_lib.read(sym, output_format="pandas")
        pd.testing.assert_frame_equal(out, _df("z"))
        for version in (0, 1):
            with pytest.raises(NoSuchVersionException):
                tmp_lib.read(sym, as_of=version)


def test_batch_delete_versions_with_snapshots(tmp_lib):
    symbols = ["sym1", "sym2"]
    for sym in symbols:
        tmp_lib.write(sym, _df("x"))
        tmp_lib.snapshot(f"{sym}_snap1")
        tmp_lib.write(sym, _df("y"))
        tmp_lib.snapshot(f"{sym}_snap2")
        tmp_lib.write(sym, _df("z"))
    res = tmp_lib.batch_delete_versions(symbols, [[0, 1], [0, 1]])
    assert len(res) == 2
    for sym in symbols:
        # pinned versions stay readable by snapshot AND by number
        pd.testing.assert_frame_equal(
            tmp_lib.read(sym, as_of=f"{sym}_snap1",
                         output_format="pandas"), _df("x"))
        pd.testing.assert_frame_equal(
            tmp_lib.read(sym, as_of=f"{sym}_snap2",
                         output_format="pandas"), _df("y"))
        pd.testing.assert_frame_equal(
            tmp_lib.read(sym, as_of=0, output_format="pandas"), _df("x"))
        pd.testing.assert_frame_equal(
            tmp_lib.read(sym, as_of=1, output_format="pandas"), _df("y"))
        pd.testing.assert_frame_equal(
            tmp_lib.read(sym, output_format="pandas"), _df("z"))


def test_batch_delete_versions_partial_symbols(tmp_lib):
    symbols = ["sym1", "sym2", "sym3", "sym4"]
    _write3(tmp_lib, symbols)
    to_delete = ["sym1", "sym3"]
    results = tmp_lib.batch_delete_versions(to_delete, [[0, 1], [0, 1]])
    assert results == [None, None]
    for sym in to_delete:
        assert len(tmp_lib.list_versions(sym)) == 1
        for version in (0, 1):
            with pytest.raises(NoSuchVersionException):
                tmp_lib.read(sym, as_of=version)
    # re-deleting already-tombstoned versions yields DataError entries
    results = tmp_lib.batch_delete_versions(to_delete, [[0, 1], [0, 1]])
    assert len(results) == 2
    assert results[0].symbol == "sym1"
    assert results[1].symbol == "sym3"
    for sym in ("sym2", "sym4"):
        assert len(tmp_lib.list_versions(sym)) == 3
        pd.testing.assert_frame_equal(
            tmp_lib.read(sym, as_of=0, output_format="pandas"), _df("x"))


def test_batch_delete_versions_empty_input(tmp_lib):
    symbols = ["sym1", "sym2"]
    for sym in symbols:
        tmp_lib.write(sym, _df("x"))
        tmp_lib.write(sym, _df("y"))
    tmp_lib.batch_delete_versions([], [])  # no-op
    assert len(tmp_lib.list_symbols()) == 2
    with pytest.raises(ValueError):
        tmp_lib.batch_delete_versions(symbols, [[], []])
    # nothing was deleted by the failed call
    for sym in symbols:
        assert len(tmp_lib.list_versions(sym)) == 2


def test_batch_delete_versions_invalid_input(tmp_lib):
    tmp_lib.write("sym1", _df("x"))
    tmp_lib.write("sym2", _df("x"))
    res = tmp_lib.batch_delete_versions(["non_existent"], [[0]])
    assert len(res) == 1
    assert res[0].symbol == "non_existent"
    assert res[0].error_code == ErrorCode.E_NO_SUCH_VERSION
    assert res[0].error_category == ErrorCategory.MISSING_DATA
    assert "version 0" in res[0].exception_string

    res = tmp_lib.batch_delete_versions(["sym1", "sym2"], [[1], [0]])
    assert len(res) == 2
    assert res[0].symbol == "sym1"
    assert res[0].error_code == ErrorCode.E_NO_SUCH_VERSION
    assert "version 1" in res[0].exception_string
    assert res[1] is None
    # sym1 untouched; sym2's only version deleted -> symbol gone
    pd.testing.assert_frame_equal(
        tmp_lib.read("sym1", output_format="pandas"), _df("x"))
    assert len(tmp_lib.list_versions("sym1")) == 1
    assert len(tmp_lib.list_versions("sym2")) == 0
    assert tmp_lib.list_symbols() == ["sym1"]

    with pytest.raises(TypeError):
        tmp_lib.batch_delete_versions(["sym1", "sym2"], [[-1], [0]])
    with pytest.raises(TypeError):
        tmp_lib.batch_delete_versions([None, "sym2"], [[0], [0]])
    with pytest.raises(TypeError):
        tmp_lib.batch_delete_versions(["sym2"], [[None]])
    with pytest.raises(UserInputException):
        tmp_lib.batch_delete_versions([], [[0]])


def test_batch_delete_versions_with_tombstones(tmp_lib):
    symbols = ["sym1", "sym2"]
    _write3(tmp_lib, symbols)
    tmp_lib.batch_delete_versions(symbols, [[0, 1], [0, 1]])
    for sym in symbols:
        assert len(tmp_lib.list_versions(sym)) == 1
        for version in (0, 1):
            with pytest.raises(NoSuchVersionException):
                tmp_lib.read(sym, as_of=version)
        pd.testing.assert_frame_equal(
            tmp_lib.read(sym, output_format="pandas"), _df("z"))


def test_batch_delete_symbols(tmp_lib):
    symbols = ["sym1", "sym2", "sym3"]
    for sym in symbols:
        tmp_lib.write(sym, _df("x"))
    res = tmp_lib.batch_delete_symbols(symbols)
    assert res == [None, None, None]
    assert tmp_lib.list_symbols() == []
