"""v1 NativeVersionStore batch/utility surface (reference _store.py):
batch_read (dict result), batch_read_metadata (missing keys absent),
batch_write/batch_append (positional vectors, write_if_missing),
batch_write_metadata, batch_delete_symbols/versions,
get_timerange_for_symbol, compact_incomplete (finalize alias).
Ported behaviors: test_basic_version_store.py test_batch_operations /
test_batch_write / test_batch_read_metadata_missing_keys /
test_delete_read_from_timestamp (dict access), test_deletion.py
delete-versions list forms."""

import tempfile

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.catalog import (Arctic, ArcticException, DataError,
                                    NoSuchVersionException)


@pytest.fixture()
def lib(spark):
    return Arctic(tempfile.mkdtemp(), spark).create_library("v1b")


def _frame(v):
    return pd.DataFrame({"x": [v, v + 1]})


def test_batch_read_dict(lib):
    lib.write("a", _frame(1))
    lib.write("a", _frame(10))
    lib.write("b", _frame(2))
    out = lib.batch_read(["a", "b"], as_ofs=[0, None])
    assert set(out) == {"a", "b"}
    assert out["a"].data["x"].tolist() == [1, 2]
    assert out["a"].version == 0
    assert out["b"].data["x"].tolist() == [2, 3]
    with pytest.raises(ArcticException):
        lib.batch_read(["a", "a"])


def test_batch_read_metadata_missing_absent(lib):
    lib.write("a", _frame(1), metadata={"m": 1})
    out = lib.batch_read_metadata(["a", "ghost"])
    assert set(out) == {"a"}
    assert out["a"].metadata == {"m": 1}
    # missing VERSION also absent
    out = lib.batch_read_metadata(["a", "a"], as_ofs=[0, 9])
    assert list(out) == ["a"]


def test_batch_write_and_append_vectors(lib):
    ms = lib.batch_write(["a", "b"], [_frame(1), _frame(2)],
                         metadata_vector=[{"k": 1}, None])
    assert [m.version for m in ms] == [0, 0]
    assert lib.read_metadata("a").metadata == {"k": 1}

    ms = lib.batch_append(["a", "c"], [_frame(3), _frame(4)])
    assert not any(isinstance(m, DataError) for m in ms)
    assert lib.read("c", output_format="pandas")["x"].tolist() == [4, 5]

    ms = lib.batch_append(["d"], [_frame(9)], write_if_missing=False)
    assert isinstance(ms[0], DataError)


def test_batch_write_metadata_and_deletes(lib):
    lib.batch_write(["a", "b"], [_frame(1), _frame(2)])
    ms = lib.batch_write_metadata(["a", "b"], [{"v": 1}, {"v": 2}])
    assert [m.metadata for m in ms] == [{"v": 1}, {"v": 2}]

    lib.write("a", _frame(5))
    res = lib.batch_delete_versions(["a"], [[0, 1]])
    assert res == [None]
    assert [v["version"] for v in lib.list_versions("a")] == [2]

    res = lib.batch_delete_symbols(["a", "b"])
    assert res == [None, None]
    assert lib.list_symbols() == []


def test_get_timerange_for_symbol(lib):
    idx = pd.date_range("2024-01-01", periods=5)
    lib.write("t", pd.DataFrame({"a": range(5)}, index=idx))
    lo, hi = lib.get_timerange_for_symbol("t")
    assert lo == idx[0] and hi == idx[-1]


def test_compact_incomplete_alias(lib):
    idx = pd.date_range("2024-01-01", periods=4)
    pdf = pd.DataFrame({"a": [1.0, 2.0, 3.0, 4.0]}, index=idx)
    lib.stage("s", pdf.iloc[:2])
    lib.stage("s", pdf.iloc[2:])
    m = lib.compact_incomplete("s", append=False,
                               convert_int_to_float=False,
                               metadata={"done": True})
    assert m.version == 0
    out = lib.read("s", output_format="pandas")
    assert out["a"].tolist() == [1.0, 2.0, 3.0, 4.0]
    assert lib.read_metadata("s").metadata == {"done": True}


def test_data_error_carries_reference_enums(lib):
    """Reference DataError contract (test_arctic_batch.py style): the
    error_code/error_category enums compare against the reference's."""
    from arcticdb_spark.exceptions import ErrorCategory, ErrorCode
    out = lib.read_batch(["ghost"])
    assert isinstance(out[0], DataError)
    assert out[0].error_code == ErrorCode.E_NO_SUCH_VERSION
    assert out[0].error_category == ErrorCategory.MISSING_DATA
    assert out[0].symbol == "ghost"


def test_read_metadata_batch_data_errors(lib):
    """Reference test_arctic_batch.py:222-264: per-item DataError with
    version_request_type/data and the reference error enums."""
    from arcticdb_spark import ReadInfoRequest, VersionRequestType
    from arcticdb_spark.exceptions import ErrorCategory, ErrorCode
    lib.write("s1", _frame(1), metadata={"meta1": 0})

    batch = lib.read_metadata_batch(["s1", "s2"])
    assert not isinstance(batch[0], DataError)
    assert batch[0].metadata == {"meta1": 0}
    assert isinstance(batch[1], DataError)
    assert batch[1].symbol == "s2"
    assert batch[1].version_request_type == VersionRequestType.LATEST
    assert batch[1].version_request_data is None
    assert batch[1].error_code == ErrorCode.E_NO_SUCH_VERSION
    assert batch[1].error_category == ErrorCategory.MISSING_DATA

    batch = lib.read_metadata_batch([ReadInfoRequest("s1", as_of=0),
                                     ReadInfoRequest("s1", as_of=1)])
    assert not isinstance(batch[0], DataError)
    assert isinstance(batch[1], DataError)
    assert batch[1].version_request_type == VersionRequestType.SPECIFIC
    assert batch[1].version_request_data == 1
    assert batch[1].error_code == ErrorCode.E_NO_SUCH_VERSION
