"""Ported from the reference's
``python/tests/unit/arcticdb/version_store/test_api.py``: column_names
by version/snapshot/timestamp, get_num_rows (incl. pickled None)."""
import time

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.catalog import NoSuchVersionException


def _one_col():
    return pd.DataFrame({"x": np.arange(10, dtype="int64")})


def _two_col():
    return pd.DataFrame({"x": np.arange(10, dtype="int64"),
                         "y": np.arange(10, dtype="int64")})


def test_read_descriptor(tmp_lib):
    tmp_lib.write("s", _one_col())
    assert tmp_lib.column_names("s") == ["x"]


def test_column_names_by_version(tmp_lib):
    v0 = tmp_lib.write("s", _one_col()).version
    tmp_lib.write("s", _two_col())
    assert tmp_lib.column_names("s", as_of=v0) == ["x"]
    assert tmp_lib.column_names("s") == ["x", "y"]


def test_column_names_by_snapshot(tmp_lib):
    tmp_lib.write("s", _one_col())
    tmp_lib.snapshot("one_col_snap")
    tmp_lib.write("s", _two_col())
    tmp_lib.snapshot("two_col_snap")
    assert tmp_lib.column_names("s", as_of="one_col_snap") == ["x"]
    assert tmp_lib.column_names("s", as_of="two_col_snap") == ["x", "y"]


def test_column_names_by_timestamp(tmp_lib):
    # reference test is xfail (#496); our timestamp resolution supports it
    tmp_lib.write("s", _one_col())
    t_after_first = pd.Timestamp.utcnow().tz_localize(None)
    time.sleep(0.05)
    tmp_lib.write("s", _two_col())
    with pytest.raises(NoSuchVersionException):
        tmp_lib.column_names("s", as_of=pd.Timestamp("1970-01-01"))
    assert tmp_lib.column_names("s", as_of=t_after_first) == ["x"]
    assert tmp_lib.column_names(
        "s", as_of=pd.Timestamp.utcnow().tz_localize(None)) == ["x", "y"]


def test_get_num_rows(tmp_lib):
    df = _two_col()
    tmp_lib.write("s", df)
    assert tmp_lib.get_num_rows("s") == df.shape[0]


def test_get_num_rows_pickled(tmp_lib):
    tmp_lib.write_pickle("s", 1)
    assert tmp_lib.get_num_rows("s") is None


def test_finalize_staged_data_mode_none_is_write(tmp_lib):
    # reference test_api.py test_finalize_staged_data: mode=None -> WRITE
    tmp_lib.write("s", _one_col())
    tmp_lib.stage("s", _two_col())
    tmp_lib.finalize_staged_data("s", None)
    assert tmp_lib.column_names("s") == ["x", "y"]
    assert tmp_lib.get_num_rows("s") == 10


@pytest.mark.parametrize("input_mode", ["something", 3])
def test_finalize_staged_data_incorrect_args(tmp_lib, input_mode):
    from arcticdb_spark.catalog import ArcticInvalidApiUsageException
    tmp_lib.write("s", _one_col())
    tmp_lib.stage("s", _two_col())
    with pytest.raises(ArcticInvalidApiUsageException):
        tmp_lib.finalize_staged_data("s", input_mode)
