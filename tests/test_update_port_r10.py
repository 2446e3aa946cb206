"""Round-10 ports from the reference's
``python/tests/unit/arcticdb/version_store/test_update.py``: update with
snapshot pins through delete (incl. the exact list_versions row shape),
update with a date_range wider than both frames, update whose range
exactly equals / fully contains the stored data, and update of a pickled
symbol raising."""
import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.catalog import ArcticException


def test_update_with_snapshot(tmp_lib):
    lib = tmp_lib
    sym = "update_no_daterange"
    idx = pd.date_range("1970-01-01", periods=100, freq="D")
    df = pd.DataFrame({"a": np.arange(len(idx), dtype="float")}, index=idx)
    original_df = df.copy(deep=True)
    lib.write(sym, df)
    lib.snapshot("my_snap")

    idx2 = pd.date_range("1970-01-12", periods=10, freq="D")
    df2 = pd.DataFrame({"a": np.arange(1000, 1000 + len(idx2),
                                       dtype="float")}, index=idx2)
    lib.update(sym, df2)

    pd.testing.assert_frame_equal(
        lib.read(sym, as_of=0, output_format="pandas"), original_df,
        check_freq=False)
    pd.testing.assert_frame_equal(
        lib.read(sym, as_of="my_snap", output_format="pandas"),
        original_df, check_freq=False)
    df.update(df2)
    pd.testing.assert_frame_equal(
        lib.read(sym, output_format="pandas"), df, check_freq=False)
    pd.testing.assert_frame_equal(
        lib.read(sym, as_of=1, output_format="pandas"), df,
        check_freq=False)

    lib.delete(sym)
    versions = [dict(v) for v in lib.list_versions()]
    assert len(versions) == 1
    version = versions[0]
    version.pop("date")
    version.pop("rows", None)  # our documented extension
    assert version == {"deleted": True, "snapshots": ["my_snap"],
                       "symbol": sym, "version": 0}
    pd.testing.assert_frame_equal(
        lib.read(sym, as_of="my_snap", output_format="pandas"),
        original_df, check_freq=False)


def test_update_with_daterange(tmp_lib):
    # date_range wider than BOTH frames: everything stored in the range
    # is replaced by the new frame — old rows outside the new frame but
    # inside the range are deleted
    def frame(start, end):
        df = pd.DataFrame(index=pd.date_range(start, end, freq="D"))
        df["value"] = df.index.day.astype("int64")
        return df

    df1 = frame("2020-01-01", "2021-01-01")
    tmp_lib.write("test", df1)
    df2 = frame("2020-06-01", "2021-06-01")
    tmp_lib.update("test", df2,
                   date_range=(pd.Timestamp("2020-01-01"),
                               pd.Timestamp("2022-01-01")))
    stored = tmp_lib.read("test", output_format="pandas")
    assert stored.index.min() == df2.index.min()
    assert stored.index.max() == df2.index.max()
    pd.testing.assert_frame_equal(stored, df2, check_freq=False)


def test_update_index_has_the_same_start_end(tmp_lib):
    row_count = 10
    columns = [f"col_{i}" for i in range(10)]
    df = pd.DataFrame({c: range(row_count) for c in columns},
                      index=pd.date_range("2024-01-01", periods=row_count))
    tmp_lib.write("sym", df)
    update_df = pd.DataFrame(
        {c: range(10, row_count + 10) for c in columns},
        index=pd.date_range("2024-01-01", periods=row_count))
    tmp_lib.update("sym", update_df)
    pd.testing.assert_frame_equal(
        tmp_lib.read("sym", output_format="pandas"), update_df,
        check_freq=False)


def test_update_new_data_contains_old(tmp_lib):
    row_count = 10
    columns = [f"col_{i}" for i in range(10)]
    df = pd.DataFrame({c: range(row_count) for c in columns},
                      index=pd.date_range("2024-01-01", periods=row_count))
    tmp_lib.write("sym", df)
    new_row_count = 12
    update_df = pd.DataFrame(
        {c: range(10, new_row_count + 10) for c in columns},
        index=pd.date_range("2023-12-31", periods=new_row_count))
    tmp_lib.update("sym", update_df)
    pd.testing.assert_frame_equal(
        tmp_lib.read("sym", output_format="pandas"), update_df,
        check_freq=False)


def test_update_pickled_data_raises(tmp_lib):
    idx = pd.date_range("2000-01-01", periods=3)
    tmp_lib.write_pickle("pk", {"a": [[1, 2], [3, 4], [5, 6]]})
    assert tmp_lib.is_symbol_pickled("pk")
    df2 = pd.DataFrame({"a": [1000]}, index=idx[1:2])
    with pytest.raises(ArcticException):
        tmp_lib.update("pk", df2)
