"""Port of remaining deciders from the reference's integration
test_arctic.py (basic suite, delete-version variants, documented
examples, WritePayload unpacking)."""

from datetime import datetime

import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow


from arcticdb_spark import Arctic, WritePayload
from arcticdb_spark.catalog import NoSuchVersionException


@pytest.fixture()
def lib(spark, tmp_path):
    return Arctic(str(tmp_path), spark).create_library("arc")


def test_basic_metadata(lib):
    """Port of test_basic_metadata:281-287."""
    df = pd.DataFrame({"col1": [1, 2, 3], "col2": [4, 5, 6]})
    lib.write("my_symbol", df, metadata={"fluffy": "muppets"})
    assert lib.read_metadata("my_symbol").metadata == {"fluffy": "muppets"}


def test_sorted_roundtrip(lib):
    """Port of test_sorted_roundtrip:291-298."""
    df = pd.DataFrame({"column": [1, 2, 3, 4]},
                      index=pd.date_range(start="1/1/2018", end="1/4/2018"))
    lib.write("sorted_test", df)
    assert lib.get_description("sorted_test").sorted == "ASCENDING"


def test_do_not_prune_previous_versions_by_default(lib):
    """Port of test_do_not_prune_previous_versions_by_default:583-591."""
    df = pd.DataFrame({"col1": [1, 2, 3]})
    for _ in range(5):
        lib.write("symbol", df)
    assert len(lib.list_versions("symbol")) == 5


@pytest.mark.parametrize("versions", [1, (1, 2)])
def test_delete_version(lib, versions):
    """Port of test_delete_version:595-608."""
    df = pd.DataFrame({"col1": [1, 2, 3]})
    lib.write("symbol", df, metadata={"very": "interesting"})
    lib.write("symbol", df, metadata={"muy": "interesante"},
              prune_previous_versions=False)
    lib.write("symbol", df, metadata={"tres": "interessant"},
              prune_previous_versions=False)
    lib.delete("symbol", versions=versions)
    if isinstance(versions, int):
        assert lib.read_metadata("symbol").version == 2
        assert lib.read_metadata("symbol").metadata == {
            "tres": "interessant"}
    else:
        assert lib.read_metadata("symbol").version == 0
        assert lib.read_metadata("symbol").metadata == {
            "very": "interesting"}


def test_delete_version_empty(lib):
    """Port of test_delete_version_empty:612-620: versions=[] is a no-op."""
    df = pd.DataFrame({"col1": [1, 2, 3]})
    for _ in range(3):
        lib.write("symbol", df, prune_previous_versions=False)
    lib.delete("symbol", versions=[])
    assert len(lib.list_versions("symbol")) == 3


def test_list_versions_write_append_update(lib):
    """Port of test_list_versions_write_append_update:623-638."""
    index = pd.date_range(start="2000-01-01", freq="D", periods=3)
    df = pd.DataFrame({"col1": [1, 2, 3], "col2": [4, 5, 6]}, index=index)
    lib.write("symbol", df)
    index_append = pd.date_range(start="2000-01-04", freq="D", periods=3)
    df_append = pd.DataFrame({"col1": [7, 8, 9], "col2": [10, 11, 12]},
                             index=index_append)
    lib.append("symbol", df_append)
    index_update = pd.DatetimeIndex(["2000-01-03", "2000-01-05"])
    df_update = pd.DataFrame({"col1": [13, 14], "col2": [15, 16]},
                             index=index_update)
    lib.update("symbol", df_update)
    expected = pd.concat([df.iloc[:-1], df_update, df_append.iloc[[2]]])
    pd.testing.assert_frame_equal(
        lib.read("symbol", output_format="pandas"), expected,
        check_freq=False)
    assert len(lib.list_versions("symbol")) == 3


def test_delete_version_after_tombstone_all(lib):
    """Port of test_delete_version_after_tombstone_all:743-763: deleting
    already-tombstoned versions raises (all-or-nothing), live ones work."""
    sym = "symbol_tombstone_all"
    lib.write(sym, pd.DataFrame({"a": [1.0]}))
    lib.write(sym, pd.DataFrame({"a": [1.0]}), prune_previous_versions=True)
    lib.write(sym, pd.DataFrame({"a": [1.0]}),
              prune_previous_versions=False)
    assert len(lib.list_versions(sym)) == 2
    assert len(lib.list_symbols()) == 1
    with pytest.raises(NoSuchVersionException):
        lib.delete(sym, versions=[0])
    with pytest.raises(NoSuchVersionException):
        lib.delete(sym, versions=[0, 1])
    with pytest.raises(NoSuchVersionException):
        lib.delete(sym, versions=[0, 1, 2])
    lib.delete(sym, versions=[1, 2])
    assert len(lib.list_versions(sym)) == 0
    assert len(lib.list_symbols()) == 0


def test_delete_date_range(lib):
    """Port of test_delete_date_range:766-780."""
    df = pd.DataFrame({"column": [5, 6, 7, 8]},
                      index=pd.date_range(start="1/1/2018", end="1/4/2018"))
    lib.write("symbol", df)
    lib.delete_data_in_range("symbol", (datetime(2018, 1, 1),
                                        datetime(2018, 1, 2)))
    out = lib.read("symbol", output_format="pandas")
    pd.testing.assert_frame_equal(
        out, pd.DataFrame({"column": [7, 8]},
                          index=pd.date_range(start="1/3/2018",
                                              end="1/4/2018")),
        check_freq=False)
    assert lib.read_metadata("symbol").version == 1


def test_write_with_unpacking(lib):
    """Port of test_write_with_unpacking:896-914: lib.write(*payload)."""
    df_1 = pd.DataFrame({"col1": [1, 2, 3], "col2": [4, 5, 6]})
    df_2 = pd.DataFrame({"col1": [-1, -2, -3], "col2": [-4, -5, -6],
                         "anothercol": [0, 0, 0]})
    payload_1 = WritePayload("symbol_1", df_1)
    payload_2 = WritePayload("symbol_2", df_2, metadata="great_metadata")
    lib.write(*payload_1)
    lib.write(*payload_2)
    pd.testing.assert_frame_equal(
        lib.read("symbol_1", columns=["col1"], output_format="pandas"),
        df_1[["col1"]])
    pd.testing.assert_frame_equal(
        lib.read("symbol_2", columns=["anothercol"],
                 output_format="pandas"), df_2[["anothercol"]])
    assert lib.read_metadata("symbol_2").metadata == "great_metadata"


def test_append_documented_example(lib):
    """Port of test_append_documented_example:942-957."""
    df = pd.DataFrame({"column": [1, 2, 3]},
                      index=pd.date_range(start="1/1/2018", end="1/3/2018"))
    lib.write("symbol", df)
    to_append = pd.DataFrame({"column": [4, 5, 6]},
                             index=pd.date_range(start="1/4/2018",
                                                 end="1/6/2018"))
    lib.append("symbol", to_append, prune_previous_versions=False)
    expected = pd.DataFrame({"column": [1, 2, 3, 4, 5, 6]},
                            index=pd.date_range(start="1/1/2018",
                                                end="1/6/2018"))
    pd.testing.assert_frame_equal(
        lib.read("symbol", output_format="pandas"), expected,
        check_freq=False)
    versions = lib.list_versions("symbol")
    assert len(versions) == 2
    pd.testing.assert_frame_equal(
        lib.read("symbol", as_of=0, output_format="pandas"), df,
        check_freq=False)


def test_append_prune_previous_versions(lib):
    """Port of test_append_prune_previous_versions:960-974."""
    df = pd.DataFrame({"column": [1, 2, 3]},
                      index=pd.date_range(start="1/1/2018", end="1/3/2018"))
    lib.write("symbol", df)
    to_append = pd.DataFrame({"column": [4, 5, 6]},
                             index=pd.date_range(start="1/4/2018",
                                                 end="1/6/2018"))
    lib.append("symbol", to_append, prune_previous_versions=True)
    live = [v for v in lib.list_versions("symbol") if not v["deleted"]]
    assert len(live) == 1 and live[0]["version"] == 1


def test_update_documented_example(lib):
    """Port of test_update_documented_example:977-999: rows inside the
    patch's span but absent from it are REMOVED (range surgery)."""
    df = pd.DataFrame({"column": [1, 2, 3, 4]},
                      index=pd.date_range(start="1/1/2018", end="1/4/2018"))
    lib.write("symbol", df)
    update_df = pd.DataFrame({"column": [400, 40]},
                             index=pd.date_range(start="1/1/2018",
                                                 end="1/3/2018", freq="2D"))
    lib.update("symbol", update_df, prune_previous_versions=False)
    result = lib.read("symbol", output_format="pandas")
    expected = pd.DataFrame(
        {"column": [400, 40, 4]},
        index=pd.to_datetime(["1/1/2018", "1/3/2018", "1/4/2018"]))
    pd.testing.assert_frame_equal(result, expected, check_freq=False)
    assert len(lib.list_versions("symbol")) == 2
    pd.testing.assert_frame_equal(
        lib.read("symbol", as_of=0, output_format="pandas"), df,
        check_freq=False)


def test_update_date_range_exhaustive(lib):
    """Port of integration test_basic_operations_scenarios.py
    test_update_date_range_exhaustive:358-435: open-ended update ranges
    bound the DELETION span; the patch's rows land regardless."""
    from datetime import timedelta
    init = pd.DataFrame({"value": range(10)},
                        index=pd.date_range("2023-01-01", periods=10,
                                            freq="D"))
    upd = pd.DataFrame({"value": [999]},
                       index=pd.date_range("2023-01-05", periods=1,
                                           freq="D"))

    def run(start, end):
        lib.write("s", init)
        lib.update("s", upd, date_range=(start, end))
        out = lib.read("s", output_format="pandas")
        return out

    out = run(pd.Timestamp("2023-01-05"), None)
    assert len(out) == 5 and out.iloc[4]["value"] == 999
    out = run(upd.index[0] - timedelta(days=300), None)
    assert len(out) == 1 and out.iloc[0]["value"] == 999
    pd.testing.assert_frame_equal(upd, out, check_freq=False)
    out = run(None, pd.Timestamp("2023-01-05"))
    assert len(out) == 6 and out.iloc[0]["value"] == 999
    out = run(None, None)
    assert len(out) == 1
    pd.testing.assert_frame_equal(upd, out, check_freq=False)


def test_get_index_versions(lib):
    """Port of test_basic_version_store.py test_get_index:2310-2333:
    read_index honors as_of version/snapshot, version_id tracks the
    writing version (pickled symbols included)."""
    symbol = "thing"
    lib.write_pickle(symbol, 1)
    idx = lib.read_index(symbol)
    assert len(idx) == 1 and idx.iloc[0]["version_id"] == 0
    lib.write_pickle(symbol, 2)
    assert lib.read_index(symbol).iloc[0]["version_id"] == 1
    lib.snapshot("snap")
    lib.write_pickle(symbol, 3)
    assert lib.read_index(symbol).iloc[0]["version_id"] == 2
    assert lib.read_index(symbol,
                          as_of="snap").iloc[0]["version_id"] == 1
    assert lib.read_index(symbol, as_of=0).iloc[0]["version_id"] == 0


def test_read_empty_index(lib):
    """Port of test_read_empty_index:2336-2341."""
    lib.write("empty_idx", pd.DataFrame({"a": np.array([], dtype=float)}))
    assert len(lib.read_index("empty_idx")) == 0


def test_snapshot_empty_segment(lib):
    """Port of test_snapshot_empty_segment:2344-2357: snapshot(versions={})
    creates a legal empty snapshot pinning nothing."""
    lib.write_pickle("a", 1)
    lib.write_pickle("b", 1)
    lib.snapshot("snap")
    lib.delete("a")
    assert lib.read("a", as_of="snap") == 1
    lib.write_pickle("c", 1)
    lib.snapshot("snap2", versions={})
    lib.delete("c")
    assert lib.has_symbol("c") is False
    assert "snap2" in lib.list_snapshots()


def test_update_date_range_restrictive(lib):
    """Port of integration test_update_with_date_range.py
    test_update_date_range_dataframe:26-43: date_range restricts BOTH the
    deleted stored range and which patch rows apply."""
    dtidx = pd.date_range("2022-06-01", "2022-06-05")
    lib.write("sym_1", pd.DataFrame(index=dtidx, data={"a": [1, 2, 3, 4,
                                                             5]}))
    dtidx2 = pd.date_range("2022-05-01", "2022-06-10")
    upd = pd.DataFrame(index=dtidx2,
                       data={"a": np.arange(dtidx2.shape[0])},
                       dtype=np.int64)
    lib.update("sym_1", upd, date_range=(datetime(2022, 6, 2),
                                         datetime(2022, 6, 4)))
    out = lib.read("sym_1", output_format="pandas")
    np.testing.assert_array_equal(out["a"].values, [1, 32, 33, 34, 5])


def test_re_snapshot_with_same_name(lib):
    """Port of test_snapshot.py test_re_snapshot_with_same_name: a second
    snapshot under an existing name raises; the original stays intact."""
    from arcticdb_spark.exceptions import InternalException
    lib.write_pickle("a", [1, 2, 3])
    lib.snapshot("snap_1")
    lib.write_pickle("a", [4, 5, 6])
    assert lib.read("a", as_of="snap_1") == [1, 2, 3]
    with pytest.raises(InternalException):
        lib.snapshot("snap_1")
    assert lib.read("a", as_of="snap_1") == [1, 2, 3]


def test_write_to_symbol_in_snapshot_only(lib):
    """Port of test_snapshot.py test_write_to_symbol_in_snapshot_only: a
    symbol surviving only via a snapshot accepts new writes; the snapshot
    keeps the old value."""
    lib.write_pickle("weird", [1, 2, 3])
    lib.snapshot("store_sym_old")
    lib.delete("weird")
    lib.write_pickle("weird", [1, 2, 3, 4])
    assert lib.read("weird") == [1, 2, 3, 4]
    assert lib.read("weird", as_of="store_sym_old") == [1, 2, 3]


def test_add_to_snapshot_invalid_leaves_snapshot_unchanged(lib):
    """Distilled from test_add_to_snapshot_atomicity: an add_to_snapshot
    naming an unresolvable version has NO effect on the snapshot (the
    reference _store.py:3194 skips it silently — pinned by
    test_snapshot_modify_port)."""
    lib.write_pickle("s1", 1)
    lib.snapshot("snap")
    lib.write_pickle("s2", 2)
    lib.add_to_snapshot("snap", ["s2"], as_ofs=[99])   # no effect
    assert lib.read("s1", as_of="snap") == 1
    with pytest.raises(Exception):
        lib.read("s2", as_of="snap")
    lib.add_to_snapshot("snap", ["s2"])
    assert lib.read("s2", as_of="snap") == 2


def test_get_info_date_range(lib):
    """Port of test_basic_version_store.py test_get_info_date_range /
    _version_no_columns_nat: per-version date_range equals
    get_timerange_for_symbol; an empty symbol reports (NaT, NaT)."""
    sym = "gi"
    lib.write(sym, pd.DataFrame({"col1": np.arange(10)},
                                index=pd.date_range(pd.Timestamp(0),
                                                    periods=10)))
    lib.write(sym, pd.DataFrame({"col1": np.arange(20)},
                                index=pd.date_range(pd.Timestamp(0),
                                                    periods=20)))
    info_0 = lib.get_info(sym, version=0)
    info_1 = lib.get_info(sym, version=1)
    assert lib.get_info(sym) == info_1
    assert info_1["date_range"] == lib.get_timerange_for_symbol(sym,
                                                                version=1)
    assert info_0["date_range"] == lib.get_timerange_for_symbol(sym,
                                                                version=0)
    lib.write("empty", pd.DataFrame({"a": np.array([], dtype="int64")},
                                    index=pd.DatetimeIndex([])))
    dr = lib.get_info("empty")["date_range"]
    assert np.isnat(dr[0]) and np.isnat(dr[1])


def test_iterate_snapshots_if_tombstoned(lib):
    """Reference two-layer contract: the v1 default
    (iterate_snapshots_if_tombstoned=True) reads a tombstoned-but-pinned
    version by NUMBER; passing False gives the v2 Library behavior
    (test_delete_version_with_snapshot — NoDataFoundException); the
    snapshot NAME always reads."""
    lib.write_pickle("s", 1)
    lib.snapshot("snap_i")
    lib.delete("s")
    assert lib.read("s", as_of=0) == 1
    with pytest.raises(NoSuchVersionException):
        lib.read("s", as_of=0, iterate_snapshots_if_tombstoned=False)
    assert lib.read("s", as_of="snap_i") == 1
