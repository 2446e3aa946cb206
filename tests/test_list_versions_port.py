"""Ported from the reference's
``python/tests/unit/arcticdb/version_store/test_list_versions.py``:
the full argument-combination contract (symbol / snapshot / latest_only /
skip_snapshots), reverse output ordering, the won't-fix
deleted-always-False quirk with ``snapshot=``, missing-snapshot raises,
and test_tombstone_all's version-chain continuity across a FULL delete.

Documented deviation: our rows carry an extra ``rows`` field (useful
extension) — the comparator pops it alongside ``date`` like the
reference's comparator pops ``date``.
"""
import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow


from arcticdb_spark.catalog import NoSuchVersionException


def _df(v):
    return pd.DataFrame({"a": np.arange(3, dtype="int64") + v})


def populate_library(lib):
    """Reference populate_library (test_list_versions.py:17): sym<n> has
    n+1 versions; snap<n> pins version min(n, sym) of each symbol; even
    versions are deleted afterwards (all stay pinned by construction)."""
    num_symbols = 5
    snapshots = {}
    all_versions = []
    for sym_idx in range(num_symbols):
        sym = f"sym{sym_idx}"
        for version_idx in range(sym_idx + 1):
            lib.write(sym, _df(10 * sym_idx + version_idx))
            all_versions.append({"symbol": sym, "version": version_idx,
                                 "deleted": version_idx % 2 == 0,
                                 "snapshots": []})
    for snap_idx in range(num_symbols):
        snap = f"snap{snap_idx}"
        versions = {f"sym{i}": min(snap_idx, i) for i in range(num_symbols)}
        snapshots[snap] = versions
        lib.snapshot(snap, versions=versions)
        for version in all_versions:
            if versions.get(version["symbol"]) == version["version"]:
                version["snapshots"].append(snap)
    for sym_idx in range(num_symbols):
        lib.delete_versions(f"sym{sym_idx}",
                            list(range(0, sym_idx + 1, 2)))
    all_versions.sort(key=lambda v: (v["symbol"], v["version"]),
                      reverse=True)
    for version in all_versions:
        version["snapshots"].sort()
    return all_versions, snapshots


def filter_for_symbol(versions, symbol):
    return [v for v in versions if v["symbol"] == symbol]


def filter_for_snapshot(versions, snapshot_versions):
    return [v for v in versions
            if snapshot_versions.get(v["symbol"]) == v["version"]]


def filter_for_latest_only(versions):
    out = []
    for v in versions:
        sym_idx = int(v["symbol"][3:])
        if (not v["deleted"]
                and v["version"] == (sym_idx - 1) + (sym_idx % 2)):
            out.append(v)
    return out


def filter_for_skip_snapshots(versions):
    out = []
    for v in versions:
        v["snapshots"] = []
        if not v["deleted"]:
            out.append(v)
    return out


def force_deleted_false(versions):
    # reference won't-fix bug 18286248854: with snapshot= every row has
    # deleted=False
    for v in versions:
        v["deleted"] = False
    return versions


def assert_versions_equal(expected, got):
    got = [dict(r) for r in got]
    for r in got:
        r.pop("date")
        r.pop("rows", None)  # our documented extension
    assert expected == got


def test_list_versions_default_args(tmp_lib):
    all_versions, _ = populate_library(tmp_lib)
    assert_versions_equal(all_versions, tmp_lib.list_versions())


@pytest.mark.parametrize("symbol", ["sym0", "sym2"])
def test_list_versions_symbol(tmp_lib, symbol):
    all_versions, _ = populate_library(tmp_lib)
    assert_versions_equal(filter_for_symbol(all_versions, symbol),
                          tmp_lib.list_versions(symbol=symbol))


@pytest.mark.parametrize("snapshot", ["snap0", "snap2"])
def test_list_versions_snapshot(tmp_lib, snapshot):
    all_versions, snapshots = populate_library(tmp_lib)
    expected = force_deleted_false(
        filter_for_snapshot(all_versions, snapshots[snapshot]))
    assert_versions_equal(expected,
                          tmp_lib.list_versions(snapshot=snapshot))


def test_list_versions_latest_only(tmp_lib):
    all_versions, _ = populate_library(tmp_lib)
    assert_versions_equal(filter_for_latest_only(all_versions),
                          tmp_lib.list_versions(latest_only=True))


def test_list_versions_skip_snapshots(tmp_lib):
    all_versions, _ = populate_library(tmp_lib)
    assert_versions_equal(filter_for_skip_snapshots(all_versions),
                          tmp_lib.list_versions(skip_snapshots=True))


@pytest.mark.parametrize("symbol", ["sym1", "sym3"])
@pytest.mark.parametrize("snapshot", ["snap1", "snap3"])
def test_list_versions_symbol_and_snapshot(tmp_lib, symbol, snapshot):
    all_versions, snapshots = populate_library(tmp_lib)
    expected = force_deleted_false(filter_for_snapshot(
        filter_for_symbol(all_versions, symbol), snapshots[snapshot]))
    assert_versions_equal(
        expected, tmp_lib.list_versions(symbol=symbol, snapshot=snapshot))


def test_list_versions_symbol_and_latest_only(tmp_lib):
    all_versions, _ = populate_library(tmp_lib)
    for symbol in ("sym0", "sym2"):
        expected = filter_for_latest_only(
            filter_for_symbol(all_versions, symbol))
        assert_versions_equal(
            expected,
            tmp_lib.list_versions(symbol=symbol, latest_only=True))


def test_list_versions_snapshot_and_latest_only_is_ignored(tmp_lib):
    # latest_only has no effect when snapshot is also specified
    all_versions, snapshots = populate_library(tmp_lib)
    expected = force_deleted_false(
        filter_for_snapshot(all_versions, snapshots["snap2"]))
    assert_versions_equal(
        expected,
        tmp_lib.list_versions(snapshot="snap2", latest_only=True))


def test_list_versions_snapshot_and_skip_snapshots(tmp_lib):
    all_versions, snapshots = populate_library(tmp_lib)
    expected = filter_for_skip_snapshots(force_deleted_false(
        filter_for_snapshot(all_versions, snapshots["snap2"])))
    assert_versions_equal(
        expected,
        tmp_lib.list_versions(snapshot="snap2", skip_snapshots=True))


def test_list_versions_specific_snapshot_all_symbols(tmp_lib):
    for i in range(5):
        tmp_lib.write(f"sym{i}", _df(i))
        tmp_lib.snapshot(f"snap{i}")
    res = tmp_lib.list_versions(snapshot="snap0", skip_snapshots=True)
    assert len(res) == 1
    assert res[0]["symbol"] == "sym0"
    assert res[0]["snapshots"] == []
    res = tmp_lib.list_versions(snapshot="snap4", skip_snapshots=True)
    assert len(res) == 5
    assert all(v["snapshots"] == [] for v in res)
    assert {r["symbol"] for r in res} == {f"sym{i}" for i in range(5)}


def test_list_versions_snapshot_not_found(tmp_lib):
    tmp_lib.write("sym", _df(1))
    tmp_lib.snapshot("snap")
    for kwargs in ({"symbol": "sym"}, {"symbol": "sym",
                                       "skip_snapshots": True},
                   {}, {"skip_snapshots": True}):
        with pytest.raises(NoSuchVersionException):
            tmp_lib.list_versions(snapshot="non_existent_snap", **kwargs)


def test_list_versions_with_snapshot_deleted_always_false(tmp_lib):
    tmp_lib.write("sym", _df(1))
    tmp_lib.snapshot("snap")
    tmp_lib.delete("sym")
    res = tmp_lib.list_versions(snapshot="snap")
    assert res[0]["deleted"] is False


@pytest.mark.parametrize("latest_only", [True, False])
def test_tombstone_all(tmp_lib, latest_only):
    """Reference test_list_versions.py:348: a FULL delete empties
    list_versions, and subsequent writes CONTINUE the version chain
    (v2, v3, v4 — numbers are never reused)."""
    sym = "test_tombstone_all"
    tmp_lib.write(sym, _df(0))
    tmp_lib.write(sym, _df(1))
    tmp_lib.delete(sym)
    assert not len(tmp_lib.list_versions(latest_only=latest_only))
    tmp_lib.write(sym, _df(2))
    tmp_lib.write(sym, _df(3))
    tmp_lib.write(sym, _df(4))
    tmp_lib.delete_version(sym, 4)
    expected = ([{"symbol": sym, "version": 3, "deleted": False,
                  "snapshots": []}]
                if latest_only else
                [{"symbol": sym, "version": 3, "deleted": False,
                  "snapshots": []},
                 {"symbol": sym, "version": 2, "deleted": False,
                  "snapshots": []}])
    assert_versions_equal(expected,
                          tmp_lib.list_versions(latest_only=latest_only))
