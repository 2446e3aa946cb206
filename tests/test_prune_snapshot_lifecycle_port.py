"""Ported from the reference's deciding prune / snapshot-pin / delete
lifecycle tests:

* ``test_with_prune``
  (reference python/tests/integration/arcticdb/version_store/
  test_basic_version_store.py:368): after a prune, exactly ONE
  non-``deleted`` version survives — snapshot-pinned previous versions are
  tombstoned but stay readable through their snapshots.
* ``test_prune_previous_versions_explicit_method`` (same file:392): the
  explicit ``prune_previous_versions`` call has the same physics.
* ``test_read_symbol_with_ts_in_snapshot``
  (reference python/tests/integration/arcticdb/version_store/
  test_snapshot.py:275): tombstoned-pinned versions stay readable BY
  VERSION NUMBER, including after ``delete_version`` of the latest.

Plus the post-delete state the round-8 verdict asked to pin: deleting the
last live version while pins remain drops the symbol from
``list_symbols`` but keeps pinned manifests readable by number AND by
snapshot.
"""

import tempfile

import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow


from arcticdb_spark.catalog import Arctic, NoSuchVersionException


@pytest.fixture()
def lib(spark):
    return Arctic(tempfile.mkdtemp(), spark).create_library("prunelc")


def _frame(seed):
    return pd.DataFrame({
        "ts": pd.date_range("2024-01-01", periods=3, freq="D"),
        "v": [seed, seed + 1, seed + 2]})


def _vals(lib, sym, **kw):
    return lib.read(sym, output_format="pandas", **kw)["v"].tolist()


def test_with_prune(lib):
    """test_basic_version_store.py:368 — one non-deleted version after
    prune; previous versions readable through their snapshots."""
    sym = "sym"
    lib.write(sym, _frame(0), prune_previous=True)
    lib.write(sym, _frame(10), prune_previous=True)

    assert len(lib.list_versions()) == 1

    lib.snapshot("my_snap")

    lib.write(sym, _frame(20), prune_previous=True)
    lib.snapshot("my_snap2")

    live = [row for row in lib.list_versions() if not row["deleted"]]
    assert len(live) == 1
    assert _vals(lib, sym, as_of="my_snap") == [10, 11, 12]
    assert _vals(lib, sym, as_of="my_snap2") == [20, 21, 22]


def test_prune_previous_versions_explicit_method(lib):
    """test_basic_version_store.py:392 — explicit prune keeps only the
    latest version live; the snapshot keeps its pinned read."""
    sym = "sym"
    lib.write(sym, _frame(0), prune_previous=True)
    lib.write(sym, _frame(10), prune_previous=False)
    lib.snapshot("my_snap")
    lib.write(sym, _frame(20), prune_previous=False)

    lib.prune_previous_versions(sym)

    assert _vals(lib, sym) == [20, 21, 22]
    live = [row for row in lib.list_versions() if not row["deleted"]]
    assert len(live) == 1
    assert _vals(lib, sym, as_of="my_snap") == [10, 11, 12]


def test_read_symbol_with_ts_in_snapshot(lib):
    """test_snapshot.py:275 — tombstoned-pinned versions read by version
    number, including after delete_version of the latest."""
    sym = "sym"
    lib.write(sym, _frame(0))
    lib.write(sym, _frame(10))
    lib.snapshot("snap")
    # after this write only version 1 exists via the snapshot
    lib.write(sym, _frame(20), prune_previous=True)

    assert _vals(lib, sym) == [20, 21, 22]
    assert len(lib.list_versions()) == 2  # deleted entry kept for pinned v1

    assert _vals(lib, sym, as_of=1) == [10, 11, 12]

    lib.snapshot("snap1")
    lib.delete_version(sym, 2)
    assert _vals(lib, sym, as_of=2) == [20, 21, 22]  # still in snapshot


def test_delete_last_live_with_pins_drops_symbol_keeps_pins(lib):
    """Round-8 verdict pin: the minimal falsifying sequence. write v0 →
    snapshot pins v0 → write v1 with prune → delete_version(v1): the
    symbol is GONE (no live versions — the pinned v0 is tombstoned, not
    rolled back to), but v0 stays readable by number and by snapshot."""
    sym = "s0"
    lib.write(sym, _frame(0))
    lib.snapshot("pin0")
    lib.write(sym, _frame(10), prune_previous=True)
    lib.delete_version(sym, 1)

    assert sym not in lib.list_symbols()
    with pytest.raises(NoSuchVersionException):
        lib.read(sym)
    assert _vals(lib, sym, as_of=0) == [0, 1, 2]
    assert _vals(lib, sym, as_of="pin0") == [0, 1, 2]

    # releasing the last pin garbage-collects the tombstoned version
    lib.delete_snapshot("pin0")
    with pytest.raises(NoSuchVersionException):
        lib.read(sym, as_of=0)


def test_delete_version_basic_middle(lib):
    """test_deletion.py:68 test_delete_version_basic (idx=1 instance):
    deleting a middle version tombstones it — its read-by-number raises,
    the neighbours and latest are untouched; deleting the rest empties
    the symbol."""
    sym = "sym"
    lib.write(sym, _frame(0))    # v0
    lib.write(sym, _frame(10))   # v1
    lib.write(sym, _frame(20))   # v2
    assert len(lib.list_versions(sym)) == 3

    lib.delete_version(sym, 1)
    with pytest.raises(NoSuchVersionException):
        lib.read(sym, as_of=1)
    assert len(lib.list_versions(sym)) == 2
    assert _vals(lib, sym) == [20, 21, 22]
    assert _vals(lib, sym, as_of=0) == [0, 1, 2]
    assert _vals(lib, sym, as_of=2) == [20, 21, 22]

    lib.delete_version(sym, 2)
    assert _vals(lib, sym) == [0, 1, 2]   # latest rolls back to v0
    assert len(lib.list_versions(sym)) == 1

    lib.delete_version(sym, 0)
    assert len(lib.list_versions(sym)) == 0
    with pytest.raises(NoSuchVersionException):
        lib.read(sym)


def test_list_versions_deleted_flag(lib):
    """test_basic_version_store.py:1388: the deleted flag and snapshot
    annotations per row; deleting a set of versions leaves the others."""
    for md in (1, 2, 3):
        lib.write("symbol", _frame(md * 10), metadata=md)
    lib.snapshot("snapshot")
    lib.write("symbol", _frame(40), metadata=4)

    versions = sorted(lib.list_versions("symbol"),
                      key=lambda v: v["version"])
    assert len(versions) == 4
    assert not versions[2]["deleted"]
    assert versions[2]["snapshots"] == ["snapshot"]

    lib.delete_version("symbol", 2)
    versions = sorted(lib.list_versions("symbol"),
                      key=lambda v: v["version"])
    assert len(versions) == 4
    assert [v["deleted"] for v in versions] == [False, False, True, False]
    assert versions[2]["snapshots"] == ["snapshot"]
    assert not versions[0]["snapshots"] and not versions[3]["snapshots"]

    lib.delete_versions("symbol", [0, 1])
    versions = sorted(lib.list_versions("symbol"),
                      key=lambda v: v["version"])
    assert len(versions) == 2
    assert versions[0]["version"] == 2 and versions[0]["deleted"]
    assert versions[0]["snapshots"] == ["snapshot"]
    assert versions[1]["version"] == 3 and not versions[1]["deleted"]


def test_list_versions_with_snapshots(lib):
    """test_basic_version_store.py:1429: snapshot annotations across
    several symbols and snapshots."""
    lib.write("a", _frame(0))
    lib.write("b", _frame(0))
    lib.snapshot("snap1")
    lv1 = lib.list_versions()
    assert len(lv1) == 2
    assert all(v["snapshots"] == ["snap1"] for v in lv1)
    lib.write("a", _frame(1))
    lib.write("b", _frame(1))
    lib.write("c", _frame(0))
    lib.snapshot("snap2")
    lib.snapshot("snap3")
    items_for_a = lib.list_versions("a")
    assert len(items_for_a) == 2
    assert set([v["snapshots"] for v in items_for_a
                if v["version"] == 0][0]) == {"snap1"}
    assert set([v["snapshots"] for v in items_for_a
                if v["version"] == 1][0]) == {"snap2", "snap3"}


def test_delete_version_that_does_not_exist(lib):
    """test_arctic.py:705: missing symbol / missing version /
    already-deleted version all raise, atomically (good versions stay
    live after a failed mixed request)."""
    with pytest.raises(NoSuchVersionException):
        lib.delete("symbol", versions=0)
    with pytest.raises(NoSuchVersionException):
        lib.delete("symbol", versions=[1, 2])

    lib.write("symbol", _frame(0))
    with pytest.raises(NoSuchVersionException):
        lib.delete("symbol", versions=1)

    lib.write("symbol", _frame(10))
    lib.delete("symbol", versions=0)
    with pytest.raises(NoSuchVersionException):
        lib.delete("symbol", versions=0)       # already deleted
    with pytest.raises(NoSuchVersionException):
        lib.delete("symbol", versions=[0, 1])  # one bad -> nothing happens
    lib.delete("symbol", versions=1)           # ...so 1 is still live here
    with pytest.raises(NoSuchVersionException):
        lib.delete("symbol", versions=1)


def test_delete_version_empty_list_is_noop(lib):
    """test_arctic.py:612"""
    for i in range(3):
        lib.write("symbol", _frame(i))
    lib.delete("symbol", versions=[])
    assert len(lib.list_versions("symbol")) == 3


def test_write_metadata_missing_symbol_creates_v0(lib):
    """test_arctic.py:346 test_write_metadata_with_none"""
    meta = {"meta_symbol": 0}
    m = lib.write_metadata("symbol", meta)
    assert m.version == 0
    got = lib.read_metadata("symbol")
    assert got.metadata == meta and got.version == 0
    assert lib.read("symbol") is None   # metadata-only symbol: None data


def test_read_ts(lib):
    """test_basic_version_store.py:1451 test_read_ts: timestamp as_of
    resolves the newest version created at or before the cutoff,
    including the exact creation instant, the far future, and a
    before-everything raise."""
    import time as _time
    lib.write("a", _frame(1))            # v0
    _time.sleep(0.002)
    lib.write("a", _frame(2))            # v1
    _time.sleep(0.002)
    lib.write("a", _frame(3))            # v2
    lib.write("a", _frame(4))            # v3

    rows = sorted((r for r in lib.list_versions() if r["symbol"] == "a"),
                  key=lambda r: r["version"])
    assert len(rows) == 4

    ts_for_v1 = pd.Timestamp(rows[1]["date"])
    got = lib.read("a", as_of=ts_for_v1, output_format="pandas")
    assert got["v"].tolist() == [2, 3, 4]

    ts_for_v0 = pd.Timestamp(rows[0]["date"])
    got = lib.read("a", as_of=ts_for_v0, output_format="pandas")
    assert got["v"].tolist() == [1, 2, 3]

    with pytest.raises(NoSuchVersionException):
        lib.read("a", as_of=pd.Timestamp(0))

    brexit_almost_over = pd.Timestamp.max - pd.Timedelta(1, unit="day")
    got = lib.read("a", as_of=brexit_almost_over, output_format="pandas")
    assert got["v"].tolist() == [4, 5, 6]
