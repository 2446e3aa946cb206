"""Ported from the reference's snapshot-modification tests
(python/tests/integration/arcticdb/version_store/test_snapshot.py:302-505):
add_to_snapshot (simple / specific version / replace / multiple /
duplicate+mismatch validation / missing snapshot) and
remove_from_snapshot (simple / multiple / missing snapshot), plus the
release-GC this engine shares with delete_snapshot: an add/remove that
releases the LAST pin of a tombstoned version garbage-collects it.
"""

import tempfile

import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow


from arcticdb_spark.catalog import Arctic, ArcticException, \
    NoSuchVersionException


@pytest.fixture()
def lib(spark):
    return Arctic(tempfile.mkdtemp(), spark).create_library("snapmod")


def _frame(v):
    return pd.DataFrame({"x": [v]})


def _val(lib, sym, **kw):
    return lib.read(sym, output_format="pandas", **kw)["x"].iloc[0]


def test_add_to_snapshot_simple(lib):
    """test_snapshot.py:302"""
    lib.write("s1", _frame(1))
    lib.write("s2", _frame(2))
    lib.snapshot("snap")
    lib.write("s3", _frame(3))

    lib.add_to_snapshot("snap", ["s3"])
    lib.write("s3", _frame(99))

    assert _val(lib, "s1", as_of="snap") == 1
    assert _val(lib, "s2", as_of="snap") == 2
    assert _val(lib, "s3", as_of="snap") == 3


def test_add_to_snapshot_missing_snap(lib):
    """test_snapshot.py:319"""
    lib.write("s3", _frame(3))
    with pytest.raises(NoSuchVersionException):
        lib.add_to_snapshot("snap", ["s3"])


def test_add_to_snapshot_specific_version(lib):
    """test_snapshot.py:330"""
    lib.write("s1", _frame(1))
    lib.snapshot("snap")
    lib.write("s3", _frame(10))   # v0
    lib.write("s3", _frame(11))   # v1
    lib.write("s3", _frame(12))   # v2
    lib.add_to_snapshot("snap", ["s3"], as_ofs=[2])
    lib.write("s3", _frame(99))
    assert _val(lib, "s3", as_of="snap") == 12


def test_add_to_snapshot_replace(lib):
    """test_snapshot.py:349: an existing entry is replaced."""
    lib.write("s1", _frame(1))
    lib.write("s3", _frame(2))
    lib.snapshot("snap")
    lib.write("s3", _frame(3))

    lib.add_to_snapshot("snap", ["s3"])
    lib.write("s3", _frame(99))

    assert _val(lib, "s1", as_of="snap") == 1
    assert _val(lib, "s3", as_of="snap") == 3


def test_add_to_snapshot_replace_specific_keeps_other_snapshot(lib):
    """test_snapshot.py:367: the displaced pin stays readable through the
    snapshot that still holds it."""
    lib.write("s3", _frame(1))
    lib.snapshot("snap")
    lib.snapshot("saved")
    lib.write("s3", _frame(2))
    lib.write("s3", _frame(3))

    lib.add_to_snapshot("snap", ["s3"], as_ofs=[2])
    lib.write("s3", _frame(99))

    assert _val(lib, "s3", as_of="snap") == 3
    assert _val(lib, "s3", as_of="saved") == 1


def test_add_to_snapshot_multiple(lib):
    """test_snapshot.py:390: mixed as_ofs, None = latest."""
    lib.write("s3", _frame(10))
    lib.write("s3", _frame(11))
    lib.write("s3", _frame(12))
    lib.write("s4", _frame(40))
    lib.snapshot("snap")
    lib.write("s4", _frame(41))

    lib.add_to_snapshot("snap", ["s3", "s4"], as_ofs=[2, None])

    assert _val(lib, "s3", as_of="snap") == 12
    assert _val(lib, "s4", as_of="snap") == 41


def test_add_to_snapshot_duplicate_symbol_raises(lib):
    """test_snapshot.py:413/425: duplicates raise whether the versions
    agree or not."""
    lib.write("s1", _frame(1))
    lib.write("s1", _frame(2))
    lib.write("s1", _frame(3))
    lib.snapshot("snap")
    with pytest.raises(ArcticException):
        lib.add_to_snapshot("snap", ["s1", "s1"], as_ofs=[1, 2])
    with pytest.raises(ArcticException):
        lib.add_to_snapshot("snap", ["s1", "s1"], as_ofs=[2, 2])


def test_add_to_snapshot_mismatched_lengths_raises(lib):
    """test_snapshot.py:436"""
    lib.write("s1", _frame(1))
    lib.snapshot("snap")
    with pytest.raises(ArcticException):
        lib.add_to_snapshot("snap", ["s1"], as_ofs=[1, 2])


def test_add_to_snapshot_nonexistent_symbol_no_effect(lib):
    """_store.py:3200: adding a missing symbol/version does not fail and
    does not change the snapshot."""
    lib.write("s1", _frame(1))
    lib.snapshot("snap")
    lib.add_to_snapshot("snap", ["ghost"])
    lib.add_to_snapshot("snap", ["s1"], as_ofs=[42])
    assert lib.list_symbols(snapshot_name="snap") == ["s1"]
    assert _val(lib, "s1", as_of="snap") == 1


def test_remove_from_snapshot(lib):
    """test_snapshot.py:447"""
    lib.write("s1", _frame(1))
    lib.write("s2", _frame(2))
    lib.write("s3", _frame(3))
    lib.snapshot("saved")
    lib.snapshot("snap")
    lib.write("s3", _frame(4))

    assert _val(lib, "s3", as_of="snap") == 3
    lib.remove_from_snapshot("snap", ["s3"], [0])
    assert len(lib.list_versions(snapshot="snap")) == 2
    assert _val(lib, "s3", as_of="saved") == 3


def test_remove_from_snapshot_missing_snap(lib):
    """test_snapshot.py:466"""
    lib.write("s3", _frame(3))
    with pytest.raises(NoSuchVersionException):
        lib.remove_from_snapshot("snap", ["s3"], [0])


def test_remove_from_snapshot_multiple(lib):
    """test_snapshot.py:477"""
    lib.write("s1", _frame(1))
    lib.write("s2", _frame(1))
    lib.write("s2", _frame(2))
    lib.write("s3", _frame(3))
    lib.snapshot("saved")
    lib.snapshot("snap")
    lib.write("s3", _frame(4))

    lib.remove_from_snapshot("snap", ["s2", "s3"], [1, 0])
    assert len(lib.list_versions(snapshot="snap")) == 1
    assert _val(lib, "s3", as_of="saved") == 3
    assert _val(lib, "s2", as_of="saved") == 2


def test_remove_from_snapshot_wrong_version_no_effect(lib):
    lib.write("s1", _frame(1))
    lib.snapshot("snap")
    lib.remove_from_snapshot("snap", ["s1"], [7])
    assert _val(lib, "s1", as_of="snap") == 1


def test_remove_last_pin_garbage_collects_tombstoned(lib):
    """Release-GC parity with delete_snapshot (reference snapshot GC,
    test_deletion.py test_delete_snapshot_key_shared_with_another_snapshot):
    removing the last pin of a pruned version purges it."""
    lib.write("s1", _frame(1))        # v0
    lib.snapshot("snap")
    lib.write("s1", _frame(2), prune_previous=True)   # v1; v0 tombstoned+pinned

    assert _val(lib, "s1", as_of=0) == 1   # readable via the pin
    lib.remove_from_snapshot("snap", ["s1"], [0])
    with pytest.raises(NoSuchVersionException):
        lib.read("s1", as_of=0)


def test_add_replace_releases_displaced_tombstoned_pin(lib):
    """The displaced entry of an add_to_snapshot replace is GC'd when it
    was the last pin of a tombstoned version."""
    lib.write("s1", _frame(1))        # v0
    lib.snapshot("snap")
    lib.write("s1", _frame(2), prune_previous=True)   # v1; v0 tombstoned+pinned

    lib.add_to_snapshot("snap", ["s1"])   # replaces pin v0 -> v1
    assert _val(lib, "s1", as_of="snap") == 2
    with pytest.raises(NoSuchVersionException):
        lib.read("s1", as_of=0)


def test_snapshot_name_must_be_unique(lib):
    """Reference version_store_api.cpp:612: "Snapshot with name {} already
    exists"."""
    from arcticdb_spark.exceptions import InternalException
    lib.write("s1", _frame(1))
    lib.snapshot("snap")
    with pytest.raises(InternalException, match="already exists"):
        lib.snapshot("snap")


def test_snapshot_empty_library_raises(lib):
    """Reference _store.py:3156: NoSuchVersionException when no symbol
    exists in the library."""
    with pytest.raises(NoSuchVersionException):
        lib.snapshot("empty")


def test_snapshot_not_accept_tombstoned_key(lib):
    """Reference test_snapshot.py:498: snapshot(versions={sym: tombstoned})
    raises NoSuchVersionException naming sym:ver."""
    lib.write("s1", _frame(1))             # v0
    lib.write("s1", _frame(2), prune_previous=True)   # v0 tombstoned+purged
    with pytest.raises(NoSuchVersionException, match="s1:0"):
        lib.snapshot("snap", versions={"s1": 0})


def test_snapshot_allow_partial(lib):
    """Reference _store.py:3167 allow_partial_snapshot: keep the
    resolvable pairs; raise when none resolve."""
    lib.write("s1", _frame(1))
    lib.write("s2", _frame(2))
    lib.snapshot("snap", versions={"s1": 0, "ghost": 3},
                 allow_partial_snapshot=True)
    assert lib.list_symbols(snapshot_name="snap") == ["s1"]
    with pytest.raises(NoSuchVersionException):
        lib.snapshot("snap2", versions={"ghost": 3},
                     allow_partial_snapshot=True)
    with pytest.raises(NoSuchVersionException, match="ghost:3"):
        lib.snapshot("snap3", versions={"s2": 0, "ghost": 3})


def test_metadata_with_snapshots(lib):
    """test_basic_version_store.py:1630: a snapshot read returns the
    PINNED version's metadata, and snapshot metadata lives separately."""
    lib.write("symbol", _frame(1), metadata={"test": "data_meta"})
    lib.snapshot("snap1", metadata={"test": "snap_meta"})
    lib.write("symbol", _frame(2), metadata={"test": "should_not_be_returned"})

    assert lib.read_metadata("symbol", as_of="snap1").metadata == \
        {"test": "data_meta"}
    assert lib.list_snapshots()["snap1"] == {"test": "snap_meta"}


def test_snapshot_with_versions_dict_scopes_symbols(lib):
    """test_snapshot.py:230 test_snapshot_with_versions_dict: a snapshot
    built from an explicit versions dict contains ONLY those symbols."""
    lib.write("a", _frame(1))
    lib.write("b", _frame(2))
    lib.snapshot("snap_a", versions={"a": 0})
    lib.snapshot("snap_all")
    with pytest.raises(NoSuchVersionException):
        lib.read("b", as_of="snap_a")
    assert _val(lib, "b", as_of="snap_all") == 2
