"""Ported from the reference's test_deletion.py: the tombstone / snapshot
data lifecycle — snapshot-pinned versions survive deletes (readable by
snapshot name AND by version number), and deleting the last referencing
snapshot garbage-collects them."""

import os
import tempfile

import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow


from arcticdb_spark.catalog import Arctic, NoSuchVersionException


@pytest.fixture()
def lib(spark):
    return Arctic(tempfile.mkdtemp(), spark).create_library("snapgc")


def _frame(vals):
    return pd.DataFrame(
        {"v": np.asarray(vals, dtype="int64")},
        index=pd.date_range("2024-01-01", periods=len(vals)).rename("ts"))


def test_delete_snapshot_releases_pruned_version(lib):
    """Reference test_deletion.py:137 test_delete_snapshot: v0 pruned but
    snapshotted stays readable by snapshot AND version number; deleting
    the snapshot removes its keys."""
    lib.write("sym", _frame([1, 2, 3]))          # v0
    lib.snapshot("snap")
    lib.write("sym", _frame([4, 5, 6]), prune_previous=True)   # v1
    # pruned v0: still readable, it exists in a snapshot
    assert lib.read("sym", as_of=0,
                    output_format="pandas")["v"].tolist() == [1, 2, 3]
    assert lib.read("sym", as_of="snap",
                    output_format="pandas")["v"].tolist() == [1, 2, 3]
    v0_files = [fe.path for fe in lib._load_manifest("sym", 0).files]
    lib.delete_snapshot("snap")
    with pytest.raises(NoSuchVersionException):
        lib.read("sym", as_of="snap")
    with pytest.raises(NoSuchVersionException):
        lib.read("sym", as_of=0)
    assert not any(os.path.exists(p) for p in v0_files)
    # the live version is untouched
    assert lib.read("sym", output_format="pandas")["v"].tolist() == [4, 5, 6]


def test_delete_snapshot_key_shared_with_another_snapshot(lib):
    """Reference test_deletion.py:169: a tombstoned version pinned by TWO
    snapshots survives the deletion of one; deleting the last releases it."""
    lib.write("sym", _frame([1, 2, 3]))          # v0
    lib.snapshot("snap1")
    lib.snapshot("snap2")
    lib.write("sym", _frame([7, 8]))             # v1 keeps the symbol alive
    lib.delete_version("sym", 0)                 # tombstone v0
    # both snapshots still reference v0
    assert lib.read("sym", as_of="snap1",
                    output_format="pandas")["v"].tolist() == [1, 2, 3]
    lib.delete_snapshot("snap1")
    # snap2 still pins v0: keys must survive
    assert lib.read("sym", as_of="snap2",
                    output_format="pandas")["v"].tolist() == [1, 2, 3]
    assert lib.read("sym", as_of=0,
                    output_format="pandas")["v"].tolist() == [1, 2, 3]
    v0_files = [fe.path for fe in lib._load_manifest("sym", 0).files]
    lib.delete_snapshot("snap2")
    with pytest.raises(NoSuchVersionException):
        lib.read("sym", as_of=0)
    assert not any(os.path.exists(p) for p in v0_files)


def test_delete_symbol_keeps_snapshot_pinned_data(lib):
    """Reference library.py:2677: delete() ``may not actually delete the
    underlying data if a snapshot still references the version``."""
    lib.write("a", _frame([1, 2, 3]))            # v0
    lib.snapshot("snap")
    lib.write("a", _frame([9]))                  # v1 (unpinned)
    v1_files = [fe.path for fe in lib._load_manifest("a", 1).files]
    lib.delete("a")
    # logically gone
    assert not lib.has_symbol("a")
    assert "a" not in lib.list_symbols()
    with pytest.raises(NoSuchVersionException):
        lib.read("a")
    # unpinned v1 is physically gone too
    assert not any(os.path.exists(p) for p in v1_files)
    # pinned v0 still reads — by snapshot and by version number
    assert lib.read("a", as_of="snap",
                    output_format="pandas")["v"].tolist() == [1, 2, 3]
    assert lib.read("a", as_of=0,
                    output_format="pandas")["v"].tolist() == [1, 2, 3]
    # releasing the snapshot garbage-collects the survivor
    v0_files = [fe.path for fe in lib._load_manifest("a", 0).files]
    lib.delete_snapshot("snap")
    with pytest.raises(NoSuchVersionException):
        lib.read("a", as_of=0)
    assert not any(os.path.exists(p) for p in v0_files)


def test_delete_then_rewrite_continues_version_chain(lib):
    """A fresh write after a pinned delete keeps the old pinned version
    readable and continues the version numbering."""
    lib.write("a", _frame([1, 2]))               # v0
    lib.snapshot("snap")
    lib.delete("a")
    m = lib.write("a", _frame([5, 6, 7]))        # continues after v0
    assert m.version > 0
    assert lib.read("a", output_format="pandas")["v"].tolist() == [5, 6, 7]
    assert lib.read("a", as_of="snap",
                    output_format="pandas")["v"].tolist() == [1, 2]
    assert lib.read("a", as_of=0,
                    output_format="pandas")["v"].tolist() == [1, 2]
