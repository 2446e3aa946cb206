"""Round-11 regression pins for the r10 ADVICE findings.

Each test pins one reported defect:
1. snapshot() pins BEFORE the manifest CAS (crash/interleave window can
   no longer expose a visible snapshot whose versions are unpinned), and
   a lost same-name CAS race keeps the winner's pins intact.
2. Legacy libraries whose snapshots predate the _pins.json sidecar
   lazily re-derive it from the snapshot manifests — pinned versions
   never lose GC protection because the sidecar is missing.
3. Exact rows_per_file write slicing is deterministic/contractual
   (one file per slice, leading slices exactly rows_per_file rows),
   even with equal timestamps straddling slice boundaries.
4. QueryBuilder is unhashable (mutable builder; reference defines
   __eq__ only — processing.py:1129).
"""
import os

import numpy as np
import pandas as pd
import pytest


def _dtidx(n, name=None, freq="1h"):
    return pd.DatetimeIndex(
        pd.date_range("2024-01-01", periods=n, freq=freq), name=name)


class TestSnapshotPinOrdering:
    def test_pins_written_before_manifest(self, tmp_lib, monkeypatch):
        # crash injection: fail the manifest CAS — the pins written
        # before it must exist at that instant (stale pins only leak;
        # the old order lost data)
        tmp_lib.write("s", pd.DataFrame({"a": [1, 2]}, index=_dtidx(2)))
        seen = {}
        real_cas = tmp_lib._fs.write_json_if_absent

        def crash_cas(path, payload):
            seen["pins_at_cas"] = tmp_lib._load_pins("s")
            raise RuntimeError("simulated crash at manifest CAS")

        monkeypatch.setattr(tmp_lib._fs, "write_json_if_absent", crash_cas)
        with pytest.raises(RuntimeError):
            tmp_lib.snapshot("snap1")
        assert seen["pins_at_cas"] == {"0": ["snap1"]}
        monkeypatch.setattr(tmp_lib._fs, "write_json_if_absent", real_cas)
        # the orphaned pin leaks until released, but must not break
        # reads/prune; a later same-name snapshot succeeds and owns it
        tmp_lib.snapshot("snap1")
        assert tmp_lib._load_pins("s") == {"0": ["snap1"]}

    def test_lost_same_name_race_keeps_winner_pins(self, tmp_lib,
                                                   monkeypatch):
        from arcticdb_spark.exceptions import InternalException
        tmp_lib.write("s", pd.DataFrame({"a": [1]}, index=_dtidx(1)))
        tmp_lib.snapshot("snap1")
        assert tmp_lib._load_pins("s") == {"0": ["snap1"]}
        # second writer: same name, same versions; pre-check lies so it
        # reaches the CAS and loses — its rollback must NOT strip the
        # winner's identical (symbol, version, name) pin
        snap_path = tmp_lib._snap_path("snap1")
        real_exists = tmp_lib._fs.exists
        monkeypatch.setattr(
            tmp_lib._fs, "exists",
            lambda p: False if p == snap_path else real_exists(p))
        with pytest.raises(InternalException):
            tmp_lib.snapshot("snap1")
        monkeypatch.setattr(tmp_lib._fs, "exists", real_exists)
        assert tmp_lib._load_pins("s") == {"0": ["snap1"]}
        # and the pinned version still survives a prune
        tmp_lib.write("s", pd.DataFrame({"a": [9]}, index=_dtidx(1)),
                      prune_previous_versions=True)
        assert tmp_lib.read("s", as_of="snap1", output_format="pandas")["a"].tolist() == [1]

    def test_lost_race_rolls_back_disjoint_pins(self, tmp_lib,
                                                monkeypatch):
        from arcticdb_spark.exceptions import InternalException
        tmp_lib.write("s", pd.DataFrame({"a": [1]}, index=_dtidx(1)))
        tmp_lib.write("s", pd.DataFrame({"a": [2]}, index=_dtidx(1)))
        tmp_lib.snapshot("snap1", versions={"s": 1})
        # loser pins v0 under the same name, loses the CAS: v0's pin is
        # NOT in the winning manifest, so the rollback must remove it
        snap_path = tmp_lib._snap_path("snap1")
        real_exists = tmp_lib._fs.exists
        monkeypatch.setattr(
            tmp_lib._fs, "exists",
            lambda p: False if p == snap_path else real_exists(p))
        with pytest.raises(InternalException):
            tmp_lib.snapshot("snap1", versions={"s": 0})
        assert tmp_lib._load_pins("s") == {"1": ["snap1"]}


class TestLegacyPinBackfill:
    def _strip_sidecars(self, lib):
        for sym in lib.list_symbols():
            p = lib._pins_path(sym)
            if lib._fs.exists(p):
                lib._fs.remove(p)
            d = lib._pins_dir(sym)
            if lib._fs.isdir(d):
                lib._fs.rmtree(d)

    def _reopen(self, lib):
        from arcticdb_spark.catalog import Library
        root = os.path.dirname(lib.root)
        return Library(lib.spark, root, lib.name)

    def test_prune_respects_legacy_snapshot(self, tmp_lib):
        tmp_lib.write("s", pd.DataFrame({"a": [1, 2]}, index=_dtidx(2)))
        tmp_lib.snapshot("legacy")
        tmp_lib.write("s", pd.DataFrame({"a": [9]}, index=_dtidx(1)))
        self._strip_sidecars(tmp_lib)   # simulate a pre-sidecar library
        lib = self._reopen(tmp_lib)
        lib.prune_previous_versions("s")
        # v0 is tombstoned but snapshot-pinned: data must survive
        got = lib.read("s", as_of="legacy", output_format="pandas")
        assert got["a"].tolist() == [1, 2]
        # and the backfill persisted the pin marker for the next opener
        assert lib._fs.exists(lib._pin_path("s", 0, "legacy"))
        assert lib._load_pins("s") == {"0": ["legacy"]}

    def test_delete_respects_legacy_snapshot(self, tmp_lib):
        tmp_lib.write("s", pd.DataFrame({"a": [7]}, index=_dtidx(1)))
        tmp_lib.snapshot("legacy")
        self._strip_sidecars(tmp_lib)
        lib = self._reopen(tmp_lib)
        lib.delete("s")
        assert lib.read("s", as_of="legacy", output_format="pandas")["a"].tolist() == [7]

    def test_list_versions_shows_legacy_pinned_deleted_symbol(self,
                                                              tmp_lib):
        tmp_lib.write("s", pd.DataFrame({"a": [1]}, index=_dtidx(1)))
        tmp_lib.snapshot("legacy")
        tmp_lib.delete("s")
        # strip explicitly: "s" is no longer in list_symbols after delete
        assert tmp_lib._fs.exists(tmp_lib._pin_path("s", 0, "legacy"))
        tmp_lib._fs.rmtree(tmp_lib._pins_dir("s"))
        # the deleted-but-pinned symbol dir has no sidecar; list_versions
        # must still surface its tombstone row via the lazy backfill
        lib = self._reopen(tmp_lib)
        rows = lib.list_versions()
        assert [(r["symbol"], r["version"], r["deleted"]) for r in rows] \
            == [("s", 0, True)]

    def test_no_snapshots_no_walk_cost(self, tmp_lib):
        # a symbol in no snapshot stays pin-free and the walk result is
        # memoized (second call hits the session memo, not the fs)
        tmp_lib.write("s", pd.DataFrame({"a": [1]}, index=_dtidx(1)))
        lib = self._reopen(tmp_lib)
        assert lib._load_pins("s") == {}
        assert "s" in lib._pins_backfilled
        calls = []
        real = lib._fs.listdir
        lib._fs.listdir = lambda p: (calls.append(p) or real(p))
        try:
            assert lib._load_pins("s") == {}
        finally:
            lib._fs.listdir = real
        assert calls == []


class TestExactSliceDeterminism:
    def test_one_file_per_slice_exact_rows(self, spark, tmp_path):
        from arcticdb_spark.catalog import Arctic
        lib = Arctic(str(tmp_path), spark).create_library(
            "slices", rows_per_file=100)
        df = pd.DataFrame({"v": np.arange(1234, dtype="int64")},
                          index=_dtidx(1234, freq="1min"))
        lib.write("s", df)
        files = lib._load_manifest("s", 0).files
        rows = [fe.rows for fe in files]
        assert rows == [100] * 12 + [34]
        back = lib.read("s", output_format="pandas")
        pd.testing.assert_frame_equal(back, df, check_freq=False)

    def test_equal_timestamps_across_boundary(self, spark, tmp_path):
        # every timestamp duplicated 3x; boundaries fall mid-duplicate —
        # the layout must still be exact and the roundtrip stable
        from arcticdb_spark.catalog import Arctic
        lib = Arctic(str(tmp_path), spark).create_library(
            "slices2", rows_per_file=50)
        idx = pd.DatetimeIndex(np.repeat(_dtidx(70).values, 3))
        df = pd.DataFrame({"v": np.arange(210, dtype="int64")}, index=idx)
        df.index.name = None
        lib.write("s", df)
        files = lib._load_manifest("s", 0).files
        assert [fe.rows for fe in files] == [50, 50, 50, 50, 10]
        back = lib.read("s", output_format="pandas")
        assert back.index.equals(df.index)
        assert sorted(back["v"].tolist()) == sorted(df["v"].tolist())


class TestQueryBuilderUnhashable:
    def test_unhashable_like_reference(self):
        from arcticdb_spark import QueryBuilder
        q = QueryBuilder()
        q = q[q["a"] > 1]
        with pytest.raises(TypeError):
            hash(q)
        q2 = QueryBuilder()
        q2 = q2[q2["a"] > 1]
        assert q == q2   # __eq__ still works
