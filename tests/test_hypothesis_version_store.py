"""Stateful version-store model check, ported (simplified) from the
reference's ``python/tests/hypothesis/arcticdb/test_hypothesis_version_store.py``
RuleBasedStateMachine: random interleavings of write / append / delete /
delete_version / snapshot / prune against a pure-Python model, with
invariants over read()/as_of/list_symbols/list_versions/snapshot reads.

Round-8 extension: the model now tracks the reference's full tombstone /
snapshot lifecycle (test_deletion.py test_delete_snapshot,
test_delete_snapshot_key_shared_with_another_snapshot, library.py:2677):

* ``delete(symbol)`` purges unpinned versions but snapshot-pinned ones
  stay readable — via the snapshot AND by version number;
* tombstoned-but-pinned versions read by version number;
* deleting the LAST snapshot that pins a tombstoned/symbol-deleted
  version garbage-collects it (reads raise afterwards);
* (round 9) PRUNE tombstones every previous version — INCLUDING
  snapshot-pinned ones (reference test_basic_version_store.py:368
  ``test_with_prune``: exactly one non-``deleted`` version survives a
  prune; pinned previous versions are readable only via pin / version
  number, so a later ``delete_version(latest)`` drops the symbol rather
  than rolling back to them — test_snapshot.py:275
  ``test_read_symbol_with_ts_in_snapshot``).

Round-9 extensions: PRUNE physics above; restore_version /
add_to_snapshot / remove_from_snapshot rules (release-GC of displaced
pins); per-version VERBATIM metadata tracked through every rule with a
read_metadata invariant.

Round-10 extensions: staged ingestion — ``stage`` /
``sort_and_finalize_staged_data`` (write & append modes) interleaved with
every snapshot/prune/delete/restore rule (staged chunks are a separate
keyspace that survives ``delete(symbol)``, like the reference's
APPEND_DATA keys; empty-staging finalize raises E_NO_STAGED_SEGMENTS,
version_core.cpp:2590; finalize metadata is per-version verbatim) — plus
a pin-index invariant: the ``_pins.json`` reverse index every GC decision
now reads must exactly mirror the snapshot manifests after every rule.

Simplifications vs the reference machine (documented scope): batch reads
are pinned by the deterministic suites (test_catalog*.py,
test_batch_ops); this machine focuses on the version chain + snapshot GC
semantics where interleaving order matters.
"""

import tempfile

import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow

from hypothesis import HealthCheck, settings
from hypothesis.stateful import (RuleBasedStateMachine, invariant, rule,
                                 run_state_machine_as_test)
from hypothesis import strategies as st

from arcticdb_spark.catalog import Arctic, NoSuchVersionException

_spark = None


@pytest.fixture(autouse=True, scope="module")
def _init(spark):
    global _spark
    _spark = spark


_SYMS = ["s0", "s1"]

LIVE, TOMB, PURGED = "live", "tombstoned", "purged"


class VersionStoreMachine(RuleBasedStateMachine):
    def __init__(self):
        super().__init__()
        self.lib = Arctic(tempfile.mkdtemp(), _spark).create_library("vs")
        self.counter = 0
        self.vals: dict = {}    # sym -> {v: row values}
        self.state: dict = {}   # sym -> {v: LIVE | TOMB | PURGED}
        self.latest: dict = {}  # sym -> v | None
        self.gone: set = set()  # syms whose ref was removed (delete(sym))
        self.snaps: dict = {}   # name -> {sym: version}
        self.meta: dict = {}    # sym -> {v: metadata} (per-version, verbatim)
        self.staged: dict = {}  # sym -> [chunk frames] (unfinalized)
        self.kind: dict = {}    # sym -> {v: "row" | "dt"} (index kind)
        self.col_stats: dict = {}  # sym -> {v} with a stats sidecar

    # ---- model helpers --------------------------------------------------
    def _pins(self, sym):
        return {snap[sym] for snap in self.snaps.values() if sym in snap}

    def _frame(self):
        self.counter += 1
        return pd.DataFrame({
            "ts": pd.date_range("2024-01-01", periods=3, freq="D"),
            "v": np.arange(3, dtype="int64") + 10 * self.counter})

    def _purge_unpinned(self, sym, keep=()):
        """delete(sym) physics: unpinned non-keep versions lose their
        manifests; pinned ones survive."""
        pins = self._pins(sym)
        for v, stt in self.state.get(sym, {}).items():
            if stt != PURGED and v not in pins and v not in keep:
                self.state[sym][v] = PURGED

    def _prune_model(self, sym, latest):
        """Prune physics (reference test_basic_version_store.py:368
        test_with_prune: exactly ONE non-deleted version survives a prune):
        every previous version is TOMBSTONED — pinned ones stay readable by
        snapshot / version number until snapshot GC releases them, unpinned
        ones lose their manifests immediately."""
        pins = self._pins(sym)
        for v, stt in self.state.get(sym, {}).items():
            if v == latest or stt == PURGED:
                continue
            self.state[sym][v] = TOMB if v in pins else PURGED

    # ---- rules ----------------------------------------------------------
    @rule(sym=st.sampled_from(_SYMS), prune=st.booleans(),
          with_meta=st.booleans())
    def write_version(self, sym, prune, with_meta):
        pdf = self._frame()
        meta = {"n": self.counter} if with_meta else None
        m = self.lib.write(sym, pdf, metadata=meta, prune_previous=prune)
        self.gone.discard(sym)
        self.vals.setdefault(sym, {})[m.version] = pdf["v"].tolist()
        self.state.setdefault(sym, {})[m.version] = LIVE
        self.meta.setdefault(sym, {})[m.version] = meta
        self.kind.setdefault(sym, {})[m.version] = "row"
        self.latest[sym] = m.version
        if prune:
            self._prune_model(sym, m.version)

    @rule(sym=st.sampled_from(_SYMS))
    def append_version(self, sym):
        v = self.latest.get(sym)
        if v is None:
            return
        if self.kind.get(sym, {}).get(v) == "dt":
            # plain row-count append onto a datetime-indexed version
            # (created by finalize) is an index-kind mismatch — covered
            # deterministically in test_incompletes; skip here
            return
        prev_vals = self.vals[sym][v]
        self.counter += 1
        start = pd.Timestamp("2024-01-01") + pd.Timedelta(days=len(prev_vals))
        pdf = pd.DataFrame({
            "ts": pd.date_range(start, periods=2, freq="D"),
            "v": np.arange(2, dtype="int64") + 10 * self.counter})
        m = self.lib.append(sym, pdf)
        self.vals[sym][m.version] = prev_vals + pdf["v"].tolist()
        self.state[sym][m.version] = LIVE
        self.kind[sym][m.version] = "row"
        # metadata is per-version and set VERBATIM: an append without
        # metadata clears it (round-9 parity, reference
        # test_append_empty_frame_metadata)
        self.meta[sym][m.version] = None
        self.latest[sym] = m.version

    @rule(sym=st.sampled_from(_SYMS))
    def prune_versions(self, sym):
        if self.latest.get(sym) is None:
            return
        self.lib.prune_previous_versions(sym)
        self._prune_model(sym, self.latest[sym])

    @rule(sym=st.sampled_from(_SYMS), rps=st.sampled_from([2, 4, 100]))
    def compact_data(self, sym, rps):
        """Reference-exact compaction interleaved with the lifecycle: when
        work happens a NEW version carries identical content and metadata,
        post-compaction slice sizes sit in [2/3*rps, 4/3*rps], and a
        follow-up compaction is a no-op (plans/compact.py invariants)."""
        v = self.latest.get(sym)
        if v is None:
            return
        from arcticdb_spark.plans.compact import compact_bounds
        before = self.lib._load_ref(sym)["latest"]
        m = self.lib.compact_data(sym, rows_per_segment=rps)
        if m.version != before:
            self.vals[sym][m.version] = self.vals[sym][before]
            self.state[sym][m.version] = LIVE
            self.kind[sym][m.version] = self.kind[sym][before]
            # compaction carries the previous version's metadata verbatim
            self.meta[sym][m.version] = self.meta[sym].get(before)
            self.latest[sym] = m.version
            idx_df = self.lib.read_index(sym)
            counts = idx_df["end_row"] - idx_df["start_row"]
            lo, hi = compact_bounds(rps)
            assert int(counts.max()) <= hi, list(counts)
            assert int(counts.min()) >= min(lo, int(counts.sum())), \
                list(counts)
        assert not self.lib.compact_data_explain_plan(
            sym, rows_per_segment=rps).will_do_work

    @rule(sym=st.sampled_from(_SYMS), data=st.data())
    def delete_version(self, sym, data):
        """Any LIVE version, not just the latest (reference
        test_deletion.py test_delete_version_basic deletes middle
        versions: they tombstone, reads by number raise, latest is
        untouched unless it was the one deleted)."""
        live = sorted(v for v, stt in self.state.get(sym, {}).items()
                      if stt == LIVE)
        if not live:
            return
        v = data.draw(st.sampled_from(live))
        self.lib.delete_version(sym, v)
        self.state[sym][v] = TOMB
        remaining = [k for k in live if k != v]
        if remaining:
            if self.latest[sym] == v:
                self.latest[sym] = max(remaining)
        else:
            # last live version: the library deletes the symbol (ref gone,
            # unpinned manifests purged, pinned survive)
            self.latest[sym] = None
            self.gone.add(sym)
            self._purge_unpinned(sym)

    @rule(sym=st.sampled_from(_SYMS))
    def delete_symbol(self, sym):
        if self.latest.get(sym) is None:
            return
        self.lib.delete(sym)
        self.latest[sym] = None
        self.gone.add(sym)
        pins = self._pins(sym)
        for v, stt in self.state[sym].items():
            if v in pins:
                if stt == LIVE:
                    self.state[sym][v] = TOMB   # readable only via pins now
            elif stt != PURGED:
                self.state[sym][v] = PURGED

    @rule(name=st.sampled_from(["snapA", "snapB"]))
    def take_snapshot(self, name):
        pinned = {s: v for s, v in self.latest.items() if v is not None}
        if not pinned:
            return
        if name in self.snaps:
            self.lib.delete_snapshot(name)
            self._release(self.snaps.pop(name))
        self.lib.snapshot(name)
        self.snaps[name] = dict(pinned)

    @rule(name=st.sampled_from(["snapA", "snapB"]))
    def drop_snapshot(self, name):
        if name in self.snaps:
            self.lib.delete_snapshot(name)
            self._release(self.snaps.pop(name))

    @rule(name=st.sampled_from(["snapA", "snapB"]),
          sym=st.sampled_from(_SYMS))
    def add_latest_to_snapshot(self, name, sym):
        """Round-9 extension (reference test_snapshot.py:349
        test_add_to_snapshot_replace): the entry is REPLACED and the
        displaced pin released — snapshot GC applies as in
        delete_snapshot."""
        if name not in self.snaps:
            return
        v = self.latest.get(sym)
        if v is None:
            self.lib.add_to_snapshot(name, sym)  # unresolvable: no effect
            return
        self.lib.add_to_snapshot(name, sym)
        old = self.snaps[name].get(sym)
        self.snaps[name][sym] = v
        if old is not None and old != v:
            self._release({sym: old})

    @rule(name=st.sampled_from(["snapA", "snapB"]),
          sym=st.sampled_from(_SYMS))
    def remove_sym_from_snapshot(self, name, sym):
        """Round-9 extension (reference test_snapshot.py:447
        test_remove_from_snapshot): the removed pin is released and
        GC'd if it was the last one keeping a tombstoned version."""
        if name not in self.snaps:
            return
        pinned = self.snaps[name].get(sym)
        self.lib.remove_from_snapshot(name, sym)
        if pinned is not None:
            del self.snaps[name][sym]
            self._release({sym: pinned})

    @rule(sym=st.sampled_from(_SYMS), data=st.data())
    def restore_version(self, sym, data):
        """Round-9 extension (reference _store.py:2739 restore_version):
        latest becomes a COPY of the chosen version under a new version
        number; the source version's state is untouched."""
        if self.latest.get(sym) is None:
            return
        pins = self._pins(sym)
        readable = sorted(
            v for v, stt in self.state.get(sym, {}).items()
            if stt == LIVE or (stt == TOMB and v in pins))
        if not readable:
            return
        v = data.draw(st.sampled_from(readable))
        m = self.lib.restore_version(sym, v)
        self.vals[sym][m.version] = self.vals[sym][v]
        self.state[sym][m.version] = LIVE
        self.kind[sym][m.version] = self.kind[sym].get(v, "row")
        # restore copies the manifest — including its metadata
        self.meta[sym][m.version] = self.meta[sym].get(v)
        self.latest[sym] = m.version

    # ---- staged ingestion (round 10) -------------------------------------
    @rule(sym=st.sampled_from(_SYMS), n=st.integers(1, 3))
    def stage_chunks(self, sym, n):
        """stage() is version-invisible: no version chain effect until a
        finalize consumes the chunks (reference APPEND_DATA keys)."""
        for _ in range(n):
            self.counter += 1
            start = (pd.Timestamp("2024-01-01")
                     + pd.Timedelta(days=10 * self.counter))
            pdf = pd.DataFrame(
                {"v": np.arange(2, dtype="int64") + 10 * self.counter},
                index=pd.date_range(start, periods=2, freq="D"))
            self.lib.stage(sym, pdf)
            self.staged.setdefault(sym, []).append(pdf)

    @rule(sym=st.sampled_from(_SYMS),
          mode=st.sampled_from(["write", "append"]),
          with_meta=st.booleans())
    def finalize_staged(self, sym, mode, with_meta):
        """sort_and_finalize_staged_data: ONE new version from all staged
        chunks — replacing (write) or extending (append) the previous
        version; metadata per-version VERBATIM; empty staging raises
        E_NO_STAGED_SEGMENTS (reference version_core.cpp:2590)."""
        chunks = self.staged.get(sym, [])
        meta = {"fin": self.counter} if with_meta else None
        if not chunks:
            from arcticdb_spark.catalog import UserInputException
            with pytest.raises(UserInputException):
                self.lib.sort_and_finalize_staged_data(sym, mode,
                                                       metadata=meta)
            return
        latest = self.latest.get(sym)
        appending = mode == "append" and latest is not None
        if appending and self.kind.get(sym, {}).get(latest) == "row":
            # datetime chunks onto a row-count version: index-kind
            # mismatch, covered deterministically elsewhere — keep the
            # chunks staged and skip
            return
        m = self.lib.sort_and_finalize_staged_data(sym, mode, metadata=meta)
        merged = pd.concat(chunks).sort_index()["v"].tolist()
        vals = (self.vals[sym][latest] + merged) if appending else merged
        self.gone.discard(sym)
        self.vals.setdefault(sym, {})[m.version] = vals
        self.state.setdefault(sym, {})[m.version] = LIVE
        self.meta.setdefault(sym, {})[m.version] = meta
        self.kind.setdefault(sym, {})[m.version] = "dt"
        self.latest[sym] = m.version
        self.staged[sym] = []

    @rule(sym=st.sampled_from(_SYMS))
    def create_stats(self, sym):
        """Round-11 extension (r10 verdict item 6): MINMAX column stats
        on the latest version, interleaved with every lifecycle rule. The
        sidecar is keyed per-version (catalog.py _stats/v{version}.json),
        which makes stale-stats mispruning after write/append/restore
        structurally impossible — the invariants below encode that so a
        refactor can't lose it."""
        if self.latest.get(sym) is None:
            return
        self.lib.create_column_stats(sym, ["v"])
        self.col_stats.setdefault(sym, set()).add(self.latest[sym])

    @rule(sym=st.sampled_from(_SYMS))
    def drop_stats(self, sym):
        if self.latest.get(sym) is None:
            return
        self.lib.drop_column_stats(sym)
        self.col_stats.get(sym, set()).discard(self.latest[sym])

    def _release(self, pins):
        """Snapshot GC model: a tombstoned / symbol-deleted version whose
        LAST pin is released is purged (reference
        test_delete_snapshot_key_shared_with_another_snapshot)."""
        for sym, v in pins.items():
            if v in self._pins(sym):
                continue    # still pinned by another snapshot
            stt = self.state.get(sym, {}).get(v)
            if stt == TOMB or (sym in self.gone and stt != PURGED):
                self.state[sym][v] = PURGED

    # ---- invariants -----------------------------------------------------
    @invariant()
    def symbols_match(self):
        expect = sorted(s for s, v in self.latest.items() if v is not None)
        assert self.lib.list_symbols() == expect

    @invariant()
    def latest_reads_match(self):
        for sym, v in self.latest.items():
            if v is None:
                continue
            out = self.lib.read(sym, output_format="pandas")
            assert out["v"].tolist() == self.vals[sym][v], sym

    @invariant()
    def as_of_reads_match(self):
        for sym, states in self.state.items():
            pins = self._pins(sym)
            for v, stt in states.items():
                if stt == PURGED or (stt == TOMB and v not in pins):
                    with pytest.raises(NoSuchVersionException):
                        self.lib.read(sym, as_of=v)
                else:
                    # LIVE, or TOMB-but-pinned (readable by version number,
                    # reference test_delete_snapshot "Should not raise")
                    out = self.lib.read(sym, as_of=v, output_format="pandas")
                    assert out["v"].tolist() == self.vals[sym][v], (sym, v)

    @invariant()
    def metadata_matches(self):
        for sym, states in self.state.items():
            pins = self._pins(sym)
            for v, stt in states.items():
                if stt == LIVE or (stt == TOMB and v in pins):
                    got = self.lib.read_metadata(sym, as_of=v)
                    assert got.version == v
                    assert got.metadata == self.meta[sym].get(v), (sym, v)

    @invariant()
    def staged_symbols_match(self):
        # staged chunks are a separate keyspace: they survive
        # delete(symbol) and only finalize/remove consumes them
        expect = sorted(s for s, c in self.staged.items() if c)
        assert self.lib.get_staged_symbols() == expect

    @invariant()
    def pin_index_matches(self):
        # the _pins.json reverse index (what prune/GC/resolve now read
        # instead of walking snapshots) must exactly mirror the snapshot
        # manifests after EVERY rule
        for sym in set(self.state) | set(self.latest):
            expect: dict = {}
            for name, snap in sorted(self.snaps.items()):
                if sym in snap:
                    expect.setdefault(str(snap[sym]), []).append(name)
            got = self.lib._load_pins(sym)
            assert got == {k: sorted(v) for k, v in expect.items()}, sym

    @invariant()
    def stats_keyed_per_version(self):
        # a version's stats sidecar exists for EXACTLY the versions where
        # create_column_stats ran: a new write/append/restore never
        # inherits the previous version's stats (per-version keying), and
        # drop removes only its own version's sidecar
        for sym, states in self.state.items():
            pins = self._pins(sym)
            have = self.col_stats.get(sym, set())
            for v, stt in states.items():
                if stt == PURGED or (stt == TOMB and v not in pins):
                    continue   # unreadable: resolve raises before stats
                got = self.lib.get_column_stats(sym, as_of=v)
                assert (got is not None) == (v in have), (sym, v)

    @invariant()
    def pruned_reads_equal_unpruned(self):
        # zone-map pruning must be invisible in results: a filtered read
        # of a stats-bearing version equals the model (= unpruned truth)
        from arcticdb_spark.query import QueryBuilder
        for sym, have in self.col_stats.items():
            pins = self._pins(sym)
            for v in have:
                stt = self.state.get(sym, {}).get(v)
                if stt == PURGED or (stt == TOMB and v not in pins):
                    continue
                vals = self.vals[sym][v]
                cut = sorted(vals)[len(vals) // 2]
                q = QueryBuilder()
                q = q[q["v"] >= cut]
                out = self.lib.read(sym, as_of=v, query_builder=q,
                                    output_format="pandas")
                assert out["v"].tolist() == [x for x in vals
                                             if x >= cut], (sym, v)

    @invariant()
    def snapshot_reads_match(self):
        assert sorted(self.lib.list_snapshots()) == sorted(self.snaps)
        for name, pins in self.snaps.items():
            for sym, v in pins.items():
                out = self.lib.read(sym, as_of=name, output_format="pandas")
                assert out["v"].tolist() == self.vals[sym][v], (name, sym)


VersionStoreMachine.TestCase.settings = settings(
    max_examples=5, stateful_step_count=10, deadline=None,
    suppress_health_check=list(HealthCheck))


def test_version_store_state_machine(spark):
    run_state_machine_as_test(
        VersionStoreMachine, settings=VersionStoreMachine.TestCase.settings)
