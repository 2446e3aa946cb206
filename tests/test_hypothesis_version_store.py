"""Stateful version-store model check, ported (simplified) from the
reference's ``python/tests/hypothesis/arcticdb/test_hypothesis_version_store.py``
RuleBasedStateMachine: random interleavings of write / append / delete /
delete_version / snapshot / prune against a pure-Python model, with
invariants over read()/as_of/list_symbols/list_versions/snapshot reads.

Simplifications vs the reference machine (documented scope): metadata
payloads and batch reads are pinned by the deterministic suites
(test_catalog*.py, test_batch_ops); this machine focuses on the version
chain + snapshot GC semantics where interleaving order matters.
"""

import tempfile

import numpy as np
import pandas as pd
import pytest
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


class VersionStoreMachine(RuleBasedStateMachine):
    def __init__(self):
        super().__init__()
        self.lib = Arctic(tempfile.mkdtemp(), _spark).create_library("vs")
        self.counter = 0
        # model: sym -> {version_number: values or None (tombstoned)}
        self.versions: dict = {}
        self.latest: dict = {}
        self.snaps: dict = {}   # name -> {sym: version}

    def _frame(self):
        self.counter += 1
        return pd.DataFrame({
            "ts": pd.date_range("2024-01-01", periods=3, freq="D"),
            "v": np.arange(3, dtype="int64") + 10 * self.counter})

    @rule(sym=st.sampled_from(_SYMS), prune=st.booleans())
    def write_version(self, sym, prune):
        pdf = self._frame()
        m = self.lib.write(sym, pdf, prune_previous=prune)
        vers = self.versions.setdefault(sym, {})
        if prune:
            pinned = {v for snap in self.snaps.values()
                      for s, v in snap.items() if s == sym}
            for v in list(vers):
                if vers[v] is not None and v not in pinned:
                    vers[v] = None
        vers[m.version] = pdf["v"].tolist()
        self.latest[sym] = m.version

    @rule(sym=st.sampled_from(_SYMS))
    def append_version(self, sym):
        if self.latest.get(sym) is None or \
                self.versions[sym].get(self.latest[sym]) is None:
            return
        prev_vals = self.versions[sym][self.latest[sym]]
        self.counter += 1
        start = pd.Timestamp("2024-01-01") + pd.Timedelta(
            days=len(prev_vals))
        pdf = pd.DataFrame({
            "ts": pd.date_range(start, periods=2, freq="D"),
            "v": np.arange(2, dtype="int64") + 10 * self.counter})
        m = self.lib.append(sym, pdf)
        self.versions[sym][m.version] = prev_vals + pdf["v"].tolist()
        self.latest[sym] = m.version

    @rule(sym=st.sampled_from(_SYMS))
    def delete_latest_version(self, sym):
        v = self.latest.get(sym)
        if v is None:
            return
        self.lib.delete_version(sym, v)
        self.versions[sym][v] = None
        live = [k for k, vals in self.versions[sym].items()
                if vals is not None]
        self.latest[sym] = max(live) if live else None

    @rule(name=st.sampled_from(["snapA", "snapB"]))
    def take_snapshot(self, name):
        pinned = {s: v for s, v in self.latest.items() if v is not None}
        if not pinned:
            return
        if name in self.snaps:
            self.lib.delete_snapshot(name)
            del self.snaps[name]
        self.lib.snapshot(name)
        self.snaps[name] = dict(pinned)

    @rule(name=st.sampled_from(["snapA", "snapB"]))
    def drop_snapshot(self, name):
        if name in self.snaps:
            self.lib.delete_snapshot(name)
            del self.snaps[name]

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
            assert out["v"].tolist() == self.versions[sym][v], sym

    @invariant()
    def as_of_reads_match(self):
        for sym, vers in self.versions.items():
            for v, vals in vers.items():
                if vals is None:
                    pinned = any(snap.get(sym) == v
                                 for snap in self.snaps.values())
                    if not pinned:
                        continue
                    # tombstoned but snapshot-pinned: still readable
                    out = self.lib.read(sym, as_of=v,
                                        output_format="pandas")
                    assert len(out) > 0
                else:
                    out = self.lib.read(sym, as_of=v,
                                        output_format="pandas")
                    assert out["v"].tolist() == vals, (sym, v)

    @invariant()
    def snapshot_reads_match(self):
        assert sorted(self.lib.list_snapshots()) == sorted(self.snaps)
        for name, pins in self.snaps.items():
            for sym, v in pins.items():
                out = self.lib.read(sym, as_of=name,
                                    output_format="pandas")
                want = self.versions[sym][v]
                if want is not None:
                    assert out["v"].tolist() == want, (name, sym)


VersionStoreMachine.TestCase.settings = settings(
    max_examples=3, stateful_step_count=8, deadline=None,
    suppress_health_check=list(HealthCheck))


def test_version_store_state_machine(spark):
    run_state_machine_as_test(
        VersionStoreMachine,
        settings=VersionStoreMachine.TestCase.settings)
