"""Property-based range-surgery parity vs pandas: random write/append
layouts with random update patches (inside, straddling, before, after, and
into holes of the existing range), checked against the pandas construction
of "drop [patch_min, patch_max], splice patch, sort by ts". Pins the
below/above boundary-rewrite split (files must never straddle the spliced
hole) and ts-ordered row ids after surgery.
"""
import uuid

import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow

from hypothesis import HealthCheck, given, settings, strategies as st

N = 48


@st.composite
def scenarios(draw):
    rng = np.random.default_rng(draw(st.integers(0, 2**16)))
    ts = pd.date_range("2024-01-01", periods=N, freq="1h")
    # base frame with an optional hole
    hole_start = draw(st.integers(5, 30))
    hole_len = draw(st.integers(0, 10))
    base_mask = np.ones(N, dtype=bool)
    base_mask[hole_start:hole_start + hole_len] = False
    base = pd.DataFrame({"v": np.arange(N, dtype="float64")[base_mask]},
                        index=ts[base_mask].rename("ts"))
    # patch: contiguous hour span anywhere from before to after the base
    p0 = draw(st.integers(-6, N + 2))
    plen = draw(st.integers(1, 12))
    pidx = pd.date_range(ts[0] + pd.Timedelta(hours=p0), periods=plen,
                         freq="1h", name="ts")
    patch = pd.DataFrame({"v": 1000.0 + np.arange(plen)}, index=pidx)
    n_appends = draw(st.integers(0, 2))
    return base, patch, n_appends, rng


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(scenarios())
def test_update_matches_pandas_surgery(tmp_lib_module, sc):
    base, patch, n_appends, rng = sc
    lib = tmp_lib_module
    sym = "u_" + uuid.uuid4().hex[:10]
    # split base into an initial write plus strictly-after appends to get a
    # multi-file layout whose boundaries the patch can straddle
    parts = np.array_split(np.arange(len(base)), n_appends + 1)
    lib.write(sym, base.iloc[parts[0]])
    for p in parts[1:]:
        if len(p):
            lib.append(sym, base.iloc[p])
    lib.update(sym, patch)

    lo, hi = patch.index.min(), patch.index.max()
    keep = base[(base.index < lo) | (base.index > hi)]
    expected = pd.concat([keep, patch]).sort_index()
    out = lib.read(sym, output_format="pandas")
    pd.testing.assert_frame_equal(out, expected, check_freq=False)
    # ts-ordered row ids: full pandas read arrives already index-sorted
    assert out.index.is_monotonic_increasing
    # manifest file ranges stay disjoint after surgery
    m = lib._resolve_version(sym, None)
    spans = sorted((fe.ts_min, fe.ts_max) for fe in m.files
                   if fe.ts_min is not None)
    for (a_min, a_max), (b_min, b_max) in zip(spans, spans[1:]):
        assert a_max <= b_min, f"overlapping file ranges {spans}"


@pytest.fixture(scope="module")
def tmp_lib_module(spark, tmp_path_factory):
    from arcticdb_spark.catalog import Arctic
    root = str(tmp_path_factory.mktemp("hyp_update"))
    return Arctic(root, spark).create_library("hyplib")
