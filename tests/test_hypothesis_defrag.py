"""Randomized append-chain + defragmentation property (the reference's
hypothesis test_append_with_defragmentation is skipped upstream on issue
#496; this is the working equivalent for this engine): many small appends
fragment the symbol, ``defragment_symbol_data`` compacts it, and the
logical content — values, order, prior versions — must be untouched."""

import tempfile

import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow

from hypothesis import HealthCheck, given, settings, strategies as st

from arcticdb_spark.catalog import Arctic

_spark = None


@pytest.fixture(autouse=True, scope="module")
def _init(spark):
    global _spark
    _spark = spark


@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(chunk_rows=st.lists(st.integers(1, 6), min_size=2, max_size=6),
       seed=st.integers(0, 2**16))
def test_defragment_preserves_content_and_versions(chunk_rows, seed):
    rng = np.random.default_rng(seed)
    lib = Arctic(tempfile.mkdtemp(), _spark).create_library(
        "frag", rows_per_file=4)   # tiny segments: appends fragment fast
    start = pd.Timestamp("2024-01-01")
    all_vals, pos = [], 0
    for i, n in enumerate(chunk_rows):
        vals = rng.integers(0, 1000, n).astype("int64").tolist()
        idx = pd.date_range(start + pd.Timedelta(minutes=pos), periods=n,
                            freq="1min")
        pdf = pd.DataFrame({"v": vals}, index=idx.rename("ts"))
        if i == 0:
            lib.write("sym", pdf)
        else:
            lib.append("sym", pdf)
        all_vals += vals
        pos += n

    pre = lib._resolve_version("sym", None)
    pre_files = len(pre.files)
    m = lib.defragment_symbol_data("sym")
    assert len(m.files) <= pre_files
    # content identical, in order, after compaction
    back = lib.read("sym", output_format="pandas")
    assert back["v"].tolist() == all_vals
    assert back.index.is_monotonic_increasing
    # prior version still reads the pre-defrag content exactly
    first_n = chunk_rows[0]
    v0 = lib.read("sym", as_of=0, output_format="pandas")
    assert v0["v"].tolist() == all_vals[:first_n]
    # defragment is idempotent on an already-compact symbol
    m2 = lib.defragment_symbol_data("sym")
    assert len(m2.files) == len(m.files)
    back2 = lib.read("sym", output_format="pandas")
    assert back2["v"].tolist() == all_vals
