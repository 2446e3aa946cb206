"""Property-based fuzz of the schema-epoch read machinery: a random chain
of dynamic-schema appends with random numeric dtypes (and occasionally new
columns) must read back exactly as the pandas concatenation under the
promotion lattice — regardless of which files landed on which schema epoch.
Exercises catalog._scan_files grouping/casting, _merge_schema, and the
manifest epoch round-trip (to_json/from_json sid dedupe)."""

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


_DTYPES = [np.int8, np.int16, np.int32, np.int64, np.float32, np.float64]


@st.composite
def append_chains(draw):
    n_chunks = draw(st.integers(2, 4))
    chunks = []
    start = pd.Timestamp("2024-01-01")
    rng = np.random.default_rng(draw(st.integers(0, 2**16)))
    for i in range(n_chunks):
        dt = draw(st.sampled_from(_DTYPES))
        n = draw(st.integers(1, 4))
        # values in int8 range so every dtype holds them exactly
        vals = rng.integers(-100, 100, n)
        pdf = pd.DataFrame({
            "ts": pd.date_range(start + pd.Timedelta(days=10 * i),
                                periods=n, freq="h"),
            "v": vals.astype(dt)})
        if i > 0 and draw(st.booleans()):
            pdf["extra"] = rng.integers(0, 5, n).astype(
                draw(st.sampled_from(_DTYPES)))
        chunks.append(pdf)
    return chunks


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(chunks=append_chains())
def test_epoch_chain_reads_like_pandas(chunks):
    lib = Arctic(tempfile.mkdtemp(), _spark).create_library(
        "fuzz", dynamic_schema=True)
    lib.write("sym", chunks[0])
    for c in chunks[1:]:
        lib.append("sym", c)
    out = (lib.read("sym", output_format="pandas")
           .sort_values("ts").reset_index(drop=True))
    expect = (pd.concat(chunks, ignore_index=True)
              .sort_values("ts").reset_index(drop=True))
    assert len(out) == len(expect)
    # every source value is exactly representable in the promoted type, so
    # compare numerically with zero tolerance
    assert np.array_equal(out["v"].to_numpy(dtype=np.float64),
                          expect["v"].to_numpy(dtype=np.float64))
    if "extra" in expect.columns:
        got = out["extra"].to_numpy(dtype=np.float64)
        want = expect["extra"].astype(np.float64).to_numpy()
        # rows from chunks without the column backfill with the promoted
        # type's DEFAULT (reference sparse_utils.hpp default_initialize):
        # 0 for an integer-promoted column, NaN for float
        mask = ~np.isnan(want)
        if out["extra"].dtype.kind in "iu":
            assert (got[~mask] == 0).all()
        else:
            assert np.isnan(got[~mask]).all()
        assert np.array_equal(got[mask], want[mask])
    # the promoted dtype must follow the lattice: any float chunk -> float,
    # all-int chunks -> the widest int
    kinds = {c["v"].dtype.kind for c in chunks}
    if "f" in kinds:
        assert out["v"].dtype.kind == "f"
    else:
        assert out["v"].dtype.kind == "i"
        assert out["v"].dtype.itemsize == max(
            c["v"].dtype.itemsize for c in chunks)
