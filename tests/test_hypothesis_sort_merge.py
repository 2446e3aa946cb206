"""Property-based STAGE -> SORT_AND_FINALIZE parity vs pandas, ported from
the reference's ``python/tests/hypothesis/arcticdb/test_sort_merge.py``:
random ts-indexed chunks staged in arbitrary order, compacted with
``sort_and_finalize_staged_data``, compared against
``pd.concat(chunks).sort_index()`` (the reference's
merge_and_sort_segment_list oracle — int columns 0-filled where a chunk
lacked them, per the non-nullable layout).

Scope notes vs the reference suite: index values are drawn UNIQUE (the
reference's sort is unstable on duplicated index values and its oracle
special-cases them; determinism with duplicates is pinned by the
deterministic staged tests instead), and NaT-in-index draws are excluded.
"""

import tempfile

import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow

from hypothesis import HealthCheck, assume, given, settings, strategies as st

from arcticdb_spark.catalog import Arctic, SchemaException, SortingException

_spark = None


@pytest.fixture(autouse=True, scope="module")
def _init(spark):
    global _spark
    _spark = spark


_ALL_COLS = ["int_col", "float_col", "str_col"]


def _mk_chunk(rng, idx_vals, cols):
    data = {}
    n = len(idx_vals)
    if "int_col" in cols:
        data["int_col"] = rng.integers(-50, 50, n).astype("int64")
    if "float_col" in cols:
        data["float_col"] = rng.uniform(-5, 5, n)
    if "str_col" in cols:
        data["str_col"] = rng.choice(["a", "bb", "ccc"], n).astype(object)
    idx = pd.DatetimeIndex(pd.Timestamp("2024-01-01")
                           + pd.to_timedelta(idx_vals, unit="min"),
                           name="ts")
    return pd.DataFrame(data, index=idx)


@st.composite
def staged_chunks(draw, same_columns):
    rng = np.random.default_rng(draw(st.integers(0, 2**16)))
    n_chunks = draw(st.integers(1, 4))
    sizes = [draw(st.integers(1, 12)) for _ in range(n_chunks)]
    # unique minute offsets across ALL chunks, dealt out shuffled so chunk
    # ranges interleave (the merge actually has to merge)
    total = sum(sizes)
    offsets = rng.choice(20_000, size=total, replace=False)
    chunks, pos = [], 0
    for s in sizes:
        if same_columns:
            cols = _ALL_COLS
        else:
            cols = sorted(draw(st.sets(st.sampled_from(_ALL_COLS),
                                       min_size=1)))
        chunks.append(_mk_chunk(rng, offsets[pos:pos + s], cols))
        pos += s
    return chunks


def _expected(chunks):
    merged = pd.concat(chunks).sort_index()
    if "int_col" in merged.columns:
        merged["int_col"] = merged["int_col"].fillna(0).astype("int64")
    return merged


def _check(out, expected):
    assert list(out.index) == list(expected.index)
    for c in expected.columns:
        got, want = out[c], expected[c]
        if pd.api.types.is_float_dtype(want.dtype):
            assert np.allclose(got.astype("float64"),
                               want.astype("float64"), equal_nan=True), c
        else:
            assert [None if pd.isna(v) else v for v in got.tolist()] == \
                [None if pd.isna(v) else v for v in want.tolist()], c


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(chunks=staged_chunks(same_columns=True))
def test_sort_merge_static_schema_write(chunks):
    lib = Arctic(tempfile.mkdtemp(), _spark).create_library("sm")
    for c in chunks:
        lib.stage("sym", c, validate_index=False)
    lib.sort_and_finalize_staged_data("sym")
    out = lib.read("sym", output_format="pandas")
    _check(out, _expected(chunks))


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(chunks=staged_chunks(same_columns=False))
def test_sort_merge_dynamic_schema_write(chunks):
    # chunks may carry different column subsets; int holes 0-fill
    lib = Arctic(tempfile.mkdtemp(), _spark).create_library(
        "sm", dynamic_schema=True)
    for c in chunks:
        lib.stage("sym", c, validate_index=False)
    lib.sort_and_finalize_staged_data("sym")
    out = lib.read("sym", output_format="pandas")
    _check(out, _expected(chunks))


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(chunks=staged_chunks(same_columns=True), data=st.data())
def test_sort_merge_static_schema_append(chunks, data):
    # initial version takes everything strictly before a split point;
    # staged chunks hold the rest -> append finalize merges after it
    merged = _expected(chunks)
    assume(len(merged) >= 2)
    split = data.draw(st.integers(1, len(merged) - 1))
    initial = merged.iloc[:split]
    lib = Arctic(tempfile.mkdtemp(), _spark).create_library("sm")
    lib.write("sym", initial)
    rest = merged.iloc[split:]
    lib.stage("sym", rest)
    lib.sort_and_finalize_staged_data("sym", mode="append")
    out = lib.read("sym", output_format="pandas")
    _check(out, merged)


def test_sort_merge_append_overlap_raises(tmp_lib):
    # reference assert_appended_data_does_not_overlap_with_storage
    idx = pd.date_range("2024-01-01", periods=4, name="ts")
    tmp_lib.write("sym", pd.DataFrame({"v": [1.0, 2.0, 3.0, 4.0]},
                                      index=idx))
    tmp_lib.stage("sym", pd.DataFrame(
        {"v": [9.0]}, index=pd.DatetimeIndex(["2024-01-02"], name="ts")))
    with pytest.raises(SortingException, match="overlap"):
        tmp_lib.sort_and_finalize_staged_data("sym", mode="append")


def test_sort_merge_static_incompatible_chunks_raise(tmp_lib):
    # reference assert_staged_columns_are_incompatible (E_DESCRIPTOR_MISMATCH)
    idx1 = pd.date_range("2024-01-01", periods=2, name="ts")
    idx2 = pd.date_range("2024-01-03", periods=2, name="ts")
    tmp_lib.stage("sym", pd.DataFrame({"a": [1.0, 2.0]}, index=idx1))
    tmp_lib.stage("sym", pd.DataFrame({"b": ["x", "y"]}, index=idx2))
    with pytest.raises(SchemaException, match="E_DESCRIPTOR_MISMATCH"):
        tmp_lib.sort_and_finalize_staged_data("sym")


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_finalize_ordering_rule(data):
    """Non-sorting finalize raises UnsortedDataException exactly when the
    staged chunk SPANS overlap (reference: segments must be ordered and
    non-overlapping); with validate_index=False the chunks concatenate in
    staged order regardless."""
    from arcticdb_spark.exceptions import UnsortedDataException
    rng = np.random.default_rng(data.draw(st.integers(0, 2**16)))
    n_chunks = data.draw(st.integers(2, 4))
    spans = []
    chunks = []
    base = pd.Timestamp("2024-01-01").value
    for _ in range(n_chunks):
        start = int(rng.integers(0, 5000))
        width = int(rng.integers(1, 1000))
        k = int(rng.integers(1, 5))
        offs = np.sort(rng.choice(width + 1, size=min(k, width + 1),
                                  replace=False))
        idx = pd.DatetimeIndex((base + (start + offs) * 60_000_000_000)
                               .astype("int64").view("M8[ns]"), name="ts")
        chunks.append(pd.DataFrame(
            {"v": rng.normal(size=len(idx))}, index=idx))
        spans.append((idx.min().value, idx.max().value))
    spans_sorted = sorted(spans)
    overlaps = any(b[0] < a[1] for a, b in zip(spans_sorted,
                                               spans_sorted[1:]))
    lib = Arctic(tempfile.mkdtemp(), _spark).create_library("ord")
    for c in chunks:
        lib.stage("sym", c)
    if overlaps:
        with pytest.raises(UnsortedDataException):
            lib.finalize_staged_data("sym", sort=False)
        lib.finalize_staged_data("sym", sort=False, validate_index=False)
        assert lib.read("sym").count() == sum(len(c) for c in chunks)
    else:
        lib.finalize_staged_data("sym", sort=False)
        out = lib.read("sym", output_format="pandas")
        assert len(out) == sum(len(c) for c in chunks)
        assert lib.get_info("sym")["sorted"] == "ASCENDING"
