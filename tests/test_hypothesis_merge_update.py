"""Property-based MERGE-UPDATE parity vs a pandas oracle, ported from the
reference's ``python/tests/hypothesis/arcticdb/test_merge_update.py`` (oracle
``python/arcticdb/util/test.py:1500`` merge_update): random ts-indexed
targets written in chunks, random sources whose first rows are forced to
match target keys on (index + on-columns), merged with
MergeStrategy(matched="update", not_matched_by_target="do_nothing").

A source with multiple rows matching one target row raises, like the
reference's UserInputException (pinned separately below).

The on-column candidates are the non-float data columns — float NaN keys
have engine-specific equality corners the reference also sidesteps in
practice, and the deterministic suite (test_merge_experimental.py) covers
typed-key edges.
"""

import tempfile

import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow

from hypothesis import HealthCheck, assume, given, settings, strategies as st

from arcticdb_spark.catalog import Arctic, ArcticException, MergeStrategy

_spark = None


@pytest.fixture(autouse=True, scope="module")
def _init(spark):
    global _spark
    _spark = spark


_ON_CANDIDATES = ["int64_col", "object_col", "bool_col"]


@st.composite
def merge_args(draw):
    """(target chunks, source, on) — mirrors the reference's
    merge_arguments: sorted-index target chunks; a source whose first k
    rows copy key values from distinct target rows (so matches actually
    happen), deduplicated on the full key tuple."""
    rng = np.random.default_rng(draw(st.integers(0, 2**16)))
    n = draw(st.integers(2, 30))
    n_chunks = min(draw(st.integers(1, 3)), n)
    idx = pd.DatetimeIndex(
        sorted(pd.Timestamp("2024-01-01")
               + pd.to_timedelta(rng.choice(10_000, size=n, replace=False),
                                 unit="min")), name="index")

    def cols(m, r):
        return {
            "int64_col": r.integers(-5, 5, m).astype("int64"),
            "float_col": r.uniform(-10, 10, m),
            "object_col": r.choice(["a", "b", "c"], m).astype(object),
            "bool_col": r.choice([True, False], m),
        }

    target = pd.DataFrame(cols(n, rng), index=idx)
    bounds = sorted(rng.choice(range(1, n), size=n_chunks - 1,
                               replace=False)) if n_chunks > 1 else []
    chunks = np.split(np.arange(n), bounds)
    target_list = [target.iloc[c] for c in chunks if len(c)]

    on = draw(st.lists(st.sampled_from(_ON_CANDIDATES), unique=True,
                       max_size=2))
    m = draw(st.integers(1, 15))
    src_idx = pd.DatetimeIndex(
        pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.choice(10_000, size=m, replace=False),
                          unit="min"), name="index")
    source = pd.DataFrame(cols(m, rng), index=src_idx)
    # force the first k source rows to match distinct target rows on the
    # full key tuple (index + on)
    k = int(draw(st.integers(0, min(m, n))))
    picked = target.iloc[rng.choice(n, size=k, replace=False)]
    if k:
        new_idx = source.index.to_numpy()
        new_idx[:k] = picked.index.to_numpy()
        source.index = pd.DatetimeIndex(new_idx, name="index")
        for c in on:
            source.iloc[:k, source.columns.get_loc(c)] = picked[c].to_numpy()
    # dedupe the source on the key tuple (the reference strategy does the
    # same; duplicate-key sources are tested separately below)
    keys = ["index"] + on
    source = source[~source.reset_index().duplicated(
        subset=keys, keep="first").values]
    source = source.sort_index()
    return target_list, source, on


def _merge_update_oracle(target: pd.DataFrame, source: pd.DataFrame,
                         on: list) -> pd.DataFrame:
    """reference merge_update (util/test.py:1500), datetime-index case:
    match on (index + on); matched target rows take the source's values in
    the non-on columns; unmatched source rows are ignored."""
    keys = ["index"] + list(on)
    t = target.reset_index()
    s = source.reset_index()
    t["__pos__"] = np.arange(len(t))
    m = t.merge(s, on=keys, how="left", suffixes=("", "__src"),
                indicator=True)
    if m["__pos__"].duplicated().any():
        raise ValueError("Multiple source rows match the same target row")
    out = target.copy()
    matched = (m["_merge"] == "both").to_numpy()
    for c in target.columns:
        if c in on or f"{c}__src" not in m.columns:
            continue
        vals = out[c].to_numpy(copy=True)
        vals[matched] = m.loc[matched, f"{c}__src"].to_numpy()
        out[c] = vals.astype(target[c].dtype)
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(args=merge_args())
def test_timeseries_merge_update(args):
    target_list, source, on = args
    assume(len(source))
    lib = Arctic(tempfile.mkdtemp(), _spark).create_library("m")
    lib.write("sym", target_list[0])
    for df in target_list[1:]:
        lib.append("sym", df)
    strategy = MergeStrategy(matched="update",
                             not_matched_by_target="do_nothing")
    lib.merge_experimental("sym", source, strategy=strategy, on=on)
    result = lib.read("sym", output_format="pandas").sort_index()
    expected = _merge_update_oracle(pd.concat(target_list), source,
                                    on).sort_index()
    assert list(result.index) == list(expected.index)
    for c in expected.columns:
        got, want = result[c], expected[c]
        if pd.api.types.is_float_dtype(want.dtype):
            assert np.allclose(got.astype("float64"), want.astype("float64"),
                               equal_nan=True), c
        else:
            assert got.tolist() == want.tolist(), c


def test_duplicate_source_matches_raise(spark, tmp_path):
    # reference UserInputException "Multiple source rows match the same
    # target row" — two identical-key source rows against one target row
    lib = Arctic(str(tmp_path), spark).create_library("m")
    idx = pd.DatetimeIndex(["2024-01-01", "2024-01-02"], name="index")
    lib.write("sym", pd.DataFrame({"v": [1.0, 2.0]}, index=idx))
    dup_idx = pd.DatetimeIndex(["2024-01-01", "2024-01-01"], name="index")
    src = pd.DataFrame({"v": [5.0, 6.0]}, index=dup_idx)
    strategy = MergeStrategy(matched="update",
                             not_matched_by_target="do_nothing")
    with pytest.raises((ValueError, ArcticException),
                       match="[Mm]ultiple source rows"):
        lib.merge_experimental("sym", src, strategy=strategy)
