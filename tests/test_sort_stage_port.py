"""Ported from the reference's
``python/tests/unit/arcticdb/version_store/test_sort.py``: stage with
sort_columns (index primary, data-column tiebreak), sort_on_index, and
finalize producing the fully sorted symbol."""
import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow



def _df(start, lo, hi, prefix):
    n = hi - lo
    return pd.DataFrame({
        "timestamp": pd.date_range(start, periods=n // 2,
                                   freq="h").repeat(2),
        "col1": np.arange(lo + 1, hi + 1),
        "col2": [f"{prefix}{i:02d}" for i in range(1, n + 1)],
    }).set_index("timestamp")


def test_stage_finalize(tmp_lib):
    sort_cols = ["timestamp", "col1"]
    df1 = _df("2023-01-01", 0, 50, "a")
    df2 = _df("2023-01-04", 50, 100, "b")
    df1_shuffled = df1.sample(frac=1, random_state=7)
    df2_shuffled = df2.sample(frac=1, random_state=8)
    d1copy, d2copy = df1_shuffled.copy(), df2_shuffled.copy()
    tmp_lib.stage("AAPL", df1_shuffled, False, False, sort_cols)
    tmp_lib.stage("AAPL", df2_shuffled, False, False, sort_cols)
    # inputs not modified by stage
    pd.testing.assert_frame_equal(df1_shuffled, d1copy)
    pd.testing.assert_frame_equal(df2_shuffled, d2copy)
    tmp_lib.finalize_staged_data("AAPL")
    result = tmp_lib.read("AAPL", output_format="pandas")
    expected = pd.concat([df1, df2]).sort_values(sort_cols)
    pd.testing.assert_frame_equal(result, expected, check_freq=False)


def test_stage_finalize_sort_index(tmp_lib):
    # sort_on_index=True without sort_columns
    df1 = _df("2023-01-01", 0, 50, "a")
    df2 = _df("2023-01-04", 50, 100, "b")
    tmp_lib.stage("s", df1.sample(frac=1, random_state=3), False, True)
    tmp_lib.stage("s", df2.sample(frac=1, random_state=4), False, True)
    tmp_lib.finalize_staged_data("s")
    result = tmp_lib.read("s", output_format="pandas")
    expected = pd.concat([df1, df2]).sort_index(kind="mergesort")
    # equal timestamps: compare the sorted-by-index frame allowing any
    # stable order within equal keys via a secondary sort on col1
    pd.testing.assert_frame_equal(
        result.sort_values(["timestamp", "col1"], kind="mergesort"),
        expected.sort_values(["timestamp", "col1"], kind="mergesort"),
        check_freq=False)


def test_stage_with_sort_columns_not_ts(tmp_lib):
    # sort_columns on a non-index column only (reference
    # test_stage_with_sort_columns_not_ts): chunk is sorted by that
    # column before the index validation, which then fails unless the
    # result is index-sorted — use validate_index=False and a rowcount df
    df = pd.DataFrame({"a": [3, 1, 2], "b": ["x", "y", "z"]})
    tmp_lib.stage("s", df, False, False, ["a"])
    tmp_lib.finalize_staged_data("s", sort=False)
    out = tmp_lib.read("s", output_format="pandas")
    assert out["a"].tolist() == [1, 2, 3]
    assert out["b"].tolist() == ["y", "z", "x"]
