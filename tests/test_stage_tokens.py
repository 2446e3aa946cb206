"""Staged-tokens API ported from the reference's
``python/tests/unit/arcticdb/version_store/test_stage.py``.
"""
import pickle

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.catalog import (ArcticException,
                                    MissingKeysInStageResultsError,
                                    SortingException)


def _df(start, vals):
    return pd.DataFrame(
        {"col1": np.asarray(vals, dtype=np.float64)},
        index=pd.date_range(start, periods=len(vals), name="ts"))


def test_stage_returns_tokens_and_finalize_all(tmp_lib):
    # reference test_stage
    tmp_lib.write("sym", _df("2025-01-01", [1, 2]))
    toks = [tmp_lib.stage("sym", _df("2025-01-03", [5, 6])),
            tmp_lib.stage("sym", _df("2025-01-05", [9, 10]))]
    assert all(len(t.staged_segments) >= 1 for t in toks)
    # not yet finalized: read returns the original write
    assert tmp_lib.read("sym").count() == 2
    tmp_lib.finalize_staged_data("sym", mode="append")
    assert tmp_lib.read("sym").count() == 6


def test_stage_result_pickle(tmp_lib):
    # reference test_stage_result_pickle
    tok = tmp_lib.stage("sym", _df("2025-01-01", [1, 2]))
    tok2 = pickle.loads(pickle.dumps(tok))
    assert tok2.symbol == "sym"
    assert tok2.staged_segments == tok.staged_segments


def test_tokens_for_wrong_symbol(tmp_lib):
    # reference test_stage_submit_tokens_for_wrong_symbol
    t0 = tmp_lib.stage("sym", _df("2025-01-03", [5, 6]))
    t1 = tmp_lib.stage("other_sym", _df("2025-01-05", [9, 10]))
    t2 = tmp_lib.stage("sym", _df("2025-01-07", [13, 14]))
    with pytest.raises(ArcticException, match="INCORRECT_SYMBOL"):
        tmp_lib.finalize_staged_data("sym", staged_data=[t0, t1, t2])
    assert not tmp_lib.has_symbol("sym")
    # nothing consumed: both symbols still staged
    assert set(tmp_lib.get_staged_symbols()) == {"sym", "other_sym"}
    tmp_lib.finalize_staged_data("sym", staged_data=[t0, t2])
    assert tmp_lib.read("sym").count() == 4
    # other_sym's segments untouched
    assert tmp_lib.get_staged_symbols() == ["other_sym"]


def test_finalize_missing_keys(tmp_lib):
    # reference test_finalize_missing_keys / test_finalize_noop_if_any_missing_keys
    t1 = tmp_lib.stage("sym", _df("2025-01-01", [1, 2, 3]))
    t2 = tmp_lib.stage("sym", _df("2025-01-04", [3, 4]))
    t3 = tmp_lib.stage("sym", _df("2025-01-06", [7]))
    tmp_lib.finalize_staged_data("sym", staged_data=[t1, t2], mode="write")
    with pytest.raises(MissingKeysInStageResultsError) as e:
        tmp_lib.finalize_staged_data("sym", staged_data=[t3, t2, t1],
                                     mode="write")
    recs = e.value.stage_results_with_missing_keys
    # every consumed segment of t2 (index 1) and t1 (index 2) is reported
    assert sorted({r["stage_result_index"] for r in recs}) == [1, 2]
    assert {r["missing_key"] for r in recs} == set(
        t1.staged_segments + t2.staged_segments)
    assert recs[0]["missing_key"] == t2.staged_segments[0]
    # all-or-nothing: version unchanged, t3 still staged
    assert tmp_lib.read("sym").count() == 5
    tmp_lib.finalize_staged_data("sym", staged_data=[t3], mode="write")
    out = tmp_lib.read("sym", output_format="pandas")
    assert out["col1"].tolist() == [7.0]


def test_finalize_tokens_then_without(tmp_lib):
    # reference test_finalize_with_tokens_then_without: untokened segments
    # stay staged and a plain finalize picks them up
    t0 = tmp_lib.stage("sym", _df("2025-01-01", [1, 2]))
    tmp_lib.stage("sym", _df("2025-01-03", [5, 6]))
    tmp_lib.finalize_staged_data("sym", staged_data=[t0], mode="write")
    assert tmp_lib.read("sym").count() == 2
    tmp_lib.finalize_staged_data("sym", mode="append")
    assert tmp_lib.read("sym").count() == 4


def test_finalize_prune_and_failure_cleanup(tmp_lib):
    # reference test_finalize_with_tokens_and_prune_previous +
    # delete_staged_data_on_failure
    tmp_lib.write("sym", _df("2025-01-01", [1, 2]))
    t = tmp_lib.stage("sym", _df("2025-01-03", [5, 6]))
    tmp_lib.finalize_staged_data("sym", staged_data=[t], mode="append",
                                 prune_previous_versions=True)
    assert [v["version"] for v in tmp_lib.list_versions("sym")] == [1]
    # failure path: overlapping append raises; with
    # delete_staged_data_on_failure the segments are dropped
    t_bad = tmp_lib.stage("sym", _df("2025-01-02", [0]))
    with pytest.raises(SortingException):
        tmp_lib.finalize_staged_data("sym", staged_data=[t_bad], mode="append",
                                     delete_staged_data_on_failure=True)
    assert tmp_lib.get_staged_symbols() == []


def test_finalize_append_validate_index_off(tmp_lib):
    # out-of-order staged append lands UNSORTED with validate_index=False
    tmp_lib.write("sym", _df("2025-01-05", [1, 2]))
    tmp_lib.stage("sym", _df("2025-01-01", [9]))
    m = tmp_lib.finalize_staged_data("sym", mode="append",
                                     validate_index=False)
    assert m.sorted == "UNSORTED"
    assert tmp_lib.read("sym").count() == 3


def test_append_finalize_interleave_rejected(tmp_lib):
    # reference test_sort_merge.py test_appended_df_interleaves_with_storage:
    # staged rows INSIDE the existing index range cannot append-finalize
    import pandas as pd
    import pytest
    from arcticdb_spark.catalog import SortingException
    tmp_lib.write("sym", pd.DataFrame(
        {"col": [1, 3]},
        index=pd.DatetimeIndex(["2023-01-01", "2023-01-03"], name="ts")))
    tmp_lib.stage("sym", pd.DataFrame(
        {"col": [2]}, index=pd.DatetimeIndex(["2023-01-02"], name="ts")))
    with pytest.raises(SortingException, match="overlap"):
        tmp_lib.sort_and_finalize_staged_data("sym", mode="append")


def test_append_finalize_equal_boundary_allowed(tmp_lib):
    # reference test_appended_df_start_same_as_df_end: starting AT the
    # existing max is a legal append
    import pandas as pd
    tmp_lib.write("sym", pd.DataFrame(
        {"col": [1, 2, 3]},
        index=pd.DatetimeIndex(["2023-01-01", "2023-01-02", "2023-01-03"],
                               name="ts")))
    tmp_lib.stage("sym", pd.DataFrame(
        {"col": [4, 5, 6]},
        index=pd.DatetimeIndex(["2023-01-03", "2023-01-04", "2023-01-05"],
                               name="ts")))
    tmp_lib.sort_and_finalize_staged_data("sym", mode="append")
    out = tmp_lib.read("sym", output_format="pandas")
    assert out["col"].tolist() == [1, 2, 3, 4, 5, 6]


def test_stage_validate_and_sort_kwargs(tmp_lib):
    """Reference library.py:952 stage kwargs: validate_index rejects an
    unsorted chunk; sort_on_index sorts it (index primary, sort_columns
    secondary); stage_results= is accepted by both finalize spellings."""
    import numpy as np
    import pandas as pd
    import pytest
    from arcticdb_spark.catalog import SortingException
    idx = pd.DatetimeIndex(["2024-01-03", "2024-01-01", "2024-01-02"],
                           name="ts")
    df = pd.DataFrame({"v": [3.0, 1.0, 2.0]}, index=idx)
    with pytest.raises(SortingException):
        tmp_lib.stage("s", df)
    tok = tmp_lib.stage("s", df, sort_on_index=True)
    tmp_lib.finalize_staged_data("s", stage_results=[tok])
    back = tmp_lib.read("s", output_format="pandas")
    assert back["v"].tolist() == [1.0, 2.0, 3.0]
    # sort_columns alone (no usable index requirement on the data)
    df2 = pd.DataFrame({"k": [2, 1, 3], "v": [20.0, 10.0, 30.0]})
    tok2 = tmp_lib.stage("c", df2, sort_columns=["k"])
    tmp_lib.sort_and_finalize_staged_data("c", stage_results=[tok2])
    assert tmp_lib.read("c", output_format="pandas")["v"].tolist() \
        == [10.0, 20.0, 30.0]
    # unsorted chunks still stage with validate_index=False
    tmp_lib.stage("u", df, validate_index=False)
    tmp_lib.sort_and_finalize_staged_data("u")
    assert tmp_lib.read("u").count() == 3


def test_finalize_mode_validation(tmp_lib):
    """Reference test_arctic.py:366/384: bad mode raises
    ArcticInvalidApiUsageException; the enum and case-insensitive
    strings are accepted."""
    import pandas as pd
    import pytest
    from arcticdb_spark import StagedDataFinalizeMethod
    from arcticdb_spark.catalog import ArcticInvalidApiUsageException
    tmp_lib.stage("fm", pd.DataFrame(
        {"col": [1.0, 2.0]}, index=pd.date_range("2024-01-01", periods=2)))
    with pytest.raises(ArcticInvalidApiUsageException):
        tmp_lib.finalize_staged_data("fm", mode="bad_mode")
    with pytest.raises(ArcticInvalidApiUsageException):
        tmp_lib.sort_and_finalize_staged_data("fm", mode="bad_mode")
    tmp_lib.finalize_staged_data("fm", mode="wRite")
    assert tmp_lib.read("fm", output_format="pandas")["col"].tolist() == \
        [1.0, 2.0]
    tmp_lib.stage("fm", pd.DataFrame(
        {"col": [3.0]}, index=[pd.Timestamp("2024-01-03")]))
    tmp_lib.finalize_staged_data("fm", mode=StagedDataFinalizeMethod.APPEND)
    assert tmp_lib.read("fm", output_format="pandas")["col"].tolist() == \
        [1.0, 2.0, 3.0]
