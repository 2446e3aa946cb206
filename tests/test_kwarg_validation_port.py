"""Port of the reference's test_kwarg_validation.py: unknown keyword
arguments to the version-store surface raise ArcticNativeException naming
the method and the offending kwargs (NativeVersionStore._validate_kwargs,
_store.py:704-720), unless ARCTICDB_DISABLE_KWARG_VALIDATION=1 downgrades
to a warning; historic Arctic kwargs in each method's valid set are
tolerated (accepted and ignored)."""

import pandas as pd
import pytest

from arcticdb_spark.catalog import Arctic, ArcticException


@pytest.fixture()
def lib(spark, tmp_path):
    return Arctic(str(tmp_path), spark).create_library("kw")


def _df():
    return pd.DataFrame({"col": [0]},
                        index=pd.DatetimeIndex([pd.Timestamp(0)], name="ts"))


MODIFY = ["stage", "write", "append", "update", "batch_write", "batch_append"]


@pytest.mark.parametrize("method", MODIFY)
@pytest.mark.parametrize("env_var_set", [True, False])
def test_modification_methods(lib, monkeypatch, method, env_var_set):
    """Port of test_modification_methods:17-36."""
    if env_var_set:
        monkeypatch.setenv("ARCTICDB_DISABLE_KWARG_VALIDATION", "1")
    sym = "test_modification_methods"
    df = _df()
    lib.write(sym, df)
    f = getattr(lib, method)
    arg_0 = [sym] if method.startswith("batch_") else sym
    arg_1 = [df] if method.startswith("batch_") else df
    if env_var_set:
        with pytest.warns(UserWarning):
            f(arg_0, arg_1, not_a_kwarg=True)
    else:
        with pytest.raises(ArcticException) as e:
            f(arg_0, arg_1, not_a_kwarg=True)
        msg = str(e.value)
        assert method in msg and "not_a_kwarg" in msg


@pytest.mark.parametrize("method", [
    "read", "head", "tail", "read_metadata", "read_index",
    "is_symbol_pickled", "get_info", "get_timerange_for_symbol",
    "get_num_rows", "restore_version", "defragment_symbol_data", "delete",
    "batch_read", "batch_read_metadata", "batch_read_metadata_multi",
    "batch_restore_version",
])
@pytest.mark.parametrize("env_var_set", [True, False])
def test_single_argument_methods(lib, monkeypatch, method, env_var_set):
    """Port of test_single_argument_methods:39-79."""
    if env_var_set:
        monkeypatch.setenv("ARCTICDB_DISABLE_KWARG_VALIDATION", "1")
    sym = "test_read_methods"
    df = _df()
    lib.write(sym, df)
    f = getattr(lib, method)
    arg_0 = [sym] if method.startswith("batch_") else sym
    if env_var_set:
        with pytest.warns(UserWarning):
            f(arg_0, not_a_kwarg=True)
    else:
        with pytest.raises(ArcticException) as e:
            f(arg_0, not_a_kwarg=True)
        msg = str(e.value)
        assert method in msg and "not_a_kwarg" in msg


@pytest.mark.parametrize("env_var_set", [True, False])
def test_batch_read_and_join(lib, monkeypatch, env_var_set):
    """Port of test_batch_read_and_join:82-95."""
    from arcticdb_spark.query import QueryBuilder
    if env_var_set:
        monkeypatch.setenv("ARCTICDB_DISABLE_KWARG_VALIDATION", "1")
    sym = "test_batch_read_and_join"
    lib.write(sym, _df())
    q = QueryBuilder()
    if env_var_set:
        with pytest.warns(UserWarning):
            lib.batch_read_and_join([sym], query_builder=q, not_a_kwarg=True)
    else:
        with pytest.raises(ArcticException) as e:
            lib.batch_read_and_join([sym], query_builder=q, not_a_kwarg=True)
        msg = str(e.value)
        assert "batch_read_and_join" in msg and "not_a_kwarg" in msg


@pytest.mark.parametrize("env_var_set", [True, False])
def test_add_to_snapshot(lib, monkeypatch, env_var_set):
    """Port of test_add_to_snapshot:98-114."""
    if env_var_set:
        monkeypatch.setenv("ARCTICDB_DISABLE_KWARG_VALIDATION", "1")
    lib.write("s0", _df())
    lib.snapshot("snap")
    lib.write("s1", _df())
    if env_var_set:
        with pytest.warns(UserWarning):
            lib.add_to_snapshot("snap", ["s1"], not_a_kwarg=True)
    else:
        with pytest.raises(ArcticException) as e:
            lib.add_to_snapshot("snap", ["s1"], not_a_kwarg=True)
        msg = str(e.value)
        assert "add_to_snapshot" in msg and "not_a_kwarg" in msg


@pytest.mark.parametrize("env_var_set", [True, False])
def test_read_with_allow_secondary(lib, monkeypatch, env_var_set):
    """Port of test_read_with_allow_secondary:117-125: a historic Arctic
    kwarg is always accepted (and ignored)."""
    if env_var_set:
        monkeypatch.setenv("ARCTICDB_DISABLE_KWARG_VALIDATION", "1")
    sym = "test_read_with_allow_secondary"
    lib.write(sym, pd.DataFrame({"col": [0]}))
    lib.read(sym, allow_secondary=True)


def test_tolerated_read_kwargs(lib):
    """Historic read kwargs in the reference's _valid_read_kwargs
    (optimise_string_memory, force_string_to_object, set_tz, ...) are
    accepted and ignored — test_string_dedup.py reads with
    optimise_string_memory=True/False and expects identical data."""
    sym = "tolerated"
    df = pd.DataFrame({"col": ["a", "b", "c"]})
    lib.write(sym, df)
    with_opt = lib.read(sym, optimise_string_memory=True,
                        output_format="pandas")
    without = lib.read(sym, optimise_string_memory=False,
                       output_format="pandas")
    pd.testing.assert_frame_equal(with_opt, without)
    pd.testing.assert_frame_equal(with_opt, df)
    lib.read(sym, force_string_to_object=True)
    lib.read(sym, iterate_snapshots_if_tombstoned=False)
