"""Ported from the reference's hypothesis test_append.py
(TestAppendHypothesis): forbidden-append index-kind rows and the
tz-aware append + partial-read composition. The forbidden cases pin that
an incompatible incoming index RAISES instead of being silently dropped
by positional normalization (reference NormalizationException /
E_INCOMPATIBLE_INDEX)."""

import tempfile

import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow


from arcticdb_spark.catalog import (Arctic, ArcticException, SchemaException)


@pytest.fixture()
def lib(spark):
    return Arctic(tempfile.mkdtemp(), spark).create_library("apb")


# --------------------------------------------------------------- forbidden

def test_append_ndarray_onto_frame_raises(lib):
    lib.write("rc", pd.DataFrame({"col": [1, 1, 1]}))
    with pytest.raises(ArcticException):
        lib.append("rc", np.array([1, 2, 3]))


def test_append_frame_onto_ndarray_raises(lib):
    lib.write("nd", np.array([1.0, 2.0, 3.0]))
    with pytest.raises(ArcticException, match="ndarray"):
        lib.append("nd", pd.DataFrame({"col": [1]}))


def test_append_multiindex_onto_rowcount_raises(lib):
    lib.write("rc", pd.DataFrame({"col": [1, 1, 1]}))
    mi = pd.DataFrame({"col": [4]},
                      index=pd.MultiIndex.from_tuples([(3, "a")]))
    with pytest.raises((SchemaException, ArcticException),
                       match="E_INCOMPATIBLE_INDEX|row-count"):
        lib.append("rc", mi)


def test_append_datetime_onto_rowcount_raises(lib):
    lib.write("rc", pd.DataFrame({"col": [1, 1, 1]}))
    dt = pd.DataFrame({"col": [4]},
                      index=pd.date_range("2024-01-01", periods=1))
    with pytest.raises((SchemaException, ArcticException),
                       match="E_INCOMPATIBLE_INDEX|row-count"):
        lib.append("rc", dt)


def test_append_non_range_int_index_onto_rowcount_raises(lib):
    # reference DF_RC + DF_RC_NON_RANGE -> NormalizationException "range"
    lib.write("rc", pd.DataFrame({"col": [1, 1, 1]}))
    bad = pd.DataFrame({"col": [4]}, index=pd.Index([3001]))
    with pytest.raises(ArcticException, match="range"):
        lib.append("rc", bad)


def test_append_stepped_range_onto_rowcount_raises(lib):
    # reference DF_RC + DF_RC_STEP -> NormalizationException "step"
    lib.write("rc", pd.DataFrame({"col": [1, 1, 1]}))
    step2 = pd.DataFrame({"col": [4]}, index=pd.RangeIndex(3, 5, step=2))
    with pytest.raises(ArcticException, match="step"):
        lib.append("rc", step2)


def test_append_rowcount_onto_stepped_range_raises(lib):
    # swapped direction: the stored non-default RangeIndex rejects the
    # plain row-count continuation (existing exact-continuation check)
    lib.write("st", pd.DataFrame({"col": [1, 1]},
                                 index=pd.RangeIndex(0, 4, step=2)))
    with pytest.raises(ArcticException, match="step"):
        lib.append("st", pd.DataFrame({"col": [4]}))


def test_append_plain_rowcount_still_works(lib):
    lib.write("rc", pd.DataFrame({"col": [1, 2, 3]}))
    lib.append("rc", pd.DataFrame({"col": [4, 5]}))
    got = lib.read("rc", output_format="pandas")
    assert got["col"].tolist() == [1, 2, 3, 4, 5]
    assert list(got.index) == [0, 1, 2, 3, 4]


def test_append_missing_named_index_raises_with_name(lib, spark):
    # reference test_regular_append_dynamic_schema_named_index: the error
    # must name the stored index column, not leak an analysis error
    dyn = Arctic(tempfile.mkdtemp(), spark).create_library(
        "dyn", dynamic_schema=True)
    df0 = pd.DataFrame({"col_0": [0], "col_1": [0.5]},
                       index=pd.date_range("2024-01-01", periods=1))
    df0.index.name = "date"
    dyn.write("s", df0)
    df1 = pd.DataFrame({"col_0": [1]},
                       index=pd.date_range("2024-01-02", periods=1))
    with pytest.raises(SchemaException, match="date"):
        dyn.append("s", df1)


# ------------------------------------------------- tz partial-read matrix

@pytest.mark.parametrize("append_point", [1, 3])
@pytest.mark.parametrize("tsbounds", [(0, 2), (1, 4), (2, 5), (0, 5)])
@pytest.mark.parametrize("cols", [["a"], ["a", "c"]])
def test_append_partial_read_tz(lib, append_point, tsbounds, cols):
    """tz-aware write + append split at ``append_point``, then read with a
    date_range spanning the boundary and a column subset — the composition
    the reference fuzzes in test_append_partial_read."""
    tz = "America/New_York"
    dtidx = pd.date_range("2019-02-06 11:43", periods=6).tz_localize(tz)
    a = np.arange(6)
    tf = pd.DataFrame({"a": a, "b": a + a, "c": a * 10}, index=dtidx)
    tf.index.name = "ts"
    lib.write("sym", tf.iloc[:append_point + 1])
    lib.append("sym", tf.iloc[append_point + 1:])
    dtr = (dtidx[tsbounds[0]], dtidx[tsbounds[1]])
    got = lib.read("sym", date_range=dtr, columns=list(cols),
                   output_format="pandas")
    exp = tf.loc[dtr[0]:dtr[1], list(cols)]
    assert [str(c) for c in got.columns] == list(cols)
    pd.testing.assert_frame_equal(got, exp, check_freq=False)


# ------------------------------------------------ append creates symbol

def test_append_missing_symbol_creates_it(lib):
    """Reference library.py:1379: "If append is called on a symbol that
    does not exist, it will create it" (v2 semantics; also
    test_append.py test_symbol_list_key_added_on_upsert — append after a
    delete re-creates the symbol)."""
    df = pd.DataFrame({"a": [1, 2]})
    m = lib.append("fresh", df)
    assert m.version == 0
    out = lib.read("fresh", output_format="pandas")
    assert out["a"].tolist() == [1, 2]

    lib.delete("fresh")
    assert "fresh" not in lib.list_symbols()
    lib.append("fresh", df)
    assert lib.list_symbols() == ["fresh"]
    assert lib.read("fresh", output_format="pandas")["a"].tolist() == [1, 2]


def test_append_empty_after_delete_recreates_symbol(lib):
    """Reference test_append.py test_symbol_list_key_added_on_upsert: even
    an EMPTY append re-creates a deleted symbol's list entry."""
    lib.write("s", pd.DataFrame({"col": [1]}))
    lib.delete("s")
    assert lib.list_symbols() == []
    lib.append("s", pd.DataFrame({"col": np.arange(0)}))
    assert lib.list_symbols() == ["s"]
    assert len(lib.read("s", output_format="pandas")) == 0
