"""Property-based GROUPBY-AGGREGATION parity vs pandas, ported from the
reference's ``python/tests/hypothesis/arcticdb/test_aggregation_hypothesis.py``
(generic_named_aggregation_test oracle, ``python/arcticdb/util/test.py:929``):
random (grouping string, numeric agg) frames through the versioned Library +
QueryBuilder.groupby().agg() vs ``df.groupby(...).agg(...)`` — including the
dynamic-schema variant where chunks drop columns and the missing cells
backfill with the type default (0 for int-promoted aggregation columns).

Ints compare exactly; float aggregates approximately (summation order
differs between engines — reference assert_dfs_approximate rationale).
"""

import tempfile

import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow

from hypothesis import HealthCheck, assume, given, settings, strategies as st

from arcticdb_spark.catalog import Arctic
from arcticdb_spark.query import QueryBuilder

_NUM_DTYPES = ["int8", "int16", "int32", "int64",
               "uint8", "uint16", "uint32", "uint64",
               "float32", "float64"]

_spark = None


@pytest.fixture(autouse=True, scope="module")
def _init(spark):
    global _spark
    _spark = spark


def _tmp_lib(dynamic=False):
    return Arctic(tempfile.mkdtemp(), _spark).create_library(
        "hyplib", dynamic_schema=dynamic)


@st.composite
def numeric_frames(draw):
    """(grouping_column: strings with missing, agg_column: numeric) —
    restricted value range like the reference's restrict_range=True, so
    sums can't overflow any of the dtypes."""
    n = draw(st.integers(1, 40))
    rng = np.random.default_rng(draw(st.integers(0, 2**16)))
    dt = draw(st.sampled_from(_NUM_DTYPES))
    lo = 0 if dt.startswith("u") else -100
    vals = rng.integers(lo, 100, n).astype(dt) if not dt.startswith("f") \
        else rng.uniform(lo, 100, n).astype(dt)
    if dt.startswith("f") and draw(st.booleans()):
        vals = np.where(rng.random(n) < 0.3, np.nan, vals).astype(dt)
    groups = rng.choice(["g1", "g2", "g3", "aaa"], n).astype(object)
    if draw(st.booleans()):
        groups[rng.random(n) < 0.2] = None   # dropped group keys
    return pd.DataFrame({"grouping_column": groups, "agg_column": vals})


_AGGS = {"mean": ("agg_column", "mean"), "sum": ("agg_column", "sum"),
         "min": ("agg_column", "min"), "max": ("agg_column", "max"),
         "count": ("agg_column", "count"),
         # first/last are feature-flagged off in the reference suite; this
         # engine ships them and they are pinned by test_aggregation_
         # semantics.py instead (order needs a ts column to be meaningful)
         }


def _run_engine(lib, symbol):
    q = QueryBuilder().groupby("grouping_column").agg(dict(_AGGS))
    # pandas output puts the group key on the INDEX like the reference
    out = lib.read(symbol, query_builder=q, output_format="pandas")
    return (out.reindex(columns=sorted(out.columns))
            .sort_index())


def _compare(received: pd.DataFrame, expected: pd.DataFrame,
             int_fill_zero: bool = False):
    expected = (expected.reindex(columns=sorted(expected.columns))
                .sort_index())
    assert list(received.index) == list(expected.index)
    for c in expected.columns:
        got, want = received[c], expected[c]
        if int_fill_zero and pd.api.types.is_integer_dtype(want.dtype):
            want = want.fillna(0)
        if pd.api.types.is_float_dtype(want.dtype) or \
                pd.api.types.is_float_dtype(got.dtype):
            g, w = got.astype("float64"), want.astype("float64")
            ok = ((g.isna() & w.isna())
                  | (np.isclose(g, w, rtol=1e-5, equal_nan=True))).all()
            assert ok, f"{c}: {g.tolist()} != {w.tolist()}"
        else:
            assert got.astype("int64").tolist() == \
                want.astype("int64").tolist(), c


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(pdf=numeric_frames())
def test_aggregation_numeric(pdf):
    # reference test_aggregation_numeric
    assume(not pdf.empty)
    lib = _tmp_lib()
    lib.write("sym", pdf)
    received = _run_engine(lib, "sym")
    expected = pdf.groupby("grouping_column").agg(None, **_AGGS)
    _compare(received, expected)


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_aggregation_strings(data):
    # reference test_aggregation_strings: count over a string agg column
    n = data.draw(st.integers(1, 30))
    rng = np.random.default_rng(data.draw(st.integers(0, 2**16)))
    vals = rng.choice(["s1", "s2", None], n).astype(object)
    groups = rng.choice(["g1", "g2"], n).astype(object)
    pdf = pd.DataFrame({"grouping_column": groups, "agg_column": vals})
    lib = _tmp_lib()
    lib.write("sym", pdf)
    q = QueryBuilder().groupby("grouping_column").agg(
        {"count": ("agg_column", "count")})
    out = (lib.read("sym", query_builder=q, output_format="pandas")
           .sort_index())
    expected = pdf.groupby("grouping_column").agg(
        None, count=("agg_column", "count")).sort_index()
    assert out["count"].astype("int64").tolist() == \
        expected["count"].astype("int64").tolist()


@st.composite
def chunk_lists(draw):
    """reference aggregation_dataframe_list_strategy: chunks that may drop
    the grouping or the aggregation column (dynamic schema)."""
    n_chunks = draw(st.integers(1, 4))
    chunks = []
    for i in range(n_chunks):
        pdf = draw(numeric_frames())
        if draw(st.booleans()) and i > 0:
            pdf = pdf.drop(columns=[draw(
                st.sampled_from(["grouping_column", "agg_column"]))])
        chunks.append(pdf)
    return chunks


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(chunks=chunk_lists())
def test_aggregation_numeric_dynamic(chunks):
    # reference test_aggregation_numeric_dynamic: dynamic-schema appends,
    # some chunks without the grouping/agg column; missing agg cells
    # backfill 0 when the promoted type is integer (sparse_utils rule)
    assume(any("grouping_column" in c.columns for c in chunks))
    assume(any("agg_column" in c.columns for c in chunks))
    agg_dtypes = [c["agg_column"].dtype for c in chunks
                  if "agg_column" in c.columns]
    # uint64 columns are bit-pattern typed: the engine raises on appending
    # ANY other dtype onto a uint64 column (documented PARITY delta) — if
    # uint64 appears, every chunk's agg dtype must be uint64
    if any(d.kind == "u" and d.itemsize == 8 for d in agg_dtypes):
        assume(all(d.kind == "u" and d.itemsize == 8 for d in agg_dtypes))
    lib = _tmp_lib(dynamic=True)
    lib.write("sym", chunks[0])
    for c in chunks[1:]:
        lib.append("sym", c)
    received = _run_engine(lib, "sym")
    concat = pd.concat(chunks, ignore_index=True)
    int_promoted = not any(d.kind == "f" for d in agg_dtypes)
    if int_promoted:
        # the engine 0-backfills missing int cells BEFORE grouping
        concat["agg_column"] = concat["agg_column"].fillna(0)
    # rows whose grouping cell came from a chunk without the column are
    # dropped by the engine's dropna grouping — pandas concat gives NaN
    # keys there, dropped by groupby(dropna=True) identically
    expected = concat.groupby("grouping_column").agg(None, **_AGGS)
    _compare(received, expected, int_fill_zero=int_promoted)
