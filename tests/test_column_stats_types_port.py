"""Ported from the reference's
``python/tests/unit/arcticdb/test_column_stats_optimisation.py``
test_column_stats_query_optimisation_different_types: zone-map pruning
across every numeric dtype — each case writes two value-disjoint
segments, creates MINMAX stats, and filters so exactly one segment can
match; the plan must scan 1 of 2 files AND the values must be right.

Plus round-11 regression pins for the uint64 mispruning this port
surfaced: uint64 columns store int64 BIT PATTERNS, so stats pruning must
compare in the unsigned domain and keep files whose pattern range
straddles 2^63 (a signed comparison silently dropped a segment of
>2^63 values on ``> 2**62``)."""
import re

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.query import QueryBuilder


def _paths_scanned(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"InMemoryFileIndex\((\d+) paths\)", plan)
    return int(m.group(1)) if m else -1


CASES = [
    (np.int8, [-100, -50], [50, 100], 0),
    (np.int16, [-1000, -500], [500, 1000], 0),
    (np.int32, [-100000, -50000], [50000, 100000], 0),
    (np.int64, [-(10 ** 15), -(10 ** 14)], [10 ** 14, 10 ** 15], 0),
    (np.uint8, [1, 10], [200, 250], 100),
    (np.uint16, [1, 100], [50000, 60000], 1000),
    (np.uint32, [1, 1000], [3000000000, 4000000000], 2000000000),
    (np.uint64, [1, 1000], [10 ** 18, 10 ** 18 + 1000], 10 ** 17),
    (np.float32, [1.5, 2.5], [10.5, 11.5], 5.0),
    (np.float64, [1.5e10, 2.5e10], [10.5e10, 11.5e10], 5.0e10),
]


@pytest.mark.parametrize(
    "dtype,values_seg0,values_seg1,filter_val", CASES,
    ids=[c[0].__name__ for c in CASES])
def test_column_stats_query_optimisation_different_types(
        tmp_lib, dtype, values_seg0, values_seg1, filter_val):
    df0 = pd.DataFrame({"col": np.array(values_seg0, dtype=dtype)},
                       index=pd.date_range("2000-01-01",
                                           periods=len(values_seg0)))
    df1 = pd.DataFrame({"col": np.array(values_seg1, dtype=dtype)},
                       index=pd.date_range("2000-01-03",
                                           periods=len(values_seg1)))
    tmp_lib.write("sym", df0)
    tmp_lib.append("sym", df1)
    tmp_lib.create_column_stats("sym", ["col"])
    q = QueryBuilder()
    q = q[q["col"] > filter_val]
    out = tmp_lib.read("sym", query_builder=q)
    assert _paths_scanned(out) == 1, dtype
    received = tmp_lib.read("sym", query_builder=q,
                            output_format="pandas")
    # check_dtype=False: small unsigned dtypes widen via Arrow (uint32 ->
    # int64, documented deviation in test_type_promotion.py) — values and
    # pruning behavior are what this port pins
    pd.testing.assert_frame_equal(df1, received, check_freq=False,
                                  check_dtype=False)


class TestUint64PruningUnsignedDomain:
    def _lib(self, tmp_lib):
        df0 = pd.DataFrame(
            {"col": np.array([1, 1000], dtype=np.uint64)},
            index=pd.date_range("2000-01-01", periods=2))
        df1 = pd.DataFrame(
            {"col": np.array([2 ** 63 + 5, 2 ** 64 - 1], dtype=np.uint64)},
            index=pd.date_range("2000-01-03", periods=2))
        tmp_lib.write("sym", df0)
        tmp_lib.append("sym", df1)
        tmp_lib.create_column_stats("sym", ["col"])
        return tmp_lib

    def test_huge_values_not_mispruned(self, tmp_lib):
        # the regression: > 2**62 must return the >2^63 segment (its
        # footer patterns are NEGATIVE longs)
        lib = self._lib(tmp_lib)
        q = QueryBuilder()
        q = q[q["col"] > 2 ** 62]
        got = sorted(lib.read("sym", query_builder=q,
                              output_format="pandas")["col"].tolist())
        assert got == [2 ** 63 + 5, 2 ** 64 - 1]

    def test_small_range_still_prunes(self, tmp_lib):
        lib = self._lib(tmp_lib)
        q = QueryBuilder()
        q = q[q["col"] < 2000]
        out = lib.read("sym", query_builder=q)
        assert _paths_scanned(out) == 1
        got = sorted(r.col for r in out.collect())
        assert [int(x) & 0xFFFFFFFFFFFFFFFF for x in got] == [1, 1000]

    def test_huge_range_prunes_small_segment(self, tmp_lib):
        lib = self._lib(tmp_lib)
        q = QueryBuilder()
        q = q[q["col"] >= 2 ** 63]
        out = lib.read("sym", query_builder=q)
        assert _paths_scanned(out) == 1   # unsigned mapping still prunes
        got = lib.read("sym", query_builder=q,
                       output_format="pandas")["col"].tolist()
        assert sorted(got) == [2 ** 63 + 5, 2 ** 64 - 1]

    def test_straddling_file_never_pruned(self, tmp_lib):
        # one file holds values on BOTH sides of 2^63: its signed pattern
        # range [negative, positive] cannot bound the unsigned set, so
        # every filter must keep it
        df = pd.DataFrame(
            {"col": np.array([5, 2 ** 64 - 10], dtype=np.uint64)},
            index=pd.date_range("2000-01-01", periods=2))
        tmp_lib.write("sym", df)
        tmp_lib.create_column_stats("sym", ["col"])
        for expr in (lambda q: q["col"] > 2 ** 63,
                     lambda q: q["col"] < 100,
                     lambda q: q["col"] == 5):
            q = QueryBuilder()
            q = q[expr(q)]
            got = tmp_lib.read("sym", query_builder=q,
                               output_format="pandas")["col"].tolist()
            assert len(got) == 1, got
