"""Ported from the reference's
``python/tests/unit/arcticdb/version_store/test_query_builder_sparse.py``:
NaN-bearing ("sparse") float columns through every QueryBuilder clause.
The reference stores these sparse (missing cells); this engine stores NaN
but compiles the same missing semantics (expr.py: EQ/orderings FALSE on a
missing operand, NE TRUE, isnotin retains missing rows, isnull matches
them, groupby drops missing keys and NaN-skips aggregates). Segments come
from stage + finalize (the reference uses parallel writes) over a
tz-aware UTC index; expected values are pandas' own, exactly like the
reference's ``assert_frame_equal`` against ``df.query``.
"""
import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.query import QueryBuilder


def _sparse_frames():
    df_0 = pd.DataFrame(
        {"sparse1": [1.0, np.nan, 2.0, np.nan],
         "sparse2": [np.nan, 1.0, 2.0, np.nan]},
        index=pd.date_range("2024-01-01", periods=4, tz="UTC"))
    df_1 = pd.DataFrame(
        {"sparse1": [1.0, np.nan, 2.0, np.nan],
         "sparse2": [np.nan, 1.0, 2.0, np.nan]},
        index=pd.date_range("2024-01-05", periods=4, tz="UTC"))
    return df_0, df_1


class TestQueryBuilderSparse:
    sym = "TestQueryBuilderSparse"

    @pytest.fixture(autouse=True)
    def write_test_data(self, tmp_lib):
        df_0, df_1 = _sparse_frames()
        tmp_lib.stage(self.sym, df_0)
        tmp_lib.stage(self.sym, df_1)
        tmp_lib.finalize_staged_data(self.sym)
        self.df = pd.concat([df_0, df_1])
        self.lib = tmp_lib

    def _read(self, q):
        return self.lib.read(self.sym, query_builder=q,
                             output_format="pandas")

    def test_filter_isnull(self):
        expected = self.df[self.df["sparse1"].isnull()]
        q = QueryBuilder()
        q = q[q["sparse1"].isnull()]
        pd.testing.assert_frame_equal(expected, self._read(q),
                                      check_freq=False)

    def test_filter_notnull(self):
        expected = self.df[self.df["sparse1"].notnull()]
        q = QueryBuilder()
        q = q[q["sparse1"].notnull()]
        pd.testing.assert_frame_equal(expected, self._read(q),
                                      check_freq=False)

    def test_filter_col_equals_val(self):
        expected = self.df.query("sparse1 == 1")
        q = QueryBuilder()
        q = q[q["sparse1"] == 1]
        pd.testing.assert_frame_equal(expected, self._read(q),
                                      check_freq=False)

    def test_filter_col_not_equals_val(self):
        # pandas: NaN != 2 is True — missing rows SURVIVE a NE filter
        expected = self.df.query("sparse1 != 2")
        q = QueryBuilder()
        q = q[q["sparse1"] != 2]
        pd.testing.assert_frame_equal(expected, self._read(q),
                                      check_freq=False)

    def test_filter_col_isin_value_set(self):
        expected = self.df.query("sparse1 in [1]")
        q = QueryBuilder()
        q = q[q["sparse1"].isin([1])]
        pd.testing.assert_frame_equal(expected, self._read(q),
                                      check_freq=False)

    def test_filter_col_isnotin_value_set(self):
        # missing is a member of NO set: NaN rows survive isnotin
        expected = self.df.query("sparse1 not in [1]")
        q = QueryBuilder()
        q = q[q["sparse1"].isnotin([1])]
        pd.testing.assert_frame_equal(expected, self._read(q),
                                      check_freq=False)

    def test_filter_col_equals_col(self):
        # NaN == NaN must be FALSE (Spark's native NaN-equality says true;
        # the compiler adds ~isnan conjuncts)
        expected = self.df.query("sparse1 == sparse2")
        q = QueryBuilder()
        q = q[q["sparse1"] == q["sparse2"]]
        pd.testing.assert_frame_equal(expected, self._read(q),
                                      check_freq=False)

    def test_filter_col_not_equals_col(self):
        expected = self.df.query("sparse1 != sparse2")
        q = QueryBuilder()
        q = q[q["sparse1"] != q["sparse2"]]
        pd.testing.assert_frame_equal(expected, self._read(q),
                                      check_freq=False)

    def test_project_minus_col(self):
        expected = self.df.copy()
        expected["projected"] = -expected["sparse1"]
        q = QueryBuilder()
        q = q.apply("projected", -q["sparse1"])
        pd.testing.assert_frame_equal(expected, self._read(q),
                                      check_freq=False)

    def test_project_col_plus_val(self):
        expected = self.df.copy()
        expected["projected"] = expected["sparse1"] + 1
        q = QueryBuilder()
        q = q.apply("projected", q["sparse1"] + 1)
        pd.testing.assert_frame_equal(expected, self._read(q),
                                      check_freq=False)

    def test_project_col_divided_by_col(self):
        expected = self.df.copy()
        expected["projected"] = expected["sparse1"] / expected["sparse2"]
        q = QueryBuilder()
        q = q.apply("projected", q["sparse1"] / q["sparse2"])
        pd.testing.assert_frame_equal(expected, self._read(q),
                                      check_freq=False)

    def test_groupby(self):
        aggs = {"sum": ("sparse2", "sum"), "min": ("sparse2", "min"),
                "max": ("sparse2", "max"), "mean": ("sparse2", "mean"),
                "count": ("sparse2", "count")}
        expected = self.df.groupby("sparse1").agg(None, **aggs)
        expected = expected.reindex(columns=sorted(expected.columns))
        q = QueryBuilder()
        q = q.groupby("sparse1").agg(aggs)
        received = self._read(q)
        received = received.reindex(columns=sorted(received.columns))
        received.sort_index(inplace=True)
        pd.testing.assert_frame_equal(expected, received,
                                      check_dtype=False)


def test_query_builder_sparse_dynamic_schema_type_change(spark, tmp_path):
    """float64 + float32 staged chunks under dynamic schema: the promoted
    read keeps missing semantics through a filter (reference
    test_query_builder_sparse_dynamic_schema_type_change)."""
    from arcticdb_spark.catalog import Arctic
    lib = Arctic(str(tmp_path), spark).create_library(
        "dynsparse", dynamic_schema=True)
    df_0, df_1 = _sparse_frames()
    df_1 = df_1.astype(np.float32)
    sym = "tc"
    lib.stage(sym, df_0)
    lib.stage(sym, df_1)
    lib.finalize_staged_data(sym)
    expected = pd.concat([df_0, df_1.astype(np.float64)])
    expected = expected[expected["sparse1"].isnull()]
    q = QueryBuilder()
    q = q[q["sparse1"].isnull()]
    received = lib.read(sym, query_builder=q, output_format="pandas")
    pd.testing.assert_frame_equal(expected, received, check_freq=False)


def test_query_builder_sparse_deterministic_fill_cases(tmp_lib):
    """Deterministic replay of the reference's hypothesis sweep shapes
    (test_query_builder_sparse_hypothesis): NaN-filled frames through
    filter / projection / groupby, expected = pandas."""
    rng = np.random.default_rng(7)
    n = 64
    s1 = rng.uniform(0, 1000, n)
    s2 = rng.uniform(0, 1000, n)
    s1[rng.random(n) < 0.5] = np.nan
    s2[rng.random(n) < 0.5] = np.nan
    df = pd.DataFrame({"sparse1": s1, "sparse2": s2},
                      index=pd.date_range("2024-01-01", periods=n))
    tmp_lib.write("hs", df)

    q = QueryBuilder()
    q = q[q["sparse1"].isnull()]
    received = tmp_lib.read("hs", query_builder=q, output_format="pandas")
    pd.testing.assert_frame_equal(df[df["sparse1"].isnull()], received,
                                  check_freq=False)

    expected = df.copy()
    expected["projected"] = expected["sparse1"] + expected["sparse2"]
    q = QueryBuilder()
    q = q.apply("projected", q["sparse1"] + q["sparse2"])
    received = tmp_lib.read("hs", query_builder=q, output_format="pandas")
    pd.testing.assert_frame_equal(expected, received, check_freq=False)

    expected = df.groupby("sparse1").agg({"sparse2": "sum"})
    q = QueryBuilder().groupby("sparse1").agg({"sparse2": "sum"})
    received = tmp_lib.read("hs", query_builder=q, output_format="pandas")
    received.sort_index(inplace=True)
    pd.testing.assert_frame_equal(expected, received, check_freq=False)
