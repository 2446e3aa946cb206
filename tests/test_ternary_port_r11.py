"""Ported from the reference's
``python/tests/unit/arcticdb/version_store/test_ternary.py`` (the
dynamic-schema missing-column and sparse/NaN sections not covered by
tests/test_ternary_semantics.py): ``where()`` over columns that are
MISSING from some segments (dynamic schema backfills bool False / int 0 /
string None before the ternary evaluates — reference
test_project_ternary_dynamic_missing_columns*) and over NaN-bearing
float columns (reference test_project_ternary_sparse_*; NaN propagates
through the chosen branch, condition NaN selects the else-branch exactly
like ``np.where``). Expected frames are computed with pandas/np.where
like the reference's ``assert_frame_equal`` oracles."""
import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.query import QueryBuilder, where


def _read(lib, sym, q):
    return lib.read(sym, query_builder=q, output_format="pandas")


def _assert_eq(expected, received):
    pd.testing.assert_frame_equal(expected, received, check_freq=False)


@pytest.fixture()
def dyn_lib(spark, tmp_path):
    from arcticdb_spark.catalog import Arctic
    return Arctic(str(tmp_path), spark).create_library(
        "dyn", dynamic_schema=True)


class TestProjectTernaryDynamicMissingColumns:
    sym = "t"

    def _write_base(self, lib):
        all_columns_df = pd.DataFrame(
            {"conditional": [True, False],
             "col1": np.arange(2, dtype=np.int64),
             "col2": np.arange(10, 12, dtype=np.int64)},
            index=pd.date_range("2024-01-01", periods=2))
        lib.write(self.sym, all_columns_df)
        base_update_df = pd.DataFrame(
            {"conditional": [True, False],
             "col1": np.arange(2, 4, dtype=np.int64),
             "col2": np.arange(12, 14, dtype=np.int64)},
            index=pd.date_range("2024-01-03", periods=2))
        return all_columns_df, base_update_df

    def test_left_column_missing_with_value(self, dyn_lib):
        all_df, base = self._write_base(dyn_lib)
        update_df = base.drop(columns="col1")
        dyn_lib.update(self.sym, update_df)
        q = QueryBuilder()
        q = q.apply("new_col", where(q["conditional"], q["col1"], 100))
        received = _read(dyn_lib, self.sym, q)
        expected = pd.concat([all_df, update_df]).fillna(0)
        expected["col1"] = expected["col1"].astype("int64")
        expected["new_col"] = np.where(expected["conditional"].to_numpy(),
                                       expected["col1"].to_numpy(), 100)
        _assert_eq(expected, received)

    def test_right_column_missing_with_value(self, dyn_lib):
        all_df, base = self._write_base(dyn_lib)
        update_df = base.drop(columns="col2")
        dyn_lib.update(self.sym, update_df)
        q = QueryBuilder()
        q = q.apply("new_col", where(q["conditional"], 100, q["col2"]))
        received = _read(dyn_lib, self.sym, q)
        expected = pd.concat([all_df, update_df]).fillna(0)
        expected["col2"] = expected["col2"].astype("int64")
        expected["new_col"] = np.where(expected["conditional"].to_numpy(),
                                       100, expected["col2"].to_numpy())
        _assert_eq(expected, received)

    def test_conditional_column_missing(self, dyn_lib):
        all_df, base = self._write_base(dyn_lib)
        update_df = base.drop(columns="conditional")
        dyn_lib.update(self.sym, update_df)
        q = QueryBuilder()
        q = q.apply("new_col",
                    where(q["conditional"], q["col1"], q["col2"]))
        received = _read(dyn_lib, self.sym, q)
        expected = pd.concat([all_df, update_df]).fillna(False)
        expected["new_col"] = np.where(expected["conditional"].to_numpy(),
                                       expected["col1"].to_numpy(),
                                       expected["col2"].to_numpy())
        _assert_eq(expected, received)

    def test_operand_column_missing_with_column(self, dyn_lib):
        all_df, base = self._write_base(dyn_lib)
        q = QueryBuilder()
        q = q.apply("new_col",
                    where(q["conditional"], q["col1"], q["col2"]))
        for drop in (["col1"], ["col2"], ["col1", "col2"]):
            update_df = base.drop(columns=drop)
            dyn_lib.update(self.sym, update_df)
            received = _read(dyn_lib, self.sym, q)
            expected = pd.concat([all_df, update_df]).fillna(0)
            for c in drop:
                expected[c] = expected[c].astype("int64")
            expected["new_col"] = np.where(
                expected["conditional"].to_numpy(),
                expected["col1"].to_numpy(), expected["col2"].to_numpy())
            _assert_eq(expected, received)

    def test_conditional_and_operand_missing(self, dyn_lib):
        all_df, base = self._write_base(dyn_lib)
        q = QueryBuilder()
        q = q.apply("new_col",
                    where(q["conditional"], q["col1"], q["col2"]))
        for drop_col in ("col1", "col2"):
            update_df = base.drop(columns=["conditional", drop_col])
            dyn_lib.update(self.sym, update_df)
            received = _read(dyn_lib, self.sym, q)
            expected = pd.concat([all_df, update_df])
            expected["conditional"] = expected["conditional"].fillna(False).astype(bool)
            expected[drop_col] = expected[drop_col].fillna(0).astype("int64")
            expected["new_col"] = np.where(
                expected["conditional"].to_numpy(),
                expected["col1"].to_numpy(), expected["col2"].to_numpy())
            _assert_eq(expected, received)

    def test_string_columns_missing(self, dyn_lib):
        # reference test_project_ternary_dynamic_missing_columns_strings:
        # missing string cells backfill None
        all_df = pd.DataFrame(
            {"conditional": [True, False],
             "col1": ["a", "bb"], "col2": ["ccc", "dddd"]},
            index=pd.date_range("2024-01-01", periods=2))
        dyn_lib.write(self.sym, all_df)
        base = pd.DataFrame(
            {"conditional": [True, False],
             "col1": ["aa", "bbb"], "col2": ["c", "dd"]},
            index=pd.date_range("2024-01-03", periods=2))

        update_df = base.drop(columns="col1")
        dyn_lib.update(self.sym, update_df)
        q = QueryBuilder()
        q = q.apply("new_col", where(q["conditional"], q["col1"], "e"))
        received = _read(dyn_lib, self.sym, q)
        expected = pd.concat([all_df, update_df])
        expected["new_col"] = np.where(expected["conditional"].to_numpy(),
                                       expected["col1"].to_numpy(), "e")
        # normalize missing-string spelling (np.where keeps nan, the
        # engine returns None — equivalent missing values)
        for c in ("col1", "new_col"):
            expected[c] = expected[c].where(expected[c].notna(), None)
            received[c] = received[c].where(received[c].notna(), None)
        _assert_eq(expected, received)

        update_df = base.drop(columns="col2")
        dyn_lib.update(self.sym, update_df)
        q = QueryBuilder()
        q = q.apply("new_col", where(q["conditional"], "e", q["col2"]))
        received = _read(dyn_lib, self.sym, q)
        expected = pd.concat([all_df, update_df])
        expected["new_col"] = np.where(expected["conditional"].to_numpy(),
                                       "e", expected["col2"].to_numpy())
        for c in ("col2", "new_col"):
            expected[c] = expected[c].where(expected[c].notna(), None)
            received[c] = received[c].where(received[c].notna(), None)
        _assert_eq(expected, received)


class TestProjectTernarySparse:
    def test_sparse_col_val(self, tmp_lib):
        sym = "s"
        df = pd.DataFrame(
            {"condition": [1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0],
             "col": [np.nan, 0.0, 1.0, np.nan, np.nan, 2.0, 3.0, np.nan]},
            index=pd.date_range("2024-01-01", periods=8))
        tmp_lib.write(sym, df)

        cases = [
            (lambda q: where(q["condition"] == 1.0, q["col"], 5),
             lambda d: np.where((d["condition"] == 1.0).to_numpy(),
                                d["col"].to_numpy(), 5.0)),
            (lambda q: where(q["col"].notnull(), q["col"], 5),
             lambda d: np.where(d["col"].notnull().to_numpy(),
                                d["col"].to_numpy(), 5.0)),
            (lambda q: where(q["condition"] == 1.0, 5, q["col"]),
             lambda d: np.where((d["condition"] == 1.0).to_numpy(),
                                5.0, d["col"].to_numpy())),
            (lambda q: where(q["col"].isnull(), 5.0, q["col"]),
             lambda d: np.where(d["col"].isnull().to_numpy(),
                                5.0, d["col"].to_numpy())),
        ]
        for build, oracle in cases:
            expected = df.copy()
            expected["projected"] = oracle(expected)
            q = QueryBuilder()
            q = q.apply("projected", build(q))
            _assert_eq(expected, _read(tmp_lib, sym, q))

    def test_sparse_col_col(self, tmp_lib):
        sym = "s2"
        df = pd.DataFrame(
            {"condition1": [1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0],
             "condition2": [1.0, 0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 1.0],
             "col1": [np.nan, 0.0, 1.0, np.nan, np.nan, 2.0, 3.0, np.nan],
             "col2": [np.nan, np.nan, 10.0, 12.0, 13.0, 14.0, np.nan,
                      np.nan],
             "!col1": [20.0, np.nan, np.nan, 21.0, 22.0, np.nan, np.nan,
                       23.0]},
            index=pd.date_range("2024-01-01", periods=8))
        tmp_lib.write(sym, df)

        cases = [("condition1", "col1", "col2"),
                 ("condition1", "col1", "condition2"),
                 ("condition1", "condition2", "col2"),
                 ("condition1", "condition2", "condition2"),
                 ("condition2", "col1", "!col1")]
        for cond, a, b in cases:
            expected = df.copy()
            expected["projected"] = np.where(
                (expected[cond] == 1.0).to_numpy(),
                expected[a].to_numpy(), expected[b].to_numpy())
            q = QueryBuilder()
            q = q.apply("projected", where(q[cond] == 1.0, q[a], q[b]))
            _assert_eq(expected, _read(tmp_lib, sym, q))

    def test_condition_empty(self, tmp_lib):
        sym = "s3"
        df = pd.DataFrame(
            {"condition": [0.0, 0.0, 0.0],
             "col1": [0.0, np.nan, np.nan],
             "col2": [0.0, np.nan, np.nan]},
            index=pd.date_range("2024-01-01", periods=3))
        tmp_lib.write(sym, df)
        expected = df.copy()
        expected["projected"] = np.where(
            expected["condition"].isnull().to_numpy(),
            expected["col1"].to_numpy(), 2000.0)
        q = QueryBuilder()
        q = q.apply("projected",
                    where(q["condition"].isnull(), q["col1"],
                          np.float64(2000)))
        _assert_eq(expected, _read(tmp_lib, sym, q))
