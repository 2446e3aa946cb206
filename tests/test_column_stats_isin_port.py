"""Ported (shape) from the reference's
``python/tests/unit/arcticdb/test_column_stats_isin.py``: ISIN prunes
per-element against each file's [min, max]; ISNOTIN prunes only
single-valued files; NaN elements disable pruning (minmax stats skip NaN
so they cannot disprove presence); empty isin sets prune everything;
results stay value-correct either way."""
import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.expr import ColumnRef
from arcticdb_spark.plans.stats_prune import (extract_conjuncts,
                                              prune_files_by_stats,
                                              range_can_match)


def _frame(start, n, off):
    return pd.DataFrame({
        "ts": pd.date_range(start, periods=n, freq="1h"),
        "v": np.arange(off, off + n, dtype="float64")})


@pytest.fixture()
def stats_lib(tmp_lib):
    tmp_lib.write("sym", _frame("2024-01-01", 20, 0))
    for i in range(1, 5):
        tmp_lib.append("sym", _frame(f"2024-01-0{i+1}", 20, i * 100))
    tmp_lib.create_column_stats("sym", ["v"])
    return tmp_lib


class TestRangeCanMatch:
    def test_isin_per_element(self):
        assert range_can_match("ISIN", [5, 500], 0, 19)
        assert not range_can_match("ISIN", [50, 500], 0, 19)
        assert not range_can_match("ISIN", [], 0, 19)  # empty set: prune

    def test_isin_nan_disables_pruning(self):
        assert range_can_match("ISIN", [np.nan], 0, 19)
        assert range_can_match("ISIN", [500, np.nan], 0, 19)
        assert range_can_match("ISIN", [None], 0, 19)

    def test_isnotin_single_valued_only(self):
        assert not range_can_match("ISNOTIN", [7], 7, 7)   # all rows == 7
        assert range_can_match("ISNOTIN", [7], 0, 19)      # multi-valued
        assert range_can_match("ISNOTIN", [8], 7, 7)       # value survives
        assert range_can_match("ISNOTIN", [7, np.nan], 7, 7)  # NaN: keep


class TestIsInPruning:
    def test_isin_prunes_files(self, stats_lib):
        stats = stats_lib.get_column_stats("sym")
        m = stats_lib._load_manifest("sym", 4)
        q = ColumnRef("v").isin([5.0, 105.0])
        kept = prune_files_by_stats(m.files, stats, q)
        assert len(kept) < len(m.files)
        assert sum(f.rows for f in kept) >= 2

    def test_isin_read_correct(self, stats_lib):
        from arcticdb_spark.query import QueryBuilder
        q = QueryBuilder()
        q = q[q["v"].isin([5.0, 105.0, 405.0])]
        out = stats_lib.read("sym", query_builder=q,
                             output_format="pandas")
        assert sorted(out["v"].tolist()) == [5.0, 105.0, 405.0]

    def test_isnotin_read_correct(self, stats_lib):
        from arcticdb_spark.query import QueryBuilder
        q = QueryBuilder()
        q = q[q["v"].isnotin([5.0])]
        out = stats_lib.read("sym", query_builder=q,
                             output_format="pandas")
        assert len(out) == 99 and 5.0 not in out["v"].tolist()

    def test_isin_conjunct_extracted_with_and(self):
        expr = (ColumnRef("v").isin([1, 2])) & (ColumnRef("v") >= 1)
        got = extract_conjuncts(expr)
        assert ("v", "ISIN", [1, 2]) in got
        assert ("v", "GE", 1) in got
