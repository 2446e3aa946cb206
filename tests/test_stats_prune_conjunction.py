"""Adjacent-FilterClause conjunction merging for zone-map pruning
(reference ``processing/query_planner.cpp:32-58``
``and_filter_expression_contexts``: adjacent FilterClauses are AND-merged
before stats evaluation) — ``q[a][b]`` must prune on BOTH conjuncts,
scanning the same file count as the single AND-combined filter, and a
projection between filters must stop the merge (the later filter may
reference computed columns the stats know nothing about)."""
import re

import numpy as np
import pandas as pd
import pytest


def _frame(start, n, off):
    return pd.DataFrame({
        "ts": pd.date_range(start, periods=n, freq="1h"),
        "v": np.arange(off, off + n, dtype="float64"),
        "w": np.arange(off, off + n, dtype="float64") * 2})


@pytest.fixture()
def stats_lib(tmp_lib):
    # 5 files, v ranges [0,19],[100,119],...,[400,419]; w = 2*v
    tmp_lib.write("sym", _frame("2024-01-01", 20, 0))
    for i in range(1, 5):
        tmp_lib.append("sym", _frame(f"2024-01-0{i+1}", 20, i * 100))
    tmp_lib.create_column_stats("sym", ["v", "w"])
    return tmp_lib


def _paths_scanned(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"InMemoryFileIndex\((\d+) paths\)", plan)
    assert m, plan[:300]
    return int(m.group(1))


class TestFilterConjunctionMerge:
    def test_chained_filters_prune_both_conjuncts(self, stats_lib):
        from arcticdb_spark.query import QueryBuilder
        # v >= 100 keeps files 2-5; w <= 440 (v <= 220) keeps files 1-3;
        # together only files 2 and 3 can match
        q1 = QueryBuilder()
        q1 = q1[q1["v"] >= 100.0]
        q1 = q1[q1["w"] <= 440.0]
        chained = stats_lib.read("sym", query_builder=q1)

        q2 = QueryBuilder()
        q2 = q2[(q2["v"] >= 100.0) & (q2["w"] <= 440.0)]
        combined = stats_lib.read("sym", query_builder=q2)

        n1, n2 = _paths_scanned(chained), _paths_scanned(combined)
        assert n1 == n2 == 2
        got = sorted(r.v for r in chained.collect())
        assert got == sorted(r.v for r in combined.collect())
        assert got == [float(x) for x in range(100, 120)] + \
            [float(x) for x in range(200, 220)]

    def test_projection_stops_the_merge(self, stats_lib):
        # filter / project / filter: the second filter references the
        # COMPUTED column, so only the first conjunct may prune — and the
        # result must still be correct
        from arcticdb_spark.query import QueryBuilder
        q = QueryBuilder()
        q = q[q["v"] >= 100.0]
        q.apply("double_v", q["v"] * 2.0)
        q = q[q["double_v"] <= 240.0]
        out = stats_lib.read("sym", query_builder=q)
        assert _paths_scanned(out) == 4   # only v >= 100 pruned file 1
        assert sorted(r.v for r in out.collect()) == \
            [float(x) for x in range(100, 120)]

    def test_date_range_interleaves_freely(self, stats_lib):
        # date_range between two filters only removes rows — both filter
        # conjuncts still prune
        from arcticdb_spark.query import QueryBuilder
        q = QueryBuilder()
        q = q[q["v"] >= 100.0]
        q = q.date_range((pd.Timestamp("2024-01-01"),
                          pd.Timestamp("2024-01-04 23:00")))
        q = q[q["w"] <= 440.0]
        out = stats_lib.read("sym", query_builder=q)
        assert _paths_scanned(out) == 2
        assert sorted(r.v for r in out.collect()) == \
            [float(x) for x in range(100, 120)] + \
            [float(x) for x in range(200, 220)]

    def test_triple_chain(self, stats_lib):
        from arcticdb_spark.query import QueryBuilder
        q = QueryBuilder()
        q = q[q["v"] >= 100.0]
        q = q[q["v"] <= 320.0]
        q = q[q["w"] >= 250.0]   # v >= 125 -> files 2..4 ∩ ... = 2
        out = stats_lib.read("sym", query_builder=q)
        assert _paths_scanned(out) == 2
        assert sorted(r.v for r in out.collect()) == \
            [float(x) for x in range(200, 220)] + \
            [float(x) for x in range(300, 320)]
