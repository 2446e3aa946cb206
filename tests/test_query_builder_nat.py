"""NaT comparison semantics ported from the reference's
``test_query_builder_nat.py``: pandas is the oracle — ``col == NaT`` is
always False (empty result), ``col != NaT`` is always True (keeps the NaT
rows too), ordered comparisons drop NaT rows.
"""
import pandas as pd
import pytest

from arcticdb_spark.query import QueryBuilder


@pytest.fixture()
def natsym(tmp_lib):
    df0 = pd.DataFrame({"col": [pd.Timestamp("2020-01-01"), pd.NaT]},
                       index=pd.date_range("2000-01-01", periods=2, name="ts"))
    df1 = pd.DataFrame({"col": [pd.Timestamp("2025-01-01"),
                                pd.Timestamp("2025-06-01")]},
                       index=pd.date_range("2000-01-03", periods=2, name="ts"))
    tmp_lib.write("sym", df0)
    tmp_lib.append("sym", df1)
    full = pd.concat([df0, df1])
    return tmp_lib, full


@pytest.mark.parametrize(
    "query_expr",
    [lambda q: q["col"] == pd.NaT,
     lambda q: q["col"] != pd.NaT,
     lambda q: q["col"] > pd.Timestamp("2024-01-01"),
     lambda q: q["col"] < pd.Timestamp("2024-01-01"),
     lambda q: q["col"] >= pd.Timestamp("2024-01-01"),
     lambda q: q["col"] <= pd.Timestamp("2024-01-01")],
    ids=["eq_nat", "ne_nat", "gt_ts", "lt_ts", "ge_ts", "le_ts"])
def test_filter_nat_values(natsym, query_expr):
    lib, full = natsym
    q = QueryBuilder()
    q = q[query_expr(q)]
    out = lib.read("sym", query_builder=q, output_format="pandas")
    exp = full[query_expr(full)]
    assert len(out) == len(exp)
    assert sorted(x for x in out["col"].dropna()) == \
        sorted(x for x in exp["col"].dropna())
    assert out["col"].isna().sum() == exp["col"].isna().sum()


@pytest.mark.parametrize("query_expr",
                         [lambda x: x["a"] == x["b"],
                          lambda x: x["a"] != x["b"]],
                         ids=["eq", "ne"])
def test_filter_nat_col_col(tmp_lib, query_expr):
    df = pd.DataFrame(
        {"a": [pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-02"),
               pd.NaT, pd.NaT, pd.Timestamp("2024-01-05")],
         "b": [pd.Timestamp("2024-01-01"), pd.NaT,
               pd.Timestamp("2024-01-03"), pd.NaT,
               pd.Timestamp("2024-01-06")]},
        index=pd.date_range("2000-01-01", periods=5, name="ts"))
    tmp_lib.write("sym", df)
    q = QueryBuilder()
    q = q[query_expr(q)]
    out = tmp_lib.read("sym", query_builder=q, output_format="pandas")
    exp = df[query_expr(df)]
    assert len(out) == len(exp)
    assert list(out.sort_index().index) == list(exp.index)
