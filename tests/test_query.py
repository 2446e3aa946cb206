"""Clause pipeline vs pandas oracle (reference generic_filter_test pattern)."""

import numpy as np
import pandas as pd

from arcticdb_spark.query import QueryBuilder


def test_filter_project_chain(lineitem, lineitem_pdf):
    q = QueryBuilder()
    q = q[(q["l_quantity"] > 30) & (q["l_discount"] <= 0.05)]
    q = q.apply("revenue", q["l_extendedprice"] * (1 - q["l_discount"]))
    out = q.to_df(lineitem).toPandas()
    p = lineitem_pdf[(lineitem_pdf.l_quantity > 30) & (lineitem_pdf.l_discount <= 0.05)].copy()
    p["revenue"] = p.l_extendedprice * (1 - p.l_discount)
    assert len(out) == len(p)
    assert np.isclose(out["revenue"].sum(), p["revenue"].sum())


def test_groupby_dropna_single(spark):
    pdf = pd.DataFrame({"k": ["a", None, "b", "a", None, "b"],
                        "v": [1.0, 2.0, np.nan, 4.0, 5.0, 6.0]})
    df = spark.createDataFrame(pdf)
    q = QueryBuilder().groupby("k").agg({"s": ("v", "sum"), "n": ("v", "count"),
                                         "m": ("v", "mean")})
    out = q.to_df(df).toPandas().set_index("k").sort_index()
    # null keys dropped (reference grouper.hpp:30-40); NaN skipped in aggs
    assert out.index.tolist() == ["a", "b"]
    assert out.loc["a", "s"] == 5.0
    assert out.loc["b", "s"] == 6.0
    assert out.loc["b", "n"] == 1
    assert out.loc["b", "m"] == 6.0


def test_groupby_nan_key_dropped(spark):
    pdf = pd.DataFrame({"k": [1.0, np.nan, 2.0, 1.0], "v": [1, 2, 3, 4]})
    df = spark.createDataFrame(pdf)
    q = QueryBuilder().groupby("k").agg({"s": ("v", "sum")})
    out = q.to_df(df).toPandas()
    assert sorted(out["k"].tolist()) == [1.0, 2.0]


def test_head_tail_row_range(events, events_pdf):
    from arcticdb_spark.plans.rowid import ROW_ID, with_row_id
    ev = with_row_id(events, ["ts", "event_id"])
    p = events_pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)

    h = QueryBuilder().head(7).to_df(ev, "ts").toPandas().sort_values("event_id")
    assert sorted(h["event_id"]) == sorted(p.head(7)["event_id"])

    t = QueryBuilder().tail(7).to_df(ev, "ts").toPandas()
    assert sorted(t["event_id"]) == sorted(p.tail(7)["event_id"])

    r = QueryBuilder().row_range((10, 25)).to_df(ev, "ts").toPandas()
    assert sorted(r["event_id"]) == sorted(p.iloc[10:25]["event_id"])

    rn = QueryBuilder().row_range((-20, -5)).to_df(ev, "ts").toPandas()
    assert sorted(rn["event_id"]) == sorted(p.iloc[-20:-5]["event_id"])


def test_date_range_inclusive(events, events_pdf):
    t0, t1 = pd.Timestamp("2024-01-03"), pd.Timestamp("2024-01-05")
    out = QueryBuilder().date_range((t0, t1)).to_df(events, "ts").toPandas()
    p = events_pdf[(events_pdf.ts >= t0) & (events_pdf.ts <= t1)]
    assert len(out) == len(p)


def test_filter_then_head_positions(events, events_pdf):
    """head after a filter = first n of the filtered frame (pandas iloc)."""
    from arcticdb_spark.plans.rowid import with_row_id
    ev = with_row_id(events, ["ts", "event_id"])
    q = QueryBuilder()
    q = q[q["event_type"] == "click"].head(5)
    out = q.to_df(ev, "ts").toPandas()
    p = (events_pdf.sort_values(["ts", "event_id"])
         .loc[events_pdf.event_type == "click"].head(5))
    assert sorted(out["event_id"]) == sorted(p["event_id"])


def test_pending_agg_raises(lineitem):
    import pytest
    from arcticdb_spark.expr import ExpressionError
    q = QueryBuilder().groupby("l_returnflag")
    with pytest.raises(ExpressionError):
        q.to_df(lineitem)


def test_querybuilder_pickle_copy_reuse(lineitem):
    """Reference test_querybuilder_pickle / _shallow_copy / _deepcopy /
    test_reuse_querybuilder: the builder is a pure-Python AST — picklable,
    copyable, and re-runnable without state leakage."""
    import copy
    import pickle
    q = QueryBuilder()
    q = q[q["l_quantity"] > 30].apply("disc2", q["l_discount"] * 2)
    n1 = q.to_df(lineitem).count()
    assert q.to_df(lineitem).count() == n1          # reuse
    assert pickle.loads(pickle.dumps(q)).to_df(lineitem).count() == n1
    assert copy.deepcopy(q).to_df(lineitem).count() == n1
    assert copy.copy(q).to_df(lineitem).count() == n1


def test_date_range_then_filter_then_resample_managed(spark, tmp_path):
    """Reference test_querybuilder_date_range_then_filter_then_resample:
    a read-level date_range composes with filter + resample clauses through
    the managed-symbol path; pandas is the oracle."""
    import numpy as np
    import pandas as pd
    from arcticdb_spark.catalog import Arctic
    lib = Arctic(str(tmp_path), spark).create_library("chain")
    n = 500
    pdf = pd.DataFrame(
        {"v": np.arange(n, dtype="float64")},
        index=pd.date_range("2024-01-01", periods=n, freq="7min", name="ts"))
    lib.write("sym", pdf)
    q = QueryBuilder()
    q = q[q["v"] > 40.0].resample("1h").agg({"v": "mean"})
    lo, hi = pd.Timestamp("2024-01-01 05:00"), pd.Timestamp("2024-01-02 01:00")
    out = (lib.read("sym", date_range=(lo, hi), query_builder=q,
                    output_format="pandas").sort_index())
    sub = pdf[(pdf.index >= lo) & (pdf.index <= hi) & (pdf.v > 40.0)]
    exp = sub.resample("1h").mean().dropna()
    assert len(out) == len(exp)
    assert np.allclose(out["v"].to_numpy(), exp["v"].to_numpy())


def test_querybuilder_then_prepend(lineitem):
    """Reference QueryBuilder.then / .prepend clause composition."""
    import pytest
    from arcticdb_spark.expr import ExpressionError
    base = QueryBuilder()
    base = base[base["l_quantity"] > 30]
    top = QueryBuilder().head(7)
    n_filtered = base.to_df(lineitem).count()
    assert base.then(top).to_df(lineitem).count() == min(7, n_filtered)
    assert top.prepend(base).to_df(lineitem).count() == min(7, n_filtered)
    # originals untouched
    assert base.to_df(lineitem).count() == n_filtered
    assert base.optimise_for_speed() is base
    assert base.optimise_for_memory() is base
    incomplete = QueryBuilder().groupby("l_returnflag")
    with pytest.raises(ExpressionError):
        base.then(incomplete)


def test_query_builder_setitem_getattr_sugar(spark, lineitem):
    """Reference processing.py __setitem__/__getattr__: q.col and
    q["new"] = expr forms."""
    q = QueryBuilder(index_column="l_shipdate")
    q = q[q.l_quantity > 30]            # attribute-style column access
    q["double_qty"] = q.l_quantity * 2  # setitem projection
    out = q.to_df(lineitem)
    assert "double_qty" in out.columns
    row = out.select("l_quantity", "double_qty").first()
    assert row["double_qty"] == row["l_quantity"] * 2
    import pickle, copy
    q2 = pickle.loads(pickle.dumps(q))   # sugar must not break pickling
    assert q2.to_df(lineitem).count() == out.count()
    q3 = copy.deepcopy(q)
    assert str(q3) == str(q)


def test_query_builder_equality_checks():
    # reference test_query_builder.py: same clause chains compare equal
    import pandas as pd
    q1, q2 = QueryBuilder(), QueryBuilder()
    q1 = q1[q1["date"] >= pd.Timestamp("2020-01-01")]
    q2 = q2[q2["date"] >= pd.Timestamp("2020-01-01")]
    assert q1 == q2
    q2 = QueryBuilder()
    q2 = q2[q2["date"] >= pd.Timestamp("2021-01-01")]
    assert q1 != q2


def test_querybuilder_getitem_idempotency(tmp_lib):
    # reference: two names aliasing one builder diverge on their first
    # filters — getitem returns a copy
    import pandas as pd
    df = pd.DataFrame({"a": [0, 1]})
    tmp_lib.write("s", df)
    q = QueryBuilder()
    q_copy = q
    q = q[q["a"] == 1]
    q_copy = q_copy[q_copy["a"] == 0]
    out = tmp_lib.read("s", query_builder=q, output_format="pandas")
    out_copy = tmp_lib.read("s", query_builder=q_copy,
                            output_format="pandas")
    assert out["a"].tolist() == [1]
    assert out_copy["a"].tolist() == [0]


def test_reuse_querybuilder(tmp_lib):
    # reference test_reuse_querybuilder: extending a used builder applies
    # the union of clauses on the next read
    import numpy as np
    import pandas as pd
    df = pd.DataFrame({"col1": np.arange(10, dtype=np.int64),
                       "col2": np.arange(100, 110, dtype=np.int64)})
    tmp_lib.write("s", df)
    q = QueryBuilder()
    q = q[q["col1"].isin(2, 3, 7)]
    out = tmp_lib.read("s", query_builder=q, output_format="pandas")
    assert sorted(out["col1"].tolist()) == [2, 3, 7]
    q = q.apply("new_col", (q["col1"] * q["col2"]) + 13)
    out = tmp_lib.read("s", query_builder=q, output_format="pandas")
    assert sorted(out["new_col"].tolist()) == sorted(
        [(c1 * c2) + 13 for c1, c2 in [(2, 102), (3, 103), (7, 107)]])


def test_querybuilder_pickle_roundtrip():
    # reference test_querybuilder_pickle: the clause chain serializes
    import pickle
    q = QueryBuilder()
    q = q[q["a"].isin(2, 3)].apply("n", q["a"] * 2)
    q2 = pickle.loads(pickle.dumps(q))
    assert q == q2


def test_querybuilder_filter_datetime_with_timezone(tmp_lib):
    # reference test_querybuilder_filter_datetime_with_timezone: filters
    # and date_range over a tz-aware index, tz restored on output
    import numpy as np
    import pandas as pd
    df = pd.DataFrame({"col": np.arange(10, dtype=np.int64)},
                      index=pd.date_range("2024-01-01", periods=10,
                                          tz="America/New_York"))
    tmp_lib.write("s", df)
    q = QueryBuilder()
    q = q[q["col"] > 3]
    out = tmp_lib.read("s", query_builder=q, output_format="pandas")
    assert len(out) == 6 and str(out.index.tz) == "America/New_York"
    dr = (pd.Timestamp("2024-01-03", tz="America/New_York"),
          pd.Timestamp("2024-01-06", tz="America/New_York"))
    out = tmp_lib.read("s", date_range=dr, output_format="pandas")
    assert len(out) == 4
