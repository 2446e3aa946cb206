"""Regression tests for round-2 fixes (VERDICT/ADVICE follow-ups):

* read-level date_range/row_range params + positional query_builder clauses
  (ADVICE high: previously intersected absolute rowids with the date filter)
* one-sided date_range in update()/delete_data_in_range
* exact resample origin='end'/'end_day' alignment (+ right-closed default)
* TS<->INT comparison in exact int64 ns math (no double rounding)
* merge_update NULL-key matched detection
* chained positional clauses rebase positions (row_range -> head)
"""

import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from arcticdb_spark.query import QueryBuilder
from arcticdb_spark.plans.rowid import ROW_ID


def _mk_ts_frame(n=1000, start="2024-01-01", freq="37min"):
    # real DatetimeIndex (pandas ts DATA columns are no longer sniffed
    # as the index — reference parity)
    idx = pd.date_range(start, periods=n, freq=freq, name="ts")
    return pd.DataFrame({"v": np.arange(n, dtype="int64"),
                         "x": np.arange(n, dtype="float64") * 0.5},
                        index=idx)


# ---------------------------------------------------------------------------
# ADVICE high: params + positional clauses
# ---------------------------------------------------------------------------

class TestReadParamsWithPositionalClauses:
    def test_date_range_param_then_head(self, tmp_lib):
        pdf = _mk_ts_frame()
        tmp_lib.write("sym", pdf)
        mid = pdf.index[500]
        q = QueryBuilder().head(5)
        out = tmp_lib.read("sym", date_range=(mid, None), query_builder=q,
                           output_format="pandas")
        expected = pdf[pdf.index >= mid].head(5)
        assert list(out["v"]) == list(expected["v"])

    def test_date_range_param_then_tail(self, tmp_lib):
        pdf = _mk_ts_frame()
        tmp_lib.write("sym", pdf)
        mid = pdf.index[500]
        q = QueryBuilder().tail(7)
        out = tmp_lib.read("sym", date_range=(None, mid), query_builder=q,
                           output_format="pandas")
        expected = pdf[pdf.index <= mid].tail(7)
        assert list(out["v"]) == list(expected["v"])

    def test_date_range_param_then_row_range(self, tmp_lib):
        pdf = _mk_ts_frame()
        tmp_lib.write("sym", pdf)
        lo, hi = pdf.index[200], pdf.index[800]
        q = QueryBuilder().row_range((10, 20))
        out = tmp_lib.read("sym", date_range=(lo, hi), query_builder=q,
                           output_format="pandas")
        expected = pdf[(pdf.index >= lo) & (pdf.index <= hi)].iloc[10:20]
        assert list(out["v"]) == list(expected["v"])

    def test_row_range_param_then_head(self, tmp_lib):
        pdf = _mk_ts_frame()
        tmp_lib.write("sym", pdf)
        q = QueryBuilder().head(5)
        out = tmp_lib.read("sym", row_range=(100, 200), query_builder=q,
                           output_format="pandas")
        assert list(out["v"]) == list(range(100, 105))

    def test_row_range_param_then_tail(self, tmp_lib):
        pdf = _mk_ts_frame()
        tmp_lib.write("sym", pdf)
        q = QueryBuilder().tail(5)
        out = tmp_lib.read("sym", row_range=(100, 200), query_builder=q,
                           output_format="pandas")
        assert list(out["v"]) == list(range(195, 200))

    def test_date_range_param_then_filter_unchanged(self, tmp_lib):
        pdf = _mk_ts_frame()
        tmp_lib.write("sym", pdf)
        mid = pdf.index[500]
        q = QueryBuilder()
        q = q[q["v"] > 700]
        out = tmp_lib.read("sym", date_range=(mid, None), query_builder=q,
                           output_format="pandas")
        expected = pdf[(pdf.index >= mid) & (pdf["v"] > 700)]
        assert sorted(out["v"]) == sorted(expected["v"])


# ---------------------------------------------------------------------------
# chained positional clauses
# ---------------------------------------------------------------------------

class TestChainedPositional:
    def test_row_range_then_head(self, events):
        q = QueryBuilder().row_range((100, 180)).head(10)
        out = q.to_df(events, ["ts", "event_id"]).drop(ROW_ID).toPandas()
        expected = (events.toPandas()
                    .sort_values(["ts", "event_id"]).iloc[100:110])
        assert list(out["event_id"]) == list(expected["event_id"])

    def test_tail_then_head(self, events):
        q = QueryBuilder().tail(50).head(10)
        out = q.to_df(events, ["ts", "event_id"]).toPandas()
        pdf = events.toPandas().sort_values(["ts", "event_id"])
        expected = pdf.tail(50).head(10)
        assert list(out["event_id"]) == list(expected["event_id"])

    def test_row_range_negative_then_head(self, events):
        total = events.count()
        q = QueryBuilder().row_range((-100, None)).head(5)
        out = q.to_df(events, ["ts", "event_id"]).drop(ROW_ID).toPandas()
        pdf = events.toPandas().sort_values(["ts", "event_id"])
        expected = pdf.iloc[total - 100:total - 95]
        assert list(out["event_id"]) == list(expected["event_id"])


# ---------------------------------------------------------------------------
# one-sided update / delete ranges
# ---------------------------------------------------------------------------

class TestOpenEndedRanges:
    def test_update_open_upper(self, tmp_lib):
        pdf = _mk_ts_frame(200)
        tmp_lib.write("sym", pdf)
        cut = pdf.index[150]
        new = pd.DataFrame({"v": [999_999], "x": [1.5]},
                           index=pd.DatetimeIndex([cut + pd.Timedelta("1s")],
                                                  name="ts"))
        tmp_lib.update("sym", new, date_range=(cut, None))
        out = tmp_lib.read("sym", output_format="pandas").sort_index()
        # rows >= cut replaced by the single new row
        assert (out.index >= cut).sum() == 1
        assert out[out.index >= cut]["v"].iloc[0] == 999_999
        assert (out.index < cut).sum() == 150

    def test_update_open_lower(self, tmp_lib):
        pdf = _mk_ts_frame(200)
        tmp_lib.write("sym", pdf)
        cut = pdf.index[50]
        new = pd.DataFrame({"v": [-1], "x": [0.0]},
                           index=pd.DatetimeIndex([pdf.index[0]], name="ts"))
        tmp_lib.update("sym", new, date_range=(None, cut))
        out = tmp_lib.read("sym", output_format="pandas").sort_index()
        assert (out.index <= cut).sum() == 1
        assert out["v"].iloc[0] == -1

    def test_delete_data_in_range_open_upper(self, tmp_lib):
        pdf = _mk_ts_frame(200)
        tmp_lib.write("sym", pdf)
        cut = pdf.index[120]
        tmp_lib.delete_data_in_range("sym", (cut, None))
        out = tmp_lib.read("sym", output_format="pandas")
        assert len(out) == 120
        assert out.index.max() < cut


# ---------------------------------------------------------------------------
# resample origin end/end_day
# ---------------------------------------------------------------------------

class TestResampleOriginEnd:
    @pytest.mark.parametrize("origin", ["end", "end_day"])
    @pytest.mark.parametrize("rule", ["90min", "7h", "1D"])
    def test_matches_pandas(self, spark, origin, rule):
        from arcticdb_spark.operators.resample import resample
        idx = pd.date_range("2024-03-02 05:13:07", periods=500, freq="41min")
        pdf = pd.DataFrame({"ts": idx, "v": np.arange(500, dtype="float64")})
        sdf = spark.createDataFrame(pdf)
        got = (resample(sdf, "ts", rule, {"s": ("v", "sum"), "n": ("v", "count")},
                        origin=origin)
               .toPandas().set_index("ts").sort_index())
        exp = (pdf.set_index("ts")["v"]
               .resample(rule, origin=origin, closed="right", label="right")
               .agg(["sum", "count"]).dropna(subset=["count"]))
        exp = exp[exp["count"] > 0]
        assert list(got.index) == list(exp.index)
        assert np.allclose(got["s"], exp["sum"])
        assert list(got["n"]) == list(exp["count"].astype(int))

    def test_end_origin_defaults_right(self, spark):
        """closed/label default to right for end origins (reference
        processing.py:898-906)."""
        from arcticdb_spark.operators.resample import resample
        idx = pd.date_range("2024-01-01 00:20:00", periods=100, freq="13min")
        pdf = pd.DataFrame({"ts": idx, "v": np.ones(100)})
        sdf = spark.createDataFrame(pdf)
        got = (resample(sdf, "ts", "2h", {"n": ("v", "count")}, origin="end")
               .toPandas())
        exp = (pdf.set_index("ts")["v"].resample("2h", origin="end")
               .count())
        exp = exp[exp > 0]
        assert list(got["ts"]) == list(exp.index)
        assert list(got["n"]) == list(exp.values)


# ---------------------------------------------------------------------------
# exact TS<->INT comparison
# ---------------------------------------------------------------------------

class TestTsIntPrecision:
    def test_ns_boundary_exact(self, spark):
        from arcticdb_spark.query import QueryBuilder
        # timestamps 1µs apart around an epoch where double*1e9 loses ~256ns
        base = pd.Timestamp("2024-01-01").value  # ~1.7e18 ns
        ts = [pd.Timestamp(base + i * 1000) for i in range(10)]
        pdf = pd.DataFrame({"ts": ts, "v": range(10)})
        sdf = spark.createDataFrame(pdf)
        cutoff = base + 5000  # exact ns literal on a µs boundary
        q = QueryBuilder()
        q = q[q["ts"] >= cutoff]
        out = q.to_df(sdf, "ts").toPandas()
        assert sorted(out["v"]) == [5, 6, 7, 8, 9]
        q2 = QueryBuilder()
        q2 = q2[q2["ts"] == cutoff]
        out2 = q2.to_df(sdf, "ts").toPandas()
        assert list(out2["v"]) == [5]


# ---------------------------------------------------------------------------
# merge_update null keys
# ---------------------------------------------------------------------------

class TestMergeUpdateNullKeys:
    def test_null_key_row_updated(self, spark):
        from arcticdb_spark.operators.merge_update import merge_update
        import pyspark.sql.types as T
        schema = T.StructType([T.StructField("k", T.LongType(), True),
                               T.StructField("val", T.StringType(), True)])
        target = spark.createDataFrame(
            [(1, "t1"), (None, "t-null"), (3, "t3")], schema)
        source = spark.createDataFrame(
            [(None, "s-null"), (3, "s3"), (9, "s9")], schema)
        out = {r["k"]: r["val"]
               for r in merge_update(target, source, on=["k"], upsert=True).collect()}
        # NULL-key target row matches NULL-key source row (eqNullSafe join)
        assert out[None] == "s-null"
        assert out[3] == "s3"
        assert out[1] == "t1"
        assert out[9] == "s9"


def test_date_range_plus_row_range_params_rejected(tmp_lib):
    """Reference _store.py:2221: both range params together is a user
    error (and the absolute-rowid intersection would be wrong anyway)."""
    from arcticdb_spark.catalog import ArcticException
    tmp_lib.write("both_ranges", _mk_ts_frame(50))
    with pytest.raises(ArcticException, match="both specified"):
        tmp_lib.read("both_ranges",
                     date_range=(pd.Timestamp("2024-01-01"), None),
                     row_range=(0, 3))
