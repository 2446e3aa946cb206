"""Resample vs pandas oracle across rules/closed/label/origin — modeled on
reference test_resample.py:48-68 (compare vs df.resample(...).agg(...),
empty buckets dropped)."""

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.operators.resample import resample


def _pandas_oracle(pdf, rule, aggs, **kw):
    r = pdf.set_index("ts").resample(rule, **kw)
    out = r.agg(**{name: (c, how if how != "mean" else "mean")
                   for name, (c, how) in aggs.items()})
    cnt = r["value"].count()
    return out[cnt > 0]


@pytest.mark.parametrize("rule", ["15min", "1h", "6h", "1D"])
def test_resample_rules(events, events_pdf, rule):
    aggs = {"n": ("value", "count"), "s": ("value", "sum"),
            "lo": ("value", "min"), "hi": ("value", "max")}
    mine = resample(events, "ts", rule, aggs).toPandas().set_index("ts").sort_index()
    orc = _pandas_oracle(events_pdf, rule, aggs)
    assert len(mine) == len(orc)
    assert np.allclose(mine["s"].values, orc["s"].values)
    assert (mine["n"].values == orc["n"].values).all()
    assert np.allclose(mine["lo"].values, orc["lo"].values)


@pytest.mark.parametrize("closed,label", [("left", "left"), ("left", "right"),
                                          ("right", "left"), ("right", "right")])
def test_resample_closed_label(events, events_pdf, closed, label):
    aggs = {"n": ("value", "count"), "s": ("value", "sum")}
    mine = resample(events, "ts", "4h", aggs, closed=closed, label=label) \
        .toPandas().set_index("ts").sort_index()
    orc = _pandas_oracle(events_pdf, "4h", aggs, closed=closed, label=label)
    assert len(mine) == len(orc)
    assert (mine.index == orc.index).all()
    assert np.allclose(mine["s"].values, orc["s"].values)


def test_resample_first_last(events, events_pdf):
    aggs = {"f": ("value", "first"), "l": ("value", "last")}
    mine = resample(events, "ts", "2h", aggs).toPandas().set_index("ts").sort_index()
    orc = _pandas_oracle(events_pdf, "2h", aggs)
    assert np.allclose(mine["f"].values, orc["f"].values)
    assert np.allclose(mine["l"].values, orc["l"].values)


def test_resample_offset_origin(events, events_pdf):
    aggs = {"n": ("value", "count")}
    mine = resample(events, "ts", "1D", aggs, offset="6h") \
        .toPandas().set_index("ts").sort_index()
    orc = _pandas_oracle(events_pdf, "1D", aggs, offset="6h")
    assert len(mine) == len(orc)
    assert (mine.index == orc.index).all()

    mine2 = resample(events, "ts", "1D", aggs, origin="start_day") \
        .toPandas().set_index("ts").sort_index()
    orc2 = _pandas_oracle(events_pdf, "1D", aggs, origin="start_day")
    assert len(mine2) == len(orc2)


def test_resample_nan_skipped(spark):
    pdf = pd.DataFrame({
        "ts": pd.date_range("2024-01-01", periods=8, freq="30min"),
        "value": [1.0, np.nan, 3.0, np.nan, np.nan, 6.0, 7.0, 8.0]})
    df = spark.createDataFrame(pdf)
    mine = resample(df, "ts", "1h", {"n": ("value", "count"),
                                     "s": ("value", "sum")}) \
        .toPandas().set_index("ts").sort_index()
    orc = pdf.set_index("ts").resample("1h").agg(n=("value", "count"),
                                                 s=("value", "sum"))
    assert (mine["n"].values == orc["n"].values).all()
    assert np.allclose(mine["s"].values, orc["s"].values)


def test_resample_non_fixed_rule_rejected(events):
    with pytest.raises(ValueError):
        resample(events, "ts", "1M", {"n": ("value", "count")})


def test_resample_rejects_calendar_anchored_frequencies():
    # reference test_resample_rejects_unsupported_frequency_strings
    import pytest
    from arcticdb_spark.expr import ExpressionError
    from arcticdb_spark.query import QueryBuilder
    for freq in ["ME", "MS", "QS", "QE", "YS", "YE", "BMS", "C"]:
        with pytest.raises(ExpressionError):
            QueryBuilder().resample(freq)
        with pytest.raises(ExpressionError):
            QueryBuilder().resample("2" + freq)
    # Week is anchored (pd.Timestamp.floor('W') raises) -> builder rejects,
    # matching the reference; '7D' is the fixed-width spelling
    for freq in ["W", "W-MON", "2W"]:
        with pytest.raises(ExpressionError):
            QueryBuilder().resample(freq)
    # fixed-width (Tick) rules still build
    for freq in ["1h", "15min", "D", "7D", "30s"]:
        QueryBuilder().resample(freq)


def test_resample_non_epoch_origin_rejects_date_range(spark, tmp_path):
    # reference test_non_epoch_origin_throws_with_daterange /
    # test_epoch_and_ts_origin_works_with_date_range
    import pandas as pd
    import pytest
    from arcticdb_spark.catalog import Arctic, ArcticException
    from arcticdb_spark.query import QueryBuilder
    lib = Arctic(str(tmp_path), spark).create_library("o")
    pdf = pd.DataFrame({"col": [1.0, 2.0, 3.0]},
                       index=pd.DatetimeIndex(
                           pd.date_range("2024-01-01", periods=3),
                           name="ts"))
    lib.write("sym", pdf)
    dr = (pd.Timestamp("2024-01-02"), pd.Timestamp("2024-01-03"))
    for origin in ["start", "start_day", "end", "end_day"]:
        q = QueryBuilder().resample("1min", origin=origin).agg({"col": "min"})
        with pytest.raises(ArcticException):
            lib.read("sym", query_builder=q, date_range=dr)
    # epoch and concrete-timestamp origins are fine
    for origin in ["epoch", pd.Timestamp("2025-01-03 12:00:00")]:
        q = QueryBuilder().resample("1D", origin=origin).agg({"col": "min"})
        assert lib.read("sym", query_builder=q, date_range=dr).count() == 2


def test_resampling_timezones(spark, tmp_path):
    # reference test_resampling_timezones: buckets are computed on the
    # UTC instant (int64 ns), so DST transitions neither drop nor double
    # rows — pandas agrees when resampling tz-aware data
    import numpy as np
    import pandas as pd
    from arcticdb_spark.catalog import Arctic
    from arcticdb_spark.query import QueryBuilder
    lib = Arctic(str(tmp_path), spark).create_library("tz")
    for start in ("2024-03-31T00:00:00", "2024-10-27T00:00:00"):
        index = pd.date_range(start, freq="min", periods=240,
                              tz="Europe/London")
        df = pd.DataFrame({"col": np.arange(len(index), dtype="int64")},
                          index=index)
        lib.write("sym", df)
        q = QueryBuilder().resample("1h").agg({"s": ("col", "sum")})
        out = lib.read("sym", query_builder=q, output_format="pandas")
        expected = df.resample("h").agg(s=("col", "sum"))
        expected = expected[expected["s"].notna()]
        assert sorted(out["s"].tolist()) == sorted(
            expected["s"].astype("int64").tolist()), start


def test_resample_infinity_elements(spark, tmp_path):
    # reference test_max/min_with_one_infinity_element
    import numpy as np
    import pandas as pd
    from arcticdb_spark.catalog import Arctic
    from arcticdb_spark.query import QueryBuilder
    lib = Arctic(str(tmp_path), spark).create_library("inf")
    lib.write("mx", pd.DataFrame({"col": [np.inf]},
                                 index=pd.DatetimeIndex(
                                     [pd.Timestamp("2024-01-01")])))
    q = QueryBuilder().resample("1min").agg({"col_max": ("col", "max")})
    out = lib.read("mx", query_builder=q, output_format="pandas")
    assert np.isinf(out["col_max"].iloc[0])
    lib.write("mn", pd.DataFrame({"col": [-np.inf]},
                                 index=pd.DatetimeIndex(
                                     [pd.Timestamp("2024-01-01")])))
    q = QueryBuilder().resample("1min").agg({"col_min": ("col", "min")})
    out = lib.read("mn", query_builder=q, output_format="pandas")
    assert np.isneginf(out["col_min"].iloc[0])


def test_resample_date_range_outside_symbol_timerange(spark, tmp_path):
    # reference test_date_range_outside_symbol_timerange: empty result,
    # aggregated column set preserved
    import numpy as np
    import pandas as pd
    from arcticdb_spark.catalog import Arctic
    from arcticdb_spark.query import QueryBuilder
    lib = Arctic(str(tmp_path), spark).create_library("dr")
    lib.write("sym", pd.DataFrame(
        {"col": np.arange(10, dtype="int64")},
        index=pd.date_range("2025-01-01", periods=10)))
    q = (QueryBuilder()
         .date_range((pd.Timestamp("2025-02-01"),
                      pd.Timestamp("2025-02-02")))
         .resample("1min").agg({"col": ("col", "sum")}))
    out = lib.read("sym", query_builder=q, output_format="pandas")
    assert not len(out)
    assert "col" in out.columns
