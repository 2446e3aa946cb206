"""Bi-temporal observation-time reads, ported from the reference's
``test_observation_time.py``: an hourly series carrying its vendor
``observed`` timestamp, built up through append (daily drops), update
(backfill BEFORE the existing range) and update (mid-range patch), read
back "as observed at T" via a query_builder filter on the observed column.
Exercises append/update/filter composition on a realistic workflow.
"""
import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow


from arcticdb_spark.query import QueryBuilder

H = 24


def _day(day, hours=None):
    data = np.arange((day - 1) * H, day * H)
    idx = pd.date_range(pd.Timestamp(2000, 1, day), periods=H, freq="1h",
                        name="ts")
    df = pd.DataFrame(
        {"data": data,
         "observed": H * [pd.Timestamp(2000, 1, day, 23, 59)]}, index=idx)
    return df


def _read_observed(lib, before_day):
    q = QueryBuilder()
    q = q[q["observed"] < pd.Timestamp(2000, 1, before_day)]
    out = lib.read("sym", query_builder=q, output_format="pandas")
    if out.index.name is None or out.index.name == "ts":
        out = out.reset_index() if out.index.name else out
    return out


def _datas(out):
    return sorted(out["data"].tolist())


def test_observation_time(tmp_lib):
    df1, df2, df3, df4, df5 = (_day(d) for d in range(1, 6))
    df4_initial = df4.loc[(df4["data"] <= 84) | (df4["data"] >= 90)]
    df4_patch = df4.loc[(df4["data"] > 84) & (df4["data"] < 90)]

    tmp_lib.write("sym", df3)
    tmp_lib.append("sym", df4_initial)
    tmp_lib.append("sym", df5)

    assert len(_read_observed(tmp_lib, 2)) == 0
    assert len(_read_observed(tmp_lib, 3)) == 0
    assert _datas(_read_observed(tmp_lib, 4)) == df3["data"].tolist()
    assert _datas(_read_observed(tmp_lib, 5)) == sorted(
        df3["data"].tolist() + df4_initial["data"].tolist())
    assert _datas(_read_observed(tmp_lib, 6)) == sorted(
        df3["data"].tolist() + df4_initial["data"].tolist()
        + df5["data"].tolist())

    # backfill BEFORE the existing range (update as prepend)
    tmp_lib.update("sym", df1)
    tmp_lib.update("sym", df2)
    assert _datas(_read_observed(tmp_lib, 2)) == df1["data"].tolist()
    assert _datas(_read_observed(tmp_lib, 3)) == sorted(
        df1["data"].tolist() + df2["data"].tolist())
    assert _datas(_read_observed(tmp_lib, 5)) == sorted(
        df1["data"].tolist() + df2["data"].tolist() + df3["data"].tolist()
        + df4_initial["data"].tolist())

    # mid-range patch: splice the missing 12:00-16:00 rows into day 4
    tmp_lib.update("sym", df4_patch)
    assert _datas(_read_observed(tmp_lib, 5)) == sorted(
        df1["data"].tolist() + df2["data"].tolist() + df3["data"].tolist()
        + df4["data"].tolist())
    assert _datas(_read_observed(tmp_lib, 6)) == list(range(5 * H))
    # full read is the complete series in order
    full = tmp_lib.read("sym", output_format="pandas")
    assert full["data"].tolist() == list(range(5 * H))


def test_nullable_boolean_roundtrip(tmp_lib):
    # reference test_nullable_boolean_column_type.py (suite disabled there;
    # nullable booleans are native here)
    df = pd.DataFrame({"col1": [True, None, False, None]})
    tmp_lib.write("sym", df)
    out = tmp_lib.read("sym", output_format="pandas")
    assert out["col1"].tolist() == [True, None, False, None]
    all_none = pd.DataFrame({"col1": [None, None, None]})
    tmp_lib.write("n", all_none)
    outn = tmp_lib.read("n", output_format="pandas")
    assert outn["col1"].tolist() == [None, None, None]
