"""Property-based resample parity vs pandas (reference hypothesis suite
test_resample.py analogue): random irregular timestamps, NaN-laden values,
random fixed rules x closed x label."""

import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow

from hypothesis import HealthCheck, given, settings, strategies as st

from arcticdb_spark.operators.resample import resample

_spark = None


@pytest.fixture(autouse=True, scope="module")
def _init(spark):
    global _spark
    _spark = spark


@st.composite
def ts_frames(draw):
    n = draw(st.integers(20, 120))
    rng = np.random.default_rng(draw(st.integers(0, 2**16)))
    # irregular timestamps over ~3 days, µs precision, sorted
    start = pd.Timestamp("2024-03-01").value
    offs = np.sort(rng.integers(0, 3 * 86400 * 1_000_000, n)) * 1000
    ts = pd.to_datetime(start + offs)
    vals = rng.uniform(-50, 50, n)
    vals = np.where(rng.random(n) < 0.2, np.nan, vals)
    return pd.DataFrame({"ts": ts, "value": vals})


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(pdf=ts_frames(),
       rule=st.sampled_from(["13min", "45min", "2h", "3h15min", "1D"]),
       closed=st.sampled_from(["left", "right"]),
       label=st.sampled_from(["left", "right"]))
def test_resample_property(pdf, rule, closed, label):
    df = _spark.createDataFrame(pdf)
    mine = resample(df, "ts", rule,
                    {"n": ("value", "count"), "s": ("value", "sum"),
                     "lo": ("value", "min"), "f": ("value", "first"),
                     "l": ("value", "last")},
                    closed=closed, label=label) \
        .toPandas().set_index("ts").sort_index()
    # origin="epoch" == the reference's default (processing.py:728);
    # pandas' own default is start_day
    r = pdf.set_index("ts").resample(rule, closed=closed, label=label,
                                     origin="epoch")
    orc = r.agg(n=("value", "count"), s=("value", "sum"), lo=("value", "min"),
                f=("value", "first"), l=("value", "last"))
    orc = orc[r["value"].size() > 0]  # reference drops empty buckets
    assert list(mine.index) == list(orc.index)
    assert (mine["n"].values == orc["n"].values).all()
    assert np.allclose(mine["s"].values, orc["s"].values)
    for c in ("lo", "f", "l"):
        a, b = mine[c].values, orc[c].values
        ok = np.isclose(a, b) | (np.isnan(a) & np.isnan(b))
        assert ok.all()
