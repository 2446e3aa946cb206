"""Ported from the reference's
``python/tests/unit/arcticdb/version_store/test_symbol_concatenation.py``
timezone-handling tests: a concatenated index level keeps its zone only
when EVERY participating symbol stores the same zone; any disagreement
(or a naive participant) demotes to naive UTC values. Also pins the
round-11 fix that lazy concat works when the library's DEFAULT output
format is pandas (intermediate frames must stay Spark)."""
import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.lazy import concat

TZS = [None, "Europe/Amsterdam", "US/Eastern"]


def _frame(tz, v):
    return pd.DataFrame(
        {"col1": np.arange(v, v + 1, dtype=np.float64),
         "col2": np.arange(v + 1, v + 2, dtype=np.float64)},
        index=pd.date_range("2025-01-01", periods=1, tz=tz))


@pytest.mark.parametrize("tz_0", TZS)
@pytest.mark.parametrize("tz_1", TZS)
@pytest.mark.parametrize("join", ["inner", "outer"])
def test_symbol_concat_timezone_handling(tmp_lib, tz_0, tz_1, join):
    tmp_lib.write("sym0", _frame(tz_0, 1))
    tmp_lib.write("sym1", _frame(tz_1, 2))
    received = concat(tmp_lib.read_batch(["sym0", "sym1"], lazy=True),
                      join).collect(output_format="pandas")
    expected_tz = (f"datetime64[ns, {tz_0}]"
                   if (tz_0 == tz_1 and tz_0 is not None)
                   else "datetime64[ns]")
    assert str(received.index.dtype) == expected_tz


@pytest.mark.parametrize("tz_0_level_1", [None, "Europe/Amsterdam",
                                          "Australia/Sydney"])
@pytest.mark.parametrize("tz_1_level_1", [None, "Europe/Amsterdam",
                                          "Australia/Sydney"])
def test_symbol_concat_multiindex_timezone_handling(tmp_lib, tz_0_level_1,
                                                    tz_1_level_1):
    def mframe(tz_l0, tz_l1):
        return pd.DataFrame(
            {"col1": np.arange(12, dtype=np.float64)},
            index=pd.MultiIndex.from_product(
                [pd.date_range("2025-01-01", periods=4, tz=tz_l0),
                 pd.date_range("2025-01-01", periods=3, tz=tz_l1)]))
    tmp_lib.write("sym0", mframe("Europe/Amsterdam", tz_0_level_1))
    tmp_lib.write("sym1", mframe("Europe/Amsterdam", tz_1_level_1))
    received = concat(tmp_lib.read_batch(["sym0", "sym1"], lazy=True),
                      "outer").collect(output_format="pandas")
    # level 0 agrees across symbols -> zone kept
    assert str(received.index.dtypes.iloc[0]) == \
        "datetime64[ns, Europe/Amsterdam]"
    expected_l1 = (f"datetime64[ns, {tz_0_level_1}]"
                   if (tz_0_level_1 == tz_1_level_1
                       and tz_0_level_1 is not None)
                   else "datetime64[ns]")
    assert str(received.index.dtypes.iloc[1]) == expected_l1


def test_symbol_concat_under_pandas_default_format(tmp_lib):
    # round-11 regression: the library-level pandas default must not leak
    # pandas frames into the lazy concat's internal union
    tmp_lib.set_output_format("pandas")
    tmp_lib.write("sym0", _frame("Europe/Amsterdam", 1))
    tmp_lib.write("sym1", _frame("Europe/Amsterdam", 2))
    received = concat(tmp_lib.read_batch(["sym0", "sym1"],
                                         lazy=True)).collect()
    assert isinstance(received, pd.DataFrame)   # library default honored
    assert str(received.index.dtype) == "datetime64[ns, Europe/Amsterdam]"
    assert sorted(received["col1"].tolist()) == [1.0, 2.0]


def test_symbol_concat_same_tz_values_roundtrip(tmp_lib):
    df0 = _frame("US/Eastern", 1)
    df1 = pd.DataFrame(
        {"col1": [3.0], "col2": [4.0]},
        index=pd.date_range("2025-01-02", periods=1, tz="US/Eastern"))
    tmp_lib.write("sym0", df0)
    tmp_lib.write("sym1", df1)
    received = concat(tmp_lib.read_batch(["sym0", "sym1"], lazy=True),
                      "outer").collect(output_format="pandas")
    expected = pd.concat([df0, df1])
    expected.index.name = None
    pd.testing.assert_frame_equal(expected, received, check_freq=False)
