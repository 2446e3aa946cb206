"""Ported from the reference's
python/tests/unit/arcticdb/version_store/test_column_type_changes.py,
pinning WHERE the strict vs permissive type combine applies:

* append/update resolve descriptors through the STRICT
  ``has_valid_common_type`` (entity/merge_descriptors.cpp:84), so
  uint64 <-> signed-int flips RAISE (common_type_mixed_sign_ints would
  need a 128-bit int -> nullopt, type_utils.cpp), while uint64 <-> float64
  WIDENS (int->float64 is valid even under IntToFloatConversion::STRICT,
  type_utils.cpp:94);
* concat/join resolve data columns through the PERMISSIVE
  ``promotable_type`` (processing/clause_utils.cpp:326,385 ->
  type_utils.cpp:254) — covered in test_uint64.py;
* mixed-sign SMALLER ints have a common type one size up
  (common_type_mixed_sign_ints): uint32 + int32 -> int64, the reference's
  test_changing_numeric_type result. (uint32 reaches Spark as int64 via
  Arrow widening, so that promotion is exercised as int64+int32 here.)
"""

import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow


from arcticdb_spark.catalog import Arctic, ArcticException, SchemaException


@pytest.fixture()
def _libs(spark, tmp_path):
    ac = Arctic(str(tmp_path), spark)
    return (ac.create_library("stat", rows_per_file=100_000),
            ac.create_library("dyn", rows_per_file=100_000,
                              dynamic_schema=True))


def _ts(start, n):
    return pd.date_range(start, periods=n, freq="1D").rename("ts")


def test_changing_numeric_type(_libs):
    """Reference test_changing_numeric_type: uint32 write then int32
    append/update — static raises StreamDescriptorMismatch, dynamic
    succeeds with the int64 common type and exact values."""
    stat, dyn = _libs
    df_write = pd.DataFrame({"col": np.arange(3, dtype=np.uint32)},
                            index=_ts("2024-01-01", 3))
    df_append = pd.DataFrame({"col": np.arange(1, dtype=np.int32)},
                             index=_ts("2024-01-04", 1))
    df_update = pd.DataFrame({"col": np.arange(1, dtype=np.int32)},
                             index=_ts("2024-01-02", 1))

    stat.write("sym_append", df_write)
    stat.write("sym_update", df_write)
    with pytest.raises(ArcticException):
        stat.append("sym_append", df_append)
    with pytest.raises(ArcticException):
        stat.update("sym_update", df_update)

    dyn.write("sym_append", df_write)
    dyn.write("sym_update", df_write)
    dyn.append("sym_append", df_append)
    dyn.update("sym_update", df_update)
    got_append = dyn.read("sym_append", output_format="pandas")
    assert got_append["col"].tolist() == [0, 1, 2, 0]
    got_update = dyn.read("sym_update", output_format="pandas")
    assert got_update["col"].tolist() == [0, 0, 2]


@pytest.mark.parametrize("first, second", [("uint64", "int64"),
                                           ("int64", "uint64"),
                                           ("uint64", "int32")])
def test_uint64_signed_flip_raises_even_dynamic(_libs, first, second):
    """The strict combine has NO common type between uint64 and any signed
    int (128 bits would be needed): append raises under BOTH schema modes
    (reference merge_descriptors.cpp:84 E_DESCRIPTOR_MISMATCH)."""
    stat, dyn = _libs
    for lib in (stat, dyn):
        lib.write("sym", pd.DataFrame(
            {"col": np.array([1, 2], dtype=first)}, index=_ts("2024-01-01", 2)))
        with pytest.raises((SchemaException, ArcticException)):
            lib.append("sym", pd.DataFrame(
                {"col": np.array([3], dtype=second)},
                index=_ts("2024-01-03", 1)))


def test_uint64_then_float64_append_widens_dynamic(_libs):
    """uint64 write + float64 append under dynamic schema -> FLOAT64, the
    stored bit-pattern epoch converted by unsigned value (reference strict
    int->float64 promotion, type_utils.cpp:94; exercised upstream by
    test_type_promotion_ints_and_floats_up_to_float64 with
    int_type=uint64)."""
    _, dyn = _libs
    top = np.uint64(2**64 - 1)
    dyn.write("sym", pd.DataFrame({"col": np.array([1, top], dtype=np.uint64)},
                                  index=_ts("2024-01-01", 2)))
    dyn.append("sym", pd.DataFrame({"col": np.array([4.5], dtype=np.float64)},
                                   index=_ts("2024-01-03", 1)))
    got = dyn.read("sym", output_format="pandas")
    assert got["col"].dtype == np.float64
    assert got["col"].tolist() == [1.0, float(top), 4.5]


def test_float64_then_uint64_append_widens_dynamic(_libs):
    """Mirror direction: float64 write + uint64 append stays FLOAT64; the
    appended bit-pattern epoch reads back by unsigned value."""
    _, dyn = _libs
    top = np.uint64(2**64 - 1)
    dyn.write("sym", pd.DataFrame({"col": np.array([4.5], dtype=np.float64)},
                                  index=_ts("2024-01-01", 1)))
    dyn.append("sym", pd.DataFrame({"col": np.array([1, top], dtype=np.uint64)},
                                   index=_ts("2024-01-02", 2)))
    got = dyn.read("sym", output_format="pandas")
    assert got["col"].dtype == np.float64
    assert got["col"].tolist() == [4.5, 1.0, float(top)]


def test_uint64_then_float64_static_raises(_libs):
    """Static schema rejects the uint64 -> float64 type change
    (StreamDescriptorMismatch in the reference)."""
    stat, _ = _libs
    stat.write("sym", pd.DataFrame(
        {"col": np.array([1, 2], dtype=np.uint64)}, index=_ts("2024-01-01", 2)))
    with pytest.raises(ArcticException):
        stat.append("sym", pd.DataFrame(
            {"col": np.array([3.0], dtype=np.float64)},
            index=_ts("2024-01-03", 1)))


def test_uint64_float_widened_then_query(_libs):
    """After widening, QueryBuilder math treats the column as plain double
    (no stale unsigned semantics) and filters see exact unsigned values."""
    from arcticdb_spark import QueryBuilder
    _, dyn = _libs
    big = np.uint64(2**63 + 10)
    dyn.write("sym", pd.DataFrame({"col": np.array([3, big], dtype=np.uint64)},
                                  index=_ts("2024-01-01", 2)))
    dyn.append("sym", pd.DataFrame({"col": np.array([0.5], dtype=np.float64)},
                                   index=_ts("2024-01-03", 1)))
    q = QueryBuilder()
    q = q[q["col"] > 1.0]
    got = dyn.read("sym", query_builder=q, output_format="pandas")
    assert got["col"].tolist() == [3.0, float(big)]
