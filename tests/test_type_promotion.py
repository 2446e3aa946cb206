"""Dynamic-schema type-promotion matrix + static-schema type rejection,
ported from the reference's ``test_column_type_changes.py`` and the
sparse/unicode string cases of ``test_empty_column_type.py`` /
``test_normalization.py``. Spark mapping notes:

* pandas unsigned dtypes arrive in Spark as the next-wider signed type
  (uint32 -> int64 via Arrow), so the reference's uint promotion rows
  collapse onto the signed lattice — same observable results.
* int32 + float32 promotes to float64 (float32's 24-bit mantissa cannot
  represent every int32 — reference
  ``test_type_promotion_int32_and_float32_up_to_float64``); ints <=16 bit
  promote to float32 (``test_type_promotion_ints_and_floats_up_to_float32``).
* static schema rejects any column type change with a pointer at
  dynamic_schema (reference raises StreamDescriptorMismatch —
  ``test_changing_numeric_type``).
"""

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.catalog import Arctic, ArcticException


@pytest.fixture()
def dyn_lib(spark, tmp_path):
    return Arctic(str(tmp_path), spark).create_library("dyn",
                                                       dynamic_schema=True)


@pytest.fixture()
def static_lib(spark, tmp_path):
    return Arctic(str(tmp_path), spark).create_library("static")


def _frame(dtype, values, start="2024-01-01", periods=None):
    # a real DatetimeIndex named "ts" (the reference never re-interprets a
    # pandas DATA column as the index — round-11 fix; updates require a
    # timestamp-indexed symbol)
    periods = periods or len(values)
    return pd.DataFrame(
        {"col": np.array(values, dtype=dtype)},
        index=pd.date_range(start, periods=periods, freq="D", name="ts"))


# ---------------------------------------------------------------- static


class TestStaticSchemaRejectsTypeChange:
    """Reference test_changing_numeric_type, dynamic_schema=False leg."""

    def test_append_numeric_type_change_raises(self, static_lib):
        static_lib.write("sym", _frame(np.int32, [0, 1, 2]))
        with pytest.raises(ArcticException, match="type mismatch"):
            static_lib.append("sym", _frame(np.float64, [3.0],
                                            start="2024-01-04"))

    def test_update_numeric_type_change_raises(self, static_lib):
        static_lib.write("sym", _frame(np.int32, [0, 1, 2]))
        with pytest.raises(ArcticException, match="type mismatch"):
            static_lib.update("sym", _frame(np.float64, [9.0],
                                            start="2024-01-02"))

    def test_same_type_append_still_fine(self, static_lib):
        static_lib.write("sym", _frame(np.int32, [0, 1, 2]))
        static_lib.append("sym", _frame(np.int32, [3], start="2024-01-04"))
        out = static_lib.read("sym", output_format="pandas")
        assert sorted(out["col"]) == [0, 1, 2, 3]

    def test_all_none_append_into_typed_column_ok(self, static_lib):
        """An incoming EMPTY (all-None object) column carries no typed data:
        it must not trip the type check; rows read back NULL-backfilled."""
        static_lib.write("sym", pd.DataFrame({
            "ts": pd.date_range("2024-01-01", periods=3, freq="D"),
            "col": ["a", "b", "c"]}))
        static_lib.append("sym", pd.DataFrame({
            "ts": pd.date_range("2024-01-04", periods=2, freq="D"),
            "col": [None, None]}))
        out = static_lib.read("sym", output_format="pandas").sort_values("ts")
        assert out["col"].tolist()[:3] == ["a", "b", "c"]
        assert out["col"].isna().sum() == 2

    def test_staged_finalize_append_type_change_raises(self, static_lib):
        """Append-mode finalize applies the same static-schema rules as
        append(): staged chunks with a drifted column type are rejected."""
        static_lib.write("sym", _frame(np.int32, [0, 1, 2]))
        static_lib.stage("sym", _frame(np.float64, [9.0],
                                       start="2024-01-04"))
        with pytest.raises(ArcticException, match="type mismatch"):
            static_lib.finalize_staged_data("sym", mode="append")
        static_lib.delete_staged_data("sym")

    def test_staged_finalize_append_dynamic_promotes(self, dyn_lib):
        dyn_lib.write("sym", _frame(np.int32, [0, 1, 2]))
        dyn_lib.stage("sym", _frame(np.float64, [9.5], start="2024-01-04"))
        dyn_lib.finalize_staged_data("sym", mode="append")
        out = dyn_lib.read("sym")
        assert dict(out.dtypes)["col"] == "double"
        assert sorted(out.toPandas()["col"]) == [0.0, 1.0, 2.0, 9.5]

    def test_string_content_change_is_not_a_type_change(self, static_lib):
        """Reference test_changing_string_type / _fixed_string_width: string
        width/storage flavour is not a logical type; append+update succeed in
        static mode."""
        static_lib.write("sym", pd.DataFrame(
            {"col": ["a", "bb", "ccc"]},
            index=pd.date_range("2024-01-01", periods=3, freq="D",
                                name="ts")))
        static_lib.append("sym", pd.DataFrame(
            {"col": ["dddd"]},
            index=pd.date_range("2024-01-04", periods=1, name="ts")))
        static_lib.update("sym", pd.DataFrame(
            {"col": ["XXXX"]},
            index=pd.date_range("2024-01-02", periods=1, name="ts")))
        out = static_lib.read("sym", output_format="pandas").sort_index()
        assert out["col"].tolist() == ["a", "XXXX", "ccc", "dddd"]


# ---------------------------------------------------------------- dynamic


# (write_type, append_type, expected read dtype) — the reference promotion
# matrix projected onto Spark's signed lattice.
PROMOTION_MATRIX = [
    (np.int8, np.int16, "smallint"),
    (np.int16, np.int32, "int"),
    (np.int32, np.int64, "bigint"),
    (np.int8, np.float32, "float"),       # <=16-bit int + f32 -> f32
    (np.int16, np.float32, "float"),
    (np.int32, np.float32, "double"),     # 32-bit int + f32 -> f64
    (np.int64, np.float32, "double"),
    (np.int32, np.float64, "double"),
    (np.int64, np.float64, "double"),
    (np.float32, np.float64, "double"),
]


class TestDynamicPromotionMatrix:
    @pytest.mark.parametrize("first,second,expected", PROMOTION_MATRIX)
    @pytest.mark.parametrize("int_first", [True, False])
    def test_append_promotes(self, dyn_lib, first, second, expected,
                             int_first):
        sym = f"m_{np.dtype(first).name}_{np.dtype(second).name}_{int_first}"
        a, b = (first, second) if int_first else (second, first)
        dyn_lib.write(sym, _frame(a, [1, 2, 3]))
        dyn_lib.append(sym, _frame(b, [4, 5, 6], start="2024-01-04"))
        out = dyn_lib.read(sym)
        assert dict(out.dtypes)["col"] == expected
        got = sorted(out.toPandas()["col"].tolist())
        assert got == [1, 2, 3, 4, 5, 6]

    def test_second_append_widens_again(self, dyn_lib):
        """write int16 -> append float32 (f32) -> append int32 (f64):
        reference test_type_promotion_ints_and_floats_up_to_float64 chain."""
        dyn_lib.write("sym", _frame(np.int16, [1, 2, 3]))
        dyn_lib.append("sym", _frame(np.float32, [4, 5, 6],
                                     start="2024-01-04"))
        assert dict(dyn_lib.read("sym").dtypes)["col"] == "float"
        dyn_lib.append("sym", _frame(np.int32, [7, 8, 9],
                                     start="2024-01-07"))
        out = dyn_lib.read("sym")
        assert dict(out.dtypes)["col"] == "double"
        assert sorted(out.toPandas()["col"]) == [1, 2, 3, 4, 5, 6, 7, 8, 9]

    def test_update_promotes(self, dyn_lib):
        """Reference test_changing_numeric_type, dynamic leg: update with a
        different numeric type promotes the whole column."""
        dyn_lib.write("sym", _frame(np.int32, [0, 1, 2]))
        dyn_lib.update("sym", _frame(np.float64, [7.5], start="2024-01-02"))
        out = dyn_lib.read("sym")
        assert dict(out.dtypes)["col"] == "double"
        pdf = out.toPandas().sort_values("ts")
        assert pdf["col"].tolist() == [0.0, 7.5, 2.0]

    def test_int32_float32_precision_preserved(self, dyn_lib):
        """Extremes of both int32 and float32 survive exactly because the
        common type is float64 (reference
        test_type_promotion_int32_and_float32_up_to_float64)."""
        lo, hi = np.iinfo(np.int32).min, np.iinfo(np.int32).max
        dyn_lib.write("sym", _frame(np.int32, [0, lo, hi]))
        flo = float(np.finfo(np.float32).min)
        fhi = float(np.finfo(np.float32).max)
        dyn_lib.append("sym", _frame(np.float32, [0.0, flo, fhi],
                                     start="2024-01-04"))
        pdf = (dyn_lib.read("sym", output_format="pandas")
               .sort_values("ts").reset_index(drop=True))
        assert pdf["col"].dtype == np.float64
        assert pdf["col"][1] == lo and pdf["col"][2] == hi
        assert pdf["col"][4] == flo and pdf["col"][5] == fhi

    def test_int64_float64_lossy_above_2_53(self, dyn_lib):
        """int64 + float64 -> float64 loses precision above 2**53; pin the
        documented behaviour (reference
        test_type_promotion_int64_and_float64_up_to_float64)."""
        dyn_lib.write("sym", _frame(np.int64, [2**53 - 1, 2**53, 2**53 + 1]))
        dyn_lib.append("sym", _frame(np.float64, [1.5], start="2024-01-04"))
        pdf = (dyn_lib.read("sym", output_format="pandas")
               .sort_values("ts").reset_index(drop=True))
        assert pdf["col"].dtype == np.float64
        assert int(pdf["col"][0]) == 2**53 - 1     # representable
        assert int(pdf["col"][1]) == 2**53         # representable
        assert int(pdf["col"][2]) == 2**53         # rounded down — lossy

    def test_unsigned_input_lands_on_signed_lattice(self, dyn_lib):
        """uint32 data arrives as int64 (Arrow widening) and promotes with a
        float32 append to float64; values at the uint32 top survive."""
        top = np.iinfo(np.uint32).max
        dyn_lib.write("sym", _frame(np.uint32, [0, top]))
        assert dict(dyn_lib.read("sym").dtypes)["col"] == "bigint"
        dyn_lib.append("sym", _frame(np.float32, [1.0], start="2024-01-03"))
        pdf = (dyn_lib.read("sym", output_format="pandas")
               .sort_values("ts").reset_index(drop=True))
        assert pdf["col"].dtype == np.float64
        assert pdf["col"][1] == top


class TestEpochCompaction:
    def test_compact_collapses_schema_epochs(self, dyn_lib):
        """Compaction rewrites every file under the current (widest) schema,
        so the per-epoch scan branches disappear and full parquet filter
        pushdown returns (heterogeneous epochs wrap the column in a cast)."""
        dyn_lib.write("sym", _frame(np.int16, [1, 2, 3]))
        dyn_lib.append("sym", _frame(np.float32, [4, 5],
                                     start="2024-02-01"))
        dyn_lib.append("sym", _frame(np.int32, [6], start="2024-03-01"))
        m = dyn_lib._load_manifest("sym", 2)
        assert len({fe.schema_json for fe in m.files}) == 3
        dyn_lib.compact_symbol("sym")
        m2 = dyn_lib._load_manifest("sym", 3)
        assert len({fe.schema_json for fe in m2.files}) == 1
        out = dyn_lib.read("sym")
        assert dict(out.dtypes)["col"] == "double"
        assert sorted(out.toPandas()["col"]) == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]


# ----------------------------------------------------- sparse / unicode


class TestSparseAndUnicodeStrings:
    def test_sparse_string_column_roundtrip(self, dyn_lib):
        """None-holed string columns (reference sparse/dynamic strings)."""
        vals = ["a", None, "ccc", None, "e"]
        dyn_lib.write("sym", pd.DataFrame({
            "ts": pd.date_range("2024-01-01", periods=5, freq="D"),
            "col": vals}))
        out = (dyn_lib.read("sym", output_format="pandas")
               .sort_values("ts").reset_index(drop=True))
        assert out["col"].where(out["col"].notna(), None).tolist() == vals

    def test_unicode_roundtrip_append_update(self, dyn_lib):
        """Multibyte/unicode strings through write/append/update (reference
        test_normalization unicode cases)."""
        vals = ["héllo", "世界", "🚀🚀🚀", "Ωμέγα", "ß"]
        dyn_lib.write("sym", pd.DataFrame(
            {"col": vals},
            index=pd.date_range("2024-01-01", periods=5, freq="D",
                                name="ts")))
        dyn_lib.append("sym", pd.DataFrame(
            {"col": ["ünïcode-appended"]},
            index=pd.date_range("2024-01-06", periods=1, name="ts")))
        dyn_lib.update("sym", pd.DataFrame(
            {"col": ["中文替换"]},
            index=pd.date_range("2024-01-03", periods=1, name="ts")))
        out = (dyn_lib.read("sym", output_format="pandas")
               .sort_index().reset_index(drop=True))
        assert out["col"].tolist() == [
            "héllo", "世界", "中文替换", "Ωμέγα", "ß",
            "ünïcode-appended"]

    def test_empty_then_string_promotion(self, dyn_lib):
        """All-None (EMPTY) column typed by a later string append (reference
        test_empty_column_type promotion-on-append)."""
        dyn_lib.write("sym", pd.DataFrame({
            "ts": pd.date_range("2024-01-01", periods=2, freq="D"),
            "col": [None, None]}))
        dyn_lib.append("sym", pd.DataFrame({
            "ts": pd.date_range("2024-01-03", periods=2, freq="D"),
            "col": ["x", "y"]}))
        out = (dyn_lib.read("sym", output_format="pandas")
               .sort_values("ts").reset_index(drop=True))
        assert out["col"].where(out["col"].notna(), None).tolist() == [
            None, None, "x", "y"]


class TestAllVoidWrites:
    """Reference test_empty_column_type.py: an all-None frame writes as
    EMPTY type and typed data appends onto it (static AND dynamic — EMPTY
    is promotable regardless of schema mode). On read, rows from void
    segments backfill with the promoted type's DEFAULT — 0 for ints, False
    for bools, NaN/NaT/None for float/time/string (reference
    util/sparse_utils.hpp:76-88 default_initialize) — so the int case
    reads back [0, 0, 1, 2, 3] with the exact dtype."""

    def test_all_void_write_roundtrip(self, tmp_lib):
        import pandas as pd
        tmp_lib.write("sym", pd.DataFrame({"col": 2 * [None]}))
        out = tmp_lib.read("sym", output_format="pandas")
        assert out["col"].tolist() == [None, None]

    def test_void_then_int_append_dynamic(self, dyn_lib):
        import numpy as np
        import pandas as pd
        dyn_lib.write("sym", pd.DataFrame({"col": 2 * [None]}))
        dyn_lib.append("sym", pd.DataFrame(
            {"col": np.array([1, 2, 3], dtype="int16")}))
        out = dyn_lib.read("sym", output_format="pandas")
        # reference test_integer_simple_dynamic: 0-backfill, exact dtype
        assert out["col"].dtype == "int16"
        assert out["col"].tolist() == [0, 0, 1, 2, 3]
        rr = dyn_lib.read("sym", row_range=(2, 5), output_format="pandas")
        assert rr["col"].dtype == "int16"
        assert rr["col"].tolist() == [1, 2, 3]
        rr0 = dyn_lib.read("sym", row_range=(0, 2), output_format="pandas")
        assert rr0["col"].tolist() == [0, 0]

    def test_void_then_int_append_static(self, tmp_lib):
        # reference test_integer_simple (static): EMPTY promotes without
        # dynamic_schema
        import numpy as np
        import pandas as pd
        tmp_lib.write("sym", pd.DataFrame({"col": 2 * [None]}))
        tmp_lib.append("sym", pd.DataFrame(
            {"col": np.array([1, 2, 3], dtype="int16")}))
        out = tmp_lib.read("sym", output_format="pandas")
        assert out["col"].dtype == "int16"
        assert out["col"].tolist() == [0, 0, 1, 2, 3]

    def test_int_then_void_append_backfills_zero(self, dyn_lib):
        # reference TestCanAppendColumnWithNones.test_integer
        import numpy as np
        import pandas as pd
        dyn_lib.write("sym", pd.DataFrame(
            {"col": np.array([1, 2, 3], dtype="int64"), "other": [1, 2, 3]}))
        dyn_lib.append("sym", pd.DataFrame(
            {"col": 2 * [None], "other": [4, 5]}))
        out = dyn_lib.read("sym", output_format="pandas")
        assert out["col"].dtype == "int64"
        assert out["col"].tolist() == [1, 2, 3, 0, 0]
        assert out["other"].tolist() == [1, 2, 3, 4, 5]

    def test_void_then_float_append_backfills_nan(self, dyn_lib):
        import numpy as np
        import pandas as pd
        dyn_lib.write("sym", pd.DataFrame({"col": 2 * [None]}))
        dyn_lib.append("sym", pd.DataFrame(
            {"col": np.array([1.5, 2.5], dtype="float64")}))
        out = dyn_lib.read("sym", output_format="pandas")
        assert out["col"].isna().tolist() == [True, True, False, False]
        assert out["col"].dropna().tolist() == [1.5, 2.5]

    def test_void_then_string_append_dynamic(self, dyn_lib):
        import numpy as np
        import pandas as pd
        dyn_lib.write("sym", pd.DataFrame({"col": 2 * [None]}))
        dyn_lib.append("sym", pd.DataFrame({"col": np.array(["x", "y"])}))
        out = dyn_lib.read("sym", output_format="pandas")
        assert out["col"].tolist() == [None, None, "x", "y"]

    def test_static_type_change_still_rejected(self, tmp_lib):
        # EMPTY promotion is allowed statically (round 7, reference
        # parity), but a genuine numeric type change still is not
        import numpy as np
        import pandas as pd
        import pytest
        from arcticdb_spark.catalog import ArcticException
        tmp_lib.write("sym", pd.DataFrame(
            {"col": np.array([1, 2], dtype="int16")}))
        with pytest.raises(ArcticException, match="dynamic_schema"):
            tmp_lib.append("sym", pd.DataFrame(
                {"col": np.array([1, 2], dtype="int64")}))


class TestAppendNonesOntoTyped:
    """Reference test_empty_column_type.py TestCanAppendColumnWithNones:
    an all-None (EMPTY) column appends onto any typed column without
    changing its type; on read the None rows backfill with the type
    default (sparse_utils.hpp:76-88): bool -> False, float -> NaN,
    string -> None, datetime -> NaT."""

    def _roundtrip(self, lib, initial):
        import pandas as pd
        lib.write("sym", pd.DataFrame({"col": initial,
                                       "other": [1, 2, 3]}))
        lib.append("sym", pd.DataFrame({"col": 2 * [None],
                                        "other": [4, 5]}))
        out = lib.read("sym", output_format="pandas")
        assert out["other"].tolist() == [1, 2, 3, 4, 5]
        return out["col"]

    def test_bool(self, dyn_lib):
        import numpy as np
        col = self._roundtrip(dyn_lib,
                              np.array([True, False, True], dtype="bool"))
        assert col.tolist() == [True, False, True, False, False]
        assert col.dtype == "bool"

    def test_float32(self, dyn_lib):
        import numpy as np
        col = self._roundtrip(dyn_lib,
                              np.array([1.5, 2.5, 3.5], dtype="float32"))
        assert col.dtype == "float32"
        assert col.tolist()[:3] == [1.5, 2.5, 3.5]
        assert col.isna().tolist() == [False, False, False, True, True]

    def test_string(self, dyn_lib):
        import numpy as np
        col = self._roundtrip(dyn_lib, np.array(["x", "y" * 100, ""]))
        assert col.tolist() == ["x", "y" * 100, "", None, None]

    def test_datetime(self, dyn_lib):
        import numpy as np
        import pandas as pd
        col = self._roundtrip(dyn_lib, np.array(
            [np.datetime64("2005-02"), np.datetime64("2005-03"),
             np.datetime64("2005-04")], dtype="datetime64[us]"))
        assert col.isna().tolist() == [False, False, False, True, True]
        assert pd.Timestamp(col.iloc[0]) == pd.Timestamp("2005-02-01")

    def test_static_schema_too(self, tmp_lib):
        # the reference runs this matrix on static AND dynamic fixtures
        import numpy as np
        col = self._roundtrip(tmp_lib,
                              np.array([7, 8, 9], dtype="int32"))
        assert col.dtype == "int32"
        assert col.tolist() == [7, 8, 9, 0, 0]

    def test_row_range_over_backfilled_rows(self, dyn_lib):
        # reference: read(sym, row_range=[3,5]) returns the defaults only
        import numpy as np
        import pandas as pd
        dyn_lib.write("sym", pd.DataFrame(
            {"col": np.array([1, 2, 3], dtype="int16"), "other": [1, 2, 3]}))
        dyn_lib.append("sym", pd.DataFrame({"col": 2 * [None],
                                            "other": [4, 5]}))
        rr = dyn_lib.read("sym", row_range=(3, 5), output_format="pandas")
        assert rr["col"].dtype == "int16"
        assert rr["col"].tolist() == [0, 0]
        tail = dyn_lib.tail("sym", n=1, output_format="pandas")
        assert tail["col"].tolist() == [0]
        head = dyn_lib.head("sym", n=1, output_format="pandas")
        assert head["col"].tolist() == [1]


def test_small_uint_width_restores_exactly(spark, tmp_path):
    """uint8/16/32 store widened to int64 (Spark has no unsigned types)
    but the recorded width restores on pandas AND arrow output like the
    reference; a dynamic-schema widening append upgrades the restored
    width; values that outgrew the recorded width stay wide."""
    import numpy as np
    import pandas as pd
    from arcticdb_spark.catalog import Arctic
    lib = Arctic(str(tmp_path), spark).create_library("uw",
                                                      dynamic_schema=True)
    df = pd.DataFrame({"u8": np.arange(5, dtype=np.uint8),
                       "u16": np.arange(5, dtype=np.uint16),
                       "u32": np.arange(5, dtype=np.uint32)})
    lib.write("s", df)
    back = lib.read("s", output_format="pandas")
    assert dict(back.dtypes.astype(str)) == {"u8": "uint8",
                                             "u16": "uint16",
                                             "u32": "uint32"}
    tbl = lib.read("s", output_format="arrow")
    assert [str(f.type) for f in tbl.schema] == ["uint8", "uint16",
                                                 "uint32"]
    # widening append: the u8 column now holds uint16 values
    lib.append("s", pd.DataFrame({
        "u8": np.array([300], dtype=np.uint16),
        "u16": np.array([1], dtype=np.uint16),
        "u32": np.array([1], dtype=np.uint32)}))
    back2 = lib.read("s", output_format="pandas")
    assert str(back2["u8"].dtype) == "uint16"
    assert back2["u8"].tolist() == [0, 1, 2, 3, 4, 300]
