"""Ported from the reference's empty-type matrix (round-8 verdict item 4):

* ``test_empty_column_type.py`` — TestCanUpdateNones, TestCanUpdateWithNone,
  TestCanAppendToEmptyColumn, TestCanUpdateEmptyColumn,
  TestAppendAndUpdateWithEmptyToColumnOnlyIncrementsVersionNumber,
  TestEmptyTypeIsOverriden (the write/append-with-Nones halves are already
  in tests/test_type_promotion.py).
* ``test_empty_writes.py`` — test_write_no_rows, test_write_no_columns_*,
  test_write_no_rows_and_columns, test_empty_series,
  test_append_empty_series, test_entirely_empty_column.
* ``test_append.py:803`` test_append_empty_frame_metadata and
  ``test_update.py`` test_update_empty_frame_metadata /
  test_empty_dataframe_with_daterange_does_not_delete_data — the
  version-bump + verbatim-metadata semantics of empty appends/updates.

Semantics pinned here:
  - an EMPTY symbol (0 rows) has undecided column AND index types; the
    first non-empty append/update decides both (reads of the undecided
    state show an empty DatetimeIndex, like the reference's empty-index
    feature);
  - appending/updating an empty frame onto a non-empty symbol bumps the
    version only — data/schema/index untouched, no new columns under
    dynamic schema, metadata set verbatim (None clears);
  - updating a range of a typed column with Nones backfills the type's
    default (0 / NaN / None / NaT) without changing the column type;
  - updating a range of an all-None column with typed data promotes the
    whole column.
"""

import tempfile

import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow


from arcticdb_spark.catalog import Arctic

IDX4 = pd.date_range("2024-01-01", "2024-01-04")
UPD2 = pd.date_range("2024-01-02", "2024-01-03")


@pytest.fixture(params=["static", "dynamic"])
def lib(request, spark):
    a = Arctic(tempfile.mkdtemp(), spark)
    return a.create_library("em", dynamic_schema=request.param == "dynamic")


def _pd(lib, sym, **kw):
    return lib.read(sym, output_format="pandas", **kw)


# ------------------------------------------------------------ update/Nones

class TestCanUpdateNones:
    """Reference test_empty_column_type.py:339: an all-None column with a
    date index updates with typed data; the WHOLE column takes the new
    type, unaffected rows backfill the type default."""

    @pytest.fixture(autouse=True)
    def _seed(self, lib):
        lib.write("sym", pd.DataFrame({"col": 4 * [None]}, index=IDX4))
        self.lib = lib

    def test_integer(self):
        self.lib.update("sym", pd.DataFrame(
            {"col": [1, 2]}, dtype="int32", index=UPD2))
        out = _pd(self.lib, "sym")
        assert out["col"].dtype == "int32"
        assert out["col"].tolist() == [0, 1, 2, 0]
        one = _pd(self.lib, "sym",
                  date_range=(IDX4[0], IDX4[0]))
        assert one["col"].dtype == "int32"
        assert one["col"].tolist() == [0]

    def test_float(self):
        self.lib.update("sym", pd.DataFrame(
            {"col": [1, 2]}, dtype="float64", index=UPD2))
        out = _pd(self.lib, "sym")
        assert out["col"].dtype == "float64"
        assert out["col"].isna().tolist() == [True, False, False, True]
        assert out["col"].dropna().tolist() == [1.0, 2.0]

    def test_bool(self):
        self.lib.update("sym", pd.DataFrame(
            {"col": [True, False]}, dtype="bool", index=UPD2))
        out = _pd(self.lib, "sym")
        # bool default-backfill is False (reference: pandas converts the
        # None rows of a bool column to False)
        assert out["col"].tolist() == [False, True, False, False]

    def test_string(self):
        self.lib.update("sym", pd.DataFrame(
            {"col": ["a", 20 * "long_string"]}, index=UPD2))
        out = _pd(self.lib, "sym")
        assert out["col"].tolist() == [None, "a", 20 * "long_string", None]

    def test_empty_update_keeps_all_none(self):
        self.lib.update("sym", pd.DataFrame({"col": 2 * [None]}, index=UPD2))
        out = _pd(self.lib, "sym")
        assert out["col"].where(out["col"].notna(), None).tolist() == 4 * [None]

    def test_date(self):
        self.lib.update("sym", pd.DataFrame(
            {"col": [np.datetime64("2005-02"), np.datetime64("2005-03")]},
            dtype="datetime64[ns]", index=UPD2))
        out = _pd(self.lib, "sym")
        assert out["col"].isna().tolist() == [True, False, False, True]
        assert pd.Timestamp(out["col"].iloc[1]) == pd.Timestamp("2005-02-01")


class TestCanUpdateWithNone:
    """Reference test_empty_column_type.py:460: a subrange updates with
    Nones; the column type is unchanged, the None rows backfill."""

    def test_int(self, lib):
        lib.write("sym", pd.DataFrame(
            {"col": [1, 2, 3, 4]}, dtype="int32", index=IDX4))
        lib.update("sym", pd.DataFrame({"col": [None, None]}, index=UPD2))
        out = _pd(lib, "sym")
        assert out["col"].dtype == "int32"
        assert out["col"].tolist() == [1, 0, 0, 4]

    def test_float(self, lib):
        lib.write("sym", pd.DataFrame(
            {"col": [1, 2, 3, 4]}, dtype="float64", index=IDX4))
        lib.update("sym", pd.DataFrame({"col": [None, np.nan]}, index=UPD2))
        out = _pd(lib, "sym")
        assert out["col"].dtype == "float64"
        assert out["col"].isna().tolist() == [False, True, True, False]

    def test_bool(self, lib):
        lib.write("sym", pd.DataFrame(
            {"col": [True] * 4}, dtype="bool", index=IDX4))
        lib.update("sym", pd.DataFrame({"col": [None, None]}, index=UPD2))
        out = _pd(lib, "sym")
        assert out["col"].tolist() == [True, False, False, True]

    def test_string(self, lib):
        lib.write("sym", pd.DataFrame(
            {"col": ["a", "longstr" * 20, "b", "longstr" * 20]}, index=IDX4))
        lib.update("sym", pd.DataFrame({"col": [None, None]}, index=UPD2))
        out = _pd(lib, "sym")
        assert out["col"].tolist() == ["a", None, None, "longstr" * 20]

    def test_date(self, lib):
        lib.write("sym", pd.DataFrame(
            {"col": np.array([np.datetime64("2005-02"), np.datetime64("2005-03"),
                              np.datetime64("2005-04"), np.datetime64("2005-05")],
                             dtype="datetime64[ns]")}, index=IDX4))
        lib.update("sym", pd.DataFrame({"col": [None, None]}, index=UPD2))
        out = _pd(lib, "sym")
        assert out["col"].isna().tolist() == [False, True, True, False]
        assert pd.Timestamp(out["col"].iloc[3]) == pd.Timestamp("2005-05-01")


# --------------------------------------------------- append/update onto 0-row

EMPTY_INDEXES = [pd.RangeIndex(0, 0), pd.DatetimeIndex([])]
APPEND_INDEXES = [pd.RangeIndex(0, 3),
                  list(pd.date_range("2024-01-01", "2024-01-03"))]


class TestCanAppendToEmptyColumn:
    """Reference test_empty_column_type.py:556: the column types AND the
    index type of an EMPTY symbol are decided by the first append."""

    @pytest.mark.parametrize("empty_index", EMPTY_INDEXES,
                             ids=["range", "datetime"])
    @pytest.mark.parametrize("append_index", APPEND_INDEXES,
                             ids=["range", "datetime"])
    @pytest.mark.parametrize("dtype,vals", [
        ("int32", [1, 2, 3]),
        ("float64", [1.0, 2.0, 3.0]),
        ("bool", [True, False, True]),
    ])
    def test_typed(self, lib, empty_index, append_index, dtype, vals):
        lib.write("sym", pd.DataFrame({"col": []}, index=empty_index))
        assert _pd(lib, "sym").index.equals(pd.DatetimeIndex([]))
        df = pd.DataFrame({"col": vals}, dtype=dtype, index=append_index)
        lib.append("sym", df)
        out = _pd(lib, "sym")
        assert out["col"].dtype == dtype
        assert out["col"].tolist() == vals
        assert out.index.equals(pd.Index(append_index))

    @pytest.mark.parametrize("append_index", APPEND_INDEXES,
                             ids=["range", "datetime"])
    def test_string(self, lib, append_index):
        lib.write("sym", pd.DataFrame({"col": []}))
        df = pd.DataFrame({"col": ["short", None, 20 * "long"]},
                          index=append_index)
        lib.append("sym", df)
        out = _pd(lib, "sym")
        assert out["col"].tolist() == ["short", None, 20 * "long"]

    def test_date(self, lib):
        lib.write("sym", pd.DataFrame({"col": []}, index=pd.DatetimeIndex([])))
        df = pd.DataFrame(
            {"col": np.array([np.datetime64("2005-02"), np.datetime64("2005-03"),
                              np.datetime64("2005-03")], dtype="datetime64[ns]")},
            index=pd.RangeIndex(0, 3))
        lib.append("sym", df)
        out = _pd(lib, "sym")
        assert [pd.Timestamp(x) for x in out["col"]] == [
            pd.Timestamp("2005-02-01"), pd.Timestamp("2005-03-01"),
            pd.Timestamp("2005-03-01")]


class TestCanUpdateEmptyColumn:
    """Reference test_empty_column_type.py:736: updating a completely
    empty symbol decides index and column types."""

    @pytest.mark.parametrize("dtype,vals", [
        ("int32", [1, 2, 3]),
        ("float64", [1.0, 2.0, 3.0]),
        ("bool", [True, False, True]),
    ])
    def test_typed(self, lib, dtype, vals):
        lib.write("sym", pd.DataFrame({"col": []}))
        upd = pd.date_range("2024-01-02", "2024-01-04")
        lib.update("sym", pd.DataFrame({"col": vals}, dtype=dtype, index=upd))
        out = _pd(lib, "sym")
        assert out["col"].dtype == dtype
        assert out["col"].tolist() == vals
        assert out.index.equals(upd)

    def test_string(self, lib):
        lib.write("sym", pd.DataFrame({"col": []}))
        upd = pd.date_range("2024-01-02", "2024-01-04")
        lib.update("sym", pd.DataFrame(
            {"col": ["short", 20 * "long", None]}, index=upd))
        out = _pd(lib, "sym")
        assert out["col"].tolist() == ["short", 20 * "long", None]


class TestEmptyOnlyIncrementsVersion:
    """Reference test_empty_column_type.py:607: append/update of an empty
    frame bumps the version and nothing else (incl. no new columns under
    dynamic schema); reference test_append.py:803 / test_update.py:1045:
    metadata is the new version's verbatim (None clears)."""

    @pytest.mark.parametrize("empty_index", EMPTY_INDEXES,
                             ids=["range", "datetime"])
    @pytest.mark.parametrize("seed_index", APPEND_INDEXES,
                             ids=["range", "datetime"])
    def test_append_and_update(self, lib, empty_index, seed_index):
        df = pd.DataFrame({"col": [1, 2, 3]}, dtype="int32", index=seed_index)
        lib.write("sym", df, metadata="v0")
        empty = pd.DataFrame({"col": []}, dtype="float64", index=empty_index)

        m = lib.append("sym", empty)
        assert m.version == 1
        out = _pd(lib, "sym")
        assert out["col"].dtype == "int32"
        assert out["col"].tolist() == [1, 2, 3]
        assert lib.read_metadata("sym").metadata is None

        m = lib.update("sym", empty, metadata="v2")
        assert m.version == 2
        out = _pd(lib, "sym")
        assert out["col"].tolist() == [1, 2, 3]
        assert lib.read_metadata("sym").metadata == "v2"

    def test_empty_onto_empty(self, lib):
        lib.write("sym", pd.DataFrame({"col": []}))
        m = lib.append("sym", pd.DataFrame({"col": []}))
        assert m.version == 1
        m = lib.update("sym", pd.DataFrame({"col": []}))
        assert m.version == 2
        assert len(_pd(lib, "sym")) == 0

    def test_empty_df_does_not_create_new_columns_in_dynamic_schema(
            self, spark):
        dyn = Arctic(tempfile.mkdtemp(), spark).create_library(
            "dync", dynamic_schema=True)
        df = pd.DataFrame({"col": [1, 2, 3]}, dtype="int32")
        dyn.write("sym", df)
        to_append = pd.DataFrame({
            "col_1": np.array([], dtype="int"),
            "col_2": np.array([], dtype="float"),
            "col_3": np.array([], dtype="object"),
            "col_4": np.array([], dtype="str")})
        dyn.append("sym", to_append)
        out = _pd(dyn, "sym")
        assert list(out.columns) == ["col"]
        assert out["col"].tolist() == [1, 2, 3]
        assert dyn.read_metadata("sym").version == 1

    def test_empty_update_with_daterange_does_not_delete(self, lib):
        """Reference test_update.py:921: an empty frame + a covering
        date_range must NOT delete the covered rows."""
        idx = pd.date_range("2024-01-02", periods=2)
        lib.write("sym", pd.DataFrame({"a": [1, 2]}, index=idx))
        lib.update("sym", pd.DataFrame({"a": []}, index=pd.DatetimeIndex([])),
                   date_range=(pd.Timestamp("2024-01-01"),
                               pd.Timestamp("2024-01-04")))
        out = _pd(lib, "sym")
        assert lib.read_metadata("sym").version == 1
        assert out["a"].tolist() == [1, 2]


class TestEmptyTypeIsOverriden:
    """Reference test_empty_column_type.py:786: the first non-empty
    append decides the type / index kind; later mismatches raise."""

    def test_cannot_append_different_type_after_first_not_none(self, lib):
        lib.write("sym", pd.DataFrame({"col": [None, None]}))
        lib.append("sym", pd.DataFrame({"col": [1, 2, 3]}))
        lib.append("sym", pd.DataFrame({"col": [None, None]}))
        with pytest.raises(Exception):
            lib.append("sym", pd.DataFrame({"col": ["some", "string"]}))

    @pytest.mark.parametrize("index,incompatible_index", [
        (pd.RangeIndex(0, 3), list(pd.date_range("2024-01-01", "2024-01-03"))),
        (list(pd.date_range("2024-01-01", "2024-01-03")), pd.RangeIndex(0, 3)),
    ], ids=["range-then-dt", "dt-then-range"])
    def test_cannot_append_different_index_type_after_first_non_empty(
            self, lib, index, incompatible_index):
        lib.write("sym", pd.DataFrame({"col": []}))
        assert _pd(lib, "sym").index.equals(pd.DatetimeIndex([]))
        ok = pd.DataFrame({"col": [1, 2, 3]}, index=index)
        lib.append("sym", ok, validate_index=False)
        assert _pd(lib, "sym")["col"].tolist() == [1, 2, 3]
        with pytest.raises(Exception):
            lib.append("sym", pd.DataFrame({"col": [4, 5, 6]},
                                           index=incompatible_index))


# ------------------------------------------------------------ empty writes

class TestEmptyWrites:
    """Reference test_empty_writes.py."""

    def test_write_no_rows_then_typed_appends(self, lib):
        """test_empty_writes.py:17 (sans coerce_columns): a 0-row frame
        with columns accepts typed appends that decide the schema."""
        cols = ["a", "b", "c"]
        df = pd.DataFrame(columns=cols)
        df["b"] = df["b"].astype("int64")
        lib.write("sym", df)
        out = _pd(lib, "sym")
        assert list(out.columns) == cols and len(out) == 0

        df2 = pd.DataFrame([[1.3, 6, "test"]], columns=cols,
                           index=[pd.Timestamp(0)])
        lib.append("sym", df2)
        out = _pd(lib, "sym")
        assert out["a"].tolist() == [1.3]
        assert out["b"].tolist() == [6]
        assert out["c"].tolist() == ["test"]

        df3 = pd.DataFrame([[3.3, 8, None], [2.3, 10, "test2"]], columns=cols,
                           index=[pd.Timestamp(1), pd.Timestamp(2)])
        lib.append("sym", df3)
        out = _pd(lib, "sym")
        assert out["b"].tolist() == [6, 8, 10]
        assert out["c"].tolist() == ["test", None, "test2"]

    def test_write_no_columns_static_schema(self, lib):
        """test_empty_writes.py:71: an index-only frame writes and
        appends."""
        lib.write("sym", pd.DataFrame(index=[pd.Timestamp(0), pd.Timestamp(1)]))
        assert len(_pd(lib, "sym")) == 2
        lib.append("sym", pd.DataFrame(index=[pd.Timestamp(2)]))
        out = _pd(lib, "sym")
        assert len(out) == 3 and list(out.columns) == []

    def test_write_no_rows_and_columns(self, spark):
        """test_empty_writes.py:90: a fully-empty DataFrame writes; the
        first append decides everything."""
        dyn = Arctic(tempfile.mkdtemp(), spark).create_library(
            "nrc", dynamic_schema=True)
        dyn.write("sym", pd.DataFrame())
        out = _pd(dyn, "sym")
        assert out.shape == (0, 0)
        df2 = pd.DataFrame([[1.3, 6, "test"]], columns=["a", "b", "c"],
                           index=[pd.Timestamp(2)])
        dyn.append("sym", df2)
        out = _pd(dyn, "sym")
        assert out["c"].tolist() == ["test"]

    def test_empty_series(self, lib):
        """test_empty_writes.py:140/159: an empty Series writes unpickled
        and accepts a typed append deciding the dtype."""
        lib.write("sym", pd.Series([], dtype="object"))
        out = _pd(lib, "sym")
        assert isinstance(out, pd.Series) and len(out) == 0
        lib.append("sym", pd.Series([1, 2, 3], dtype="int64"))
        out2 = _pd(lib, "sym")
        assert isinstance(out2, pd.Series)
        assert out2.dtype == "int64" and out2.tolist() == [1, 2, 3]

    def test_append_empty_series_onto_typed(self, lib):
        lib.write("sym", pd.Series([1, 2, 3], dtype="float64"))
        m = lib.append("sym", pd.Series([], dtype="float64"))
        assert m.version == 1
        out = _pd(lib, "sym")
        assert isinstance(out, pd.Series) and out.tolist() == [1.0, 2.0, 3.0]

    def test_entirely_empty_column(self, lib):
        """test_empty_writes.py:172: an all-None column among typed ones
        round-trips."""
        df = pd.DataFrame({"Bat": ["String1"], "Cow": [None], "Pig": [1.23]})
        lib.write("sym", df)
        out = _pd(lib, "sym")
        assert out["Bat"].tolist() == ["String1"]
        assert out["Cow"].where(out["Cow"].notna(), None).tolist() == [None]
        assert out["Pig"].tolist() == [1.23]
