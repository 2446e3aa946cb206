"""update(upsert) + batch error capture, ported from the reference's
``test_update.py`` TestUpdateBatch class (``library.py`` update_batch /
UpdatePayload / DataError semantics)."""

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.catalog import (Arctic, ArcticException, DataError,
                                    UpdatePayload)


@pytest.fixture()
def lib(spark, tmp_path):
    return Arctic(str(tmp_path), spark).create_library("ub")


def _frame(vals, start):
    # real DatetimeIndex: pandas datetime DATA columns are no longer
    # index-sniffed (reference parity), and update needs a ts index
    return pd.DataFrame(
        {"a": np.array(vals, dtype="int64")},
        index=pd.date_range(start, periods=len(vals), freq="D", name="ts"))


class TestUpdateUpsert:
    def test_update_missing_symbol_raises_without_upsert(self, lib):
        with pytest.raises(ArcticException, match="upsert"):
            lib.update("nope", _frame([1], "2024-01-01"))

    def test_update_upsert_creates_symbol(self, lib):
        m = lib.update("fresh", _frame([1, 2], "2024-01-01"), upsert=True)
        assert m.version == 0
        assert lib.read("fresh").count() == 2

    def test_zero_row_update_bumps_version_only(self, lib):
        """Reference test_update.py test_update_empty_frame_metadata /
        test_empty_dataframe_increases_version: zero-row data leaves the
        rows untouched but still commits a new version (metadata set
        verbatim — None clears)."""
        lib.write("sym", _frame([1, 2, 3], "2024-01-01"), metadata="v0")
        empty = pd.DataFrame({"a": np.array([], dtype="int64")},
                             index=pd.DatetimeIndex([], name="ts"))
        m = lib.update("sym", empty)
        assert m.version == 1
        assert sorted(v["version"] for v in lib.list_versions("sym")) == [0, 1]
        assert lib.read("sym").count() == 3
        assert lib.read_metadata("sym").metadata is None

    def test_update_prune_previous(self, lib):
        from arcticdb_spark.catalog import NoSuchVersionException
        lib.write("sym", _frame([1, 2, 3], "2024-01-01"))
        lib.update("sym", _frame([9], "2024-01-02"),
                   prune_previous_versions=True)
        with pytest.raises(NoSuchVersionException):
            lib.read("sym", as_of=0)
        out = (lib.read("sym", output_format="pandas")
               .sort_values("ts"))
        assert out["a"].tolist() == [1, 9, 3]


class TestUpdateBatch:
    def test_missing_symbol_is_dataerror_not_abort(self, lib):
        """Reference test_missing_symbol_is_error: the bad payload yields a
        DataError; the good one still lands."""
        lib.write("symbol_1", _frame([1], "2024-01-01"))
        res = lib.update_batch([
            UpdatePayload("symbol_3", _frame([1, 2], "2024-01-01")),
            UpdatePayload("symbol_1", _frame([2, 3], "2024-01-02")),
        ])
        assert isinstance(res[0], DataError)
        assert res[0].symbol == "symbol_3"
        assert "upsert" in res[0].exception_string
        assert not isinstance(res[1], DataError)
        assert res[1].version == 1
        out = (lib.read("symbol_1", output_format="pandas")
               .sort_values("ts"))
        assert out["a"].tolist() == [1, 2, 3]
        assert lib.list_symbols() == ["symbol_1"]

    def test_upsert_creates_symbols(self, lib):
        """Reference test_update_batch_upsert_creates_symbol."""
        lib.write("symbol_1", _frame([1], "2024-01-01"))
        res = lib.update_batch([
            UpdatePayload("symbol_2", _frame([10, 11], "2024-01-04")),
            UpdatePayload("symbol_1", _frame([2, 3], "2024-01-02")),
        ], upsert=True)
        assert not any(isinstance(r, DataError) for r in res)
        assert set(lib.list_symbols()) == {"symbol_1", "symbol_2"}
        assert lib.read("symbol_1").count() == 3
        assert res[0].version == 0 and res[1].version == 1

    def test_date_range_payload(self, lib):
        """Reference TestUpdateBatch test_date_range: the payload's range
        restricts the splice."""
        lib.write("sym", _frame([1, 2, 3, 4], "2024-01-01"))
        res = lib.update_batch([UpdatePayload(
            "sym", _frame([8, 9], "2024-01-02"),
            date_range=(pd.Timestamp("2024-01-02"),
                        pd.Timestamp("2024-01-03")))])
        assert not isinstance(res[0], DataError)
        out = (lib.read("sym", output_format="pandas").sort_values("ts"))
        assert out["a"].tolist() == [1, 8, 9, 4]

    def test_prune_previous(self, lib):
        from arcticdb_spark.catalog import NoSuchVersionException
        lib.write("s1", _frame([1], "2024-01-01"))
        lib.write("s2", _frame([10], "2024-01-01"))
        lib.update_batch(
            [UpdatePayload("s1", _frame([1, 2, 3], "2024-01-01")),
             UpdatePayload("s2", _frame([11], "2024-01-01"))],
            prune_previous_versions=True)
        for s in ("s1", "s2"):
            with pytest.raises(NoSuchVersionException):
                lib.read(s, as_of=0)
        assert lib.read("s1").count() == 3


class TestSignatureParity:
    def test_write_staged_routes_to_stage(self, lib):
        """Reference write(staged=True) stages an incomplete chunk."""
        lib.write("sym", _frame([1, 2], "2024-01-01"), staged=True)
        assert "sym" in lib.get_staged_symbols()
        lib.finalize_staged_data("sym", mode="write")
        assert lib.read("sym").count() == 2

    def test_append_prune_previous_versions(self, lib):
        from arcticdb_spark.catalog import NoSuchVersionException
        lib.write("sym", _frame([1], "2024-01-01"))
        lib.append("sym", _frame([2], "2024-02-01"),
                   prune_previous_versions=True)
        with pytest.raises(NoSuchVersionException):
            lib.read("sym", as_of=0)
        assert lib.read("sym").count() == 2

    def test_write_prune_previous_versions_alias(self, lib):
        from arcticdb_spark.catalog import NoSuchVersionException
        lib.write("sym", _frame([1], "2024-01-01"))
        lib.write("sym", _frame([5, 6], "2024-01-01"),
                  prune_previous_versions=True)
        with pytest.raises(NoSuchVersionException):
            lib.read("sym", as_of=0)
        assert lib.read("sym").count() == 2


class TestReadBatchErrors:
    def test_read_batch_missing_symbol_is_dataerror(self, lib):
        """Reference read_batch: missing symbols surface as DataError
        entries, good symbols still return frames."""
        lib.write("good", _frame([1, 2], "2024-01-01"))
        res = lib.read_batch(["good", "missing"])
        assert res[0].count() == 2
        assert isinstance(res[1], DataError)
        assert res[1].symbol == "missing"


class TestUpdateReferenceCases:
    """Ported from the reference test_update.py top-level cases."""

    def test_update_single_dates_out_of_order(self, lib):
        # test_update_single_dates: three single-row upsert updates landing
        # out of order assemble a sorted frame
        df1 = pd.DataFrame(index=pd.DatetimeIndex([pd.Timestamp(2022, 1, 3)],
                                                  name="ts"),
                           data={"a": [2220103.0]})
        df2 = pd.DataFrame(index=pd.DatetimeIndex([pd.Timestamp(2021, 12, 22)],
                                                  name="ts"),
                           data={"a": [211222.0]})
        df3 = pd.DataFrame(index=pd.DatetimeIndex([pd.Timestamp(2021, 12, 29)],
                                                  name="ts"),
                           data={"a": [2211229.0]})
        lib.update("d6", df1, upsert=True)
        lib.update("d6", df2, upsert=True)
        lib.update("d6", df3, upsert=True)
        out = lib.read("d6", output_format="pandas")
        expected = pd.concat((df2, df3, df1))
        pd.testing.assert_frame_equal(out, expected, check_freq=False)

    def test_update_middle_span_matches_pandas(self, lib):
        # test_update: pandas df.update as the oracle for a mid-range splice
        idx = pd.date_range("1970-01-01", periods=100, freq="D", name="ts")
        df = pd.DataFrame({"a": np.arange(100, dtype="float")}, index=idx)
        lib.write("u", df)
        idx2 = pd.date_range("1970-01-12", periods=10, freq="D", name="ts")
        df2 = pd.DataFrame({"a": np.arange(1000, 1010, dtype="float")},
                           index=idx2)
        lib.update("u", df2)
        out = lib.read("u", output_format="pandas")
        exp = df.copy()
        exp.update(df2)
        pd.testing.assert_frame_equal(out, exp, check_freq=False)

    def test_update_with_wider_daterange_replaces_range(self, lib):
        # test_update_with_daterange: an explicit date_range WIDER than the
        # patch deletes the whole range, so the result is exactly the patch
        def frame(start, end):
            idx = pd.date_range(start, end, freq="D", name="ts")
            return pd.DataFrame({"value": idx.day.astype("int64")}, index=idx)
        df1 = frame("2020-01-01", "2021-01-01")
        lib.write("t", df1)
        df2 = frame("2020-06-01", "2021-06-01")
        lib.update("t", df2,
                   date_range=(pd.Timestamp("2020-01-01"),
                               pd.Timestamp("2022-01-01")))
        out = lib.read("t", output_format="pandas")
        assert out.index.min() == df2.index.min()
        assert out.index.max() == df2.index.max()
        assert len(out) == len(df2)
