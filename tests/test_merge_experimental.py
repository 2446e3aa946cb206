"""Library.merge_experimental (reference ``library.py`` merge_experimental /
``test_merge_update.py``): versioned SQL-MERGE on a timestamp-indexed
symbol, strategy-driven matched/unmatched handling."""

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.catalog import Arctic, ArcticException, MergeStrategy


@pytest.fixture()
def lib(spark, tmp_path):
    return Arctic(str(tmp_path), spark).create_library("m")


def _target():
    # DatetimeIndex frames: the ts DATA column is no longer index-sniffed
    # (reference parity) and merge keys on the symbol's real index
    return pd.DataFrame(
        {"price": [10.0, 20.0, 30.0, 40.0, 50.0]},
        index=pd.date_range("2024-01-01", periods=5, freq="D", name="ts"))


def _source(days, prices):
    return pd.DataFrame(
        {"price": prices},
        index=pd.DatetimeIndex(
            pd.to_datetime([f"2024-01-{d:02d}" for d in days]), name="ts"))


def _read(lib):
    return (lib.read("sym", output_format="pandas")
            .sort_values("ts").reset_index(drop=True))


class TestMergeStrategies:
    def test_update_and_insert_default(self, lib):
        lib.write("sym", _target())
        m = lib.merge_experimental("sym", _source([2, 9], [99.0, 77.0]))
        assert m.version == 1
        out = _read(lib)
        assert len(out) == 6
        assert out["price"].tolist() == [10.0, 99.0, 30.0, 40.0, 50.0, 77.0]

    def test_update_only(self, lib):
        lib.write("sym", _target())
        lib.merge_experimental(
            "sym", _source([2, 9], [99.0, 77.0]),
            strategy=MergeStrategy(matched="update",
                                   not_matched_by_target="do_nothing"))
        out = _read(lib)
        assert len(out) == 5   # the unmatched 2024-01-09 row is dropped
        assert out["price"].tolist() == [10.0, 99.0, 30.0, 40.0, 50.0]

    def test_insert_only(self, lib):
        lib.write("sym", _target())
        lib.merge_experimental(
            "sym", _source([2, 9], [99.0, 77.0]),
            strategy=MergeStrategy(matched="do_nothing",
                                   not_matched_by_target="insert"))
        out = _read(lib)
        assert len(out) == 6
        # matched 2024-01-02 keeps the target value; only 01-09 inserted
        assert out["price"].tolist() == [10.0, 20.0, 30.0, 40.0, 50.0, 77.0]

    def test_unsupported_strategy_raises(self, lib):
        lib.write("sym", _target())
        with pytest.raises(ArcticException, match="unsupported"):
            lib.merge_experimental(
                "sym", _source([2], [1.0]),
                strategy=MergeStrategy(matched="do_nothing",
                                       not_matched_by_target="do_nothing"))


class TestMergeLifecycle:
    def test_missing_symbol_requires_upsert(self, lib):
        with pytest.raises(ArcticException, match="upsert"):
            lib.merge_experimental("sym", _source([1], [1.0]))
        m = lib.merge_experimental("sym", _source([1], [1.0]), upsert=True)
        assert m.version == 0
        assert lib.read("sym").count() == 1

    def test_versioned_and_as_of(self, lib):
        lib.write("sym", _target())
        lib.merge_experimental("sym", _source([3], [111.0]))
        assert lib.read("sym", as_of=0).toPandas()["price"].sum() == 150.0
        assert _read(lib)["price"].tolist() == [10.0, 20.0, 111.0, 40.0, 50.0]

    def test_on_columns_compound_key(self, lib):
        """Matching on index + an `on` column: same timestamp, different
        instrument keys stay distinct."""
        lib.write("sym", pd.DataFrame(
            {"k": ["a", "b", "a"], "price": [1.0, 2.0, 3.0]},
            index=pd.DatetimeIndex(pd.to_datetime(
                ["2024-01-01", "2024-01-01", "2024-01-02"]), name="ts")))
        lib.merge_experimental(
            "sym",
            pd.DataFrame({"k": ["b"], "price": [20.0]},
                         index=pd.DatetimeIndex(
                             pd.to_datetime(["2024-01-01"]), name="ts")),
            on=["k"],
            strategy=MergeStrategy(matched="update",
                                   not_matched_by_target="do_nothing"))
        out = (lib.read("sym", output_format="pandas")
               .sort_values(["ts", "k"]).reset_index(drop=True))
        assert out["price"].tolist() == [1.0, 20.0, 3.0]

    def test_prune_previous(self, lib):
        from arcticdb_spark.catalog import NoSuchVersionException
        lib.write("sym", _target())
        lib.merge_experimental("sym", _source([2], [99.0]),
                               prune_previous_versions=True)
        with pytest.raises(NoSuchVersionException):
            lib.read("sym", as_of=0)

    def test_options_roundtrip(self, lib):
        from arcticdb_spark import LibraryOptions
        assert lib.options() == LibraryOptions(rows_per_segment=1_000_000,
                                               dynamic_schema=False,
                                               dedup=False,
                                               columns_per_segment=127)
