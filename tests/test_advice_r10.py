"""Round-10 regression pins for the r9 ADVICE findings.

Each test pins one reported defect:
1. unnamed DatetimeIndex colliding with a data column named 'ts' must
   round-trip UNNAMED (reference restores None —
   /root/reference/python/arcticdb/version_store/_normalization.py:450-463)
2. get_info on a named Series whose index name collides with the value
   column reports the ORIGINAL index name in col_names['columns']
   (reference test_basic_version_store.py test_get_info_series)
3. batch_read reads the same version it resolved (no double resolution)
4. snapshot() creation is an exclusive-create (CAS), not exists()+write
5. _version_request_of: bool is not SPECIFIC; numpy integers are
"""
import numpy as np
import pandas as pd
import pytest


def _dtidx(n, name=None):
    return pd.DatetimeIndex(
        pd.date_range("2024-01-01", periods=n, freq="1h"), name=name)


class TestUnnamedIndexTsCollision:
    def test_roundtrip_stays_unnamed(self, tmp_lib):
        # unnamed index, data column literally named "ts"
        df = pd.DataFrame({"ts": np.arange(5, dtype="int64"),
                           "v": np.arange(5, dtype="float64")},
                          index=_dtidx(5))
        assert df.index.name is None
        tmp_lib.write("s", df)
        out = tmp_lib.read("s", output_format="pandas")
        assert out.index.name is None
        pd.testing.assert_frame_equal(out, df, check_freq=False)

    def test_named_collision_still_restores_name(self, tmp_lib):
        # index NAMED like a data column keeps its name on read
        df = pd.DataFrame({"col1": np.arange(4, dtype="int64")},
                          index=_dtidx(4, name="col1"))
        tmp_lib.write("s", df)
        out = tmp_lib.read("s", output_format="pandas")
        assert out.index.name == "col1"
        pd.testing.assert_frame_equal(out, df, check_freq=False)

    def test_get_info_unnamed_collision(self, tmp_lib):
        df = pd.DataFrame({"ts": np.arange(3, dtype="int64")},
                          index=_dtidx(3))
        tmp_lib.write("s", df)
        info = tmp_lib.get_info("s")
        assert info["col_names"]["index"] == [None]
        assert "ts" in info["col_names"]["columns"]
        assert not any(c.startswith("__idx__")
                       for c in info["col_names"]["columns"])


class TestGetInfoSeriesCollision:
    def test_series_index_name_collides_with_value(self, tmp_lib):
        ser = pd.Series(np.arange(4, dtype="float64"), name="col1",
                        index=_dtidx(4, name="col1"))
        tmp_lib.write("s", ser)
        out = tmp_lib.read("s", output_format="pandas")
        assert isinstance(out, pd.Series)
        assert out.index.name == "col1"
        info = tmp_lib.get_info("s")
        # upstream quirk: named series index leaks into columns — as the
        # ORIGINAL name, never the disambiguated physical one. Reference
        # test_get_info_series with index_name="col1" expects the name
        # TWICE: [index_name, value_name] == ["col1", "col1"]
        assert info["col_names"]["columns"] == ["col1", "col1"]

    def test_series_multiindex_leak(self, tmp_lib):
        # reference test_get_info_series_multiindex: a multiindex series
        # leaks the PHYSICAL level names — unnamed level 0 is "index",
        # unnamed level i is "__fkidx__i"
        dtidx = pd.date_range("2016-01-01", periods=5)
        vals = np.arange(5, dtype="int64")
        ser = pd.Series(np.arange(5), name="col1",
                        index=pd.MultiIndex.from_arrays([dtidx, vals]))
        tmp_lib.write("s", ser)
        info = tmp_lib.get_info("s")
        assert info["type"] == "pandasseries"
        assert info["col_names"]["columns"] == ["index", "__fkidx__1",
                                                "col1"]
        assert info["col_names"]["index"] == []
        assert info["index_type"] == "NA"

    def test_batch_get_info_pickled(self, tmp_lib):
        # reference test_batch_get_info_pickled: the batch variant matches
        # the single-symbol pickled shape
        tmp_lib.write_pickle("pk", 1)
        info = tmp_lib.batch_get_info(["pk"])[0]
        assert info["col_names"]["columns"] == ["bytes"]
        assert info["input_type"] == "msg_pack_frame"
        assert np.isnat(info["date_range"][0])
        assert np.isnat(info["date_range"][1])
        assert info["sorted"] == "UNKNOWN"
        assert info["rows"] is None


class TestBatchReadSingleResolve:
    def test_version_metadata_data_consistent(self, tmp_lib):
        df0 = pd.DataFrame({"a": [1, 2]}, index=_dtidx(2))
        df1 = pd.DataFrame({"a": [3, 4]}, index=_dtidx(2))
        tmp_lib.write("s", df0, metadata={"v": 0})
        tmp_lib.write("s", df1, metadata={"v": 1})
        out = tmp_lib.batch_read(["s"])
        item = out["s"]
        assert item.version == 1
        assert item.metadata == {"v": 1}
        pd.testing.assert_frame_equal(item.data, df1, check_freq=False)


class TestSnapshotExclusiveCreate:
    def test_duplicate_raises(self, tmp_lib):
        from arcticdb_spark.exceptions import InternalException
        tmp_lib.write("s", pd.DataFrame({"a": [1]}, index=_dtidx(1)))
        tmp_lib.snapshot("snap1")
        with pytest.raises(InternalException):
            tmp_lib.snapshot("snap1")

    def test_cas_wins_even_past_precheck(self, tmp_lib, monkeypatch):
        # simulate the race: the exists() pre-check lies (says absent) —
        # the exclusive create must still reject the second writer
        from arcticdb_spark.exceptions import InternalException
        tmp_lib.write("s", pd.DataFrame({"a": [1]}, index=_dtidx(1)))
        tmp_lib.snapshot("snap1")
        snap_path = tmp_lib._snap_path("snap1")
        real_exists = tmp_lib._fs.exists
        monkeypatch.setattr(
            tmp_lib._fs, "exists",
            lambda p: False if p == snap_path else real_exists(p))
        with pytest.raises(InternalException):
            tmp_lib.snapshot("snap1")


class TestVersionRequestClassification:
    def test_bool_is_not_specific(self):
        from arcticdb_spark.catalog import (_version_request_of,
                                            VersionRequestType)
        vt, _ = _version_request_of(True)
        assert vt is not VersionRequestType.SPECIFIC

    def test_numpy_int_is_specific(self):
        from arcticdb_spark.catalog import (_version_request_of,
                                            VersionRequestType)
        vt, vd = _version_request_of(np.int64(3))
        assert vt is VersionRequestType.SPECIFIC
        assert vd == 3 and isinstance(vd, int)

    def test_numpy_int_as_of_reads(self, tmp_lib):
        df = pd.DataFrame({"a": [1, 2]}, index=_dtidx(2))
        tmp_lib.write("s", df)
        tmp_lib.write("s", df * 2)
        out = tmp_lib.read("s", as_of=np.int64(0), output_format="pandas")
        pd.testing.assert_frame_equal(out, df, check_freq=False)
