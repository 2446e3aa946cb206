"""Versioned Library: write/read/append/update/as_of/snapshots/staging —
modeled on reference test_append.py / test_update.py / version-chain tests."""

import pandas as pd
import pytest

from arcticdb_spark.catalog import NoSuchVersionException, SortingException
from arcticdb_spark.query import QueryBuilder


def _ts_frame(start, periods, value_offset=0, freq="1h"):
    # a real DatetimeIndex: pandas datetime DATA columns are no longer
    # index-sniffed (reference parity — the pandas index IS the index),
    # so timeseries semantics (sortedness validation, date_range, update)
    # require the index itself to be the timestamps
    return pd.DataFrame({
        "v": [float(i + value_offset) for i in range(periods)],
        "k": [f"k{i % 3}" for i in range(periods)],
    }, index=pd.date_range(start, periods=periods, freq=freq, name="ts"))


def test_write_read_roundtrip(tmp_lib):
    pdf = _ts_frame("2024-01-01", 48)
    tmp_lib.write("sym", pdf)
    out = tmp_lib.read("sym").toPandas().sort_values("ts").reset_index(drop=True)
    assert len(out) == 48
    assert out["v"].tolist() == pdf["v"].tolist()
    assert tmp_lib.has_symbol("sym")
    assert tmp_lib.list_symbols() == ["sym"]


def test_versioning_and_as_of(tmp_lib):
    tmp_lib.write("sym", _ts_frame("2024-01-01", 10))
    tmp_lib.write("sym", _ts_frame("2024-01-01", 20))
    assert tmp_lib.read("sym").count() == 20
    assert tmp_lib.read("sym", as_of=0).count() == 10
    versions = tmp_lib.list_versions("sym")
    assert [v["version"] for v in versions] == [1, 0]  # reference order: version DESC


def test_append_reuses_files_and_validates(tmp_lib):
    tmp_lib.write("sym", _ts_frame("2024-01-01", 24))
    m0 = tmp_lib._load_manifest("sym", 0)
    tmp_lib.append("sym", _ts_frame("2024-01-02", 24))
    m1 = tmp_lib._load_manifest("sym", 1)
    # previous files are shared, not rewritten
    assert {f.path for f in m0.files} <= {f.path for f in m1.files}
    assert tmp_lib.read("sym").count() == 48
    # overlapping append rejected
    with pytest.raises(SortingException):
        tmp_lib.append("sym", _ts_frame("2024-01-01 12:00", 4))


def test_update_range_surgery(tmp_lib):
    tmp_lib.write("sym", _ts_frame("2024-01-01", 48))
    patch = _ts_frame("2024-01-01 10:00", 5, value_offset=1000)
    tmp_lib.update("sym", patch)
    out = tmp_lib.read("sym").toPandas().sort_values("ts").reset_index(drop=True)
    assert len(out) == 48  # 5 replaced in-range
    inside = out[(out.ts >= "2024-01-01 10:00") & (out.ts <= "2024-01-01 14:00")]
    assert (inside["v"] >= 1000).all()
    outside = out[~((out.ts >= "2024-01-01 10:00") & (out.ts <= "2024-01-01 14:00"))]
    assert (outside["v"] < 1000).all()
    # old version untouched
    old = tmp_lib.read("sym", as_of=0).toPandas()
    assert (old["v"] < 1000).all()


def test_delete_data_in_range(tmp_lib):
    tmp_lib.write("sym", _ts_frame("2024-01-01", 24))
    tmp_lib.delete_data_in_range(
        "sym", (pd.Timestamp("2024-01-01 06:00"), pd.Timestamp("2024-01-01 11:00")))
    out = tmp_lib.read("sym").toPandas()
    assert len(out) == 18


def test_read_with_query_and_pruning(tmp_lib):
    tmp_lib.write("sym", _ts_frame("2024-01-01", 100))
    q = QueryBuilder()
    q = q[q["v"] >= 50]
    out = tmp_lib.read("sym", query_builder=q).toPandas()
    assert len(out) == 50
    dr = tmp_lib.read("sym", date_range=(pd.Timestamp("2024-01-02"),
                                         pd.Timestamp("2024-01-03"))).toPandas()
    p = _ts_frame("2024-01-01", 100)
    assert len(dr) == len(p[(p.index >= "2024-01-02")
                            & (p.index <= "2024-01-03")])
    cols = tmp_lib.read("sym", columns=["v"]).columns
    assert cols == ["ts", "v"]  # index force-included


def test_row_range_head_tail(tmp_lib):
    pdf = _ts_frame("2024-01-01", 60)
    tmp_lib.write("sym", pdf)
    assert tmp_lib.head("sym", 5).toPandas()["v"].tolist() == [0, 1, 2, 3, 4]
    assert sorted(tmp_lib.tail("sym", 5).toPandas()["v"]) == [55, 56, 57, 58, 59]
    rr = tmp_lib.read("sym", row_range=(10, 20)).toPandas()
    assert sorted(rr["v"]) == list(range(10, 20))
    rrn = tmp_lib.read("sym", row_range=(-10, None)).toPandas()
    assert sorted(rrn["v"]) == list(range(50, 60))


def test_snapshots(tmp_lib):
    tmp_lib.write("a", _ts_frame("2024-01-01", 5))
    tmp_lib.write("b", _ts_frame("2024-01-01", 6))
    tmp_lib.snapshot("snap1")
    tmp_lib.write("a", _ts_frame("2024-01-01", 50))
    assert tmp_lib.read("a").count() == 50
    assert tmp_lib.read("a", as_of="snap1").count() == 5
    assert tmp_lib.list_snapshots() == {"snap1": None}
    assert tmp_lib.list_snapshots(load_metadata=False) == ["snap1"]
    tmp_lib.delete_snapshot("snap1")
    assert tmp_lib.list_snapshots() == {}


def test_metadata_roundtrip(tmp_lib):
    tmp_lib.write("sym", _ts_frame("2024-01-01", 5), metadata={"source": "unit"})
    assert tmp_lib.read_metadata("sym").metadata == {"source": "unit"}
    tmp_lib.write_metadata("sym", {"source": "v2"})
    assert tmp_lib.read_metadata("sym").metadata == {"source": "v2"}
    assert tmp_lib.read("sym").count() == 5  # data untouched
    desc = tmp_lib.get_description("sym")
    assert desc["row_count"] == 5 and desc["index_column"] == "ts"


def test_prune_previous_versions(tmp_lib):
    import os
    tmp_lib.write("sym", _ts_frame("2024-01-01", 10))
    old_files = [f.path for f in tmp_lib._load_manifest("sym", 0).files]
    tmp_lib.write("sym", _ts_frame("2024-01-01", 20))
    tmp_lib.prune_previous_versions("sym")
    with pytest.raises(NoSuchVersionException):
        tmp_lib.read("sym", as_of=0)
    assert all(not os.path.exists(p) for p in old_files)
    assert tmp_lib.read("sym").count() == 20


def test_staged_ingestion_sort_and_finalize(tmp_lib):
    # unsorted, overlapping chunks (FIXTURES F7 shape)
    c1 = _ts_frame("2024-01-01", 20).sample(frac=1.0, random_state=1)
    c2 = _ts_frame("2024-01-01 10:00", 20, value_offset=100).sample(frac=1.0, random_state=2)
    # unsorted datetime-indexed chunks need validate_index=False at stage
    # time (reference library.py:952); the sorted finalize orders them
    tmp_lib.stage("sym", c1, validate_index=False)
    tmp_lib.stage("sym", c2, validate_index=False)
    tmp_lib.finalize_staged_data("sym", mode="write", sort=True)
    out = tmp_lib.read("sym").toPandas()
    assert len(out) == 40
    m = tmp_lib._load_manifest("sym", 0)
    assert m.sorted == "ASCENDING"
    # staged dir cleaned
    import os
    assert not os.path.isdir(tmp_lib._staging_dir("sym"))


def test_timestamp_as_of(tmp_lib):
    import time
    tmp_lib.write("sym", _ts_frame("2024-01-01", 5))
    time.sleep(0.01)
    cut = pd.Timestamp.utcnow().tz_localize(None)
    time.sleep(0.01)
    tmp_lib.write("sym", _ts_frame("2024-01-01", 9))
    assert tmp_lib.read("sym", as_of=cut).count() == 5
