"""Cross-epoch storage-format compatibility matrix (round-12 verdict item 3).

Reference analogue: ``/root/reference/python/tests/compat/`` — the upstream
suite writes libraries with OLD package versions and reads them with the
current one. This engine's equivalent: every format epoch enumerated in
``catalog.FORMAT_EPOCHS`` (the fv table above ``FORMAT_VERSION``) is
FABRICATED here by stripping the artifacts that epoch lacked from a
HEAD-written library, then read back on HEAD. Each test pins one epoch's
read-side fallback:

* fv0  — no _pins.json / _chain.json / per-key manifest extras, single
  swapped _ref.json
* fv<6 — no format_version stamps anywhere
* fv2  — staged sidecar without uint64/unsigned markers
* fv3  — staged sidecar without the tz zone map
* fv4  — staged sidecar without the sortedness record
* fv5  — single-object _pins.json / _ref.json (migrate to marker files /
  the CAS generation chain on first read); GC'd manifests physically
  REMOVED rather than tombstoned
* fv>6 — FORWARD stamps are refused loudly, never misread
"""

import json
import os

import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow


from arcticdb_spark.catalog import FORMAT_VERSION, Arctic
from arcticdb_spark.exceptions import ArcticException


def _strip_keys(path: str, keys: list[str]) -> None:
    with open(path) as fh:
        d = json.load(fh)
    for k in keys:
        d.pop(k, None)
    with open(path, "w") as fh:
        json.dump(d, fh)


def _manifest_paths(lib, symbol):
    vdir = os.path.join(lib.root, symbol, "_versions")
    return [os.path.join(vdir, f) for f in sorted(os.listdir(vdir))]


def _staged_sidecars(lib, symbol):
    out = []
    for base, _dirs, files in os.walk(os.path.join(lib.root, symbol)):
        for f in files:
            if f == "_asdb_staged_meta.json":
                out.append(os.path.join(base, f))
    return out


@pytest.fixture()
def df():
    return pd.DataFrame(
        {"a": [1, 2, 3, 4], "b": [1.5, 2.5, 3.5, 4.5]},
        index=pd.date_range("2024-01-01", periods=4, freq="D"))


def _fabricate_fv0(lib, symbol):
    """Strip every artifact introduced after the fv0 base layout."""
    import shutil
    sym_dir = os.path.join(lib.root, symbol)
    for name in ("_pins.json", "_chain.json"):
        p = os.path.join(sym_dir, name)
        if os.path.exists(p):
            os.remove(p)
    shutil.rmtree(os.path.join(sym_dir, "_pins"), ignore_errors=True)
    # fv0..5 stored the ref as a single swapped _ref.json, not a CAS chain
    ref = lib._load_ref(symbol)
    shutil.rmtree(os.path.join(sym_dir, "_ref"), ignore_errors=True)
    with open(os.path.join(sym_dir, "_ref.json"), "w") as fh:
        json.dump(ref, fh)
    for mp in _manifest_paths(lib, symbol):
        with open(mp) as fh:
            d = json.load(fh)
        d.pop("fv", None)
        d.pop("sorted", None)          # fv0 default: ASCENDING
        for fe in d["files"]:
            fe.pop("version_id", None)  # legacy manifests predate the field
            fe.pop("content_hash", None)
        with open(mp, "w") as fh:
            json.dump(d, fh)
    _strip_keys(os.path.join(lib.root, "_config.json"), ["format_version"])


class TestFv0BaseLayout:
    def test_read_values_after_strip(self, spark, tmp_path, df):
        lib = Arctic(str(tmp_path), spark).create_library("l")
        lib.write("s", df)
        lib.append("s", df.set_index(df.index + pd.Timedelta(days=4)))
        _fabricate_fv0(lib, "s")
        # re-open the library cold (a fresh Arctic object, no session state)
        lib2 = Arctic(str(tmp_path), spark)["l"]
        got = lib2.read("s", output_format="pandas")
        assert got["a"].tolist() == [1, 2, 3, 4] * 2
        assert lib2.get_num_rows("s") == 8
        # sorted flag falls back to ASCENDING: date_range reads still work
        got2 = lib2.read("s", date_range=(pd.Timestamp("2024-01-02"),
                                          pd.Timestamp("2024-01-03")),
                         output_format="pandas")
        assert got2["a"].tolist() == [2, 3]

    def test_pin_sidecar_rederived_from_snapshots(self, spark, tmp_path, df):
        """fv1 fallback: a snapshot-pinned tombstoned version must survive
        prune on a library whose _pins.json never existed."""
        lib = Arctic(str(tmp_path), spark).create_library("l")
        lib.write("s", df)
        lib.snapshot("snap0")
        lib.write("s", df.assign(a=df["a"] * 10))
        _fabricate_fv0(lib, "s")
        lib2 = Arctic(str(tmp_path), spark)["l"]
        lib2.prune_previous_versions("s")
        got = lib2.read("s", as_of="snap0", output_format="pandas")
        assert got["a"].tolist() == [1, 2, 3, 4]

    def test_chain_marker_absent_versions_never_reused(self, spark, tmp_path,
                                                       df):
        """fv1 fallback: with no _chain.json the next version number still
        clears every surviving manifest (snapshot-pinned after delete)."""
        lib = Arctic(str(tmp_path), spark).create_library("l")
        lib.write("s", df)
        lib.write("s", df)
        lib.snapshot("keep")
        _fabricate_fv0(lib, "s")
        lib2 = Arctic(str(tmp_path), spark)["l"]
        lib2.delete("s")
        v = lib2.write("s", df).version
        assert v == 2  # not 0: pinned v0/v1 manifests still exist

    def test_version_travel_after_strip(self, spark, tmp_path, df):
        lib = Arctic(str(tmp_path), spark).create_library("l")
        lib.write("s", df)
        lib.write("s", df.assign(a=df["a"] + 100))
        _fabricate_fv0(lib, "s")
        lib2 = Arctic(str(tmp_path), spark)["l"]
        assert lib2.read("s", as_of=0,
                         output_format="pandas")["a"].tolist() == [1, 2, 3, 4]
        assert lib2.read("s", as_of=1, output_format="pandas")["a"].tolist() \
            == [101, 102, 103, 104]


class TestStagedSidecarEpochs:
    def test_fv2_sidecar_without_uint64_reads_signed(self, spark, tmp_path):
        """A staged chunk whose artifacts predate the uint64 marker (absent
        from BOTH the sidecar and the parquet field metadata — the marker is
        stored redundantly since fv2) finalizes as plain signed int64 —
        exactly the values that epoch stored."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        lib = Arctic(str(tmp_path), spark).create_library("l")
        pdf = pd.DataFrame({"u": np.array([1, 2, 3], dtype="uint64")},
                           index=pd.date_range("2024-01-01", periods=3))
        seg_files = lib.stage("s", pdf).staged_segments
        for sc in _staged_sidecars(lib, "s"):
            _strip_keys(sc, ["uint64", "unsigned", "unsigned_dtypes"])
        for f in seg_files:
            t = pq.read_table(f)
            bare = pa.schema([pa.field(fl.name, fl.type) for fl in t.schema])
            pq.write_table(t.cast(bare), f)
            # Hadoop's local FS validates .crc sidecars; the rewrite
            # invalidated them
            crc = os.path.join(os.path.dirname(f),
                               "." + os.path.basename(f) + ".crc")
            if os.path.exists(crc):
                os.remove(crc)
        lib.finalize_staged_data("s")
        got = lib.read("s", output_format="pandas")
        assert got["u"].tolist() == [1, 2, 3]
        assert got["u"].dtype == "int64"   # marker lost at that epoch

    def test_fv3_sidecar_without_tz_reads_utc_naive(self, spark, tmp_path):
        lib = Arctic(str(tmp_path), spark).create_library("l")
        idx = pd.date_range("2024-01-01", periods=3, freq="D",
                            tz="America/New_York")
        lib.stage("s", pd.DataFrame({"a": [1, 2, 3]}, index=idx))
        for sc in _staged_sidecars(lib, "s"):
            _strip_keys(sc, ["tzs"])
        lib.finalize_staged_data("s")
        got = lib.read("s", output_format="pandas")
        assert got.index.tz is None              # zone lost at that epoch
        # physical instants are UTC either way — values are NOT shifted
        assert got.index[0] == idx[0].tz_convert("UTC").tz_localize(None)
        assert got["a"].tolist() == [1, 2, 3]

    def test_fv4_sidecar_without_sortedness(self, spark, tmp_path):
        """Pre-fv4 chunks carry no sortedness record; sort_and_finalize
        (which sorts anything) still produces the ascending result."""
        lib = Arctic(str(tmp_path), spark).create_library("l")
        idx = pd.to_datetime(["2024-01-03", "2024-01-01", "2024-01-02"])
        lib.stage("s", pd.DataFrame({"a": [3, 1, 2]}, index=idx),
                  validate_index=False)
        for sc in _staged_sidecars(lib, "s"):
            _strip_keys(sc, ["sorted"])
        lib.sort_and_finalize_staged_data("s")
        got = lib.read("s", output_format="pandas")
        assert got["a"].tolist() == [1, 2, 3]


class TestForwardRefusal:
    def test_newer_manifest_refused(self, spark, tmp_path, df):
        lib = Arctic(str(tmp_path), spark).create_library("l")
        lib.write("s", df)
        mp = _manifest_paths(lib, "s")[0]
        with open(mp) as fh:
            d = json.load(fh)
        d["fv"] = FORMAT_VERSION + 1
        with open(mp, "w") as fh:
            json.dump(d, fh)
        with pytest.raises(ArcticException, match="format_version"):
            lib.read("s")

    def test_newer_config_refused_on_open(self, spark, tmp_path, df):
        ac = Arctic(str(tmp_path), spark)
        ac.create_library("l").write("s", df)
        cfg_path = os.path.join(str(tmp_path), "l", "_config.json")
        with open(cfg_path) as fh:
            cfg = json.load(fh)
        cfg["format_version"] = FORMAT_VERSION + 1
        with open(cfg_path, "w") as fh:
            json.dump(cfg, fh)
        with pytest.raises(ArcticException, match="format_version"):
            Arctic(str(tmp_path), spark)["l"]

    def test_current_stamps_present(self, spark, tmp_path, df):
        lib = Arctic(str(tmp_path), spark).create_library("l")
        lib.write("s", df)
        with open(os.path.join(lib.root, "_config.json")) as fh:
            assert json.load(fh)["format_version"] == FORMAT_VERSION
        with open(_manifest_paths(lib, "s")[0]) as fh:
            assert json.load(fh)["fv"] == FORMAT_VERSION


class TestMixedEpochChain:
    def test_legacy_then_head_appends(self, spark, tmp_path, df):
        """A library that lived through several epochs: v0 stripped to fv0,
        then HEAD appends v1 — both versions readable, stamps only on v1."""
        lib = Arctic(str(tmp_path), spark).create_library("l")
        lib.write("s", df)
        _fabricate_fv0(lib, "s")
        lib2 = Arctic(str(tmp_path), spark)["l"]
        lib2.append("s", df.set_index(df.index + pd.Timedelta(days=4)))
        mps = _manifest_paths(lib2, "s")
        with open(mps[0]) as fh:
            assert "fv" not in json.load(fh)
        with open(mps[1]) as fh:
            assert json.load(fh)["fv"] == FORMAT_VERSION
        assert lib2.read("s", as_of=0, output_format="pandas")["a"].tolist() \
            == [1, 2, 3, 4]
        assert lib2.read("s", output_format="pandas")["a"].tolist() \
            == [1, 2, 3, 4] * 2


class TestPinIndexEpochs:
    def test_fv1_single_json_pins_migrate_to_markers(self, spark, tmp_path,
                                                     df):
        """An fv1..5 library stored pins as ONE _pins.json; HEAD migrates it
        to per-pin marker files on first read and keeps GC protection."""
        lib = Arctic(str(tmp_path), spark).create_library("l")
        lib.write("s", df)
        lib.snapshot("snap0")
        lib.write("s", df.assign(a=df["a"] * 10))
        # fabricate the fv1..5 shape: single json, no marker dir
        import shutil
        shutil.rmtree(os.path.join(lib.root, "s", "_pins"),
                      ignore_errors=True)
        with open(os.path.join(lib.root, "s", "_pins.json"), "w") as fh:
            json.dump({"0": ["snap0"]}, fh)
        lib2 = Arctic(str(tmp_path), spark)["l"]
        assert lib2._load_pins("s") == {"0": ["snap0"]}
        # migrated: marker exists, legacy json consumed
        assert os.path.exists(lib2._pin_path("s", 0, "snap0"))
        assert not os.path.exists(os.path.join(lib.root, "s", "_pins.json"))
        lib2.prune_previous_versions("s")
        got = lib2.read("s", as_of="snap0", output_format="pandas")
        assert got["a"].tolist() == [1, 2, 3, 4]

    def test_fv5_removed_manifest_reads_as_missing(self, spark, tmp_path,
                                                   df):
        """fv<=5 GC physically REMOVED collected manifests (no tombstone
        stub): absence must surface the same NoSuchVersion as a tombstone,
        and the chain stays monotone for new writers."""
        from arcticdb_spark.exceptions import NoSuchVersionException
        lib = Arctic(str(tmp_path), spark).create_library("l")
        lib.write("s", df)
        lib.write("s", df.assign(a=df["a"] + 1))
        lib.prune_previous_versions("s")
        # HEAD leaves a tombstone stub; fabricate the fv5 shape: remove it
        vpath = os.path.join(lib.root, "s", "_versions", "v00000000.json")
        with open(vpath) as fh:
            assert json.load(fh)["tombstone"] is True
        os.remove(vpath)
        lib2 = Arctic(str(tmp_path), spark)["l"]
        with pytest.raises(NoSuchVersionException):
            lib2.read("s", as_of=0)
        assert lib2.write("s", df).version == 2


class TestRefChainEpochs:
    def test_fv5_single_ref_json_migrates(self, spark, tmp_path, df):
        """fv<=5 stored the ref as ONE _ref.json swapped in place; HEAD
        migrates it into the CAS chain (generation 0) on first read and
        every op keeps working."""
        import shutil
        lib = Arctic(str(tmp_path), spark).create_library("l")
        lib.write("s", df)
        lib.write("s", df.assign(a=df["a"] + 1))
        # fabricate the legacy shape: single json, no chain dir
        ref = lib._load_ref("s")
        shutil.rmtree(os.path.join(lib.root, "s", "_ref"))
        with open(os.path.join(lib.root, "s", "_ref.json"), "w") as fh:
            json.dump(ref, fh)
        lib2 = Arctic(str(tmp_path), spark)["l"]
        assert lib2.read("s", output_format="pandas")["a"].tolist() \
            == [2, 3, 4, 5]
        # migrated: generation 0 exists, legacy json consumed
        assert os.path.exists(lib2._ref_gen_path("s", 0))
        assert not os.path.exists(os.path.join(lib.root, "s", "_ref.json"))
        assert lib2.write("s", df).version == 2
