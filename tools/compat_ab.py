"""Historical storage-compat A/B (r13; reference ``python/tests/compat/``).

``tests/test_manifest_compat.py`` fabricates the fv0-5 epoch shapes from
HEAD-written libraries — it proves the READ-SIDE fallbacks, but not that the
shapes match what old code ACTUALLY wrote. This tool closes that gap the way
the reference's compat suite does: check out a past round's real commit in a
git worktree, write a feature-matrix library **with that old code**, capture
what the old code itself reads back, then read the same on-disk library with
HEAD and require byte-identical frames plus working lifecycle ops.

Writers: end-of-round commits r10 (2636bc8) and r11 (6cffe3d) — the two
rounds preceding the fv6 metadata rebuild, so the ladder crosses the
single-_ref.json -> CAS-chain and _pins.json -> pin-marker migrations with
storage written by the code that really shipped them.

Feature matrix per writer: multi-version (write/append/update) with
metadata, a snapshot pinning v1, uint64 round-trip, tz-aware datetime index,
staged+finalize, write_pickle.

Usage:
    python tools/compat_ab.py            # full ladder (both writers)
    python tools/compat_ab.py write DIR  # subprocess mode (old PYTHONPATH)
    python tools/compat_ab.py read  DIR  # subprocess mode (HEAD PYTHONPATH)
"""

from __future__ import annotations

import json
import os
import pickle
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WRITERS = {"r10": "2636bc8", "r11": "6cffe3d"}
SCRATCH = "/tmp/asdb_compat_ab"


# ---------------------------------------------------------------------------
# deterministic input frames (built by HEAD numpy/pandas in BOTH subprocesses
# — only the arcticdb_spark import differs between writer and reader)
# ---------------------------------------------------------------------------

def _frames():
    import numpy as np
    import pandas as pd
    ts = pd.date_range("2024-03-01", periods=12, freq="1h")
    base = pd.DataFrame({"price": np.arange(12) * 1.5,
                         "qty": np.arange(12, dtype="int64")}, index=ts)
    app = pd.DataFrame({"price": [100.0, 101.0], "qty": [7, 8]},
                       index=pd.date_range("2024-03-01 12:00", periods=2,
                                           freq="1h"))
    upd = pd.DataFrame({"price": [-1.0], "qty": [99]},
                       index=pd.DatetimeIndex([pd.Timestamp("2024-03-01 03:00")]))
    u64 = pd.DataFrame({"big": np.array([2**63 + 3, 5, 2**64 - 1],
                                        dtype="uint64")},
                       index=pd.date_range("2024-01-01", periods=3, freq="D"))
    tz = pd.DataFrame({"v": [1.0, 2.0, 3.0]},
                      index=pd.date_range("2024-06-01", periods=3, freq="D",
                                          tz="America/New_York"))
    st1 = pd.DataFrame({"x": [1.0, 2.0]},
                       index=pd.date_range("2024-02-01", periods=2, freq="h"))
    st2 = pd.DataFrame({"x": [3.0, 4.0]},
                       index=pd.date_range("2024-02-01 02:00", periods=2,
                                           freq="h"))
    return base, app, upd, u64, tz, st1, st2


def _read_all(lib):
    """Every (symbol, as_of) cell of the matrix as pandas, via whichever
    arcticdb_spark is on sys.path."""
    out = {}
    for key, sym, as_of in [
            ("multi_latest", "multi", None), ("multi_v0", "multi", 0),
            ("multi_v1", "multi", 1), ("multi_snap", "multi", "snap_v1"),
            ("u64", "u64", None), ("tz", "tz", None),
            ("staged", "staged", None)]:
        out[key] = lib.read(sym, as_of=as_of, output_format="pandas")
    out["pick"] = lib.read("pick")   # pickled symbol: read returns the object
    out["meta_v_latest"] = lib.read_metadata("multi").metadata
    out["versions"] = sorted(v["version"] if isinstance(v, dict) else v.version
                             for v in lib.list_versions("multi"))
    return out


def _mk_session():
    from arcticdb_spark import get_spark
    return get_spark()


def do_write(root: str) -> None:
    import arcticdb_spark
    from arcticdb_spark.catalog import Arctic
    spark = _mk_session()
    base, app, upd, u64, tz, st1, st2 = _frames()
    ac = Arctic(root, spark)
    ac.create_library("compat")
    lib = ac["compat"]
    lib.write("multi", base)                       # v0
    lib.append("multi", app)                       # v1
    lib.snapshot("snap_v1")
    lib.update("multi", upd, metadata={"round": "writer", "k": 1})  # v2
    lib.write("u64", u64)
    lib.write("tz", tz)
    lib.stage("staged", st2)
    lib.stage("staged", st1)
    lib.sort_and_finalize_staged_data("staged")
    lib.write_pickle("pick", {"a": [1, 2, 3], "b": "text"})
    expected = _read_all(lib)
    with open(os.path.join(root, "_expected.pkl"), "wb") as f:
        pickle.dump({"frames": expected,
                     "writer_path": os.path.dirname(
                         os.path.dirname(arcticdb_spark.__file__))}, f)
    print("WRITE_OK", flush=True)
    spark.stop()


def do_read(root: str) -> None:
    import pandas as pd
    from arcticdb_spark.catalog import Arctic
    spark = _mk_session()
    with open(os.path.join(root, "_expected.pkl"), "rb") as f:
        exp = pickle.load(f)["frames"]
    ac = Arctic(root, spark)
    lib = ac["compat"]
    got = _read_all(lib)
    for key in exp:
        if isinstance(exp[key], pd.DataFrame):
            pd.testing.assert_frame_equal(got[key], exp[key])
        else:
            assert got[key] == exp[key], (key, got[key], exp[key])
    # lifecycle ops on the old library with HEAD code
    base, app, upd, u64, tz, st1, st2 = _frames()
    nxt = app.copy()
    nxt.index = nxt.index + pd.Timedelta(hours=6)
    m = lib.append("multi", nxt)                   # v3 on old storage
    assert m.version == 3, m.version
    lib.restore_version("multi", as_of=0)          # v4 == v0 content
    pd.testing.assert_frame_equal(lib.read("multi", output_format="pandas"),
                                  exp["multi_v0"])
    lib.prune_previous_versions("multi")
    # snapshot written by the OLD code must still pin v1 through the prune
    pd.testing.assert_frame_equal(
        lib.read("multi", as_of="snap_v1", output_format="pandas"),
        exp["multi_v1"])
    lib.delete_snapshot("snap_v1")
    assert lib.list_snapshots() in ({}, []) or \
        "snap_v1" not in lib.list_snapshots()
    print("READ_OK", flush=True)
    spark.stop()


def _run(pythonpath: str, mode: str, root: str) -> None:
    env = dict(os.environ, PYTHONPATH=pythonpath)
    r = subprocess.run([sys.executable, os.path.abspath(__file__), mode, root],
                       env=env, capture_output=True, text=True, timeout=900)
    marker = "WRITE_OK" if mode == "write" else "READ_OK"
    if marker not in r.stdout:
        sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-6000:])
        raise SystemExit(f"{mode} subprocess failed for {root}")


def main() -> None:
    results = {}
    os.makedirs(SCRATCH, exist_ok=True)
    for tag, commit in WRITERS.items():
        wt = os.path.join(SCRATCH, f"wt_{tag}")
        if not os.path.isdir(wt):
            subprocess.run(["git", "-C", REPO, "worktree", "add", "--detach",
                            wt, commit], check=True, capture_output=True)
        root = os.path.join(SCRATCH, f"lib_{tag}")
        if os.path.isdir(root):
            import shutil
            shutil.rmtree(root)
        os.makedirs(root)
        print(f"[{tag}] writing with {commit} ...", flush=True)
        _run(wt, "write", root)
        print(f"[{tag}] reading with HEAD ...", flush=True)
        _run(REPO, "read", root)
        results[tag] = {"writer_commit": commit, "status": "green"}
        print(f"[{tag}] GREEN", flush=True)
    out = os.path.join(REPO, "COMPAT_AB.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] in ("write", "read"):
        sys.path.insert(0, os.environ.get("PYTHONPATH", REPO).split(":")[0])
        (do_write if sys.argv[1] == "write" else do_read)(sys.argv[2])
    else:
        main()
