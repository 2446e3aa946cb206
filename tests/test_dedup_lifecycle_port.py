"""Port of the reference's integration test_dedup.py lifecycle semantics:
with write-dedup on, identical segments are SHARED between versions, and
deleting/pruning one of the sharing versions must never break the others.
Physical key-count assertions are relaxed to inequalities — this engine's
content-hash dedup also reuses position-shifted identical slices, which
the reference's (start_row, end_row)-matched dedup does not."""

import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow


from arcticdb_spark.catalog import Arctic, NoSuchVersionException


@pytest.fixture()
def lib(spark, tmp_path):
    from arcticdb_spark.catalog import LibraryOptions
    return Arctic(str(tmp_path), spark).create_library(
        "dd", rows_per_file=25,
        library_options=LibraryOptions(dedup=True, rows_per_segment=25))


def _paths(lib, sym, v):
    return {fe.path for fe in lib._load_manifest(sym, v).files}


def test_basic_de_dup(lib):
    """Port of test_basic_de_dup:42-65: rewriting a longer frame whose
    prefix matches shares the prefix files."""
    sym = "basic"
    df1 = pd.DataFrame({"x": np.arange(0, 100, dtype=np.int64)})
    lib.write(sym, df1)
    n1 = len(_paths(lib, sym, 0))
    df2 = pd.DataFrame({"x": np.arange(100, 200, dtype=np.int64)})
    new_df = pd.concat([df1, df2], ignore_index=True)
    lib.write(sym, new_df)
    pd.testing.assert_frame_equal(lib.read(sym, output_format="pandas"),
                                  new_df)
    shared = _paths(lib, sym, 0) & _paths(lib, sym, 1)
    assert len(shared) == n1          # the whole prefix deduped


def test_de_dup_same_value_written(lib):
    """Port of test_de_dup_same_value_written:68-89: an identical rewrite
    adds a version but no data files; prune keeps the data readable."""
    sym = "same"
    df1 = pd.DataFrame({"x": np.arange(0, 100, dtype=np.int64)})
    lib.write(sym, df1)
    p0 = _paths(lib, sym, 0)
    lib.write(sym, df1)
    assert len(lib.list_versions(sym)) == 2
    assert _paths(lib, sym, 1) == p0
    lib.write(sym, df1, prune_previous_versions=True)
    assert len(lib.list_versions(sym)) == 1
    pd.testing.assert_frame_equal(lib.read(sym, output_format="pandas"),
                                  df1)


def test_de_dup_with_delete(lib):
    """Port of test_de_dup_with_delete:92-146 (content semantics): shared
    files survive deleting one of the sharing versions; every remaining
    version reads exactly."""
    sym = "del"
    df1 = pd.DataFrame({"x": np.arange(0, 100, dtype=np.int64)},
                       index=np.arange(0, 100))
    lib.write(sym, df1)
    df2 = pd.DataFrame({"x": np.arange(100, 200, dtype=np.int64)},
                       index=np.arange(100, 200))
    new_df = pd.concat([df1, df2])
    lib.write(sym, new_df)                      # v1 shares v0's prefix
    df3 = pd.DataFrame({"x": np.arange(200, 300, dtype=np.int64)},
                       index=np.arange(200, 300))
    final_df = pd.concat([df2, df3])
    lib.write(sym, final_df)                    # v2
    pd.testing.assert_frame_equal(lib.read(sym, output_format="pandas"),
                                  final_df)
    pd.testing.assert_frame_equal(
        lib.read(sym, as_of=1, output_format="pandas"), new_df)
    pd.testing.assert_frame_equal(
        lib.read(sym, as_of=0, output_format="pandas"), df1)
    # delete the middle version: v0 and v2 keep reading exactly,
    # including any files v1 shared with them
    lib.delete_version(sym, 1)
    pd.testing.assert_frame_equal(lib.read(sym, output_format="pandas"),
                                  final_df)
    pd.testing.assert_frame_equal(
        lib.read(sym, as_of=0, output_format="pandas"), df1)
    with pytest.raises(NoSuchVersionException):
        lib.read(sym, as_of=1)
    # delete the latest: v0 is the only survivor and still reads
    lib.delete_version(sym, 2)
    pd.testing.assert_frame_equal(lib.read(sym, output_format="pandas"),
                                  df1)
    # a fresh write with prune leaves one clean version
    lib.write(sym, final_df, prune_previous_versions=True)
    pd.testing.assert_frame_equal(lib.read(sym, output_format="pandas"),
                                  final_df)
    live = [v for v in lib.list_versions(sym) if not v["deleted"]]
    assert len(live) == 1


def test_de_dup_with_snapshot(lib):
    """Port of test_de_dup_with_snapshot:198-237 (content semantics): a
    snapshot pinning a version that SHARES files with later versions keeps
    reading after those later versions are pruned."""
    sym = "snap"
    df1 = pd.DataFrame({"x": np.arange(0, 100, dtype=np.int64)})
    lib.write(sym, df1)
    lib.snapshot("s1")
    df2 = pd.concat([df1, pd.DataFrame(
        {"x": np.arange(100, 200, dtype=np.int64)})], ignore_index=True)
    lib.write(sym, df2)                          # shares v0's files
    lib.write(sym, df2, prune_previous_versions=True)
    pd.testing.assert_frame_equal(
        lib.read(sym, as_of="s1", output_format="pandas"), df1)
    pd.testing.assert_frame_equal(lib.read(sym, output_format="pandas"),
                                  df2)
    lib.delete_snapshot("s1")
    pd.testing.assert_frame_equal(lib.read(sym, output_format="pandas"),
                                  df2)
