"""Port of the reference's test_append_compact_data.py (unit/arcticdb/
version_store/test_append_compact_data.py): ``append(compact_data=True)``
runs the CompactDataClause inline — ONE new version, the appended frame
treated as one row slice, in-bounds existing slices untouched, frame
remainder resliced by ReslicingInfo (version_core.cpp:3155-3320).

Adaptations: no query-stats counters (slice layout + version_id column of
read_index pin the same accounting); polars sparse checks become pandas
equality; column slicing is a non-axis (parquet scans prune columns).
"""

import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow


from arcticdb_spark.catalog import Arctic
from arcticdb_spark.plans.compact import compact_bounds


def _lib(spark, tmp_path, rows_per_file=100_000, name="acd", **kw):
    return Arctic(str(tmp_path), spark).create_library(
        name, rows_per_file=rows_per_file, **kw)


def generic_append_compact_data_test(lib, sym, df, **append_kwargs):
    """Port of generic_append_compact_data_test:34-72."""
    before = lib.read(sym, output_format="pandas")
    before_version = lib._load_ref(sym)["latest"]
    oracle_sym = sym + "_oracle"
    lib.write(oracle_sym, before)
    lib.append(oracle_sym, df, compact_data=False, **append_kwargs)
    expected = lib.read(oracle_sym, output_format="pandas")
    lib.append(sym, df, compact_data=True, **append_kwargs)
    # ONE new version (reference: inline compaction is atomic)
    after_version = lib._load_ref(sym)["latest"]
    assert after_version == before_version + 1
    received = lib.read(sym, output_format="pandas")
    pd.testing.assert_frame_equal(expected, received)
    post_idx = lib.read_index(sym)
    counts = post_idx["end_row"] - post_idx["start_row"]
    min_r, max_r = compact_bounds(lib.rows_per_file)
    min_r = min(min_r, len(expected))
    assert counts.min() >= min_r, list(counts)
    assert counts.max() <= max_r, list(counts)
    # a follow-up compaction would be a no-op
    assert not lib.compact_data_explain_plan(sym).will_do_work


@pytest.mark.parametrize("index", [None, "ts"])
def test_basic(spark, tmp_path, index):
    """Port of test_basic:75-86."""
    lib = _lib(spark, tmp_path)
    sym = "test_basic"
    df_0 = pd.DataFrame({"col": np.arange(20)},
                        index=None if index is None
                        else pd.date_range("2026-01-01", periods=20))
    lib.write(sym, df_0)
    df_1 = pd.DataFrame({"col": np.arange(20, 30)},
                        index=None if index is None
                        else pd.date_range("2026-01-21", periods=10))
    generic_append_compact_data_test(lib, sym, df_1)


def test_frequent_append_compact_once(spark, tmp_path):
    """Port of test_frequent_append_io_counts_compact_once:89-105 (scaled
    10x; the IO counters become the 2-slice layout + all-new version_ids)."""
    lib = _lib(spark, tmp_path)
    sym = "freq_once"
    df = pd.DataFrame({"col": np.arange(20_000)},
                      index=pd.date_range("2026-01-01", freq="s",
                                          periods=20_000))
    lib.write(sym, df[:2_000])
    for idx in range(1, 9):
        lib.append(sym, df[idx * 2_000:(idx + 1) * 2_000])
    lib.append(sym, df[9 * 2_000:], compact_data=True)
    received = lib.read(sym, output_format="pandas")
    pd.testing.assert_frame_equal(df, received, check_freq=False)
    idx_df = lib.read_index(sym)
    assert len(idx_df) == 1          # 20k rows < 100k target: one slice
    assert (idx_df["version_id"] == lib._load_ref(sym)["latest"]).all()


def test_compact_every_time(spark, tmp_path):
    """Port of test_frequent_append_io_counts_compact_every_time:108-123
    (scaled row counts, default segment size like the reference): each
    compacting append leaves <= 2 slices."""
    lib = _lib(spark, tmp_path)
    sym = "freq_every"
    df = pd.DataFrame({"col": np.arange(5_000)},
                      index=pd.date_range("2026-01-01", freq="s",
                                          periods=5_000))
    for idx in range(10):
        lib.append(sym, df[idx * 500:(idx + 1) * 500], compact_data=True)
        received = lib.read(sym, output_format="pandas")
        pd.testing.assert_frame_equal(df[:(idx + 1) * 500], received,
                                      check_freq=False)
        assert len(lib.read_index(sym)) <= 2


@pytest.mark.parametrize("index", [None, "ts"])
def test_series(spark, tmp_path, index):
    """Port of test_series:146-164."""
    lib = _lib(spark, tmp_path)
    sym = "test_series"
    s0 = pd.Series(np.arange(20), index=None if index is None
                   else pd.date_range("2026-01-01", periods=20))
    lib.write(sym, s0)
    s1 = pd.Series(np.arange(20, 30), index=None if index is None
                   else pd.date_range("2026-01-21", periods=10))
    lib.append(sym, s1, compact_data=True)
    assert lib._load_ref(sym)["latest"] == 1
    expected = pd.concat([s0, s1])
    if index is None:
        expected.reset_index(drop=True, inplace=True)
    out = lib.read(sym, output_format="pandas")
    pd.testing.assert_series_equal(expected, out, check_freq=False)
    assert len(lib.read_index(sym)) == 1


def test_numpy_arrays(spark, tmp_path):
    """Port of test_numpy_arrays:167-183 (ndarray appends follow the
    ndarray path; compact_data applies afterwards as a plain compact)."""
    lib = _lib(spark, tmp_path)
    sym = "np_arr"
    lib.write(sym, np.arange(20))
    lib.append(sym, np.arange(20, 30))
    assert (lib.read(sym) == np.arange(30)).all()
    lib.compact_data(sym)
    assert (lib.read(sym) == np.arange(30)).all()
    assert len(lib.read_index(sym)) == 1


def test_existing_zero_rows(spark, tmp_path):
    """Port of test_existing_zero_rows:186-193."""
    lib = _lib(spark, tmp_path, rows_per_file=10)
    sym = "zero_rows"
    lib.write(sym, pd.DataFrame({"col": np.arange(0)}))
    df_1 = pd.DataFrame({"col": np.arange(15)},
                        index=pd.date_range("2026-01-21", periods=15))
    # first non-empty append onto an empty symbol decides types/index —
    # a write-like replace; compaction then has nothing to do
    lib.append(sym, df_1, compact_data=True)
    out = lib.read(sym, output_format="pandas")
    pd.testing.assert_frame_equal(df_1, out, check_freq=False)


def test_metadata(spark, tmp_path):
    """Port of test_metadata:215-223."""
    lib = _lib(spark, tmp_path)
    sym = "test_metadata"
    lib.write(sym, pd.DataFrame({"col": [0]}), metadata="0")
    lib.append(sym, pd.DataFrame({"col": [1]}), metadata="1",
               compact_data=True)
    assert lib.read_metadata(sym).metadata == "1"
    out = lib.read(sym, output_format="pandas")
    pd.testing.assert_frame_equal(out, pd.DataFrame({"col": [0, 1]}))
    assert len(lib.read_index(sym)) == 1


@pytest.mark.parametrize("index", [None, "ts"])
def test_compact_whole_symbol(spark, tmp_path, index):
    """Port of test_compact_whole_symbol:227-234."""
    lib = _lib(spark, tmp_path, rows_per_file=10)
    sym = "whole"
    df = pd.DataFrame({"col": np.arange(20)},
                      index=None if index is None
                      else pd.date_range("2026-01-01", periods=20))
    lib.write(sym, df[:5])
    lib.append(sym, df[5:10])
    lib.append(sym, df[10:15])
    generic_append_compact_data_test(lib, sym, df[15:])
    assert [int(c) for c in (lambda i: i["end_row"] - i["start_row"])(
        lib.read_index(sym))] == [10, 10]


@pytest.mark.parametrize("index", [None, "ts"])
def test_compact_leftover_slices(spark, tmp_path, index):
    """Port of test_compact_leftover_slices:238-243."""
    lib = _lib(spark, tmp_path, rows_per_file=10)
    sym = "leftover"
    df = pd.DataFrame({"col": np.arange(20)},
                      index=None if index is None
                      else pd.date_range("2026-01-01", periods=20))
    lib.write(sym, df[:5])
    generic_append_compact_data_test(lib, sym, df[5:])
    assert [int(c) for c in (lambda i: i["end_row"] - i["start_row"])(
        lib.read_index(sym))] == [10, 10]


def test_existing_data_compacted_noop(spark, tmp_path):
    """Port of test_existing_data_compacted:246-251: a 10-row slice at
    rps=10 is in-bounds, and so is the 10-row frame — plain append."""
    lib = _lib(spark, tmp_path, rows_per_file=10)
    sym = "noop"
    df = pd.DataFrame({"col": np.arange(20)})
    lib.write(sym, df[:10])
    generic_append_compact_data_test(lib, sym, df[10:])


@pytest.mark.parametrize("total_rows", [25, 30, 35])
def test_tail_of_existing_data_already_compacted(spark, tmp_path,
                                                 total_rows):
    """Port of test_tail_of_existing_data_already_compacted:254-263."""
    lib = _lib(spark, tmp_path, rows_per_file=10)
    sym = "tail_compacted"
    df = pd.DataFrame({"col": np.arange(total_rows)})
    lib.write(sym, df[:5])
    lib.append(sym, df[5:10])
    lib.append(sym, df[10:20])
    assert len(lib.read_index(sym)) == 3
    generic_append_compact_data_test(lib, sym, df[20:])


@pytest.mark.parametrize("segment_row_size", [100_000, 10, 5])
def test_dynamic_schema_col_ordering(spark, tmp_path, segment_row_size):
    """Port of test_dynamic_schema_col_ordering:266-288."""
    lib = _lib(spark, tmp_path, rows_per_file=segment_row_size,
               dynamic_schema=True)
    sym = "dyn_cols"
    df_0 = pd.DataFrame({"col_0": np.arange(20, dtype=np.float64),
                         "col_1": np.arange(20, 40, dtype=np.float64),
                         "col_2": np.arange(40, 60, dtype=np.float64)},
                        index=pd.date_range("2026-01-01", periods=20))
    lib.write(sym, df_0)
    df_1 = pd.DataFrame({"col_3": np.arange(100, 110, dtype=np.float64),
                         "col_2": np.arange(60, 70, dtype=np.float64),
                         "col_1": np.arange(40, 50, dtype=np.float64)},
                        index=pd.date_range("2026-01-21", periods=10))
    generic_append_compact_data_test(lib, sym, df_1)


@pytest.mark.parametrize("segment_row_size", [100_000, 10, 5])
def test_dynamic_schema_type_promotion(spark, tmp_path, segment_row_size):
    """Port of test_dynamic_schema_type_promotion:291-310."""
    lib = _lib(spark, tmp_path, rows_per_file=segment_row_size,
               dynamic_schema=True)
    sym = "dyn_types"
    df_0 = pd.DataFrame({"col_0": np.arange(20, dtype=np.float64),
                         "col_1": np.arange(20, 40, dtype=np.uint8),
                         "col_2": np.arange(40, 60, dtype=np.int16)})
    lib.write(sym, df_0)
    df_1 = pd.DataFrame({"col_0": np.arange(100, 110, dtype=np.int32),
                         "col_1": np.arange(60, 70, dtype=np.uint16),
                         "col_2": np.arange(40, 50, dtype=np.uint16)})
    generic_append_compact_data_test(lib, sym, df_1)


@pytest.mark.parametrize("names", [None, ["ts", None], [None, "level 2"],
                                   ["ts", "level 2"]])
def test_multiindex(spark, tmp_path, names):
    """Port of test_multiindex:330-351."""
    lib = _lib(spark, tmp_path, rows_per_file=10)
    sym = "multiindex"
    num_rows = 20
    df = pd.DataFrame(
        {"col": np.arange(num_rows)},
        index=pd.MultiIndex.from_product(
            [pd.date_range("2026-01-01", periods=num_rows // 2),
             ["GOOG", "AAPL"]], names=names))
    lib.write(sym, df[:5])
    lib.append(sym, df[5:], compact_data=True)
    assert lib._load_ref(sym)["latest"] == 1
    out = lib.read(sym, output_format="pandas")
    pd.testing.assert_frame_equal(df, out)
    assert len(lib.read_index(sym)) == 2


def test_string_none_nan_handling(spark, tmp_path):
    """Port of test_string_none_nan_handling:354-359."""
    lib = _lib(spark, tmp_path)
    sym = "str_none"
    df = pd.DataFrame({"col": ["hello", None, None, None, None,
                               None, None, None, None, None]})
    lib.write(sym, df[:5])
    generic_append_compact_data_test(lib, sym, df[5:])


def test_append_empty_frame_compacts_existing_data(spark, tmp_path):
    """Port of test_append_empty_frame_compacts_existing_data:383-405."""
    lib = _lib(spark, tmp_path, rows_per_file=10)
    sym = "empty_compacts"
    lib.write(sym, pd.DataFrame({"col": np.arange(5)}))
    lib.append(sym, pd.DataFrame({"col": np.arange(5, 10)}))
    lib.append(sym, pd.DataFrame())
    assert lib._load_ref(sym)["latest"] == 2
    assert len(lib.read_index(sym)) == 2
    lib.append(sym, pd.DataFrame(), compact_data=True)
    assert lib._load_ref(sym)["latest"] == 3
    assert len(lib.read_index(sym)) == 1
    out = lib.read(sym, output_format="pandas")
    assert out["col"].tolist() == list(range(10))


@pytest.mark.parametrize("rows_to_append", [5, 10, 15, 20])
def test_fortran_ordered_data(spark, tmp_path, rows_to_append):
    """Port of test_fortran_ordered_data:408-416."""
    rng = np.random.default_rng(3)
    lib = _lib(spark, tmp_path, rows_per_file=10)
    sym = "fortran"
    cols = ["col_0", "col_1"]
    df_0 = pd.DataFrame(rng.integers(0, 100, size=(5, 2)), columns=cols)
    lib.write(sym, df_0)
    df_1 = pd.DataFrame(rng.integers(0, 100, size=(rows_to_append, 2)),
                        columns=cols)
    generic_append_compact_data_test(lib, sym, df_1)


def test_column_filtered_read(spark, tmp_path):
    """Port of test_column_filtered_read:419-438 (ts-indexed variant)."""
    lib = _lib(spark, tmp_path, rows_per_file=10)
    sym = "col_filtered"
    num_rows = 20
    df = pd.DataFrame({"col_a": np.arange(num_rows),
                       "col_b": np.arange(num_rows, 2 * num_rows),
                       "col_c": np.arange(2 * num_rows, 3 * num_rows)},
                      index=pd.date_range("2026-01-01", periods=num_rows))
    lib.write(sym, df[:5])
    for i in range(1, 4):
        generic_append_compact_data_test(lib, sym, df[i * 5:(i + 1) * 5])
    pd.testing.assert_frame_equal(
        df[["col_a"]], lib.read(sym, columns=["col_a"],
                                output_format="pandas"), check_freq=False)
    pd.testing.assert_frame_equal(
        df[["col_b", "col_c"]],
        lib.read(sym, columns=["col_b", "col_c"], output_format="pandas"),
        check_freq=False)


@pytest.mark.parametrize("rows_per_segment", [3, 10])
def test_date_range_read(spark, tmp_path, rows_per_segment):
    """Port of test_date_range_read:441-457 (scaled to 8 appends)."""
    lib = _lib(spark, tmp_path, rows_per_file=rows_per_segment)
    sym = "dr_read"
    num_rows = 45
    index = pd.date_range("2026-01-01", periods=num_rows)
    df = pd.DataFrame({"ints": np.arange(num_rows)}, index=index)
    lib.write(sym, df[:5])
    for i in range(1, 9):
        generic_append_compact_data_test(lib, sym, df[i * 5:(i + 1) * 5])
    mid = index[num_rows // 2]
    pd.testing.assert_frame_equal(
        df[:mid], lib.read(sym, date_range=(index[0], mid),
                           output_format="pandas"), check_freq=False)
    pd.testing.assert_frame_equal(
        df[mid:], lib.read(sym, date_range=(mid, index[-1]),
                           output_format="pandas"), check_freq=False)


def test_read_previous_version(spark, tmp_path):
    """Port of test_read_previous_version:460-468."""
    lib = _lib(spark, tmp_path)
    sym = "prev_ver"
    df = pd.DataFrame({"col": np.arange(10)})
    lib.write(sym, df[:5])
    generic_append_compact_data_test(lib, sym, df[5:])
    pd.testing.assert_frame_equal(
        df[:5], lib.read(sym, as_of=0, output_format="pandas"))
    pd.testing.assert_frame_equal(
        df, lib.read(sym, as_of=1, output_format="pandas"))
    pd.testing.assert_frame_equal(df, lib.read(sym, output_format="pandas"))


def test_schema_mismatch_static(spark, tmp_path):
    """Port of test_schema_mismatch_static:471-493: errors identical with
    and without compact_data (validation runs before compaction)."""
    lib = _lib(spark, tmp_path)
    sym = "mismatch"
    lib.write(sym, pd.DataFrame({"col_0": [0]}))
    for bad in (pd.DataFrame({"col_1": [0]}),
                pd.DataFrame({"col_0": ["hello"]})):
        with pytest.raises(Exception) as e_without:
            lib.append(sym, bad)
        with pytest.raises(Exception) as e_with:
            lib.append(sym, bad, compact_data=True)
        assert e_with.type == e_without.type
        assert str(e_with.value) == str(e_without.value)


def test_schema_mismatch_dynamic(spark, tmp_path):
    """Port of test_schema_mismatch_dynamic:496-508."""
    lib = _lib(spark, tmp_path, dynamic_schema=True)
    sym = "mismatch_dyn"
    lib.write(sym, pd.DataFrame({"col_0": [0]}))
    bad = pd.DataFrame({"col_0": ["hello"]})
    with pytest.raises(Exception) as e_without:
        lib.append(sym, bad)
    with pytest.raises(Exception) as e_with:
        lib.append(sym, bad, compact_data=True)
    assert e_with.type == e_without.type
    assert str(e_with.value) == str(e_without.value)
