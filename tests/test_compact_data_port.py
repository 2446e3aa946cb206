"""Port of the reference's test_compact_data.py (unit/arcticdb/
version_store/test_compact_data.py) against the reference-exact
CompactDataClause planning in plans/compact.py.

Adaptations for this engine (documented in PARITY.md):
- no query-stats counters (the plan itself is asserted instead: explain
  reads only the manifest; kept slices retain their original writing
  version, visible through read_index's version_id column);
- polars sparse-output checks become pandas equality;
- no column slicing (parquet is columnar — column selection prunes at the
  scan, so the column_group_size axis is moot);
- fixed-width vs dynamic strings is a non-axis (strings are always
  parquet BYTE_ARRAY).
"""

import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow


from arcticdb_spark.catalog import Arctic, ArcticException, SchemaException
from arcticdb_spark.exceptions import StorageException
from arcticdb_spark.plans.compact import compact_bounds


def _lib(spark, tmp_path, rows_per_file=100_000, name="cd", **kw):
    return Arctic(str(tmp_path), spark).create_library(
        name, rows_per_file=rows_per_file, **kw)


def check_compact_data_info(info, pre_version, post_version, pre_idx,
                            post_idx):
    """Port of test_compact_data.py check_compact_data_info:32-52."""
    assert info.version_id_before == pre_version
    assert info.version_id_after == post_version
    assert info.will_do_work == (pre_version != post_version)
    before = info.row_slices_before
    assert info.num_row_slices_before == max(len(before) - 1, 0)
    for i, row in enumerate(pre_idx.itertuples()):
        assert row.start_row == before[i]
        assert row.end_row == before[i + 1]
    after = info.row_slices_after
    assert info.num_row_slices_after == max(len(after) - 1, 0)
    for i, row in enumerate(post_idx.itertuples()):
        assert row.start_row == after[i]
        assert row.end_row == after[i + 1]


def generic_compact_data_test(lib, sym, method_arg=None):
    """Port of test_compact_data.py generic_compact_data_test:55-112."""
    expected = lib.read(sym, output_format="pandas")
    pre_idx = lib.read_index(sym)
    pre_version = lib._load_ref(sym)["latest"]
    info = lib.compact_data_explain_plan(sym, rows_per_segment=method_arg)
    m = lib.compact_data(sym, rows_per_segment=method_arg)
    rps = method_arg if method_arg is not None else lib.rows_per_file
    received = lib.read(sym, output_format="pandas")
    pd.testing.assert_frame_equal(expected, received)
    post_idx = lib.read_index(sym)
    counts = post_idx["end_row"] - post_idx["start_row"]
    min_r, max_r = compact_bounds(rps)
    min_r = min(min_r, len(expected))
    assert counts.min() >= min_r, list(counts)
    assert counts.max() <= max_r, list(counts)
    # kept slices retain their original writing version; rewritten ones
    # carry the new version (the reference pins the same accounting via
    # query-stats GetObject/PutObject counts)
    new_keys = int((post_idx["version_id"] == m.version).sum())
    kept_keys = len(post_idx) - new_keys
    assert kept_keys == sum(
        1 for row in post_idx.itertuples()
        if (row.start_row, row.end_row) in
        {(r.start_row, r.end_row) for r in pre_idx.itertuples()}
        and row.version_id < m.version)
    check_compact_data_info(info, pre_version, m.version, pre_idx, post_idx)
    generic_compact_data_test_noop(lib, sym, rps)


def generic_compact_data_test_noop(lib, sym, rows_per_segment=None):
    """Port of generic_compact_data_test_noop:115-153."""
    expected = lib.read(sym, output_format="pandas")
    pre_idx = lib.read_index(sym)
    pre_version = lib._load_ref(sym)["latest"]
    info = lib.compact_data_explain_plan(sym,
                                         rows_per_segment=rows_per_segment)
    assert info.num_row_slices_before == info.num_row_slices_after
    assert info.row_slices_before == info.row_slices_after
    assert info.version_id_before == info.version_id_after
    assert not info.will_do_work
    m = lib.compact_data(sym, rows_per_segment=rows_per_segment)
    assert m.version == pre_version
    received = lib.read(sym, output_format="pandas")
    pd.testing.assert_frame_equal(expected, received)
    post_idx = lib.read_index(sym)
    pd.testing.assert_frame_equal(post_idx, pre_idx)
    check_compact_data_info(info, pre_version, m.version, pre_idx, post_idx)


def test_compact_data_explain_plan(spark, tmp_path):
    """Port of test_compact_data_explain_plan:156-185."""
    lib = _lib(spark, tmp_path, rows_per_file=10)
    sym = "test_compact_data_explain_plan"
    lib.write(sym, pd.DataFrame({"col": [0, 1, 2, 3, 4]}))
    lib.append(sym, pd.DataFrame({"col": [5, 6, 7, 8, 9]}))
    info = lib.compact_data_explain_plan(sym)
    info_again = lib.compact_data_explain_plan(sym)
    assert str(info) == str(info_again)
    assert info.num_row_slices_before == 2
    assert info.num_row_slices_after == 1
    assert info.row_slices_before == [0, 5, 10]
    assert info.row_slices_after == [0, 10]
    assert info.version_id_before == 1
    assert info.version_id_after == 2
    assert info.will_do_work

    lib.compact_data(sym)
    info = lib.compact_data_explain_plan(sym)
    assert info.num_row_slices_before == 1
    assert info.num_row_slices_after == 1
    assert info.row_slices_before == [0, 10]
    assert info.row_slices_after == [0, 10]
    assert info.version_id_before == 2
    assert info.version_id_after == 2
    assert not info.will_do_work


def test_compact_data_docstring_example(spark, tmp_path):
    """Port of test_compact_data_explain_plan_docstring_example:188-210
    (scaled 10x down — Spark job floor, same slice arithmetic)."""
    lib = _lib(spark, tmp_path)
    df = pd.DataFrame({"col": np.arange(10_000)})
    for idx in range(10):
        lib.append("sym", df[idx * 1_000:(idx + 1) * 1_000])
    info = lib.compact_data_explain_plan("sym")
    assert info.row_slices_before == list(range(0, 11_000, 1_000))
    assert info.row_slices_after == [0, 10_000]
    assert info.num_row_slices_before == 10
    assert info.num_row_slices_after == 1
    assert info.version_id_before == 9
    assert info.version_id_after == 10
    assert info.will_do_work
    assert len(lib.read_index("sym")) == 10
    lib.compact_data("sym")
    assert len(lib.read_index("sym")) == 1
    out = lib.read("sym", output_format="pandas")
    assert out["col"].tolist() == list(range(10_000))


def test_compact_data_symbol_doesnt_exist(spark, tmp_path):
    """Port of test_compact_data_symbol_doesnt_exist:224-229."""
    lib = _lib(spark, tmp_path)
    sym = "test_compact_data_symbol_doesnt_exist"
    with pytest.raises(StorageException) as e:
        lib.compact_data(sym)
    assert sym in str(e.value)


@pytest.mark.parametrize("rows_per_segment", [0, -1, -100_000])
def test_compact_data_invalid_rows_per_segment(spark, tmp_path,
                                               rows_per_segment):
    """Port of test_compact_data_invalid_rows_per_segment:232-237 —
    validated before storage is touched (the symbol doesn't exist)."""
    lib = _lib(spark, tmp_path)
    with pytest.raises(ArcticException):
        lib.compact_data("missing", rows_per_segment=rows_per_segment)


def test_compact_data_maintain_metadata(spark, tmp_path):
    """Port of test_compact_data_maintain_metadata:240-250."""
    lib = _lib(spark, tmp_path)
    sym = "test_compact_data_maintain_metadata"
    df = pd.DataFrame({"col": np.arange(10)})
    lib.write(sym, df)
    metadata = {"hello": "world"}
    lib.append(sym, df, metadata=metadata)
    assert lib.read_metadata(sym).metadata == metadata
    lib.compact_data(sym)
    assert len(lib.read_index(sym)) == 1
    assert lib.read_metadata(sym).metadata == metadata


@pytest.mark.parametrize("method_argument", [1, 8, 13, 100])
def test_compact_data_widely_varying_row_counts(spark, tmp_path,
                                                method_argument):
    """Port of test_compact_data_widely_varying_row_counts:282-302."""
    rng = np.random.default_rng(7)
    lib = _lib(spark, tmp_path, rows_per_file=100)
    sym = "varying"
    df = pd.DataFrame({
        "ints": np.arange(303, dtype=np.int64),
        "floats": np.arange(303, dtype=np.float32),
        "bools": rng.random(303) > 0.5,
        "strings": 101 * ["hello", "bonjour", "gutentag"],
    })
    lib.write(sym, df[:100])
    lib.append(sym, df[100:101])
    lib.append(sym, df[101:201])
    lib.append(sym, df[201:202])
    lib.append(sym, df[202:302])
    lib.append(sym, df[302:])
    generic_compact_data_test(lib, sym, method_argument)


@pytest.mark.parametrize("rows_per_segment", [1, 3, 7])
@pytest.mark.parametrize("initial_rows,append_rows", [(20, 1), (23, 5),
                                                      (29, 10)])
def test_compact_data_append(spark, tmp_path, rows_per_segment,
                             initial_rows, append_rows):
    """Port of test_compact_data_append:305-332 (pandas input; the arrow
    sparse columns are covered by test_arrow_sparse.py)."""
    rng = np.random.default_rng(11)
    lib = _lib(spark, tmp_path, rows_per_file=rows_per_segment)
    sym = "test_compact_data_append"
    n = initial_rows + append_rows
    df = pd.DataFrame({
        "ints": np.arange(n, dtype=np.int64),
        "floats": np.arange(n, 2 * n, dtype=np.float32),
        "bools": rng.random(n) > 0.5,
        "strings": [f"s{i % 5}" for i in range(n)],
    })
    lib.write(sym, df[:initial_rows])
    lib.append(sym, df[initial_rows:])
    generic_compact_data_test(lib, sym)


def test_compact_data_update(spark, tmp_path):
    """Port of test_compact_data_update:335-380 (one representative
    parameterization; update fragments the middle of the symbol)."""
    lib = _lib(spark, tmp_path, rows_per_file=7)
    sym = "test_compact_data_update"
    idx = pd.date_range("2026-01-01", periods=25, name="ts")
    df = pd.DataFrame({"ints": np.arange(25, dtype=np.int64),
                       "strings": [f"s{i % 3}" for i in range(25)]},
                      index=idx)
    lib.write(sym, df)
    upd = pd.DataFrame({"ints": np.arange(100, 103, dtype=np.int64),
                        "strings": ["u0", "u1", "u2"]},
                       index=pd.date_range("2026-01-15", periods=3,
                                           name="ts"))
    lib.update(sym, upd)
    generic_compact_data_test(lib, sym)


@pytest.mark.parametrize("names", [None, ["ts", None], [None, "level 2"],
                                   ["ts", "level 2"]])
def test_compact_data_multiindex(spark, tmp_path, names):
    """Port of test_compact_data_multiindex:395-409."""
    lib = _lib(spark, tmp_path, rows_per_file=100)
    sym = "test_compact_data_multiindex"
    num_rows = 100
    df = pd.DataFrame(
        {"col": np.arange(num_rows)},
        index=pd.MultiIndex.from_product(
            [pd.date_range("2026-01-01", periods=num_rows // 2),
             ["GOOG", "AAPL"]], names=names))
    lib.write(sym, df[:num_rows // 2])
    lib.append(sym, df[num_rows // 2:])
    generic_compact_data_test(lib, sym)


def test_compact_data_many_appends(spark, tmp_path):
    """Port of test_compact_data_many_appends:412-419 (20 1-row appends)."""
    lib = _lib(spark, tmp_path, rows_per_file=7)
    sym = "test_compact_data_many_appends"
    df = pd.DataFrame({"ints": np.arange(20),
                       "strings": [f"s{i % 5}" for i in range(20)]})
    lib.write(sym, df[0:1])
    for i in range(1, 20):
        lib.append(sym, df[i:i + 1])
    generic_compact_data_test(lib, sym)


def test_compact_data_newest_version_deleted(spark, tmp_path):
    """Port of test_compact_data_newest_version_deleted:422-435: the
    compacted version id clears the deleted tombstone (v2 deleted →
    compaction of v1 writes v3)."""
    lib = _lib(spark, tmp_path)
    sym = "newest_deleted"
    df = pd.DataFrame({"col": np.arange(30)})
    metadata = {"hello": "world"}
    lib.write(sym, df[:10])
    lib.append(sym, df[10:20], metadata=metadata)
    lib.append(sym, df[20:])
    lib.delete_version(sym, 2)
    generic_compact_data_test(lib, sym)
    ref = lib._load_ref(sym)
    assert ref["latest"] == 3
    out = lib.read(sym, output_format="pandas")
    pd.testing.assert_frame_equal(out, df[:20])
    assert lib.read_metadata(sym).metadata == metadata


def test_compact_data_newest_version_deleted_noop(spark, tmp_path):
    """Port of test_compact_data_newest_version_deleted_noop:438-450."""
    lib = _lib(spark, tmp_path, rows_per_file=10)
    sym = "newest_deleted_noop"
    df = pd.DataFrame({"col": np.arange(30)})
    metadata = {"hello": "world"}
    lib.write(sym, df[:10])
    lib.append(sym, df[10:20], metadata=metadata)
    lib.append(sym, df[20:])
    lib.delete_version(sym, 2)
    generic_compact_data_test_noop(lib, sym)
    assert lib._load_ref(sym)["latest"] == 1
    out = lib.read(sym, output_format="pandas")
    pd.testing.assert_frame_equal(out, df[:20])


def test_compact_data_read_previous_version(spark, tmp_path):
    """Port of test_compact_data_read_previous_version:453-462."""
    lib = _lib(spark, tmp_path, rows_per_file=10)
    sym = "prev_version"
    df = pd.DataFrame({"col": np.arange(10)})
    lib.write(sym, df[:5])                 # v0
    lib.append(sym, df[5:])                # v1
    lib.compact_data(sym)                  # v2
    pd.testing.assert_frame_equal(df[:5],
                                  lib.read(sym, as_of=0,
                                           output_format="pandas"))
    pd.testing.assert_frame_equal(
        df, lib.read(sym, as_of=1, output_format="pandas"))
    pd.testing.assert_frame_equal(df, lib.read(sym, output_format="pandas"))


@pytest.mark.parametrize("rows_per_segment", [3, 10])
def test_compact_data_date_range_read(spark, tmp_path, rows_per_segment):
    """Port of test_compact_data_date_range_read:465-481."""
    lib = _lib(spark, tmp_path, rows_per_file=rows_per_segment)
    sym = "dr_read"
    num_rows = 40
    index = pd.date_range("2026-01-01", periods=num_rows, name="ts")
    df = pd.DataFrame({"ints": np.arange(num_rows)}, index=index)
    lib.write(sym, df[:5])
    for i in range(1, 8):
        lib.append(sym, df[i * 5:(i + 1) * 5])
    mid = index[num_rows // 2]
    exp_first = lib.read(sym, date_range=(index[0], mid),
                         output_format="pandas")
    exp_second = lib.read(sym, date_range=(mid, index[-1]),
                          output_format="pandas")
    lib.compact_data(sym)
    pd.testing.assert_frame_equal(
        exp_first, lib.read(sym, date_range=(index[0], mid),
                            output_format="pandas"))
    pd.testing.assert_frame_equal(
        exp_second, lib.read(sym, date_range=(mid, index[-1]),
                             output_format="pandas"))


def test_compact_data_single_row(spark, tmp_path):
    """Port of test_compact_data_single_row:484-489."""
    lib = _lib(spark, tmp_path, rows_per_file=10)
    sym = "single_row"
    lib.write(sym, pd.DataFrame({"col": [42]}))
    generic_compact_data_test_noop(lib, sym)


def test_compact_data_empty_dataframe(spark, tmp_path):
    """Port of test_compact_data_empty_dataframe:492-497."""
    lib = _lib(spark, tmp_path, rows_per_file=10)
    sym = "empty_df"
    lib.write(sym, pd.DataFrame({"col": np.array([], dtype=np.int64)}))
    generic_compact_data_test_noop(lib, sym)


@pytest.mark.parametrize("rows_per_segment", [5, 20])
def test_compact_data_total_rows_equals_rows_per_segment(spark, tmp_path,
                                                         rows_per_segment):
    """Port of test_compact_data_total_rows_equals_rows_per_segment:500-506."""
    lib = _lib(spark, tmp_path, rows_per_file=rows_per_segment)
    sym = "exact_rows"
    lib.write(sym, pd.DataFrame({"col": np.arange(rows_per_segment)}))
    generic_compact_data_test_noop(lib, sym)


def test_compact_data_column_filtered_read(spark, tmp_path):
    """Port of test_compact_data_column_filtered_read:509-526."""
    lib = _lib(spark, tmp_path, rows_per_file=10)
    sym = "col_filtered"
    n = 20
    df = pd.DataFrame({"col_a": np.arange(n),
                       "col_b": np.arange(n, 2 * n),
                       "col_c": np.arange(2 * n, 3 * n)})
    lib.write(sym, df[0:5])
    for i in range(1, 4):
        lib.append(sym, df[i * 5:(i + 1) * 5])
    exp_a = lib.read(sym, columns=["col_a"], output_format="pandas")
    exp_bc = lib.read(sym, columns=["col_b", "col_c"],
                      output_format="pandas")
    generic_compact_data_test(lib, sym)
    pd.testing.assert_frame_equal(
        exp_a, lib.read(sym, columns=["col_a"], output_format="pandas"))
    pd.testing.assert_frame_equal(
        exp_bc, lib.read(sym, columns=["col_b", "col_c"],
                         output_format="pandas"))


def test_compact_data_string_none_nan_handling(spark, tmp_path):
    """Port of test_compact_data_string_none_nan_handling:561-570."""
    lib = _lib(spark, tmp_path)
    sym = "none_nan"
    lib.write(sym, pd.DataFrame({"col": pd.array(
        [None, None, None, None, None], dtype="string")}))
    lib.append(sym, pd.DataFrame({"col": pd.array(
        [None, None, None, None, None], dtype="string")}))
    generic_compact_data_test(lib, sym)
    lib.write(sym, pd.DataFrame({"col": ["a", "b", "c", "d", "e",
                                         None, None, None, None, None]}))
    generic_compact_data_test(lib, sym, 5)


def test_compact_pickled_data_is_noop(spark, tmp_path):
    """Adapted from test_compact_pickled_data:573-579: this engine stores
    a pickled object as 16 MB binary chunk rows (one file), so compaction
    has nothing to merge — the value round-trips and the version stands."""
    lib = _lib(spark, tmp_path)
    sym = "pickled"
    data = 10_000 * [0]
    lib.write_pickle(sym, data)
    assert lib.is_symbol_pickled(sym)
    v = lib._load_ref(sym)["latest"]
    lib.compact_data(sym)
    assert lib._load_ref(sym)["latest"] == v
    assert lib.read(sym) == data


def test_compact_recursively_normalized_data(spark, tmp_path):
    """Port of test_compact_recursively_normalized_data:582-591."""
    lib = _lib(spark, tmp_path)
    sym = "recursive"
    lib.write(sym, {"a": pd.DataFrame({"col": [42]})},
              recursive_normalizers=True)
    with pytest.raises(SchemaException) as e:
        lib.compact_data(sym)
    assert "recursive" in str(e.value) and sym in str(e.value)


def test_compact_numpy_arrays(spark, tmp_path):
    """Port of test_compact_numpy_arrays:594-602."""
    lib = _lib(spark, tmp_path)
    sym = "np_arrays"
    lib.write(sym, np.arange(10))
    lib.append(sym, np.arange(10, 20))
    assert (lib.read(sym) == np.arange(20)).all()
    lib.compact_data(sym)
    assert (lib.read(sym) == np.arange(20)).all()
    assert len(lib.read_index(sym)) == 1


@pytest.mark.parametrize("first_type,second_type", [
    ("int8", "int64"), ("int64", "int8"), ("uint8", "float32"),
    ("float32", "float64"), ("uint32", "int16"), ("uint64", "uint8"),
])
def test_compact_data_dynamic_schema_changing_types(spark, tmp_path,
                                                    first_type, second_type):
    """Port of test_compact_data_dynamic_schema_changing_types:605-622
    (representative pairs of the 10x10 matrix — the full promotion table
    is pinned by test_type_promotion.py)."""
    lib = _lib(spark, tmp_path, dynamic_schema=True)
    sym = "changing_types"
    lib.write(sym, pd.DataFrame(
        {"col": np.arange(1, dtype=np.dtype(first_type))}))
    lib.append(sym, pd.DataFrame(
        {"col": np.arange(1, dtype=np.dtype(second_type))}))
    generic_compact_data_test(lib, sym)


def test_compact_data_dynamic_schema_changing_types_three_slices(spark,
                                                                 tmp_path):
    """Port of test_compact_data_dynamic_schema_changing_types_three_slices
    :625-646: after compaction every data file carries the promoted
    manifest schema (INT64), not its original epoch."""
    lib = _lib(spark, tmp_path, rows_per_file=10, dynamic_schema=True)
    sym = "three_slices"
    lib.write(sym, pd.DataFrame({"col": np.arange(5, dtype=np.int64)}))
    lib.append(sym, pd.DataFrame({"col": np.arange(5, 15, dtype=np.int8)}))
    lib.append(sym, pd.DataFrame({"col": np.arange(15, 20, dtype=np.int8)}))
    generic_compact_data_test(lib, sym)
    import json as _json
    import pyarrow.parquet as pq
    m = lib._load_manifest(sym, lib._load_ref(sym)["latest"])
    want = {f["name"]: f["type"]
            for f in _json.loads(m.schema_json)["fields"]}
    for fe in m.files:
        phys = pq.read_schema(fe.path)
        assert str(phys.field("col").type) == "int64", fe.path
    assert want["col"] == "long"


def test_compact_data_dynamic_schema_missing_columns(spark, tmp_path):
    """Port of test_compact_data_dynamic_schema_missing_columns:649-698
    (RangeIndex variant): per-slice column subsets compact into the
    union schema with NULL/0 backfill identical to the uncompacted read."""
    lib = _lib(spark, tmp_path, dynamic_schema=True)
    sym = "missing_cols"
    df_0 = pd.DataFrame({"col1": ["a", "b", "c", "d", "e"],
                         "col2": np.arange(5, 10, dtype=np.float64),
                         "col3": np.arange(10, 15, dtype=np.float64)})
    df_1 = pd.DataFrame({"col3": np.arange(15, 20, dtype=np.float64),
                         "col2": np.arange(15, 20, dtype=np.float64),
                         "col4": np.arange(20, 25, dtype=np.float64)})
    df_2 = pd.DataFrame({"col4": np.arange(30, 35, dtype=np.float64),
                         "col5": np.arange(35, 40, dtype=np.float64),
                         "col1": ["e", "d", "1", "2", "3"]})
    lib.write(sym, df_0)
    lib.append(sym, df_1)
    lib.append(sym, df_2)
    generic_compact_data_test(lib, sym)


def test_compact_data_small_and_large_segments(spark, tmp_path):
    """Port of test_compact_data_hypothesis_small_and_large_segments:
    783-821 (fixed representative draw: S S L L S L)."""
    rng = np.random.default_rng(42)
    lib = _lib(spark, tmp_path, rows_per_file=100)
    sym = "small_large"
    sizes = [3, 7, 160, 175, 5, 190]
    chunks = [pd.DataFrame({"col": rng.random(n)}) for n in sizes]
    lib.write(sym, chunks[0])
    for c in chunks[1:]:
        lib.append(sym, c)
    generic_compact_data_test(lib, sym)
