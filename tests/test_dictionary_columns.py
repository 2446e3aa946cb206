"""Dictionary-coded string columns (LibraryOptions.dictionary_columns) —
the engine's analogue of the reference string pool (``string_pool.hpp``;
SURVEY §1.1). Declared categorical/id STRING columns are stored as int64
content-hash codes with a (code, value) parquet sidecar; a pure groupby
pipeline aggregates on the codes (8-byte hash keys instead of UTF8) and
decodes the k-row result, while any filter/project pipeline decodes up
front so every expression sees strings. Exactness is enforced by write-time
collision checks, so results must be IDENTICAL to an undeclared library in
every cell of this matrix.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.catalog import Arctic, LibraryOptions
from arcticdb_spark.query import QueryBuilder


@pytest.fixture()
def libs(spark, tmp_path):
    ac = Arctic(str(tmp_path), spark)
    plain = ac.create_library("plain")
    coded = ac.create_library(
        "coded", library_options=LibraryOptions(
            dictionary_columns=("cat", "cat2")))
    return plain, coded


def _frame(n=500, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "cat": rng.choice([f"id{i:03d}" for i in range(40)], n),
        "cat2": rng.choice(["a", "b", "c"], n),
        "v": rng.integers(0, 100, n).astype("int64"),
        "w": np.round(rng.uniform(0, 10, n), 6),
    }, index=pd.date_range("2024-01-01", periods=n, freq="min"))


def test_roundtrip_identical(libs):
    plain, coded = libs
    df = _frame()
    plain.write("s", df)
    coded.write("s", df)
    pd.testing.assert_frame_equal(coded.read("s", output_format="pandas"),
                                  plain.read("s", output_format="pandas"))
    # physically the coded library stores int64 codes, not strings
    m = coded._load_manifest("s", 0)
    import json as _json
    stored = {f["name"]: f["type"]
              for f in _json.loads(m.schema_json)["fields"]}
    assert stored["cat"] == "long" and stored["cat2"] == "long"


def test_groupby_fast_path_identical(libs):
    plain, coded = libs
    df = _frame()
    plain.write("s", df)
    coded.write("s", df)
    q = QueryBuilder().groupby("cat").agg({"v": "sum", "w": "max"})
    a = (plain.read("s", query_builder=q, output_format="pandas")
         .sort_index())
    b = (coded.read("s", query_builder=q, output_format="pandas")
         .sort_index())
    pd.testing.assert_frame_equal(a, b)


def test_multi_key_groupby(libs):
    plain, coded = libs
    df = _frame()
    plain.write("s", df)
    coded.write("s", df)
    q = QueryBuilder().groupby(["cat", "cat2"]).agg({"v": "mean"})
    a = (plain.read("s", query_builder=q, output_format="pandas")
         .sort_index())
    b = (coded.read("s", query_builder=q, output_format="pandas")
         .sort_index())
    pd.testing.assert_frame_equal(a, b)


def test_filter_decodes_early(libs):
    plain, coded = libs
    df = _frame()
    plain.write("s", df)
    coded.write("s", df)
    q = QueryBuilder()
    q = q[q["cat"] == "id005"]
    a = plain.read("s", query_builder=q, output_format="pandas")
    b = coded.read("s", query_builder=q, output_format="pandas")
    pd.testing.assert_frame_equal(a, b)
    assert (b["cat"] == "id005").all() and len(b) > 0


def test_agg_on_dict_column_decodes_early(libs):
    """first/last OVER a dictionary column must yield strings even when
    the aggregation RENAMES the output (the fast path's name-based
    decode-after could not find it) — the fast path is forbidden when a
    dict column is an agg input. (min/max/sum/mean on strings are already
    rejected by the reference support matrix.)"""
    plain, coded = libs
    df = _frame()
    plain.write("s", df)
    coded.write("s", df)
    q = QueryBuilder().groupby("cat2").agg({"first_cat": ("cat", "first"),
                                            "v": "sum"})
    a = (plain.read("s", query_builder=q, output_format="pandas")
         .sort_index())
    b = (coded.read("s", query_builder=q, output_format="pandas")
         .sort_index())
    pd.testing.assert_frame_equal(a, b)


def test_append_update_and_asof(libs):
    plain, coded = libs
    df = _frame(300)
    extra = _frame(100, seed=9)
    extra.index = pd.date_range("2024-02-01", periods=100, freq="min")
    upd = pd.DataFrame(
        {"cat": ["zz_new"], "cat2": ["b"], "v": [7], "w": [1.5]},
        index=pd.DatetimeIndex([pd.Timestamp("2024-01-01 00:30")]))
    for lib in (plain, coded):
        lib.write("s", df)
        lib.append("s", extra)      # introduces NEW dictionary values
        lib.update("s", upd)        # and another one via update
    for as_of in (0, 1, None):
        pd.testing.assert_frame_equal(
            coded.read("s", as_of=as_of, output_format="pandas"),
            plain.read("s", as_of=as_of, output_format="pandas"))
    got = coded.read("s", output_format="pandas")
    assert "zz_new" in set(got["cat"])


def test_null_strings_stay_null(libs):
    _plain, coded = libs
    df = _frame(50)
    df.loc[df.index[:10], "cat"] = None
    coded.write("s", df)
    got = coded.read("s", output_format="pandas")
    assert got["cat"].isna().sum() == 10
    # null keys are dropped by groupby like the reference
    q = QueryBuilder().groupby("cat").agg({"v": "count"})
    res = coded.read("s", query_builder=q, output_format="pandas")
    assert not res.index.isna().any()


def test_columns_selection_and_head(libs):
    _plain, coded = libs
    df = _frame(100)
    coded.write("s", df)
    got = coded.read("s", columns=["cat"], output_format="pandas")
    assert list(got.columns) == ["cat"]
    assert got["cat"].dtype == object
    h = coded.head("s", 5, output_format="pandas")
    pd.testing.assert_frame_equal(h, df.head(5), check_freq=False)


def test_staged_finalize_encodes(libs):
    plain, coded = libs
    df = _frame(200)
    a, b = df.iloc[:120], df.iloc[120:]
    for lib in (plain, coded):
        lib.stage("s", b)
        lib.stage("s", a)
        lib.sort_and_finalize_staged_data("s")
    pd.testing.assert_frame_equal(coded.read("s", output_format="pandas"),
                                  plain.read("s", output_format="pandas"))


def test_undeclared_symbol_passthrough(libs):
    """A symbol whose declared column was written as a GENUINE long (never
    a string) must not be 'decoded'."""
    _plain, coded = libs
    df = pd.DataFrame({"cat": np.arange(20, dtype="int64"),
                       "v": np.ones(20)},
                      index=pd.date_range("2024-01-01", periods=20,
                                          freq="min"))
    coded.write("s", df)
    got = coded.read("s", output_format="pandas")
    pd.testing.assert_frame_equal(got, df, check_freq=False)


def test_decode_paths_agree_across_lookup_threshold(libs, monkeypatch):
    """The decode broadcast lookup has two builds: a local relation from
    the driver-cached map (sidecar under _DICT_LOCAL_RELATION_ROWS_MAX
    rows) and a persisted parquet scan above it. Both must decode
    identically — force each side of the threshold on the same library."""
    import arcticdb_spark.catalog as cat
    plain, coded = libs
    df = _frame()
    plain.write("s", df)
    coded.write("s", df)
    expect = plain.read("s", output_format="pandas")

    # force the JOIN decode: _frame()'s 40-value dictionary would
    # otherwise take the literal-map projection on every read and never
    # build a lookup at all (ADVICE r13)
    monkeypatch.setattr(cat, "_DICT_LITERAL_MAP_ROWS_MAX", 0)
    monkeypatch.setattr(cat, "_DICT_LOCAL_RELATION_ROWS_MAX", 10**9)
    coded._dict_cache.clear()
    via_local = coded.read("s", output_format="pandas")
    lk = coded._dict_lookup("s", "cat")
    assert lk.storageLevel.useMemory is False  # local relation, not persisted

    monkeypatch.setattr(cat, "_DICT_LOCAL_RELATION_ROWS_MAX", 0)
    coded._dict_cache.clear()
    via_scan = coded.read("s", output_format="pandas")
    lk = coded._dict_lookup("s", "cat")
    assert lk.storageLevel.useMemory is True  # persisted scan path

    pd.testing.assert_frame_equal(via_local, expect)
    pd.testing.assert_frame_equal(via_scan, expect)
