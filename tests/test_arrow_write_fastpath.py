"""Focused tests for the r14 pyarrow write fast path (arrowwrite.py):
byte-level contract and off/on equivalence of every eligible flow, plus
the fallback gates that keep ineligible shapes on the Spark writer."""

import os

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark import arrowwrite as aw
from arcticdb_spark.catalog import Arctic


@pytest.fixture()
def counting(monkeypatch):
    """Count write_slices invocations so tests can assert the fast path
    actually fired (or did not)."""
    calls = {"n": 0}
    orig = aw.write_slices

    def wrapper(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)
    monkeypatch.setattr(aw, "write_slices", wrapper)
    return calls


def _frame(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "a": rng.integers(0, 1000, n).astype("int64"),
        "b": rng.integers(0, 100, n).astype("int32"),
        "c": rng.normal(size=n),
        "d": rng.choice(["x", "yy", "zzz", None], n),
        "e": rng.random(n).astype("float32"),
        "f": rng.integers(0, 2, n).astype("bool"),
    }, index=pd.date_range("2024-01-01", periods=n, freq="s"))


def _roundtrip(spark, tmp_path, sub, pdf, rows_per_file=1500):
    lib = Arctic(str(tmp_path / sub), spark).create_library(
        "l", rows_per_file=rows_per_file)
    lib.write("s", pdf)
    return lib


def test_fast_path_equivalence(spark, tmp_path, counting, monkeypatch):
    """write/append/stage+finalize round-trip byte-identically with the
    fast path off vs on: same values, same per-file rows/offsets/ts
    bounds, same manifest schema."""
    pdf = _frame()
    tail = _frame(800, 1).set_index(
        pd.date_range("2024-02-01", periods=800, freq="s"))
    state = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("ARCTICDB_SPARK_ARROW_WRITE", mode)
        counting["n"] = 0
        lib = _roundtrip(spark, tmp_path, f"m{mode}", pdf)
        lib.append("s", tail)
        lib.stage("st", pdf.iloc[::2])
        lib.stage("st", pdf.iloc[1::2])
        lib.sort_and_finalize_staged_data("st", "write")
        m = lib._load_manifest("s", lib._load_ref("s")["latest"])
        state[mode] = {
            "read": lib.read("s", output_format="pandas"),
            "read_st": lib.read("st", output_format="pandas"),
            "files": [(f.rows, f.row_start, f.ts_min, f.ts_max)
                      for f in m.files],
            "schema": m.schema_json,
            "calls": counting["n"],
        }
    assert state["0"]["calls"] == 0
    assert state["1"]["calls"] >= 3          # write + append + 2 stages
    pd.testing.assert_frame_equal(state["0"]["read"], state["1"]["read"])
    pd.testing.assert_frame_equal(state["0"]["read_st"],
                                  state["1"]["read_st"])
    assert state["0"]["files"] == state["1"]["files"]
    assert state["0"]["schema"] == state["1"]["schema"]


def test_fast_path_footer_contract(spark, tmp_path, counting):
    """A fast-path file carries the Spark row.metadata footer key (so
    schema inference matches Spark-written files exactly), per-column
    min/max statistics, and exact rows_per_file slicing."""
    import pyarrow.parquet as pq
    from pyspark.sql import types as T
    import json
    lib = _roundtrip(spark, tmp_path, "contract", _frame())
    assert counting["n"] == 1
    m = lib._load_manifest("s", lib._load_ref("s")["latest"])
    assert [f.rows for f in m.files] == [1500, 1500, 1000]
    pf = pq.ParquetFile(m.files[0].path)
    md = pf.metadata.metadata
    assert aw.ROW_METADATA_KEY in md
    inferred = spark.read.parquet(m.files[0].path).schema
    assert inferred == T.StructType.fromJson(
        json.loads(md[aw.ROW_METADATA_KEY]))
    for i in range(pf.metadata.num_columns):
        st = pf.metadata.row_group(0).column(i).statistics
        assert st is not None and st.has_min_max


@pytest.mark.parametrize("mutate", [
    lambda p: p.assign(ts_data=pd.date_range("2024-01-01",
                                             periods=len(p), freq="us")),
    lambda p: p.assign(binary=[b"x"] * len(p)),
    lambda p: p.assign(lists=[[1, 2]] * len(p)),
])
def test_ineligible_dtypes_fall_back(spark, tmp_path, counting, mutate):
    """Timestamp data columns, binary and list payloads keep the Spark
    writer — and the write still round-trips."""
    pdf = mutate(_frame(50))
    lib = _roundtrip(spark, tmp_path, "fb" + str(counting["n"]), pdf)
    assert counting["n"] == 0
    got = lib.read("s", output_format="pandas")
    assert len(got) == 50


def test_dict_encoded_library_falls_back(spark, tmp_path, counting):
    """Dictionary-coded columns transform the frame after normalization,
    which must break the identity gate."""
    from arcticdb_spark.catalog import LibraryOptions
    lib = Arctic(str(tmp_path / "dict"), spark).create_library(
        "l", library_options=LibraryOptions(dictionary_columns=("d",)))
    pdf = _frame(200)
    pdf["d"] = pdf["d"].fillna("z")
    lib.write("s", pdf)
    assert counting["n"] == 0
    got = lib.read("s", output_format="pandas")
    pd.testing.assert_frame_equal(got, pdf, check_freq=False)
