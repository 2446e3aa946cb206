"""Port of the reference's test_arrow_api.py output-format precedence:
per-read override > library default > Arctic-instance default (reference
test_read_arctic:50-60, head/tail/lazy/batch variants). POLARS legs skip
where polars is absent; this engine's factory default is the Spark frame
(documented deviation — the reference defaults to PANDAS)."""

import pandas as pd
import pyarrow as pa
import pytest

from arcticdb_spark.catalog import Arctic


def _df():
    return pd.DataFrame({"a": [1, 2, 3]},
                        index=pd.date_range("2024-01-01", periods=3,
                                            name="ts"))


def _type_of(fmt):
    return pa.Table if fmt in ("arrow", "PYARROW", "pyarrow") else pd.DataFrame


@pytest.mark.parametrize("arctic_fmt", [None, "pandas", "PYARROW"])
@pytest.mark.parametrize("lib_fmt", [None, "pandas", "pyarrow"])
@pytest.mark.parametrize("override", [None, "pandas", "PYARROW"])
def test_output_format_precedence(spark, tmp_path, arctic_fmt, lib_fmt,
                                  override):
    """Port of test_read_arctic:50-60."""
    ac = Arctic(str(tmp_path), spark, output_format=arctic_fmt)
    lib = ac.create_library(
        f"p_{arctic_fmt}_{lib_fmt}_{override}".lower(),
        output_format=lib_fmt)
    lib.write("sym", _df())
    result = lib.read("sym", output_format=override)
    effective = override or lib_fmt or arctic_fmt
    if effective is None:
        from pyspark.sql import DataFrame
        assert isinstance(result, DataFrame)  # engine default: Spark frame
    else:
        assert isinstance(result, _type_of(effective)), type(result)


def test_head_tail_honor_library_default(spark, tmp_path):
    """Port of test_head:63-75 / test_tail:77-89 (library default)."""
    ac = Arctic(str(tmp_path), spark)
    lib = ac.create_library("ht", output_format="pyarrow")
    lib.write("sym", _df())
    assert isinstance(lib.head("sym", 2), pa.Table)
    assert isinstance(lib.tail("sym", 2), pa.Table)
    assert isinstance(lib.head("sym", 2, output_format="pandas"),
                      pd.DataFrame)


def test_get_library_inherits_arctic_default(spark, tmp_path):
    ac = Arctic(str(tmp_path), spark, output_format="pyarrow")
    ac.create_library("inh")
    lib = Arctic(str(tmp_path), spark,
                 output_format="pyarrow").get_library("inh")
    lib.write("sym", _df())
    assert isinstance(lib.read("sym"), pa.Table)


def test_read_batch_override(spark, tmp_path):
    """Port of test_read_batch:111-133 (v2 read_batch honors formats)."""
    ac = Arctic(str(tmp_path), spark)
    lib = ac.create_library("rb", output_format="pyarrow")
    lib.write("sym", _df())
    outs = lib.read_batch(["sym"])
    assert isinstance(outs[0], pa.Table)
    outs = lib.read_batch(["sym"], output_format="pandas")
    assert isinstance(outs[0], pd.DataFrame)
