"""Ported from the reference's test_query_builder.py
test_column_select_projected_column /
test_column_select_projected_column_and_filter_it /
test_filter_synthetic_column_and_select_on_disk_column: with a
query_builder, ``columns=`` selects from the pipeline OUTPUT — a
projected name works, and a pipeline may read stored columns the user
did not request (Catalyst's column pruning keeps the physical scan
narrow, the Spark analog of the reference's column-slice reads). Also
pins the reference vwap example (project → resample → project)."""
import re

import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.query import QueryBuilder


def test_column_select_projected_column(tmp_lib):
    tmp_lib.write("sym", pd.DataFrame(
        {"a": [1, 2], "b": ["a", "b"], "c": [5, 6]}))
    qb = QueryBuilder()
    qb = qb.apply("new_column", qb["a"] + 2)
    result = tmp_lib.read("sym", columns=["new_column"], query_builder=qb,
                          output_format="pandas")
    pd.testing.assert_frame_equal(
        pd.DataFrame({"new_column": [3, 4]}), result)


def test_column_select_projected_column_and_filter_it(tmp_lib):
    tmp_lib.write("sym", pd.DataFrame(
        {"b": ["a", "b"], "c": [5, 6], "a": [1, 2]}))
    qb = QueryBuilder()
    qb = qb.apply("new_column", qb["a"] + 2)
    qb = qb[qb["new_column"] > 3]
    result = tmp_lib.read("sym", columns=["new_column"], query_builder=qb,
                          output_format="pandas")
    assert result.columns.tolist() == ["new_column"]
    assert result["new_column"].tolist() == [4]


@pytest.mark.parametrize("column_to_read", ["b", "c"])
def test_filter_synthetic_column_and_select_on_disk_column(tmp_lib,
                                                           column_to_read):
    df = pd.DataFrame({"a": [1, 2], "b": [7, 8], "c": [5, 6]})
    tmp_lib.write("sym", df)
    qb = QueryBuilder()
    qb = qb.apply("new_column", qb["a"] + 2)
    qb = qb[qb["new_column"] > 3]
    result = tmp_lib.read("sym", columns=[column_to_read],
                          query_builder=qb, output_format="pandas")
    assert result.columns.tolist() == [column_to_read]
    assert result[column_to_read].tolist() == [df[column_to_read][1]]


def test_pipeline_scan_stays_pruned(tmp_lib):
    # the 100 TB story: deferring selection must NOT widen the physical
    # scan — Catalyst prunes the parquet ReadSchema to the columns the
    # plan uses (here: a for the projection/filter, c for the output;
    # b never read)
    tmp_lib.write("sym", pd.DataFrame(
        {"a": [1, 2], "b": ["x", "y"], "c": [5, 6]}))
    qb = QueryBuilder()
    qb = qb.apply("new_column", qb["a"] + 2)
    qb = qb[qb["new_column"] > 3]
    out = tmp_lib.read("sym", columns=["c"], query_builder=qb)
    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"ReadSchema: ([^\n]+)", plan)
    assert m and "b:" not in m.group(1), plan[:400]


def test_query_builder_vwap(tmp_lib):
    # reference test_query_builder_vwap: project -> resample-agg ->
    # project over a date_range read
    rng = np.random.default_rng(3)
    index = pd.date_range("2024-01-01", "2024-01-03", freq="min")
    df = pd.DataFrame({
        "price": rng.random(len(index)),
        "volume": rng.integers(1, 100, len(index))}, index=index)
    tmp_lib.write("sym", df)
    date_range = (pd.Timestamp("2024-01-01T12:00:00"),
                  pd.Timestamp("2024-01-02T12:00:00"))
    aggs = {"volume": "sum", "product": "sum"}
    q = QueryBuilder()
    q["product"] = q["price"] * q["volume"]
    q = q.resample("h").agg(aggs)
    q["vwap"] = q["product"] / q["volume"]
    received = tmp_lib.read("sym", date_range=date_range, query_builder=q,
                            output_format="pandas")
    expected = df.loc[date_range[0]:date_range[1]].copy()
    expected["product"] = expected["price"] * expected["volume"]
    expected = expected.resample("h").agg(aggs)
    expected["vwap"] = expected["product"] / expected["volume"]
    expected.sort_index(inplace=True, axis=1)
    received.sort_index(inplace=True, axis=1)
    received.index.name = expected.index.name
    pd.testing.assert_frame_equal(expected, received, check_dtype=False,
                                  check_freq=False)
