"""Port of the reference's integration test_read_batch_more.py: each
read_batch request is fully isolated (per-request as_of/date_range/
columns/query_builder), missing symbols surface as DataError IN ORDER,
and column selection returns columns in the REQUESTED order.

Adaptation: this engine's v2 read_batch returns the data object itself
for successes (Spark-first — read() has no VersionedItem wrapper), so the
assertions use the results directly; metadata checks go through
read_metadata."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow


from arcticdb_spark import Arctic, DataError, QueryBuilder, ReadRequest


@pytest.fixture()
def lib(spark, tmp_path):
    return Arctic(str(tmp_path), spark).create_library("rbm")


def _df(start_hour, end_hour, num_columns=7):
    """Port of create_df_index_datetime: hourly rows [start, end)."""
    idx = pd.date_range("2020-01-01", periods=1000, freq="h")[
        start_hour:end_hour]
    n = len(idx)
    return pd.DataFrame(
        {f"COL_{i}": np.arange(start_hour * 10 + i,
                               start_hour * 10 + i + n, dtype=np.int64)
         for i in range(num_columns)}, index=idx)


def _sim_update(old, new):
    """Pandas model of arctic update: old rows outside new's span + new."""
    keep = old[(old.index < new.index.min()) | (old.index > new.index.max())]
    return pd.concat([keep, new]).sort_index()


def test_read_batch_2tables_7reads_different_slices(lib):
    """Port of test_read_batch_2tables_7reads_different_slices:60-150."""
    df1_0 = _df(0, 5)
    df1_1 = _df(4, 6)
    df1_2 = _df(6, 10)
    df1_3 = _df(0, 10)
    df1_till2 = _sim_update(df1_0, df1_1)
    df1_till3 = pd.concat([df1_till2, df1_2]).sort_index()
    df1_all = _sim_update(df1_till3, df1_3)

    df2_0 = _df(0, 100, num_columns=20)
    df2_1 = _df(100, 200, num_columns=20)
    df2_2 = _df(200, 300, num_columns=20)
    df2_all = pd.concat([df2_0, df2_1, df2_2]).sort_index()
    columns_to_select = ["COL_1", "COL_13", "COL_15"]
    start, end = df2_all.index[4], df2_all.index[-5]
    df2_mid = df2_all[(df2_all.index >= start) & (df2_all.index <= end)]
    columns_to_select1 = ["COL_1", "COL_18"]
    start1, end1 = df2_0.index[1], df2_0.index[-2]
    df2_0_allfilters = df2_0.loc[:, columns_to_select1][
        (df2_0.index >= start1) & (df2_0.index <= end1)]

    lib.write("sym1", df1_0)
    lib.update("sym1", df1_1)
    lib.append("sym1", df1_2)
    lib.update("sym1", df1_3)
    lib.write("sym2", df2_0)
    lib.append("sym2", df2_1)
    lib.append("sym2", df2_2)

    pd.testing.assert_frame_equal(
        df1_all, lib.read("sym1", output_format="pandas"),
        check_freq=False)
    pd.testing.assert_frame_equal(
        df1_till2, lib.read("sym1", as_of=1, output_format="pandas"),
        check_freq=False)

    batch = lib.read_batch(
        ["sym3",                                     # missing
         "sym1",
         ReadRequest("sym1", as_of=2),
         ReadRequest("sym1", as_of=0),
         ReadRequest("sym2", date_range=(dt.datetime(1990, 1, 1),
                                         dt.datetime(1999, 1, 1))),
         ReadRequest("sym2", columns=columns_to_select),
         ReadRequest("sym2", date_range=(start, end)),
         ReadRequest("sym2", date_range=(start1, end1),
                     columns=columns_to_select1, as_of=0)],
        output_format="pandas")
    assert isinstance(batch[0], DataError)
    assert batch[0].symbol == "sym3"
    ck = dict(check_freq=False)
    pd.testing.assert_frame_equal(df1_all, batch[1], **ck)
    pd.testing.assert_frame_equal(df1_till3, batch[2], **ck)
    pd.testing.assert_frame_equal(df1_0, batch[3], **ck)
    assert batch[4].empty
    pd.testing.assert_frame_equal(df2_all[columns_to_select], batch[5],
                                  **ck)
    pd.testing.assert_frame_equal(df2_mid, batch[6], **ck)
    pd.testing.assert_frame_equal(df2_0_allfilters, batch[7], **ck)


def test_read_batch_query_and_columns_returned_order(lib):
    """Port of test_read_batch_query_and_columns_returned_order:396-417:
    output column order matches the requested 'columns' list."""
    df = pd.DataFrame({
        "strings": [f"s{i}" for i in range(100)],
        "float64": np.arange(100.0),
        "int32": np.arange(100, dtype=np.int32),
        "bool": (np.arange(100) % 3 == 0),
    })
    columns = ["int32", "float64", "strings", "bool"]
    lib.write("sym", df)
    q = QueryBuilder()
    q = q[q["bool"]]
    batch = lib.read_batch(
        [ReadRequest("sym", as_of=0, query_builder=q, columns=columns)],
        output_format="pandas")
    expected = df[df["bool"]][columns].reset_index(drop=True)
    got = batch[0].reset_index(drop=True)
    assert got.columns.to_list() == columns
    pd.testing.assert_frame_equal(expected, got, check_dtype=False)


def test_read_batch_query_and_columns(lib):
    """Port of test_read_batch_query_and_columns:445-517 (condensed):
    per-request query+columns isolation, empty-match frames keep the
    requested columns, columns=[] keeps the row count."""
    rng = np.random.default_rng(2)
    def mk(n, off=0):
        return pd.DataFrame({
            "short": rng.choice(list("ABCXYZ"), n),
            "long": [f"long_{i+off}" for i in range(n)],
            "uint8": rng.integers(0, 255, n).astype(np.uint8),
            "int64": np.arange(off, off + n, dtype=np.int64),
            "bool": rng.random(n) > 0.5,
        })
    df1 = mk(100)
    df2 = mk(50, off=100)
    df_all = pd.concat([df1, df2], ignore_index=True)
    metadata = {"name": "SomeInterestingName", "info": [1, 3, 5, 6]}
    lib.write("sym", df1)
    lib.append("sym", df2, metadata=metadata)

    def q1():
        q = QueryBuilder()
        return q[(q["short"].isin(["A", "B", "C", "Z"]))
                 & (q["bool"] == True)]    # noqa: E712

    def q2():
        q = QueryBuilder()
        return q[q["long"] == "impossible to match"]

    def q3():
        q = QueryBuilder()
        return q[q["uint8"] > 155]

    batch = lib.read_batch(
        [ReadRequest("sym", as_of=0, query_builder=q3(),
                     columns=["uint8", "bool"]),
         ReadRequest("sym", query_builder=q1(),
                     columns=["int64", "bool", "short"]),
         ReadRequest("sym", query_builder=q2(), columns=["bool", "long"]),
         ReadRequest("sym", query_builder=q1(), columns=["int64"],
                     as_of=0),
         ReadRequest("sym", query_builder=q1(), columns=[], as_of=0)],
        output_format="pandas")

    def pdq1(d):
        return d[(d["short"].isin(["A", "B", "C", "Z"])) & d["bool"]]

    got = batch[0].reset_index(drop=True)
    exp = df1[df1["uint8"] > 155][["uint8", "bool"]].reset_index(drop=True)
    # small uints store widened in this engine (documented promotion)
    pd.testing.assert_frame_equal(exp, got, check_dtype=False)
    got = batch[1].reset_index(drop=True)
    exp = pdq1(df_all)[["int64", "bool", "short"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(exp, got)
    assert lib.read_metadata("sym").metadata == metadata
    empty = batch[2]
    assert empty.shape[0] == 0
    assert empty.columns.to_list() == ["bool", "long"]
    got = batch[3].reset_index(drop=True)
    exp = pdq1(df1)[["int64"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(exp, got)
    # columns=[] keeps the filtered row count with zero columns
    assert batch[4].shape == (len(pdq1(df1)), 0)
