"""Ported from the reference's
``python/tests/unit/arcticdb/version_store/test_query_builder_batch.py``:
v1 ``batch_read`` with one shared QueryBuilder, a per-symbol list,
None entries, a mis-sized list (raises), and missing symbols/versions."""
import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.catalog import NoSuchVersionException
from arcticdb_spark.exceptions import InternalException
from arcticdb_spark.query import QueryBuilder


@pytest.fixture()
def two_syms(tmp_lib):
    tmp_lib.write("sym1", pd.DataFrame({"a": [1, 2]}, index=np.arange(2)))
    tmp_lib.write("sym2", pd.DataFrame({"a": [2, 3]}, index=np.arange(2)))
    return tmp_lib


def test_filter_batch_one_query(two_syms):
    q = QueryBuilder()
    q = q[q["a"] == 2]
    batch_res = two_syms.batch_read(["sym1", "sym2"], query_builder=q)
    assert batch_res["sym1"].data["a"].tolist() == [2]
    assert batch_res["sym2"].data["a"].tolist() == [2]


def test_filter_batch_multiple_queries(two_syms):
    q1 = QueryBuilder()
    q1 = q1[q1["a"] == 1]
    q2 = QueryBuilder()
    q2 = q2[q2["a"] == 3]
    batch_res = two_syms.batch_read(["sym1", "sym2"],
                                    query_builder=[q1, q2])
    assert batch_res["sym1"].data["a"].tolist() == [1]
    assert batch_res["sym2"].data["a"].tolist() == [3]


def test_filter_batch_multiple_queries_with_none(two_syms):
    q2 = QueryBuilder()
    q2 = q2[q2["a"] == 3]
    batch_res = two_syms.batch_read(["sym1", "sym2"],
                                    query_builder=[None, q2])
    assert batch_res["sym1"].data["a"].tolist() == [1, 2]
    assert batch_res["sym2"].data["a"].tolist() == [3]


def test_filter_batch_incorrect_query_count(two_syms):
    q = QueryBuilder()
    q = q[q["a"] == 3]
    with pytest.raises(InternalException):
        two_syms.batch_read(["sym1", "sym2"], query_builder=[q])
    with pytest.raises(InternalException):
        two_syms.batch_read(["sym1", "sym2"], query_builder=[q, q, q])


def test_filter_batch_symbol_doesnt_exist(tmp_lib):
    tmp_lib.write("sym1", pd.DataFrame({"a": [1, 2]}, index=np.arange(2)))
    q = QueryBuilder()
    q = q[q["a"] == 2]
    with pytest.raises(NoSuchVersionException):
        tmp_lib.batch_read(["sym1", "sym2"], query_builder=q)


def test_filter_batch_version_doesnt_exist(two_syms):
    q = QueryBuilder()
    q = q[q["a"] == 2]
    with pytest.raises(NoSuchVersionException):
        two_syms.batch_read(["sym1", "sym2"], as_ofs=[0, 1],
                            query_builder=q)
