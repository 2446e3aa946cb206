"""Ported from the reference's
``python/tests/unit/arcticdb/version_store/test_filtering.py`` (round-11
batch): derived-expression reuse across conjuncts, the float32-vs-every-
numeric-dtype comparison matrix, and builder-time boolean
short-circuiting (reference ``processing.py:152-173``)."""
import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.exceptions import InternalException
from arcticdb_spark.query import QueryBuilder


def test_filter_reused_derived_expression(tmp_lib):
    # reference test_filter_reused_derived_expression: one derived node
    # used by two conjuncts of the same filter
    df = pd.DataFrame({"bid": np.arange(0, 20, 2, dtype=np.int64),
                       "ask": np.arange(10, dtype=np.int64)})
    tmp_lib.write("sym", df)
    limit = 3
    q = QueryBuilder()
    spread = q["bid"] - q["ask"]
    q = q[(spread > 0) & (spread < limit)]
    pandas_spread = df["bid"] - df["ask"]
    expected = df[(pandas_spread > 0)
                  & (pandas_spread < limit)].reset_index(drop=True)
    received = tmp_lib.read("sym", query_builder=q,
                            output_format="pandas").reset_index(drop=True)
    pd.testing.assert_frame_equal(expected, received)


def test_float32_binary_comparison(tmp_lib):
    # reference test_float32_binary_comparison: float32 column against
    # every numeric dtype, all six operators, expected = pandas
    df = pd.DataFrame({
        "uint8": np.arange(1000, dtype=np.uint8),
        "uint16": np.arange(1000, dtype=np.uint16),
        "uint32": np.arange(1000, dtype=np.uint32),
        "uint64": np.arange(1000, dtype=np.uint64),
        "int8": np.arange(1000, dtype=np.int8),
        "int16": np.arange(1000, dtype=np.int16),
        "int32": np.arange(1000, dtype=np.int32),
        "int64": np.arange(1000, dtype=np.int64),
        "float32": np.arange(1000, dtype=np.float32),
        "float64": np.arange(1000, dtype=np.float64),
    })
    tmp_lib.write("sym", df)
    ops = {
        "<": (lambda a, b: a < b), "<=": (lambda a, b: a <= b),
        ">": (lambda a, b: a > b), ">=": (lambda a, b: a >= b),
        "==": (lambda a, b: a == b), "!=": (lambda a, b: a != b),
    }
    for op_name, op in ops.items():
        for other in df.columns:
            q = QueryBuilder()
            q = q[op(q["float32"], q[other])]
            expected = df[op(df["float32"], df[other])]
            received = tmp_lib.read("sym", query_builder=q,
                                    output_format="pandas")
            assert len(received) == len(expected), (op_name, other)
            assert received["int64"].tolist() == \
                expected["int64"].tolist(), (op_name, other)


class TestFilterBoolShortCircuiting:
    # reference test_filter_bool_short_circuiting: plain-bool operands
    # collapse at BUILD time; a constant-result filter raises
    def _plain(self):
        q = QueryBuilder()
        return q[q["a"] < 5]

    def test_and_true(self):
        q = QueryBuilder()
        assert q[(q["a"] < 5) & True] == self._plain()

    def test_rand_true(self):
        q = QueryBuilder()
        assert q[True & (q["a"] < 5)] == self._plain()

    def test_or_false(self):
        q = QueryBuilder()
        assert q[(q["a"] < 5) | False] == self._plain()

    def test_ror_false(self):
        q = QueryBuilder()
        assert q[False | (q["a"] < 5)] == self._plain()

    def test_and_false_raises(self):
        q = QueryBuilder()
        with pytest.raises(InternalException):
            q[(q["a"] < 5) & False]

    def test_rand_false_raises(self):
        q = QueryBuilder()
        with pytest.raises(InternalException):
            q[False & (q["a"] < 5)]

    def test_or_true_raises(self):
        q = QueryBuilder()
        with pytest.raises(InternalException):
            q[(q["a"] < 5) | True]

    def test_ror_true_raises(self):
        q = QueryBuilder()
        with pytest.raises(InternalException):
            q[True | (q["a"] < 5)]

    def test_xor_true_is_not(self):
        q1 = QueryBuilder()
        q1 = q1[(q1["a"] < 5) ^ True]
        q2 = QueryBuilder()
        q2 = q2[~(q2["a"] < 5)]
        assert q1 == q2

    def test_xor_false(self):
        q = QueryBuilder()
        assert q[(q["a"] < 5) ^ False] == self._plain()

    def test_short_circuit_executes(self, tmp_lib):
        df = pd.DataFrame({"a": np.arange(10, dtype=np.int64)})
        tmp_lib.write("sym", df)
        q = QueryBuilder()
        q = q[(q["a"] < 5) & True]
        out = tmp_lib.read("sym", query_builder=q, output_format="pandas")
        assert out["a"].tolist() == [0, 1, 2, 3, 4]
