"""Ternary (where) semantics ported from the reference's
``python/tests/unit/arcticdb/version_store/test_ternary.py``.

Oracle is ``np.where`` over pandas frames, exactly as the reference tests
compute their expected values.
"""
import numpy as np
import pandas as pd
import pytest

from arcticdb_spark.expr import ExpressionError
from arcticdb_spark.query import QueryBuilder, where


def _df():
    return pd.DataFrame({
        "ts": pd.date_range("2024-01-01", periods=6),
        "conditional": [True, False, False, True, False, True],
        "int64_1": np.arange(6, dtype=np.int64),
        "int64_2": np.arange(10, 16, dtype=np.int64),
        "int8": np.arange(-6, 0, dtype=np.int64),
        "f64": np.arange(6, dtype=np.float64),
    })


def _run(lib, pdf, q):
    lib.write("sym", pdf)
    out = lib.read("sym", query_builder=q, output_format="pandas")
    lib.delete("sym")
    return out.sort_values("ts").reset_index(drop=True)


def test_project_ternary_column_column_numeric(tmp_lib):
    # reference test_project_ternary_column_column_numeric
    pdf = _df()
    q = QueryBuilder()
    q = q.apply("new_col", where(q["conditional"], q["int64_1"], q["int64_2"]))
    out = _run(tmp_lib, pdf, q)
    exp = np.where(pdf["conditional"], pdf["int64_1"], pdf["int64_2"])
    assert (out["new_col"].to_numpy() == exp).all()

    # int/float mix promotes to float64
    q = QueryBuilder()
    q = q.apply("new_col", where(q["conditional"], q["int64_1"], q["f64"]))
    out = _run(tmp_lib, pdf, q)
    assert out["new_col"].dtype == np.float64
    exp = np.where(pdf["conditional"], pdf["int64_1"], pdf["f64"])
    assert np.allclose(out["new_col"].to_numpy(), exp)


def test_project_ternary_column_column_strings(tmp_lib):
    # reference test_project_ternary_column_column_dynamic_strings: missing
    # values flow through the chosen branch
    pdf = pd.DataFrame({
        "ts": pd.date_range("2024-01-01", periods=6),
        "conditional": [True, False, False, True, False, True],
        "col1": ["a", "b", "c", None, "e", "f"],
        "col2": ["g", "h", "i", "j", None, "l"],
    })
    q = QueryBuilder()
    q = q.apply("new_col", where(q["conditional"], q["col1"], q["col2"]))
    out = _run(tmp_lib, pdf, q)
    exp = np.where(pdf["conditional"], pdf["col1"], pdf["col2"])
    got = out["new_col"].to_numpy()
    for g, e in zip(got, exp):
        assert (g is None and e is None) or g == e


def test_project_ternary_column_value_both_orders(tmp_lib):
    # reference test_project_ternary_column_value_numeric / _strings
    pdf = _df()
    for a, b, exp in [
        (lambda q: q["int64_1"], 10,
         np.where(_df()["conditional"], _df()["int64_1"], 10)),
        (10, lambda q: q["int64_1"],
         np.where(_df()["conditional"], 10, _df()["int64_1"])),
    ]:
        q = QueryBuilder()
        av = a(q) if callable(a) else a
        bv = b(q) if callable(b) else b
        q = q.apply("new_col", where(q["conditional"], av, bv))
        out = _run(tmp_lib, pdf, q)
        assert (out["new_col"].to_numpy() == exp).all()

    pdf2 = pd.DataFrame({
        "ts": pd.date_range("2024-01-01", periods=6),
        "conditional": [True, False, False, True, False, True],
        "col1": ["a", "b", "c", "d", "e", "f"],
    })
    q = QueryBuilder()
    q = q.apply("new_col", where(q["conditional"], q["col1"], "h"))
    out = _run(tmp_lib, pdf2, q)
    exp = np.where(pdf2["conditional"], pdf2["col1"], "h")
    assert (out["new_col"].to_numpy() == exp).all()


def test_project_ternary_value_value(tmp_lib):
    # reference test_project_ternary_value_value_numeric / _string
    pdf = _df()
    q = QueryBuilder()
    q = q.apply("new_col", where(q["conditional"], 0, 1))
    out = _run(tmp_lib, pdf, q)
    assert (out["new_col"].to_numpy()
            == np.where(pdf["conditional"], 0, 1)).all()

    q = QueryBuilder()
    q = q.apply("new_col", where(q["conditional"], "hello", "goodbye"))
    out = _run(tmp_lib, pdf, q)
    assert (out["new_col"].to_numpy()
            == np.where(pdf["conditional"], "hello", "goodbye")).all()


def test_filter_ternary_bitset_bitset_and_column(tmp_lib):
    # reference test_filter_ternary_bitset_bitset / _bitset_column /
    # _bool_columns / _bitset_value
    pdf = _df()
    # bitset/bitset
    q = QueryBuilder()
    q = q[where(q["int64_1"] < 3, q["int64_2"] > 11, q["f64"] >= 4.0)]
    out = _run(tmp_lib, pdf, q)
    mask = np.where(pdf["int64_1"] < 3, pdf["int64_2"] > 11, pdf["f64"] >= 4.0)
    assert (out["int64_1"].to_numpy()
            == pdf.loc[mask, "int64_1"].to_numpy()).all()

    # bitset/bool-column
    q = QueryBuilder()
    q = q[where(q["int64_1"] < 3, q["conditional"], q["f64"] >= 4.0)]
    out = _run(tmp_lib, pdf, q)
    mask = np.where(pdf["int64_1"] < 3, pdf["conditional"], pdf["f64"] >= 4.0)
    assert len(out) == int(mask.sum())

    # bool-column condition, bool columns both branches
    q = QueryBuilder()
    q = q[where(q["conditional"], q["conditional"], ~q["conditional"])]
    out = _run(tmp_lib, pdf, q)
    assert len(out) == int(np.where(
        pdf["conditional"], pdf["conditional"], ~pdf["conditional"]).sum())


def test_filter_ternary_full_and_empty_results(tmp_lib):
    # reference test_filter_ternary_bitset_full_and_empty_results: the
    # condition bitset may select everything or nothing
    pdf = _df()
    q = QueryBuilder()
    q = q[where(q["int64_1"] >= 0, q["int64_2"] > 11, q["f64"] >= 4.0)]
    out = _run(tmp_lib, pdf, q)
    assert len(out) == int((pdf["int64_2"] > 11).sum())

    q = QueryBuilder()
    q = q[where(q["int64_1"] < 0, q["int64_2"] > 11, q["f64"] >= 4.0)]
    out = _run(tmp_lib, pdf, q)
    assert len(out) == int((pdf["f64"] >= 4.0).sum())


def test_ternary_invalid_conditions(tmp_lib):
    # reference test_filter_ternary_invalid_conditions
    pdf = _df()
    tmp_lib.write("sym", pdf)
    # non-bool condition column
    q = QueryBuilder()
    q = q[where(q["int64_1"], q["int64_1"] < 0, q["int64_1"] >= 0)]
    with pytest.raises(ExpressionError):
        tmp_lib.read("sym", query_builder=q)
    # plain value condition
    q = QueryBuilder()
    q = q[where(True, q["int64_1"] < 0, q["int64_1"] >= 0)]
    with pytest.raises(ExpressionError):
        tmp_lib.read("sym", query_builder=q)


def test_ternary_invalid_arguments(tmp_lib):
    # reference test_filter_ternary_invalid_arguments: incompatible branch
    # kinds raise instead of letting Spark implicitly cast
    pdf = pd.DataFrame({
        "ts": pd.date_range("2024-01-01", periods=2),
        "conditional": [True, False],
        "col1": [0, 1],
        "col2": ["hello", "there"],
    })
    tmp_lib.write("sym", pdf)
    bad = [
        lambda q: where(q["conditional"], q["col1"], q["conditional"]),
        lambda q: where(q["conditional"], q["conditional"], q["col1"]),
        lambda q: where(q["conditional"], 0, q["col1"] == 0),
        lambda q: where(q["conditional"], q["col1"] == 0, 0),
        lambda q: where(q["conditional"], q["col1"], q["col2"]),
        lambda q: where(q["conditional"], q["col1"], "hello"),
        lambda q: where(q["conditional"], 0, "hello"),
    ]
    for mk in bad:
        q = QueryBuilder()
        q = q[mk(q)]
        with pytest.raises(ExpressionError):
            tmp_lib.read("sym", query_builder=q)


def test_filter_ternary_pythonic_syntax():
    # reference test_filter_ternary_pythonic_syntax: `a if cond else b`
    # calls bool(cond) which must raise
    q = QueryBuilder()
    with pytest.raises(ExpressionError):
        q[q["col1"] if q["conditional"] else q["col2"]]


def test_filter_requires_boolean_expression(tmp_lib):
    # reference FilterClause rejects a non-bitset expression; Spark would
    # otherwise implicitly cast ints to bool
    pdf = _df()
    tmp_lib.write("sym", pdf)
    q = QueryBuilder()
    q = q[q["int64_1"] + 1]
    with pytest.raises(ExpressionError):
        tmp_lib.read("sym", query_builder=q)
