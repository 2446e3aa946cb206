"""Full-range uint64: storage, unsigned comparison semantics, membership,
aggregation — ported from the reference's uint64 filter coverage
(python/tests/unit/arcticdb/version_store/test_filtering.py:
test_filter_numeric_isin_unsigned, test_filter_numeric_isnotin_mixed_types_
exception, test_filter_numeric_membership_mixing_int64_and_uint64) plus the
comparison matrix from cpp/arcticdb/processing/signed_unsigned_comparison.hpp.

Spark-first design under test: uint64 columns are stored as their int64 BIT
PATTERNS with a norm-meta marker; the expression compiler (expr.py UINT kind)
implements unsigned order with sign-bit flips (pure long codegen, no UDFs,
no decimals), and pandas/arrow outputs bit-view back to uint64.
"""

import numpy as np
import pandas as pd
import pytest
# multi-version lifecycle / property stress: run in the FULL gate;
# deselect with -m "not slow" for the fast (<10 min) loop
pytestmark = pytest.mark.slow


from arcticdb_spark.catalog import (ArcticDbNotYetImplemented,
                                    SchemaException)
from arcticdb_spark.expr import ExpressionError
from arcticdb_spark.query import QueryBuilder

U64_MAX = 2**64 - 1
I64_MAX = 2**63 - 1
FULL = [0, 1, I64_MAX, 2**63, U64_MAX, 12345]


@pytest.fixture()
def ulib(tmp_lib):
    pdf = pd.DataFrame({
        "u": np.array(FULL, dtype=np.uint64),
        "i": np.array([0, 1, -1, 3, -100, 12345], dtype=np.int64),
        "f": np.array([0.0, 1.5, -1.0, 3.0, 4.0, 12345.0]),
        "s": list("abcdef"),
    })
    tmp_lib.write("u64", pdf)
    return tmp_lib


def _vals(lib, q, col="u"):
    out = lib.read("u64", query_builder=q, output_format="pandas")
    return sorted(int(v) for v in out[col].tolist())


# ---------------------------------------------------------------------------
# round trip
# ---------------------------------------------------------------------------

def test_roundtrip_pandas_and_arrow(ulib):
    back = ulib.read("u64", output_format="pandas")
    assert back["u"].dtype == "uint64"
    assert back["u"].tolist() == FULL
    tbl = ulib.read("u64", output_format="arrow")
    import pyarrow as pa
    assert tbl.schema.field("u").type == pa.uint64()
    assert tbl.column("u").to_pylist() == FULL


def test_empty_write_restores_uint64_dtype(tmp_lib):
    tmp_lib.write("e", pd.DataFrame({"u": np.array([], dtype=np.uint64)}))
    back = tmp_lib.read("e", output_format="pandas")
    assert back["u"].dtype == "uint64" and len(back) == 0


# ---------------------------------------------------------------------------
# unsigned comparisons: col vs constant
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("op,const,expect", [
    ("gt", 2**63, [U64_MAX]),
    ("ge", 2**63, [2**63, U64_MAX]),
    ("lt", 2**63, [0, 1, 12345, I64_MAX]),
    ("le", I64_MAX, [0, 1, 12345, I64_MAX]),
    ("eq", U64_MAX, [U64_MAX]),
    ("ne", U64_MAX, [0, 1, 12345, I64_MAX, 2**63]),
    # negative constants: every uint64 value is greater
    ("gt", -5, FULL),
    ("ge", -5, FULL),
    ("lt", -5, []),
    ("eq", -5, []),
    ("ne", -5, FULL),
])
def test_filter_uint64_vs_constant(ulib, op, const, expect):
    q = QueryBuilder()
    col = q["u"]
    expr = {"gt": lambda: col > const, "ge": lambda: col >= const,
            "lt": lambda: col < const, "le": lambda: col <= const,
            "eq": lambda: col == const, "ne": lambda: col != const}[op]()
    q = q[expr]
    assert _vals(ulib, q) == sorted(expect)


def test_constant_beyond_uint64_range_rejected(ulib):
    q = QueryBuilder()
    with pytest.raises(ExpressionError, match="uint64 range"):
        ulib.read("u64", query_builder=q[q["u"] > 2**64])


# ---------------------------------------------------------------------------
# mixed signed/unsigned column comparisons (signed_unsigned_comparison.hpp)
# ---------------------------------------------------------------------------

def test_uint64_vs_int64_column(ulib):
    pdf = pd.DataFrame({"u": np.array(FULL, dtype=np.uint64),
                        "i": np.array([0, 1, -1, 3, -100, 12345],
                                      dtype=np.int64)})
    for op, fn in [("gt", lambda a, b: a > b), ("lt", lambda a, b: a < b),
                   ("ge", lambda a, b: a >= b), ("le", lambda a, b: a <= b),
                   ("eq", lambda a, b: a == b), ("ne", lambda a, b: a != b)]:
        q = QueryBuilder()
        q = q[fn(q["u"], q["i"])]
        got = _vals(ulib, q)
        # oracle: exact Python big-int comparison per row
        exp = sorted(int(u) for u, i in zip(pdf["u"], pdf["i"])
                     if fn(int(u), int(i)))
        assert got == exp, f"op {op}: {got} != {exp}"


def test_int64_vs_uint64_column_mirrored(ulib):
    q = QueryBuilder()
    q = q[q["i"] < q["u"]]   # signed on the left
    exp = sorted(u for u, i in zip(FULL, [0, 1, -1, 3, -100, 12345]) if i < u)
    assert _vals(ulib, q) == exp


def test_uint64_vs_float_column(ulib):
    q = QueryBuilder()
    q = q[q["u"] > q["f"]]
    # unsigned value compared as double: 0>0 F, 1>1.5 F, max>-1 T,
    # 2^63>3 T, max>4 T... wait row order: u=I64_MAX pairs f=-1.0
    exp = sorted(u for u, f in zip(FULL, [0.0, 1.5, -1.0, 3.0, 4.0, 12345.0])
                 if float(u) > f)
    assert _vals(ulib, q) == exp


# ---------------------------------------------------------------------------
# membership (reference test_filter_numeric_isin_unsigned + mixing tests)
# ---------------------------------------------------------------------------

def test_filter_numeric_isin_unsigned(tmp_lib):
    # reference test_filtering.py:647-661 verbatim semantics
    tmp_lib.write("t", pd.DataFrame({"a": np.array([0, 1, U64_MAX],
                                                   dtype=np.uint64)}))
    q = QueryBuilder()
    q = q[q["a"].isin([0, 1, 2])]
    out = tmp_lib.read("t", query_builder=q, output_format="pandas")
    assert out["a"].dtype == "uint64"
    assert sorted(out["a"].tolist()) == [0, 1]


def test_isin_uint64_max_matches(ulib):
    q = QueryBuilder()
    q = q[q["u"].isin([U64_MAX, 7])]
    assert _vals(ulib, q) == [U64_MAX]


def test_isnotin_unsigned(ulib):
    q = QueryBuilder()
    q = q[q["u"].isnotin([0, 1, U64_MAX])]
    assert _vals(ulib, q) == [12345, I64_MAX, 2**63]


def test_isnotin_negative_only_set_matches_nothing(ulib):
    q = QueryBuilder()
    q = q[q["u"].isnotin([-3, -1])]   # negatives can never match a uint64
    assert _vals(ulib, q) == sorted(FULL)


def test_filter_numeric_isnotin_mixed_types_exception():
    # reference test_filtering.py:664-668: raised at BUILD time
    vals = [np.int64(-1), np.uint64(2**64 - 1)]  # > int64 max
    q = QueryBuilder()
    with pytest.raises(ExpressionError, match="double"):
        q["a"].isnotin(vals)


@pytest.mark.parametrize("op", ("in", "not in"))
@pytest.mark.parametrize("signed_type", (np.int8, np.int16, np.int32, np.int64))
@pytest.mark.parametrize("uint64_in", ("df", "vals"))
def test_filter_numeric_membership_mixing_int64_and_uint64(
        tmp_lib, op, signed_type, uint64_in):
    # reference test_filtering.py:738-760
    signed = signed_type(-1)
    if uint64_in == "df":
        df, vals = pd.DataFrame({"a": [np.uint64(U64_MAX)]}), [signed]
    else:
        df, vals = pd.DataFrame({"a": [signed]}), [np.uint64(U64_MAX)]
    sym = f"mix_{op}_{signed_type.__name__}_{uint64_in}"
    tmp_lib.write(sym, df)
    q = QueryBuilder()
    q = q[q["a"].isin(vals) if op == "in" else q["a"].isnotin(vals)]
    out = tmp_lib.read(sym, query_builder=q, output_format="pandas")
    expected = df[df["a"].isin(vals) if op == "in" else ~df["a"].isin(vals)]
    assert len(out) == len(expected)
    if len(expected):
        assert out["a"].tolist() == expected["a"].tolist()


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------

def test_groupby_uint64_aggs(tmp_lib):
    pdf = pd.DataFrame({
        "g": ["a", "a", "b", "b"],
        "u": np.array([2**63, 2**63, 5, 7], dtype=np.uint64),
    })
    tmp_lib.write("agg", pdf)
    q = QueryBuilder()
    q = q.groupby("g").agg({"umin": ("u", "min"), "umax": ("u", "max"),
                            "usum": ("u", "sum"), "umean": ("u", "mean"),
                            "ucnt": ("u", "count")})
    out = (tmp_lib.read("agg", query_builder=q, output_format="pandas")
           .sort_values("g").reset_index(drop=True))
    assert out["umin"].dtype == "uint64" and out["umax"].dtype == "uint64"
    assert out["umin"].tolist() == [2**63, 5]
    assert out["umax"].tolist() == [2**63, 7]
    # sum accumulates mod 2^64 (reference uint64 accumulator wraps):
    # 2^63 + 2^63 == 2^64 == 0
    assert out["usum"].tolist() == [0, 12]
    assert out["umean"].tolist() == [float(2**63), 6.0]
    assert out["ucnt"].tolist() == [2, 2]


def test_resample_uint64_minmax(tmp_lib):
    idx = pd.date_range("2024-01-01", periods=4, freq="30min")
    pdf = pd.DataFrame({"u": np.array([1, U64_MAX, 3, 2**63],
                                      dtype=np.uint64)}, index=idx)
    tmp_lib.write("rs", pdf)
    q = QueryBuilder()
    q = q.resample("1h").agg({"hi": ("u", "max"), "lo": ("u", "min")})
    out = tmp_lib.read("rs", query_builder=q, output_format="pandas")
    assert out["hi"].tolist() == [U64_MAX, 2**63]
    assert out["lo"].tolist() == [1, 3]
    assert out["hi"].dtype == "uint64"


# ---------------------------------------------------------------------------
# projection arithmetic
# ---------------------------------------------------------------------------

def test_project_uint64_plus_uint64_wraps(ulib):
    # uint64 + uint64 -> uint64 mod 2^64 (two's-complement long add)
    q = QueryBuilder()
    q = q.apply("w", q["u"] + q["u"])
    out = ulib.read("u64", query_builder=q, output_format="pandas")
    assert out["w"].dtype == "uint64"
    # query-builder reads do not guarantee write order: compare as multisets
    assert sorted(out["w"].tolist()) == sorted((v + v) % 2**64 for v in FULL)


def test_project_uint64_with_signed_promotes_double(ulib):
    # permissive combine (type_utils.cpp:254): uint64 op signed -> float64
    q = QueryBuilder()
    q = q.apply("w", q["u"] + q["i"])
    out = ulib.read("u64", query_builder=q, output_format="pandas")
    assert out["w"].dtype == "float64"
    exp = [float(u) + i for u, i in zip(FULL, [0, 1, -1, 3, -100, 12345])]
    assert sorted(out["w"].tolist()) == pytest.approx(sorted(exp), rel=1e-12)


def test_project_uint64_div_is_double(ulib):
    q = QueryBuilder()
    q = q.apply("w", q["u"] / q["u"])
    out = ulib.read("u64", query_builder=q, output_format="pandas")
    assert out["w"].dtype == "float64"


def test_abs_neg_uint64(ulib):
    q = QueryBuilder()
    q = q.apply("a", abs(q["u"])).apply("n", -q["u"])
    out = ulib.read("u64", query_builder=q, output_format="pandas")
    assert sorted(out["a"].tolist()) == sorted(FULL)   # abs is identity
    assert out["a"].dtype == "uint64"
    assert out["n"].dtype == "float64"
    assert sorted(out["n"].tolist()) == pytest.approx(
        sorted(-float(v) for v in FULL))


def test_ternary_uint64_branches(ulib):
    from arcticdb_spark.expr import where
    q = QueryBuilder()
    q = q.apply("w", where(q["i"] >= 0, q["u"], q["u"] + q["u"]))
    out = ulib.read("u64", query_builder=q, output_format="pandas")
    assert out["w"].dtype == "uint64"
    exp = [u if i >= 0 else (2 * u) % 2**64
           for u, i in zip(FULL, [0, 1, -1, 3, -100, 12345])]
    assert sorted(out["w"].tolist()) == sorted(exp)


# ---------------------------------------------------------------------------
# versioning-surface guards
# ---------------------------------------------------------------------------

def test_append_uint64_to_uint64_ok(tmp_lib):
    idx = pd.date_range("2024-01-01", periods=2, freq="1D")
    tmp_lib.write("s", pd.DataFrame(
        {"u": np.array([1, U64_MAX], dtype=np.uint64)}, index=idx))
    idx2 = pd.date_range("2024-01-03", periods=2, freq="1D")
    tmp_lib.append("s", pd.DataFrame(
        {"u": np.array([2**63, 7], dtype=np.uint64)}, index=idx2))
    back = tmp_lib.read("s", output_format="pandas")
    assert back["u"].tolist() == [1, U64_MAX, 2**63, 7]
    assert back["u"].dtype == "uint64"


def test_append_signed_to_uint64_raises(tmp_lib):
    idx = pd.date_range("2024-01-01", periods=2, freq="1D")
    tmp_lib.write("s", pd.DataFrame(
        {"u": np.array([1, U64_MAX], dtype=np.uint64)}, index=idx))
    idx2 = pd.date_range("2024-01-03", periods=1, freq="1D")
    with pytest.raises(SchemaException, match="uint64"):
        tmp_lib.append("s", pd.DataFrame({"u": np.array([5], dtype=np.int64)},
                                         index=idx2))


def test_append_uint64_to_signed_raises(tmp_lib):
    idx = pd.date_range("2024-01-01", periods=2, freq="1D")
    tmp_lib.write("s", pd.DataFrame({"u": np.array([1, 2], dtype=np.int64)},
                                    index=idx))
    idx2 = pd.date_range("2024-01-03", periods=1, freq="1D")
    with pytest.raises(SchemaException, match="uint64"):
        tmp_lib.append("s", pd.DataFrame(
            {"u": np.array([U64_MAX], dtype=np.uint64)}, index=idx2))


def test_update_uint64_range_surgery(tmp_lib):
    idx = pd.date_range("2024-01-01", periods=4, freq="1D")
    tmp_lib.write("s", pd.DataFrame(
        {"u": np.array([1, 2, 3, 4], dtype=np.uint64)}, index=idx))
    upd_idx = pd.date_range("2024-01-02", periods=2, freq="1D")
    tmp_lib.update("s", pd.DataFrame(
        {"u": np.array([U64_MAX, 2**63], dtype=np.uint64)}, index=upd_idx))
    back = tmp_lib.read("s", output_format="pandas")
    assert back["u"].tolist() == [1, U64_MAX, 2**63, 4]
    assert back["u"].dtype == "uint64"


def test_stage_finalize_uint64_roundtrip(tmp_lib):
    # chunk sidecars carry the uint64 marker into finalize's manifest
    tmp_lib.stage("s", pd.DataFrame(
        {"u": np.array([1, U64_MAX], dtype=np.uint64)}))
    tmp_lib.stage("s", pd.DataFrame(
        {"u": np.array([2**63, 7], dtype=np.uint64)}))
    tmp_lib.finalize_staged_data("s", sort=False)
    back = tmp_lib.read("s", output_format="pandas")
    assert back["u"].dtype == "uint64"
    assert sorted(back["u"].tolist()) == [1, 7, 2**63, U64_MAX]
    # and the QueryBuilder applies unsigned semantics on the result
    q = QueryBuilder()
    q = q[q["u"] >= 2**63]
    out = tmp_lib.read("s", query_builder=q, output_format="pandas")
    assert sorted(out["u"].tolist()) == [2**63, U64_MAX]


def test_stage_finalize_mixed_uint64_signed_raises(tmp_lib):
    tmp_lib.stage("s", pd.DataFrame(
        {"u": np.array([1, U64_MAX], dtype=np.uint64)}))
    tmp_lib.stage("s", pd.DataFrame(
        {"u": np.array([5, -2], dtype=np.int64)}))
    with pytest.raises(SchemaException, match="uint64"):
        tmp_lib.finalize_staged_data("s", sort=False)


def test_incomplete_read_restores_staged_uint64(tmp_lib):
    tmp_lib.stage("s", pd.DataFrame(
        {"u": np.array([3, U64_MAX], dtype=np.uint64)}))
    out = tmp_lib.read("s", incomplete=True, output_format="pandas")
    assert out["u"].dtype == "uint64"
    assert sorted(out["u"].tolist()) == [3, U64_MAX]


def test_finalize_append_signed_onto_uint64_symbol_raises(tmp_lib):
    idx = pd.date_range("2024-01-01", periods=2, freq="1D")
    tmp_lib.write("s", pd.DataFrame(
        {"u": np.array([1, U64_MAX], dtype=np.uint64)}, index=idx))
    tmp_lib.stage("s", pd.DataFrame(
        {"u": np.array([5, 6], dtype=np.int64)},
        index=pd.date_range("2024-02-01", periods=2, freq="1D")))
    with pytest.raises(SchemaException, match="uint64"):
        tmp_lib.finalize_staged_data("s", mode="append")


def test_column_selection_keeps_marker(ulib):
    back = ulib.read("u64", columns=["u"], output_format="pandas")
    assert back["u"].dtype == "uint64"
    assert back["u"].tolist() == FULL


def test_concat_uint64_with_signed_widens_to_float64(tmp_lib):
    """Concat resolves DATA columns through the reference's PERMISSIVE
    combine (clause_utils.cpp:326,385 outer/inner_join -> promotable_type,
    type_utils.cpp:254): uint64 + int64 -> FLOAT64, the unsigned side by
    exact unsigned value. (Append/update use the STRICT merge_descriptors
    path and still raise — test_append_signed_to_uint64_raises.)"""
    from arcticdb_spark.lazy import concat as lazy_concat
    tmp_lib.write("a", pd.DataFrame({"x": np.array([1, U64_MAX],
                                                   dtype=np.uint64)}))
    tmp_lib.write("b", pd.DataFrame({"x": np.array([1, -2],
                                                   dtype=np.int64)}))
    out = lazy_concat(tmp_lib.read_batch(["a", "b"], lazy=True),
                      "outer").collect(output_format="pandas")
    assert out["x"].dtype == "float64"
    assert sorted(out["x"].tolist()) == [-2.0, 1.0, 1.0, float(U64_MAX)]


def test_concat_uint64_both_sides_roundtrips(tmp_lib):
    from arcticdb_spark.lazy import concat as lazy_concat
    tmp_lib.write("a", pd.DataFrame({"x": np.array([1, U64_MAX],
                                                   dtype=np.uint64)}))
    tmp_lib.write("b", pd.DataFrame({"x": np.array([2**63, 7],
                                                   dtype=np.uint64)}))
    out = lazy_concat(tmp_lib.read_batch(["a", "b"], lazy=True),
                      "outer").collect(output_format="pandas")
    assert out["x"].dtype == "uint64"
    assert sorted(out["x"].tolist()) == [1, 7, 2**63, U64_MAX]


def test_pow_uint_uint_is_uint64(tmp_lib):
    """uint ^ uint -> uint64 (reference operation_types.hpp:238 PowOperator
    integer case; computed in double then cast back, PowOperator::apply)."""
    pdf = pd.DataFrame({
        "b": np.array([2, 3, 2, 7], dtype=np.uint64),
        "e": np.array([10, 2, 63, 0], dtype=np.uint64),
        "i": np.array([2, -3, 5, 1], dtype=np.int64),
    })
    tmp_lib.write("powsym", pdf)
    q = QueryBuilder()
    q = q.apply("w", q["b"] ** q["e"])
    out = tmp_lib.read("powsym", query_builder=q, output_format="pandas")
    assert out["w"].dtype == "uint64"
    assert sorted(out["w"].tolist()) == sorted([1024, 9, 2**63, 1])


def test_pow_int_uint_is_int64(tmp_lib):
    """signed base ^ unsigned exponent -> int64 (same promotion table)."""
    pdf = pd.DataFrame({
        "e": np.array([10, 2, 3, 0], dtype=np.uint64),
        "i": np.array([2, -3, 5, 1], dtype=np.int64),
    })
    tmp_lib.write("powsym2", pdf)
    q = QueryBuilder()
    q = q.apply("w", q["i"] ** q["e"])
    out = tmp_lib.read("powsym2", query_builder=q, output_format="pandas")
    assert out["w"].dtype == "int64"
    assert sorted(out["w"].tolist()) == sorted([1024, 9, 125, 1])


def test_pow_uint_signed_exponent_is_double(ulib):
    """unsigned base ^ signed exponent -> double (negative exponents are
    fractional)."""
    q = QueryBuilder()
    q = q.apply("w", q["u"] ** q["i"])
    out = ulib.read("u64", query_builder=q, output_format="pandas")
    assert out["w"].dtype == "float64"
