"""Symbol concatenation — reference ``ConcatClause`` (``clause.cpp:1083-1124``)
and ``join_schemas`` outer/inner schema merge with type promotion
(``clause_utils.cpp:230+``; Python surface ``processing.py:1059-1127``,
``library.py:2348`` ``read_batch_and_join``).

Spark-first: ``unionByName(allowMissingColumns=True)`` after casting every
shared column to the promoted common type. A union is a zero-shuffle
narrow op in Spark — at 100 TB this costs nothing beyond the scans.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# numeric widening lattice, mirroring promotable_type
# (reference cpp/arcticdb/entity/type_utils.hpp:40)
_NUM_ORDER = [T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
              T.FloatType(), T.DoubleType()]


def default_fill_lit(dtype: T.DataType):
    """Reference ``util/sparse_utils.hpp:76-88`` default_initialize: cells a
    segment/frame does not store backfill **0 for integers, False for
    bools**, and missing (NaN / NaT / None -> NULL) for float / time /
    string — the reference's non-nullable layout."""
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType,
                          T.LongType)):
        return F.lit(0).cast(dtype)
    if isinstance(dtype, T.BooleanType):
        return F.lit(False)
    return F.lit(None).cast(dtype)


def promote_types(a: T.DataType, b: T.DataType) -> T.DataType:
    if a == b:
        return a
    if isinstance(a, T.NullType):
        return b
    if isinstance(b, T.NullType):
        return a
    num = {type(t) for t in _NUM_ORDER}
    if type(a) in num and type(b) in num:
        ia, ib = ([type(t) for t in _NUM_ORDER].index(type(a)),
                  [type(t) for t in _NUM_ORDER].index(type(b)))
        hi = _NUM_ORDER[max(ia, ib)]
        # int32/int64 + float32 -> float64: float32's 24-bit mantissa cannot
        # hold every int32, so the reference widens to float64 to avoid
        # precision loss (type_utils.hpp has_valid_common_type; pinned by
        # reference test_column_type_changes.py
        # test_type_promotion_int32_and_float32_up_to_float64). Ints <=16 bit
        # fit exactly in float32 and stay there.
        if isinstance(hi, T.FloatType) and (
                isinstance(a, (T.IntegerType, T.LongType))
                or isinstance(b, (T.IntegerType, T.LongType))):
            return T.DoubleType()
        return hi
    if {type(a), type(b)} == {T.TimestampType, T.TimestampNTZType}:
        return T.TimestampType()
    raise TypeError(f"cannot promote {a} with {b}")


def concat(dfs: list[DataFrame], join: str = "outer") -> DataFrame:
    """Row-wise concatenation of N frames.

    join='outer': union of columns; cells of a column missing from a frame
    backfill with the promoted type's DEFAULT — 0 for ints, False for
    bools, NULL for float/time/string (reference join_schemas + the
    default_initialize rule; pinned by test_symbol_concatenation.py:191
    ``fillna(0).astype(int64)``). join='inner': intersection of columns.
    Column order: first frame's order, then new columns in encounter order.
    """
    if not dfs:
        raise ValueError("concat of zero frames")
    if len(dfs) == 1:
        return dfs[0]
    if join not in ("outer", "inner"):
        raise ValueError("join must be 'outer' or 'inner'")

    # promoted common type per column name; uint64 bit-pattern columns may
    # only meet other uint64 columns (no common type with signed int64 —
    # reference type_utils.cpp:141-155; a silent union would reinterpret
    # bit patterns)
    from arcticdb_spark.expr import UINT64_META
    merged: dict[str, T.DataType] = {}
    u64_status: dict[str, bool] = {}
    orders: list[list[str]] = []
    for df in dfs:
        orders.append(df.columns)
        for f in df.schema.fields:
            if not isinstance(f.dataType, T.NullType):  # EMPTY: no opinion
                is_u64 = bool((f.metadata or {}).get(UINT64_META))
                if u64_status.setdefault(f.name, is_u64) != is_u64:
                    raise TypeError(
                        f"concat column {f.name!r} mixes uint64 and signed "
                        "integers across frames (no common type)")
            merged[f.name] = (promote_types(merged[f.name], f.dataType)
                              if f.name in merged else f.dataType)

    def _out(col, name):   # keep the uint64 marker through the cast
        if u64_status.get(name):
            return col.alias(name, metadata={UINT64_META: True})
        return col.alias(name)

    if join == "inner":
        common = set(orders[0])
        for cols in orders[1:]:
            common &= set(cols)
        keep = [c for c in orders[0] if c in common]
        casted = [df.select([_out(F.col(c).cast(merged[c]), c) for c in keep])
                  for df in dfs]
        return reduce(lambda a, b: a.unionByName(b), casted)

    # outer: attach missing columns as typed-default literals BEFORE the
    # union (a post-union coalesce would also mask genuine nulls in frames
    # that do store the column; pre-union literals only fill truly-absent
    # cells). Still a zero-shuffle narrow union.
    all_cols = list(orders[0]) + [c for o in orders[1:] for c in o
                                  if c not in orders[0]]
    seen: list[str] = []
    ordered = [c for c in all_cols if not (c in seen or seen.append(c))]
    casted = [df.select([_out(F.col(c).cast(merged[c]) if c in df.columns
                              else default_fill_lit(merged[c]), c)
                         for c in ordered])
              for df in dfs]
    return reduce(lambda a, b: a.unionByName(b), casted)
