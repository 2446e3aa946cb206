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


def concat(dfs: list[DataFrame], join: str = "outer",
           index_cols: list[str] | None = None) -> DataFrame:
    """Row-wise concatenation of N frames.

    join='outer': union of columns; cells of a column missing from a frame
    backfill with the promoted type's DEFAULT — 0 for ints, False for
    bools, NULL for float/time/string (reference join_schemas + the
    default_initialize rule; pinned by test_symbol_concatenation.py:191
    ``fillna(0).astype(int64)``). join='inner': intersection of columns.
    Column order: first frame's order, then new columns in encounter order.

    uint64 columns: a DATA column that is uint64 in one frame and signed
    int / float in another widens to FLOAT64 with the unsigned side
    converted by exact unsigned value — the reference's concat join_schemas
    resolves data columns through the PERMISSIVE ``promotable_type``
    (``clause_utils.cpp:326,385`` inner/outer_join -> ``type_utils.cpp:254``
    fall back to FLOAT64 when both sides promote to it). INDEX columns go
    through the STRICT ``has_valid_common_type`` instead
    (``clause_utils.cpp:267`` generate_index_fields), where uint64 + signed
    has no common type (128 bits would be needed) — that mix raises.
    """
    if not dfs:
        raise ValueError("concat of zero frames")
    if len(dfs) == 1:
        return dfs[0]
    if join not in ("outer", "inner"):
        raise ValueError("join must be 'outer' or 'inner'")

    from arcticdb_spark.expr import UINT64_META, _u64_to_double
    idx_cols = set(index_cols or [])
    merged: dict[str, T.DataType] = {}
    u64_seen: dict[str, set[bool]] = {}
    orders: list[list[str]] = []
    for df in dfs:
        orders.append(df.columns)
        for f in df.schema.fields:
            if not isinstance(f.dataType, T.NullType):  # EMPTY: no opinion
                is_u64 = bool((f.metadata or {}).get(UINT64_META))
                u64_seen.setdefault(f.name, set()).add(is_u64)
                if len(u64_seen[f.name]) > 1 and f.name in idx_cols:
                    raise TypeError(
                        f"concat index column {f.name!r} mixes uint64 and "
                        "signed integers across frames (no common type; "
                        "reference clause_utils.cpp:267 strict index join)")
            merged[f.name] = (promote_types(merged[f.name], f.dataType)
                              if f.name in merged else f.dataType)
    # mixed uint64/signed data columns -> FLOAT64 (permissive combine)
    mixed_u64 = {c for c, s in u64_seen.items() if len(s) > 1}
    pure_u64 = {c for c, s in u64_seen.items() if s == {True}}
    for c in mixed_u64:
        merged[c] = T.DoubleType()

    def _cast(df, name, target):
        """Per-frame cast to the merged type; a uint64 bit-pattern source
        converts by exact unsigned VALUE when the target is double."""
        col = F.col(name)
        f = df.schema[name]
        if (name in mixed_u64 and (f.metadata or {}).get(UINT64_META)):
            return _u64_to_double(col).cast(target)
        return col.cast(target)

    def _out(col, name):   # keep the uint64 marker through the cast
        if name in pure_u64:
            return col.alias(name, metadata={UINT64_META: True})
        return col.alias(name)

    if join == "inner":
        common = set(orders[0])
        for cols in orders[1:]:
            common &= set(cols)
        keep = [c for c in orders[0] if c in common]
        casted = [df.select([_out(_cast(df, c, merged[c]), c) for c in keep])
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
    casted = [df.select([_out(_cast(df, c, merged[c]) if c in df.columns
                              else default_fill_lit(merged[c]), c)
                         for c in ordered])
              for df in dfs]
    return reduce(lambda a, b: a.unionByName(b), casted)
