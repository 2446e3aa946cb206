"""Resample — pandas-compatible time-bucketed aggregation (the reference's
flagship operator, ``processing.py:722-925`` + ``clause_resample.cpp``).

Semantics reproduced here:
* rules: any fixed-width pandas offset string (ns/us/ms/s/min/h/D multiples
  and combinations) — parsed via ``pandas.tseries.frequencies.to_offset``;
* ``closed`` / ``label`` in {left, right}, defaults left/left for these rules;
* ``offset`` and ``origin`` in {epoch, start, start_day, end, end_day,
  Timestamp} (reference ``processing.py:880-895``);
* aggregators: sum / mean / min / max / count / first / last
  (``sorted_aggregation.hpp:102``);
* empty buckets are dropped (reference drops them, ``processing.py:749-750``)
  — Spark's groupBy never emits them, so this is free.

Spark-first design: instead of the reference's sorted linear scan per bucket,
we compute the bucket start with **exact int64 nanosecond arithmetic**
(``pmod`` on longs — no double rounding at 1e18 ns magnitudes, stays inside
whole-stage codegen) and hash-aggregate on it. first/last use
``min_by/max_by`` over the timestamp because a shuffle destroys row order —
plain ``F.first`` would be nondeterministic. At 100 TB this is a single
map-side-combined shuffle on the bucket key; no windowing, no sort.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SORTED_AGGS = {"sum", "mean", "min", "max", "count", "first", "last",
                "std", "var", "median"}


def rule_to_nanos(rule: str) -> int:
    off = pd.tseries.frequencies.to_offset(rule)
    try:
        return off.nanos
    except ValueError as e:  # non-fixed freq like 'M'
        raise ValueError(f"resample rule {rule!r} is not a fixed frequency") from e


def _ts_nanos(col: Column) -> Column:
    # Spark timestamps are µs precision; exact long math (no doubles).
    # cast handles TIMESTAMP_NTZ inputs (naive parquet timestamps) — the
    # session timezone is pinned to UTC so the cast is value-preserving.
    return F.unix_micros(col.cast("timestamp")) * F.lit(1000)


def bucket_start_nanos(ts_ns: Column, rule_ns: int, origin_ns: int,
                       closed: str) -> Column:
    """Exact bucket-left edge in ns. closed='right' puts boundary points in
    the bucket *ending* there: shift by 1ns before flooring."""
    d = ts_ns - F.lit(origin_ns)
    if closed == "right":
        d = d - F.lit(1)
    start = d - F.pmod(d, F.lit(rule_ns))
    return start + F.lit(origin_ns)


def resolve_origin(df: DataFrame, ts_col: str, origin: Any, offset: str | None,
                   rule_ns: int, ns_src: Column | None = None) -> int:
    """Origin in ns since epoch. 'start'/'end' variants need a min/max scan
    (tiny agg job, same as the reference's index-range read). ``ns_src``:
    exact LONG-ns source column for an ns-physical index."""
    if isinstance(origin, str) and origin in ("start", "start_day", "end", "end_day"):
        src = ns_src if ns_src is not None else F.col(ts_col)
        agg = F.min(src) if origin.startswith("start") else F.max(src)
        val = df.select(agg).first()[0]
        t = pd.Timestamp(val)
        # pandas TimeGrouper anchors (core/resample.py _get_timestamp_range_edges):
        #   start:     data min          start_day: floor-midnight of first day
        #   end:       data max          end_day:   ceiling-midnight of last day
        # Bucket edges are then aligned mod rule to this anchor — no extra
        # epoch flooring (reference processing.py:890-895 keeps all six exact).
        if origin == "start_day":
            t = t.normalize()
        elif origin == "end_day":
            t = t.ceil("D")
        origin_ns = t.value
    elif origin in (None, "epoch"):
        origin_ns = 0
    else:
        origin_ns = pd.Timestamp(origin).value
    if offset:
        origin_ns += pd.Timedelta(offset).value
    return origin_ns


def nan_safe(c: Column, dtype: str | None) -> Column:
    """NaN -> null for float agg inputs (reference kernels skip NaN; Spark
    aggregates skip null but would propagate NaN through sum/mean)."""
    if dtype in ("float", "double"):
        return F.nanvl(c.cast("double"), F.lit(None).cast("double"))
    return c


def compile_agg(out_name: str, in_col: str, how: str, ts_col: str,
                dtypes: dict[str, str],
                u64: frozenset = frozenset(),
                unsigned: frozenset = frozenset()) -> Column:
    """One resample/groupby aggregator -> Spark agg Column.

    Spark aggregates skip nulls natively; float inputs are nanvl-normalized
    so NaN is skipped too (matches reference kernels
    ``unsorted_aggregation.cpp`` / ``sorted_aggregation.cpp``).

    ``u64`` names LONG columns that hold uint64 bit patterns (catalog
    uint64 marker): min/max flip the sign bit so signed aggregation
    implements unsigned order; sum wraps mod 2^64 (= plain long sum under
    ansi=false, matching the reference's uint64 accumulate); mean/std/var/
    median convert exactly to double; the uint64-preserving aggregates
    re-attach the marker on their alias.
    """
    how = how.lower()
    dt = dtypes.get(in_col)
    if in_col in u64 and dt == "bigint":
        from arcticdb_spark.expr import UINT64_META, _u64_flip, _u64_to_double
        umeta = {UINT64_META: True}
        c = F.col(in_col)
        if how == "sum":
            return F.coalesce(F.sum(c), F.lit(0).cast("long")) \
                    .alias(out_name, metadata=umeta)
        if how == "min":
            return _u64_flip(F.min(_u64_flip(c))).alias(out_name,
                                                        metadata=umeta)
        if how == "max":
            return _u64_flip(F.max(_u64_flip(c))).alias(out_name,
                                                        metadata=umeta)
        if how == "count":
            return F.count(c).alias(out_name, metadata=umeta)
        if how == "first":
            return F.min_by(c, F.when(c.isNotNull(), F.col(ts_col))) \
                    .alias(out_name, metadata=umeta)
        if how == "last":
            return F.max_by(c, F.when(c.isNotNull(), F.col(ts_col))) \
                    .alias(out_name, metadata=umeta)
        d = _u64_to_double(c)
        if how == "mean":
            return F.avg(d).alias(out_name)
        if how == "std":
            return F.stddev_samp(d).alias(out_name)
        if how == "var":
            return F.var_samp(d).alias(out_name)
        if how == "median":
            return F.median(d).alias(out_name)
        raise ValueError(f"unsupported aggregator {how!r} on uint64 column")
    # reference per-type support matrix (processing.py:742-747): strings
    # support only count/first/last; timestamps everything except sum
    if dt == "string" and how in ("sum", "mean", "min", "max"):
        raise ValueError(f"aggregator {how!r} unsupported on string column {in_col!r}")
    if dt is not None and dt.startswith("timestamp") and how == "sum":
        raise ValueError(f"sum unsupported on timestamp column {in_col!r}")
    c = nan_safe(F.col(in_col), dt)
    if how == "sum":
        # reference SumAggregator starts at 0 and skips missing: a group with
        # no valid values yields 0, not null (pandas matches; Spark gives
        # null) — get_default_value, unsorted_aggregation.hpp:76-88.
        # Output dtype promotes to the LARGEST type of the input's category
        # (common_sum_aggregation_dtype): signed -> int64, float -> float64,
        # and bool / small-unsigned -> uint64 (the value is a non-negative
        # long, so the uint64 marker is a pure dtype re-view on output).
        if dt == "boolean":
            from arcticdb_spark.expr import UINT64_META
            return F.coalesce(F.sum(c.cast("long")),
                              F.lit(0).cast("long")) \
                    .alias(out_name, metadata={UINT64_META: True})
        if in_col in unsigned and dt in ("tinyint", "smallint", "int",
                                         "bigint"):
            from arcticdb_spark.expr import UINT64_META
            return F.coalesce(F.sum(c.cast("long")),
                              F.lit(0).cast("long")) \
                    .alias(out_name, metadata={UINT64_META: True})
        zero = F.lit(0).cast("long") if dt and dt in ("tinyint", "smallint",
                                                      "int", "bigint") \
            else F.lit(0.0)
        return F.coalesce(F.sum(c), zero).alias(out_name)
    if how == "mean":
        if dt is not None and dt.startswith("timestamp"):
            # reference MeanAggregator supports timestamps (test_mean_
            # aggregation_timestamp): average the epoch micros exactly
            # (decimal avg — a double sum loses sub-µs exactness at large
            # group counts) and round back to a timestamp
            micros = F.unix_micros(c).cast("decimal(20,0)")
            return F.timestamp_micros(
                F.round(F.avg(micros)).cast("long")).alias(out_name)
        if dt == "boolean":
            return F.avg(c.cast("long")).alias(out_name)
        return F.avg(c).alias(out_name)
    # value-preserving aggregates keep the INPUT dtype (reference: min/max/
    # first/last of float32 stay float32) — nan_safe upcast floats to
    # double for NaN-skip, so cast the result back
    keep_t = "float" if dt == "float" else None
    if how == "min":
        m = F.min(c)
        return (m.cast(keep_t) if keep_t else m).alias(out_name)
    if how == "max":
        m = F.max(c)
        return (m.cast(keep_t) if keep_t else m).alias(out_name)
    if how == "count":
        # non-null count; uint64 in the reference (processing.py:746)
        from arcticdb_spark.expr import UINT64_META
        return F.count(c).alias(out_name, metadata={UINT64_META: True})
    if how == "std":      # extension beyond the reference's 7 aggregators
        return F.stddev_samp(c).alias(out_name)
    if how == "var":
        return F.var_samp(c).alias(out_name)
    if how == "median":
        return F.median(c).alias(out_name)
    if how == "first":
        # earliest-by-timestamp non-null value; shuffle-safe
        m = F.min_by(c, F.when(c.isNotNull(), F.col(ts_col)))
        return (m.cast(keep_t) if keep_t else m).alias(out_name)
    if how == "last":
        m = F.max_by(c, F.when(c.isNotNull(), F.col(ts_col)))
        return (m.cast(keep_t) if keep_t else m).alias(out_name)
    raise ValueError(f"unsupported aggregator {how!r} (supported: {_SORTED_AGGS})")


def normalize_agg_spec(aggregations: dict) -> list[tuple[str, str, str]]:
    """Reference agg dict forms -> [(out_name, in_col, how)].

    ``{"col": "sum"}`` or ``{"out": ("col", "sum")}`` (processing.py:591-691).
    """
    out = []
    for k, v in aggregations.items():
        if isinstance(v, str):
            out.append((k, k, v))
        elif isinstance(v, (tuple, list)) and len(v) == 2:
            out.append((k, v[0], v[1]))
        else:
            raise ValueError(f"bad aggregation spec {k}: {v}")
    return out


def resample(df: DataFrame, ts_col: str, rule: str, aggregations: dict,
             closed: str | None = None, label: str | None = None,
             offset: str | None = None, origin: Any = "epoch") -> DataFrame:
    """Down-sample ``df`` on ``ts_col``; returns one row per non-empty bucket,
    bucket timestamp in ``ts_col`` (left or right label)."""
    rule_ns = rule_to_nanos(rule)
    if rule_ns % 1000:
        # bucket labels are emitted as µs timestamps (Spark's type
        # ceiling): two sub-µs buckets would collide on the same label —
        # reject loudly instead of returning ambiguous output
        raise ValueError(
            f"resample rule {rule!r} is finer than 1µs: bucket labels are "
            "µs timestamps and would collide; aggregate on the spark-ns "
            "LONG index directly for sub-µs bucketing")
    # end origins flip the default boundary to right (reference
    # processing.py:898-906, mirroring pandas TimeGrouper.__init__)
    end_origin = isinstance(origin, str) and origin in ("end", "end_day")
    closed = closed or ("right" if end_origin else "left")
    label = label or ("right" if end_origin else "left")
    if closed not in ("left", "right") or label not in ("left", "right"):
        raise ValueError("closed/label must be 'left' or 'right'")
    # an ns-physical Library index carries an exact LONG shadow — bucket in
    # true ns instead of the µs view (NaT sentinel back to null so NaT rows
    # drop out of the bucket key like a null timestamp would)
    from arcticdb_spark.catalog import NAT_SENTINEL, ns_shadow_col
    shadow = ns_shadow_col(ts_col)
    ns_src = (F.nullif(F.col(shadow), F.lit(NAT_SENTINEL))
              if shadow in df.columns else None)
    origin_ns = resolve_origin(df, ts_col, origin, offset, rule_ns,
                               ns_src=ns_src)

    specs = normalize_agg_spec(aggregations)
    ts_ns = ns_src if ns_src is not None else _ts_nanos(F.col(ts_col))
    start_ns = bucket_start_nanos(ts_ns, rule_ns, origin_ns, closed)
    label_ns = start_ns + F.lit(rule_ns) if label == "right" else start_ns
    # ns -> µs must stay exact: long `/` is double division and at ~1.7e18 ns
    # the pre-division rounding error can truncate the quotient one µs low.
    # Floor to a multiple of 1000 in long math, then divide in decimal
    # (exact for any int64 input).
    label_us = ((label_ns - F.pmod(label_ns, F.lit(1000)))
                .cast("decimal(38,0)") / F.lit(1000)).cast("long")
    bucket = F.timestamp_micros(label_us).alias(ts_col)

    dtypes = dict(df.dtypes)
    from arcticdb_spark.expr import UINT64_META, UNSIGNED_META
    u64 = frozenset(f.name for f in df.schema.fields
                    if (f.metadata or {}).get(UINT64_META))
    unsigned = frozenset(f.name for f in df.schema.fields
                         if (f.metadata or {}).get(UNSIGNED_META))
    aggs = [compile_agg(o, i, h, ts_col, dtypes, u64, unsigned)
            for (o, i, h) in specs]
    out = df.groupBy(bucket).agg(*aggs)
    return out.orderBy(ts_col)
