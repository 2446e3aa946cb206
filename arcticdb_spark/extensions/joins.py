"""Join extensions: as-of join and range join.

The reference has no joins between arbitrary tables (SURVEY §2.3); these are
the Spark-first extensions a timeseries engine needs.

**as-of join** (match each left row to the latest right row with
``right.ts <= left.ts`` per key): implemented as the classic union-merge —
tag both sides, union, and carry the last right-side values forward with a
``last(..., ignorenulls=True)`` window per key ordered by (ts, side).

Scale shape: ONE shuffle (the window's partitionBy key), no cartesian, no
per-key Python. This beats the broadcast-filter-max pattern whenever the
right side is large, and is exactly how KDB/Flink implement aj/temporal
joins. Skewed keys: AQE or pre-salting on the union input.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              by: str | list[str] | None = None,
              direction: str = "backward",
              suffix: str = "_right") -> DataFrame:
    """pandas.merge_asof semantics (allow_exact_matches=True).

    on: ordering (timestamp) column, same name both sides.
    by: optional equality key(s).
    direction: 'backward' (latest right.ts <= left.ts) or 'forward'.
    Right's non-key columns are appended (suffixed on collision).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = [by] if isinstance(by, str) else (list(by) if by else [])

    rcols = [c for c in right.columns if c != on and c not in by]
    out_names = {c: (c + suffix if c in left.columns else c) for c in rcols}

    lhs = left.select(*left.columns,
                      F.lit(1).alias("__side__"),
                      *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
                        for c in rcols])
    rhs = right.select(*[(F.col(c) if c in ([on] + by)
                          else F.lit(None).cast(left.schema[c].dataType).alias(c))
                         for c in left.columns],
                       F.lit(0).alias("__side__"),
                       *[F.col(c).alias(f"__r_{c}") for c in rcols])
    rhs = rhs.select(lhs.columns)
    u = lhs.unionByName(rhs)

    order = [F.col(on).asc(), F.col("__side__").asc()] if direction == "backward" \
        else [F.col(on).desc(), F.col("__side__").asc()]

    if by:
        w = Window.partitionBy(*by) \
            .orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
        filled = u.select(
            *left.columns, "__side__",
            *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(out_names[c])
              for c in rcols])
        return filled.filter(F.col("__side__") == 1).drop("__side__")

    # Keyless as-of: a single global window would put the whole union on one
    # task. Instead, range-bucket the timeline (two-phase prefix scan):
    #   1. per-bucket window fills values WITHIN each time bucket;
    #   2. a tiny per-bucket summary table (one row per bucket) is
    #      prefix-scanned to get each bucket's carry-in from earlier buckets
    #      (n_buckets rows — a single-task window over summaries is fine);
    #   3. carry-ins broadcast-join back; value = within-bucket fill else
    #      carry-in. One shuffle over the data (the bucket hash), O(buckets)
    #      small work — survives any table size.
    is_ts = str(u.schema[on].dataType).lower().startswith("timestamp")
    # bucket on epoch seconds (monotonic in ts — any monotonic truncation
    # yields a correct bucketing, only the balance changes)
    tcol = F.col(on).cast("timestamp").cast("long") if is_ts \
        else F.col(on).cast("long")
    lo_hi = u.select(F.min(tcol).alias("lo"), F.max(tcol).alias("hi")).first()
    lo, hi = lo_hi["lo"], lo_hi["hi"]
    if lo is None:      # empty input: any plan is fine
        lo, hi = 0, 0
    n_buckets = max(u.sparkSession.sparkContext.defaultParallelism * 4, 32)
    width = max(-(-(int(hi) - int(lo)) // n_buckets), 1)
    ub = u.withColumn("__bkt__", ((tcol - F.lit(int(lo))) / F.lit(width))
                      .cast("long"))

    w_in = Window.partitionBy("__bkt__").orderBy(*order) \
        .rowsBetween(Window.unboundedPreceding, 0)
    filled = ub.select(
        *left.columns, "__side__", "__bkt__",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w_in).alias(out_names[c])
          for c in rcols])

    # per-bucket last right-side value (right rows only), prefix-carried
    extreme = (F.max_by if direction == "backward" else F.min_by)
    summary = (ub.filter(F.col("__side__") == 0)
                 .groupBy("__bkt__")
                 .agg(*[extreme(f"__r_{c}", F.col(on)).alias(f"__v_{c}")
                        for c in rcols]))
    all_buckets = ub.select("__bkt__").distinct()
    carry_order = F.col("__bkt__").asc() if direction == "backward" \
        else F.col("__bkt__").desc()
    w_carry = Window.orderBy(carry_order) \
        .rowsBetween(Window.unboundedPreceding, -1)
    carries = (all_buckets.join(summary, "__bkt__", "left")
               .select("__bkt__",
                       *[F.last(f"__v_{c}", ignorenulls=True).over(w_carry)
                          .alias(f"__carry_{c}") for c in rcols]))

    out = (filled.join(F.broadcast(carries), "__bkt__", "left")
           .select(*left.columns, "__side__",
                   *[F.coalesce(out_names[c], f"__carry_{c}").alias(out_names[c])
                     for c in rcols]))
    return out.filter(F.col("__side__") == 1).drop("__side__")


def range_join(left: DataFrame, right: DataFrame, left_ts: str,
               right_lo: str, right_hi: str,
               by: list[str] | None = None,
               bucket: str = "1 hour") -> DataFrame:
    """Interval join: left rows matched to right intervals containing them.

    Bucketized: both sides exploded to coarse time buckets so the join is an
    equi-join on (by, bucket) + residual filter — avoids the O(n*m)
    broadcast-nested-loop Spark would otherwise pick.
    """
    import pandas as pd
    by = by or []
    step = int(pd.Timedelta(bucket).total_seconds())
    lb = left.withColumn("__bkt", (F.unix_timestamp(F.col(left_ts)) / step).cast("long"))
    rb = right.withColumn(
        "__bkt",
        F.explode(F.sequence((F.unix_timestamp(F.col(right_lo)) / step).cast("long"),
                             (F.unix_timestamp(F.col(right_hi)) / step).cast("long"))))
    cond = [lb["__bkt"] == rb["__bkt"]] + [lb[c] == rb[c] for c in by]
    j = lb.join(rb, cond).filter(
        (F.col(left_ts) >= F.col(right_lo)) & (F.col(left_ts) <= F.col(right_hi)))
    drop = [rb["__bkt"], lb["__bkt"]] + [rb[c] for c in by]
    for d in drop:
        j = j.drop(d)
    return j
