"""Skew-handling: salted two-phase aggregation.

AQE's skew-join splitting covers joins; for aggregations over pathologically
hot keys (one key = 30% of a 100 TB table), pre-salting bounds any single
reducer: phase 1 aggregates (key, salt) partials, phase 2 merges the <=
``salt`` partials per key. Only algebraic aggregates (sum/count/min/max —
and mean as sum+count) can be salted; use it when a key histogram says the
top key exceeds what one executor core should hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_PART = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}


def salted_groupby(df: DataFrame, key: str, aggs: dict, salt: int = 16
                   ) -> DataFrame:
    """aggs: {out_name: (in_col, how)} with how in sum/count/min/max/mean."""
    spec = []
    for out, (col, how) in aggs.items():
        if how == "mean":
            spec.append((f"__{out}_s", col, "sum"))
            spec.append((f"__{out}_c", col, "count"))
        elif how in _PART:
            spec.append((out, col, how))
        else:
            raise ValueError(f"{how!r} is not salt-able (algebraic aggs only)")

    salted = df.withColumn("__salt", (F.rand(seed=0) * salt).cast("int"))
    partial = (salted.groupBy(key, "__salt")
               .agg(*[_PART[h](c).alias(o) for (o, c, h) in spec]))
    merged = (partial.groupBy(key)
              .agg(*[_MERGE[h](o).alias(o) for (o, c, h) in spec]))
    out_cols = [F.col(key)]
    for out, (col, how) in aggs.items():
        if how == "mean":
            out_cols.append((F.col(f"__{out}_s") / F.col(f"__{out}_c")).alias(out))
        else:
            out_cols.append(F.col(out))
    return merged.select(out_cols)


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt: int = 16, how: str = "inner") -> DataFrame:
    """Skew-proof equi-join: salt the BIG side's key, replicate every small
    row ``salt`` times (one copy per salt value), join on (key, salt).

    AQE's skew-join splitting handles most cases at runtime; this is the
    explicit variant for pathological keys (one key = 30% of a 100 TB
    fact table) or when AQE is off. The small side grows salt-fold, so use
    it only when small x salt still broadcasts/fits; per-reducer work for
    the hot key drops by the salt factor.

    Column contract: result = big columns + small's non-key columns (the
    usual star-join shape). ``how`` in inner/left.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how in ('inner','left')")
    bs = big.withColumn("__salt", (F.rand(seed=0) * salt).cast("int"))
    ss = (small.withColumn(
              "__salt",
              F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))))
    out = bs.join(ss, [key, "__salt"], how)
    return out.drop("__salt")
