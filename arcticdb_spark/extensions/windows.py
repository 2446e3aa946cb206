"""Window-function extensions (the reference has none — SURVEY §2.6):
sessionization, top-k per group, rolling/expanding stats. All plain Spark
window specs; one shuffle on the partition key each."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(df: DataFrame, group_cols: list[str], order_col: str,
                   k: int, ascending: bool = False,
                   tiebreak: list[str] | None = None) -> DataFrame:
    """Top-k rows per group by order_col (deterministic via tiebreak cols)."""
    order = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    for t in (tiebreak or []):
        order.append(F.col(t).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (df.withColumn("rank", F.row_number().over(w))
              .filter(F.col("rank") <= k))


def sessionize(df: DataFrame, ts_col: str, key_cols: list[str],
               gap: str = "30 minutes") -> DataFrame:
    """Assign session ids: a new session starts when the gap to the previous
    event (per key) exceeds ``gap``. Classic lag + cumulative-sum pattern."""
    import pandas as pd
    gap_s = int(pd.Timedelta(gap).total_seconds())
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    new_sess = F.when(prev.isNull() |
                      ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)) > gap_s),
                      1).otherwise(0)
    return df.withColumn("session_seq",
                         F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
                         .cast("long"))


def rolling_agg(df: DataFrame, ts_col: str, key_cols: list[str],
                value_col: str, window_rows: int, how: str = "mean") -> DataFrame:
    """Rolling aggregate over the previous ``window_rows`` rows per key."""
    w = (Window.partitionBy(*key_cols).orderBy(ts_col)
         .rowsBetween(-(window_rows - 1), 0))
    fn = {"mean": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
          "count": F.count}[how]
    return df.withColumn(f"rolling_{how}", fn(value_col).over(w))
