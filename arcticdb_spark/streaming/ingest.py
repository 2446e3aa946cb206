"""Streaming ingestion: readStream -> staging chunks -> batch finalize.

The reference's "streaming support" is the stage/APPEND_DATA/compact path
(tick collectors write unindexed chunks; ``finalize_staged_data`` compacts
them into the versioned timeline — ``_store.py:2797``, SURVEY §2.9). The
exact Spark analogue is a Structured Streaming sink writing Parquet chunks
into the library's staging directory with ``trigger(availableNow=True)``,
then ``Library.finalize_staged_data`` committing a version. Watermarked
windowed aggregation is additionally offered (beyond the reference) for
resample-on-ingest.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arcticdb_spark.catalog import Library


def stream_stage(lib: Library, symbol: str, stream_df: DataFrame,
                 checkpoint: str | None = None) -> None:
    """Drain a streaming DataFrame into the symbol's staging area
    (one availableNow pass — synchronous, exactly-once via checkpoint)."""
    stg_root = lib._staging_dir(symbol)
    os.makedirs(stg_root, exist_ok=True)
    out = os.path.join(stg_root, uuid.uuid4().hex)
    ckpt = checkpoint or os.path.join(lib._sym_dir(symbol), "_checkpoints",
                                      uuid.uuid4().hex)
    q = (stream_df.writeStream
         .format("parquet")
         .option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def stream_resample(stream_df: DataFrame, ts_col: str, rule: str,
                    aggregations: dict, watermark: str = "10 minutes"):
    """Watermarked tumbling-window aggregation on a stream (extension beyond
    the reference — resample semantics on unbounded data with late-row
    handling; the reference handles lateness bitemporally via update())."""
    from arcticdb_spark.operators.resample import normalize_agg_spec
    specs = normalize_agg_spec(aggregations)
    aggs = []
    for out_name, in_col, how in specs:
        fn = {"sum": F.sum, "mean": F.avg, "min": F.min, "max": F.max,
              "count": F.count}.get(how)
        if fn is None:
            raise ValueError(f"streaming resample supports sum/mean/min/max/count, not {how}")
        aggs.append(fn(in_col).alias(out_name))
    return (stream_df
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, rule).alias("window"))
            .agg(*aggs)
            .select(F.col("window.start").alias(ts_col), *[F.col(o) for o, _, _ in specs]))


def stream_dedup(stream_df: DataFrame, text_col: str = "text",
                 keys: list[str] | None = None, ts_col: str | None = None,
                 watermark: str | None = None) -> DataFrame:
    """Exact dedup on an ingestion stream — the streaming counterpart of
    ``extensions.dedup.exact_dedup``: one row per normalized content
    fingerprint passes (within a micro-batch the surviving copy is
    arbitrary, per ``dropDuplicates``); once a fingerprint is seen, later
    micro-batches never re-admit it (state-store backed, so restarts keep
    their memory via the checkpoint).

    ``keys`` overrides the fingerprint (dedup on explicit columns). With
    ``ts_col`` + ``watermark`` the state is bounded: duplicates are only
    tracked inside the watermark horizon (``dropDuplicatesWithinWatermark``)
    — the 100 TB-ingest configuration, since unbounded dedup state on an
    infinite stream is itself a scale hazard. Without a watermark, state
    grows with distinct-document count (fine for bounded backfills).
    """
    from arcticdb_spark.extensions.text import fingerprint

    if (ts_col is None) != (watermark is None):
        # asymmetric acceptance would silently produce unbounded state when
        # the caller passed ts_col but forgot watermark
        raise ValueError("stream_dedup: pass ts_col AND watermark together "
                         "(bounded state) or neither (unbounded state)")
    if keys is None:
        if "__fp__" in stream_df.columns:
            raise ValueError("stream_dedup: input already has a __fp__ "
                             "column; pass keys=['__fp__'] to dedup on it")
        df = stream_df.withColumn("__fp__", fingerprint(F.col(text_col)))
        keys, drop_fp = ["__fp__"], True
    else:
        df, drop_fp = stream_df, False
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
        out = df.dropDuplicatesWithinWatermark(keys)
    else:
        out = df.dropDuplicates(keys)
    return out.drop("__fp__") if drop_fp else out
