"""Structured-Streaming ingestion (reference §2.9: streaming = staged
ingestion + finalize, no stream operators)."""

from arcticdb_spark.streaming.ingest import stream_stage, stream_resample

__all__ = ["stream_stage", "stream_resample"]
