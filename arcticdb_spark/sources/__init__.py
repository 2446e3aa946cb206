"""Table loaders for the driver's parquet test tables + generic sources."""

from arcticdb_spark.sources.tables import load_table, TABLES

__all__ = ["load_table", "TABLES"]
