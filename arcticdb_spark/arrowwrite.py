"""Driver-side pyarrow write fast-path for pandas-backed library writes.

A pandas-input ``lib.write()``/``append()``/``stage()`` of a few thousand
rows used to launch a full Spark job (createDataFrame -> shuffle/coalesce ->
parquet committer) costing ~0.2-0.35 s of scheduling/commit latency per
operation on a local cluster — pure harness, not data work (optimization
guide §5 "the driver should do almost no data work" cuts both ways: a
driver-RESIDENT frame gains nothing from a cluster round-trip). This module
writes the same physical parquet directly with pyarrow in ~1-10 ms.

The physical contract replicated here was probed from Spark-written files
in optimization round 1 (OPTIMIZATION_r13.md "Not yet optimized"):

* plain INT64 for the demoted ns index and uint64 bit-pattern columns
  (int64 carries no parquet logical annotation), INT32/INT(16)/INT(8) for
  the narrower ints, FLOAT/DOUBLE/BOOLEAN/BYTE_ARRAY-UTF8 as-is;
* SNAPPY compression, one row group per file, footer min/max statistics on
  every column (``create_column_stats`` and the manifest's ts_min/ts_max
  come from footer stats);
* the ``org.apache.spark.sql.parquet.row.metadata`` footer key holding the
  exact Spark schema JSON — Spark's schema inference prefers this key, so
  a pyarrow-written file infers the IDENTICAL StructType (nullability
  included) as a Spark-written one. (pyarrow 16 drops ALL custom footer
  keys under ``store_schema=False``, so the ``ARROW:schema`` key rides
  along; the whitelist below only admits types whose arrow-schema
  reconstruction equals the parquet-derived one, so readers that compare
  footer schemas — e.g. the staged static-schema validator — see the same
  {name: type} map for both writer identities.)

Writer identity is otherwise not load-bearing: every repo read path passes
an explicit schema, and write-dedup content hashes are VALUE-based
(xxhash64 row sums), not file-byte-based.

Eligibility is a strict whitelist — anything else falls back to the Spark
writer unchanged:

* the Spark frame handed to the writer must be the IDENTICAL object the
  normalizer produced from the pandas frame (no intervening transform);
* every column dtype maps 1:1 between the pandas frame and the Spark
  schema (plain numpy int8/16/32/64, float32/64, bool, and object columns
  holding only str/None);
* the physical layout must be exactly reproducible driver-side: either the
  stable ascending index sort of an already-monotonic frame (slice into
  consecutive ``rows_per_file`` ranges) or a single-file order-preserving
  write. Multi-file layouts whose boundaries Spark derives from sampling
  (repartitionByRange quantiles) or partition coalescing are NOT
  replicated — those fall back.

Kill switch: ``ARCTICDB_SPARK_ARROW_WRITE=0`` disables the path entirely.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

ROW_METADATA_KEY = b"org.apache.spark.sql.parquet.row.metadata"


def enabled() -> bool:
    return os.environ.get("ARCTICDB_SPARK_ARROW_WRITE", "1") != "0"


def _type_map():
    # Spark type -> (arrow type, accepted pandas dtype names). Both the
    # plain numpy dtype and its nullable extension twin are accepted (the
    # normalizer's demoted ns index is extension Int64 so NaT can be NA);
    # pa.Array.from_pandas converts either, mask -> null.
    from pyspark.sql import types as T
    return {
        T.LongType: (pa.int64(), ("int64", "Int64")),
        T.IntegerType: (pa.int32(), ("int32", "Int32")),
        T.ShortType: (pa.int16(), ("int16", "Int16")),
        T.ByteType: (pa.int8(), ("int8", "Int8")),
        T.DoubleType: (pa.float64(), ("float64", "Float64")),
        T.FloatType: (pa.float32(), ("float32", "Float32")),
        T.BooleanType: (pa.bool_(), ("bool", "boolean")),
    }


def arrow_table_for(spark_schema, pdf) -> "pa.Table | None":
    """Build the arrow table matching ``spark_schema`` from the normalized
    pandas frame, or None when any column falls outside the whitelist."""
    import numpy as np
    import pandas as pd
    from pandas.api.types import infer_dtype
    from pyspark.sql import types as T

    if len(pdf) == 0:
        return None
    names = [f.name for f in spark_schema.fields]
    if [str(c) for c in pdf.columns] != names:
        return None
    tmap = _type_map()
    arrays, fields = [], []
    for pos, f in enumerate(spark_schema.fields):
        col = pdf.iloc[:, pos]
        dt = col.dtype
        if isinstance(f.dataType, T.StringType):
            if isinstance(dt, pd.StringDtype):
                pass
            elif dt == object:
                # str/None only (binary payloads, lists, mixed go to
                # Spark); "empty" = all-null object column typed string
                if infer_dtype(col, skipna=True) not in ("string", "empty"):
                    return None
            else:
                return None
            arr = pa.Array.from_pandas(col, type=pa.string())
        else:
            m = tmap.get(type(f.dataType))
            if m is None or str(dt) not in m[1]:
                return None
            arr = pa.Array.from_pandas(col, type=m[0])
        arrays.append(arr)
        fields.append(pa.field(f.name, arr.type, nullable=True))
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def write_slices(table: "pa.Table", out_dir: str, rows_per_slice: int,
                 spark_schema_json: str) -> list[str]:
    """Write ``table`` as consecutive slices of ``rows_per_slice`` rows,
    one file (one row group) per slice, named so lexicographic order is
    slice order. Returns the file paths in slice order."""
    os.makedirs(out_dir, exist_ok=True)
    table = table.replace_schema_metadata(
        {ROW_METADATA_KEY: spark_schema_json.encode("utf-8")})
    n = table.num_rows
    paths = []
    for i, start in enumerate(range(0, n, rows_per_slice)):
        sl = table.slice(start, rows_per_slice)
        p = os.path.join(out_dir,
                         f"part-{i:05d}-{uuid.uuid4().hex}.snappy.parquet")
        pq.write_table(sl, p, compression="snappy",
                       row_group_size=rows_per_slice,
                       write_statistics=True)
        paths.append(p)
    return paths
