"""Dump .explain('formatted') for declared queries into plans/r13/.

Usage: python tools/dump_plans_r13.py <suffix> <outdir> [query ...]
Writes <outdir>/<query>_<suffix>.txt. Run from the tree whose plans you
want (the r13 optimization judge compares _before vs _after files).
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import __spark_entry__ as E
from arcticdb_spark import get_spark
from arcticdb_spark.extensions import dedup as xdedup
from arcticdb_spark.extensions import similarity as xsim


def main():
    suffix, outdir = sys.argv[1], sys.argv[2]
    only = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plans_r13")
    sf = "/root/testdata/sf0.01"
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:
            plan = f"ERROR {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "->", f"{name}_{suffix}.txt", flush=True)
        xdedup.unpersist_all()
        xsim.unpersist_all()


if __name__ == "__main__":
    main()
