#!/usr/bin/env python
"""Dump .explain("formatted") for headline keys to plans/<dir>/<key>_<tag>.txt.

    python tools/dump_plan.py <sf_dir> <outdir> <tag> key [key ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, outdir, tag = sys.argv[1], sys.argv[2], sys.argv[3]
    keys = sys.argv[4:]
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entry
    from faiss_metal_spark.session import get_spark

    spark = get_spark("dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in keys:
        df = qs[name](spark, sf_dir)
        # execute first so AQE finalizes: the committed plan is the
        # FINAL adaptive plan (isFinalPlan=true), where runtime
        # ReusedExchange / coalesced reads are visible
        df.collect()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
