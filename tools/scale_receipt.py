#!/usr/bin/env python
"""Measured scaling receipt: run the heavy query keys at sf0.1 and sf1
(/tmp/sf1 from tools/make_scaled_sf.py) and print per-key seconds plus the
fitted exponent  e = log(t_sf1 / t_sf0.1) / log(10).

e ~= 1.0 means linear in data volume; e << 1 means fixed overhead still
dominates at sf1; e > 1.2 on any key is a found scaling bug.  Results go
into SCALE.md's "Measured scaling" table.

Usage: python tools/scale_receipt.py [key ...]   (default: the top-5 heavy)
"""
from __future__ import annotations

import gc
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = ["curate_corpus", "mllib_index_build", "ann_pq", "ann_compact", "simhash_all"]


def main() -> None:
    argv = list(sys.argv[1:])
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        del argv[i : i + 2]
    keys = argv or HEAVY
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    import __spark_entry__ as entry
    from faiss_metal_spark import get_spark

    spark = get_spark("scale-receipt")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out = {}
    for sf_dir, sf in (("/root/testdata/sf0.1", 0.1), ("/tmp/sf1", 1.0)):
        for k in keys:
            fn = qs[k]
            fn(spark, sf_dir).count()  # warmup (JIT, file listing, broadcasts)
            gc.collect()
            # min-of-2 timed runs (r13): a shared receipt session
            # accumulates executor/GC state across keys, and one-shot
            # readings produced 10×-inflated ghosts (corpus_splits 22 s
            # one-shot vs 2.5 s double-run — SCALE.md caveat); a spike
            # must now hit both runs to distort a key
            times = []
            for _ in range(2):
                spark.catalog.clearCache()
                gc.collect()
                t0 = time.perf_counter()
                n = fn(spark, sf_dir).count()
                times.append(time.perf_counter() - t0)
            out.setdefault(k, {})[sf] = {
                "sec": round(min(times), 3),
                "rows": n,
                "load1m": round(os.getloadavg()[0], 2),
            }
            print(f"{k} sf={sf}: {min(times):.2f}s rows={n}", flush=True)
    table = {}
    for k, v in out.items():
        e = math.log(v[1.0]["sec"] / v[0.1]["sec"]) / math.log(10)
        table[k] = {
            "sf0.1_sec": v[0.1]["sec"],
            "sf1_sec": v[1.0]["sec"],
            "exponent": round(e, 2),
            "rows_sf1": v[1.0]["rows"],
            "load1m": v[1.0]["load1m"],
        }
    print(json.dumps(table, indent=2))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(table, f, indent=2)


if __name__ == "__main__":
    main()
