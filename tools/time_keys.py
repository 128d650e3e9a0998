#!/usr/bin/env python
"""Bench-discipline timing for a subset of headline keys: JVM gc once
per key BEFORE the discarded warmup (never between timed runs — the
full GC queues dead broadcasts into the async ContextCleaner and the
drain would bleed into the next timed run; measured r14, tpch_q5
2.97→3.90 s with gc-in-reset), then 1 discarded warmup + min of 3
timed runs with cache-clear + Python gc between runs — exactly
bench_headline's protocol post-r14. For quick same-host A/B of a
targeted optimization without a full bench pass.

    python tools/time_keys.py [sf_dir] key [key ...]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
KEYS = sys.argv[2:]


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    import __spark_entry__ as entry
    from faiss_metal_spark.session import get_spark

    spark = get_spark("time-keys")
    spark.sparkContext.setLogLevel("ERROR")

    def reset():
        spark.catalog.clearCache()
        gc.collect()

    qs = entry.queries()
    out = {}
    for name in KEYS or list(qs):
        fn = qs[name]
        spark._jvm.System.gc()  # per-key, pre-warmup — bench protocol
        fn(spark, SF_DIR).count()
        reset()
        timed = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, SF_DIR).count()
            timed.append(round(time.time() - t0, 3))
            reset()
        out[name] = {"min": min(timed), "times": timed,
                     "load1m": round(os.getloadavg()[0], 2)}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
