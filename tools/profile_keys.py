#!/usr/bin/env python
"""Per-key execution profile: where does a headline key's wall time go?

For each requested key, runs the bench discipline (1 warmup + N timed,
cache cleared between runs) and splits every timed run into

  t_build   — fn(spark, sf_dir): plan construction INCLUDING every
              eager sub-job (collects, localCheckpoints, Lloyd rounds)
  t_action  — .count() on the returned DataFrame

and, from the SQLAppStatusStore, lists every SQL execution the run
created with its wall duration and a one-line plan summary (shuffle /
broadcast / SMJ counts), so a slow key is attributable to a specific
sequential sub-job instead of guessed at (guide §1: measure first).

    python tools/profile_keys.py [sf_dir] key [key ...]

Prints one JSON object per key.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
KEYS = sys.argv[2:]


def _executions(spark):
    store = spark._jsparkSession.sharedState().statusStore()
    lst = store.executionsList()
    out = {}
    for i in range(lst.size()):
        e = lst.apply(i)
        dur = None
        try:
            ct = e.completionTime()
            if ct.isDefined():
                dur = (ct.get().getTime() - e.submissionTime()) / 1000.0
        except Exception:
            pass
        out[int(e.executionId())] = (dur, e.physicalPlanDescription())
    return out


def _summ(desc: str) -> str:
    import re

    region = desc
    if "== Final Plan ==" in desc:
        region = desc.split("== Final Plan ==", 1)[1].split("== Initial Plan ==", 1)[0]
    else:
        region = desc.split("\n\n", 1)[0]
    sh = len(set(re.findall(r"(?<!Broadcast)(?<!Reused)Exchange \((\d+)\)", region)))
    bc = len(set(re.findall(r"BroadcastExchange \((\d+)\)", region)))
    smj = len(set(re.findall(r"SortMergeJoin[^(\n]*\((\d+)\)", region)))
    head = next(
        (
            ln.strip()
            for ln in region.splitlines()
            if ln.strip() and not ln.startswith("==")
        ),
        "",
    )
    return f"sh={sh} bc={bc} smj={smj} :: {head[:90]}"


def main() -> None:
    import gc

    import __spark_entry__ as entry
    from faiss_metal_spark.session import get_spark

    spark = get_spark("profile-keys")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    names = KEYS or list(qs)

    for name in names:
        fn = qs[name]
        fn(spark, SF_DIR).count()  # warmup
        spark.catalog.clearCache()
        gc.collect()

        before = set(_executions(spark))
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t1 = time.perf_counter()
        mid = set(_executions(spark))
        df.count()
        t2 = time.perf_counter()
        after = _executions(spark)

        subs = sorted(i for i in after if i not in before)
        rows = []
        for i in subs:
            dur, desc = after[i]
            rows.append(
                {
                    "exec": i,
                    "phase": "build" if i in mid else "action",
                    "wall_sec": round(dur, 3) if dur is not None else None,
                    "plan": _summ(desc),
                }
            )
        print(
            json.dumps(
                {
                    "key": name,
                    "t_build": round(t1 - t0, 3),
                    "t_action": round(t2 - t1, 3),
                    "t_total": round(t2 - t0, 3),
                    "executions": rows,
                },
                indent=1,
            )
        )
        spark.catalog.clearCache()
        gc.collect()


if __name__ == "__main__":
    main()
