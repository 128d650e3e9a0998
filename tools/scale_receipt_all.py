#!/usr/bin/env python
"""Full-headline scale receipt (r14 VERDICT task 1): run EVERY
``__spark_entry__.queries()`` key through tools/scale_receipt.py's
min-of-2 protocol at sf0.1 vs /tmp/sf1, in CHUNKS of a few keys per
fresh subprocess/SparkSession — the r13 caveat showed a single shared
session accumulates executor/GC state across many keys and produces
10x-inflated one-shot ghosts; fresh per-chunk sessions keep each key's
double-run honest.

Writes per-chunk JSON to --workdir and the merged table to --out.

Usage: python tools/scale_receipt_all.py [--chunk 5] \
           [--workdir /tmp/scale_r14] [--out /tmp/scale_r14/all.json]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=5)
    ap.add_argument("--workdir", default="/tmp/scale_r14")
    ap.add_argument("--out", default="/tmp/scale_r14/all.json")
    a = ap.parse_args()
    os.makedirs(a.workdir, exist_ok=True)

    import __spark_entry__ as entry

    keys = list(entry.queries().keys())
    chunks = [keys[i : i + a.chunk] for i in range(0, len(keys), a.chunk)]
    merged = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for i, ch in enumerate(chunks):
        out = os.path.join(a.workdir, f"chunk_{i:02d}.json")
        if os.path.exists(out):  # resumable
            merged.update(json.load(open(out)))
            print(f"chunk {i} cached: {ch}", flush=True)
            continue
        print(f"chunk {i}/{len(chunks)}: {ch}", flush=True)
        rc = subprocess.call(
            [sys.executable, os.path.join(here, "scale_receipt.py"), "--out", out]
            + ch,
            cwd=os.path.dirname(here),
        )
        if rc != 0:
            print(f"chunk {i} FAILED rc={rc}", flush=True)
            continue
        merged.update(json.load(open(out)))
    with open(a.out, "w") as f:
        json.dump(merged, f, indent=2)
    worst = sorted(merged.items(), key=lambda kv: -kv[1]["exponent"])
    for k, v in worst:
        flag = "  <-- e>1.2" if v["exponent"] > 1.2 else ""
        print(
            f"{k:24s} sf0.1={v['sf0.1_sec']:7.2f}s sf1={v['sf1_sec']:8.2f}s "
            f"e={v['exponent']:5.2f}{flag}",
            flush=True,
        )


if __name__ == "__main__":
    main()
