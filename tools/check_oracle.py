#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at the given sf_dir and
compares against its oracle_sql() via DuckDB: row count, column names,
and order-insensitive exact value match (rows sorted, floats compared
bit-wise after the queries' own rounding). Usage:

    python tools/check_oracle.py [sf_dir] [query ...]

Known artifact at sf > 0.01: a handful of rows (~0.1%) in the
quality-scored keys differ in the 4th decimal because the engines
ROUND the same double differently at representation boundaries:
for x = 0.53874999999999995 (the double just below .53875) Spark's
round goes through the double's SHORTEST DECIMAL STRING ("0.53875",
then HALF_UP → .5388) while DuckDB rounds the true binary value
(→ .5387). Verified at sf0.1: every mismatching row's unrounded
doubles are bit-identical across engines (5 docs / 5000 in
doc_profile). The driver's gate runs at sf0.01 where no value lands
on a boundary — and the artifact is two correct round functions
disagreeing about ties, not an engine error.
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name: str, eng: pd.DataFrame, ora: pd.DataFrame) -> list[str]:
    problems = []
    if len(eng) != len(ora):
        problems.append(f"row count {len(eng)} != {len(ora)}")
    if sorted(eng.columns) != sorted(ora.columns):
        problems.append(f"columns {sorted(eng.columns)} != {sorted(ora.columns)}")
        return problems
    if problems:
        return problems
    e, o = normalize(eng), normalize(ora)
    for c in e.columns:
        ec, oc = e[c], o[c]
        if ec.dtype.kind == "f" or oc.dtype.kind == "f":
            ea = ec.to_numpy(dtype=float)
            oa = oc.to_numpy(dtype=float)
            bad = ~((ea == oa) | (pd.isna(ea) & pd.isna(oa)))
            if bad.any():
                i = bad.argmax()
                problems.append(
                    f"col {c}: {int(bad.sum())}/{len(ea)} mismatches, "
                    f"first at row {i}: {ea[i]!r} vs {oa[i]!r}"
                )
        else:
            neq = ec.astype(str).to_numpy() != oc.astype(str).to_numpy()
            if neq.any():
                i = neq.argmax()
                problems.append(
                    f"col {c}: {int(neq.sum())}/{len(ec)} mismatches, "
                    f"first at row {i}: {ec.iloc[i]!r} vs {oc.iloc[i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from faiss_metal_spark.session import get_spark

    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            eng = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: engine raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"PASS {name}: rows-only ({len(eng)} rows, {t1-t0:.1f}s) [no oracle]")
            continue
        try:
            ora = con.execute(oracles[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        problems = compare(name, eng, ora)
        if problems:
            failures += 1
            print(f"FAIL {name} ({len(eng)} rows, {t1-t0:.1f}s): " + "; ".join(problems))
        else:
            print(f"PASS {name}: {len(eng)} rows match ({t1-t0:.1f}s)")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
