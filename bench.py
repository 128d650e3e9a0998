#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Two sections:
1. Headline queries: every __spark_entry__.queries() entry, timed
   end-to-end (plan build + execution + fetch) at $SPARK_GRAFT_SF_DIR
   (default /root/testdata/sf0.1).
2. The reference's 7-config kNN benchmark grid
   (/root/reference/tests/bench_metal_flat.mm:16-23 — see BASELINE.md):
   synthetic uniform[−1,1] vectors generated *distributed* (no driver
   materialization), L2 metric, timed per search.

Output: {"metric": "headline_total_sec", "value": N, "unit": "sec",
         "queries": {name: sec, ...}, "sf": X}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _gen_vectors(spark, nv: int, d: int, seed: int = 42):
    """Distributed deterministic uniform[−1,1] vector table (id, vec)."""
    from faiss_metal_spark.sources import synthetic_vectors

    return synthetic_vectors(spark, nv, d, seed)


def bench_grid(spark) -> dict[str, float]:
    """BASELINE.md grid: (label, nv, nq, d, k)."""
    from faiss_metal_spark.operators.knn import knn_search

    grid = [
        ("knn_small_32d", 10_000, 100, 32, 10),
        ("knn_small_128d", 10_000, 100, 128, 10),
        ("knn_medium_128d", 100_000, 100, 128, 10),
        ("knn_medium_768d", 100_000, 10, 768, 10),
        ("knn_large_1536d", 10_000, 10, 1536, 10),
        ("knn_highk_128d", 10_000, 10, 128, 100),
        ("knn_latency_128d", 100_000, 1, 128, 10),
    ]
    results = {}
    for label, nv, nq, d, k in grid:
        vecs = _gen_vectors(spark, nv, d).persist()
        vecs.count()  # materialize the index (build ≠ search time)
        rng = np.random.default_rng(1042 + d)
        Q = rng.uniform(-1, 1, size=(nq, d)).astype(np.float32)
        qdf = spark.createDataFrame(
            [(int(i), v.tolist()) for i, v in enumerate(Q)],
            schema="qid long, vec array<float>",
        )
        # warm-up (JIT, codegen, Python worker pool)
        knn_search(vecs, qdf, k).count()
        t0 = time.time()
        n = knn_search(vecs, qdf, k).count()
        results[label] = round(time.time() - t0, 3)
        assert n == nq * k, f"{label}: got {n} rows"

        if label in ("knn_medium_128d", "knn_medium_768d", "knn_large_1536d"):
            # the reference's FP32-vs-FP16-storage comparison
            # (bench_metal_flat.mm benches every config on CPU / Metal
            # FP32 / Metal FP16): same search over the 2-byte compact
            # store. The +22–34% reference claim is for BANDWIDTH-BOUND
            # workloads (/root/reference/README.md:12) — here that is
            # the wide-vector configs (768d scans 307 MB for 10
            # queries); the 128d config at this scale is bounded by
            # per-job scheduling, not scan bandwidth, so its ratio
            # reads ≈1.
            from pyspark.sql import functions as F

            from faiss_metal_spark.quantize import encode_col

            cvecs = vecs.select(
                "id", encode_col(F.col("vec"), "fp16").alias("vec")
            ).persist()
            cvecs.count()
            knn_search(cvecs, qdf, k, vec_format="fp16_binary").count()
            t0 = time.time()
            n = knn_search(cvecs, qdf, k, vec_format="fp16_binary").count()
            results[f"{label}_fp16c"] = round(time.time() - t0, 3)
            assert n == nq * k
            cvecs.unpersist()
        vecs.unpersist()
    return results


def _warmup(spark) -> None:
    """Steady-state warm-up (the reference benches warmup=3 before
    timing, bench_metal_flat.mm:118): spin up the Python worker pool,
    JIT the codegen paths, and prime the parquet footer cache."""
    import pandas as pd

    def ident(batches):
        yield from batches

    spark.range(0, 1000, 1, 8).mapInPandas(
        ident, "id long"
    ).count()
    # events may store TIMESTAMP(NANOS); same conf __spark_entry__ uses
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in ("lineitem", "events", "documents", "embeddings"):
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).count()
    # compile the text/dedup codegen paths (md5 HOFs, shingle lambdas,
    # iterative join+agg) on a 4-row corpus so the first timed query
    # measures steady-state, not first-compile
    from faiss_metal_spark.operators.dedup import (
        connected_components,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    tiny = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(4)],
        schema="doc_id long, text string",
    )
    sig = minhash_signatures(tiny, num_hashes=8, shingle_size=3)
    connected_components(lsh_candidate_pairs(sig, num_hashes=8, bands=4)).count()
    _ = pd.DataFrame()


def bench_headline(spark) -> dict[str, float]:
    import __spark_entry__ as entry_mod

    out = {}
    for name, fn in entry_mod.queries().items():
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        out[name] = round(time.time() - t0, 3)
        _ = n
    return out


def main() -> None:
    from faiss_metal_spark.session import get_spark

    spark = get_spark("faiss-metal-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    _warmup(spark)
    queries: dict[str, float] = {}
    queries.update(bench_headline(spark))
    queries.update(bench_grid(spark))

    sf = 0.1
    if "sf0.01" in SF_DIR:
        sf = 0.01
    elif "sf0.001" in SF_DIR:
        sf = 0.001

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
