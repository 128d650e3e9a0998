#!/usr/bin/env python
"""Round-15 repro harness for the knn_large_1536d 32-core regression.

Replicates bench_grid's timing for one grid config (default the
regressed knn_large_1536d: nv=10k, nq=10, d=1536, k=10) at the
session's $SPARK_GRAFT_CPUS, printing every iteration time plus a
worker-environment probe (are the BLAS pins actually reaching the
Python workers?).

    SPARK_GRAFT_CPUS=32 python tools/repro_knn_large.py [nv nq d k]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from pyspark.sql import functions as F

    from faiss_metal_spark.operators.knn import knn_search
    from faiss_metal_spark.quantize import encode_col
    from faiss_metal_spark.session import get_spark
    from faiss_metal_spark.sources import synthetic_vectors

    nv, nq, d, k = (int(x) for x in sys.argv[1:5]) if len(sys.argv) > 4 else (
        10_000, 10, 1536, 10
    )
    spark = get_spark("repro-knn-large")
    spark.sparkContext.setLogLevel("ERROR")
    print("cores:", spark.sparkContext.defaultParallelism, flush=True)

    # probe: what env do the Python workers actually see?
    def env_probe(batches):
        import os as _os

        import pyarrow as pa

        keys = ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS")
        vals = ";".join(f"{k}={_os.environ.get(k)}" for k in keys)
        try:
            import numpy as _np

            cfg = _np.__config__.CONFIG.get("Build Dependencies", {}).get(
                "blas", {}
            ).get("name", "?")
        except Exception:
            cfg = "?"
        for b in batches:
            yield pa.record_batch(
                [pa.array([vals]), pa.array([cfg])], names=["env", "blas"]
            )
            break

    probe = (
        spark.range(0, 32, 1, 32)
        .mapInArrow(env_probe, "env string, blas string")
        .distinct()
        .collect()
    )
    print("worker env:", probe, flush=True)

    vecs = synthetic_vectors(spark, nv, d, 42).persist()
    vecs.count()
    print("vec partitions:", vecs.rdd.getNumPartitions(), flush=True)
    rng = np.random.default_rng(1042 + d)
    Q = rng.uniform(-1, 1, size=(nq, d)).astype(np.float32)
    qhost = (np.arange(nq, dtype=np.int64), Q.astype(np.float64))

    enc_tbl = vecs.select("id", encode_col(F.col("vec"), "fp16").alias("vec")).persist()
    enc_tbl.count()

    for fmt, tbl, kwargs in (
        ("fp32", vecs, {}),
        ("fp16c", enc_tbl, {"vec_format": "fp16_binary"}),
    ):
        for _ in range(3):
            n = knn_search(tbl, None, k, queries_host=qhost, **kwargs).count()
            assert n == nq * k
        times = []
        for _ in range(10):
            t0 = time.perf_counter()
            knn_search(tbl, None, k, queries_host=qhost, **kwargs).count()
            times.append(round(time.perf_counter() - t0, 3))
        print(f"{fmt}: median={np.median(times):.3f} times={times}", flush=True)


if __name__ == "__main__":
    main()
