#!/usr/bin/env python
"""Demo: the r12 index tiers on real test embeddings.

Exercises every surface this round added, the way a faiss user would
reach for it:

1. the IVF additive-quantizer family (``IVF<n>,RQ<m>x8`` and the
   LSQ/PRQ/PLSQ variants) — compressed inverted files whose search is
   one shared query-batch LUT across probed cells,
2. additive fast-scan (``RQ<m>x4fs`` / ``IVF<n>,RQ<m>x4fs``) — packed
   4-bit stages, half the storage and scan bytes of nbits=8,
3. ``Refine(<spec>)`` — rescore any base through an arbitrary refine
   tier's reconstruction (here SQfp16: half-precision rescore storage),
4. the graph coarse quantizer (``IVF<n>_HNSW<M>,<code>``) — the
   big-nlist recipe where assignment cost is nlist-independent,
5. streaming IVF-additive ingest (stream-grown store ≡ batch),
6. ``IDMap2,Flat`` — caller-id wrapper with reconstruct.

    python examples/r12_tiers_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    from pyspark.sql import functions as F

    from faiss_metal_spark import VectorTable, get_spark, index_factory
    from faiss_metal_spark.functions.evaluate import recall_at_k

    spark = get_spark("r12-demo")
    spark.sparkContext.setLogLevel("ERROR")
    vt = VectorTable.from_parquet(
        spark, f"{SF}/embeddings.parquet", d=64,
        id_col="vec_id", vec_col="embedding",
    )
    pdf = vt.df.orderBy("id").limit(8).toPandas()
    Q = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
    exact_D, exact_L = vt.search_numpy(Q, 10)

    def show(name, L, extra=""):
        r = np.mean([
            len(set(L[i][L[i] >= 0]) & set(exact_L[i])) / 10
            for i in range(len(Q))
        ])
        print(f"  {name:28} recall@10 {r:5.2f} {extra}")

    print(f"corpus: {vt.ntotal} x 64-dim embeddings from {SF}")

    print("\n[1] IVF additive quantizers")
    for spec in ("IVF16,RQ4x8", "IVF16,LSQ4x8", "IVF16,PRQ2x2x8"):
        idx = index_factory(vt, spec, sample_size=500, iters=4)
        _, L = idx.search_numpy(Q, 10, nprobe=8)
        code_bytes = idx.sa_code_size
        show(spec, L, f"({code_bytes} B/vec + cell)")
        idx.release()

    print("\n[2] additive fast-scan (packed 4-bit stages)")
    fs = index_factory(vt, "RQ4x4fs", sample_size=500, iters=4)
    _, L = fs.search_numpy(Q, 10)
    show("RQ4x4fs", L, f"({fs.sa_code_size} B/vec — half of RQ4x8)")
    ifs = index_factory(vt, "IVF16,RQ4x4fs", sample_size=500, iters=4)
    _, L = ifs.search_numpy(Q, 10, nprobe=8)
    show("IVF16,RQ4x4fs", L)
    fs.release(), ifs.release()

    print("\n[3] Refine(<spec>): coded base + half-precision rescore")
    for spec in ("PQ8,Refine(SQfp16)", "IVF16,PQ8,Refine(SQfp16)"):
        idx = index_factory(vt, spec, sample_size=500, iters=4, k_factor=8)
        kw = {"nprobe": 8} if spec.startswith("IVF") else {}
        _, L = idx.search_numpy(Q, 10, **kw)
        show(spec, L)

    print("\n[4] graph coarse quantizer (nlist-independent assignment)")
    for spec in ("IVF16_HNSW8,Flat", "IVF16_HNSW8,PQ8"):
        idx = index_factory(vt, spec, sample_size=500, iters=4)
        _, L = idx.search_numpy(Q, 10, nprobe=8)
        show(spec, L)
        idx.release()

    print("\n[5] streaming IVF-additive ingest (stream == batch)")
    from faiss_metal_spark.operators.rq import ivfrq_build, ivfrq_search
    from faiss_metal_spark.streaming.index_ingest import (
        ivfrq_store_search,
        read_vector_stream,
        run_ivfrq_ingest,
    )

    emb = vt.df.select("id", "vec")
    C, books, batch_codes = ivfrq_build(emb, 8, 3, sample_size=500)
    qdf = spark.createDataFrame(pdf.rename(columns={"id": "qid"}))
    with tempfile.TemporaryDirectory() as td:
        emb.write.parquet(f"{td}/src")
        run_ivfrq_ingest(
            read_vector_stream(spark, f"{td}/src"), C, books,
            f"{td}/store", checkpoint=f"{td}/cp",
        )
        got = ivfrq_store_search(
            spark, f"{td}/store", C, books, qdf, 10, nprobe=8
        ).orderBy("qid", "rank").collect()
        want = ivfrq_search(
            batch_codes, C, books, qdf, 10, nprobe=8
        ).orderBy("qid", "rank").collect()
        same = [r["label"] for r in got] == [r["label"] for r in want]
        print(f"  stream-grown store == batch encode: {same}")

    print("\n[6] IDMap2 (caller ids + reconstruct)")
    im = index_factory(vt, "IDMap2,Flat")
    im.add_with_ids(Q[:2] + 0.01, np.array([70001, 70002]))
    rec = im.reconstruct(70001)
    print(f"  add_with_ids + reconstruct: d={len(rec)}, "
          f"err={float(np.abs(rec - (Q[0] + 0.01)).max()):.2e}")

    print("\ndone.")


if __name__ == "__main__":
    main()
