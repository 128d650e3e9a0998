#!/usr/bin/env python
"""End-to-end demo: raw corpus → curated training set → indexes → search.

Runs the whole engine surface a training-data team would actually
compose, against the small test tables:

1. curate the document corpus (exact + LSH near-dedup + quality gate),
2. score it (Gopher repetition, DSIR weights, bigram-LM perplexity),
3. decontaminate against a held-out set and split train/val/test,
4. train a BPE vocabulary and pack training shards,
5. build vector indexes over the embeddings (flat FP16 VectorTable,
   derived SQ8 + binary tiers, IVF, PQ with refine, multiprobe LSH),
6. search them and report recall vs the exact flat search.

    python examples/pipeline_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    from pyspark.sql import functions as F

    from faiss_metal_spark import BinaryIndex, SQ8Index, VectorTable, get_spark
    from faiss_metal_spark.functions.evaluate import mean_recall
    from faiss_metal_spark.operators import (
        ann_lsh_search,
        bpe_train,
        bigram_lm_scores,
        dsir_weights,
        lsh_planes,
        repetition_profile,
    )
    from faiss_metal_spark.pipeline import curate_corpus, decontaminate, hash_split

    spark = get_spark("pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    n0 = docs.count()

    # 1. curate
    curated = curate_corpus(docs, min_quality=0.5).cache()
    n1 = curated.count()
    print(f"[curate]   {n0} docs -> {n1} after dedup + quality gate")

    # 2. quality scores
    rep = repetition_profile(docs)
    dsir = dsir_weights(docs, F.col("lang") == "en", buckets=64)
    lm = bigram_lm_scores(docs)
    worst = (
        lm.orderBy(F.col("cross_entropy").desc()).limit(3).collect()
    )
    print(f"[score]    highest-perplexity docs: {[r['doc_id'] for r in worst]}")
    _ = rep.count(), dsir.count()

    # 3. decontaminate + split
    evalset = docs.where(F.col("doc_id") % 53 == 0)
    contam = decontaminate(docs, evalset)
    split = hash_split(curated)
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    print(f"[split]    contaminated={contam.count()}  splits={counts}")

    # 4. tokenizer
    merges = bpe_train(docs, num_merges=20)
    print(f"[bpe]      learned {len(merges)} merges, first 5: {merges[:5]}")

    # 5-6. vector indexes + recall
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    vt = VectorTable.from_parquet(
        spark, os.path.join(SF, "embeddings.parquet"),
        d=64, id_col="vec_id", vec_col="embedding", storage="fp16", compact=True,
    )
    Q = np.stack(
        emb.orderBy("vec_id").limit(8).toPandas()["embedding"].to_numpy()
    ).astype(np.float32)
    D, L = vt.search_numpy(Q, k=5)
    exact = spark.createDataFrame(
        [
            (int(q), int(r), int(L[q, r]), float(D[q, r]))
            for q in range(len(Q))
            for r in range(5)
        ],
        "qid long, rank int, label long, distance double",
    )
    print(f"[flat]     fp16-compact self top-1: {L[:, 0].tolist()}")

    sq8 = SQ8Index.from_table(vt)
    _, L8 = sq8.search_numpy(Q, k=5)
    binx = BinaryIndex.from_table(vt)
    _, Lb = binx.refine_search_numpy(Q, k=5)
    ev = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    qdf = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    lsh = ann_lsh_search(ev, qdf, 5, lsh_planes(64, 6, 2, 7), n_probes=3)
    print(
        "[recall@5 vs exact] "
        f"sq8={mean_recall(_as_df(spark, L8), exact):.2f} "
        f"binary+refine={mean_recall(_as_df(spark, Lb), exact):.2f} "
        f"lsh-mp={mean_recall(lsh, exact):.2f}"
    )
    sq8.release(); binx.release()

    # 7. day-2 operations: factory build, tune, persist/reload, deltas
    import tempfile

    from faiss_metal_spark import index_factory, read_index, write_index
    from faiss_metal_spark.functions.evaluate import tune_nprobe
    from faiss_metal_spark.operators import incremental_lsh_dedup, lsh_band_buckets
    from faiss_metal_spark.operators.dedup import minhash_signatures

    tmp = tempfile.mkdtemp(prefix="fms_demo_")
    ivf = index_factory(vt, "IVF8,Flat", sample_size=500)
    tuned = tune_nprobe(ivf, qdf, k=5, target_recall=0.95)
    write_index(ivf, f"{tmp}/ivf")
    ivf2 = read_index(spark, f"{tmp}/ivf")
    _, Lr = ivf2.search_numpy(Q, 5, nprobe=tuned["nprobe"])
    print(
        f"[day2]     ivf nprobe tuned to {tuned['nprobe']}/{ivf.nlist}; "
        f"reloaded-index self top-1: {Lr[:, 0].tolist()}"
    )
    band_index = lsh_band_buckets(minhash_signatures(docs), bands=4)
    delta = docs.limit(3).select((F.col("doc_id") + 10**6).alias("doc_id"), "text")
    pairs, _ = incremental_lsh_dedup(delta, band_index, bands=4)
    print(f"[day2]     delta near-dedup vs persisted band index: {pairs.count()} pairs")
    ivf.release()

    # 8. external keys + standalone codec (the faiss IndexIDMap /
    #    sa_encode workflow, Spark-first: ids live IN the id column)
    from faiss_metal_spark import IDMapVectorTable

    idmap = IDMapVectorTable(spark, d=64)
    idmap.add_with_ids_df(
        emb.select((10_000 + F.col("vec_id") * 7).alias("id"),
                   F.col("embedding").alias("vec"))
    )
    snr = idmap.search_and_reconstruct(qdf, k=1).orderBy("qid").toPandas()
    codes = vt.sa_encode(Q[:2])
    print(
        f"[idmap]    top-1 external ids: {snr['label'].tolist()[:4]} "
        f"(vectors attached: {snr['vec'].notna().all()}); "
        f"sa_encode {len(codes)} codes x {vt.sa_code_size} bytes"
    )

    # 9. round-8 tiers: binary-hash LSH, refine-PQ re-rank, graph growth
    from faiss_metal_spark import GraphIndex

    lshidx = index_factory(vt, "LSH128", seed=11)
    _, Ll = lshidx.refine_search_numpy(Q, k=5)
    pqr = index_factory(vt, "IVF8,PQ8+8", sample_size=500)
    _, Lp = pqr.search_numpy(Q, 5, nprobe=8, k_factor=8)
    g = GraphIndex.from_table(vt, M=8, iters=3)
    g.add_numpy(Q + 0.01)  # incremental NSW insertion (IndexHNSW::add)
    print(
        "[r8 tiers] "
        f"lsh128+refine={mean_recall(_as_df(spark, Ll), exact):.2f} "
        f"ivfpqr={mean_recall(_as_df(spark, Lp), exact):.2f} "
        f"graph grew {g.ntotal - vt.ntotal} nodes to ntotal={g.ntotal}"
    )
    lshidx.release(); pqr.release(); g.release()

    # 10. round-8 fourth wave: dedup inverted file, narrow PQ codes,
    #     generic RFlat refine suffix, in-place IVF updates
    dup_vt = IDMapVectorTable(spark, d=64)
    dup_vt.add_with_ids_df(
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
        .unionByName(
            emb.where(F.col("vec_id") < 10).select(
                (F.col("vec_id") + 5000).alias("id"),
                F.col("embedding").alias("vec"),
            )
        )
    )
    ddup = index_factory(dup_vt, "IVF8,FlatDedup", sample_size=500)
    _, Ld = ddup.search_numpy(Q[:2], 2, nprobe=8)
    pq4 = index_factory(vt, "PQ8x4,RFlat", sample_size=500, k_factor=8)
    _, L4 = pq4.search_numpy(Q, 5)
    upd = index_factory(vt, "IVF8,Flat", sample_size=500)
    upd.update_vectors([0], Q[1:2])  # IndexIVFFlat::update_vectors
    print(
        "[r8 wave4] "
        f"dedup stored={ddup.ntotal} dups={ddup.n_instances} "
        f"expanded-top2={Ld.tolist()} "
        f"pq8x4+rflat recall={mean_recall(_as_df(spark, L4), exact):.2f} "
        f"ivf updated ntotal={upd.ntotal}"
    )
    ddup.release(); pq4.base.release(); upd.release()

    # 11. round-11 tiers: fast-scan PQ, product residual quantizer,
    #     normalized-cosine prefix, 1-d index, operating-point sweep
    fs = index_factory(vt, "PQ8x4fs", sample_size=500)
    _, Lf = fs.search_numpy(Q, 5)
    prq = index_factory(vt, "PRQ2x2x8", sample_size=500)
    _, Lr = prq.search_numpy(Q, 5)
    l2n = index_factory(vt, "L2norm,Flat")
    _, Ln = l2n.search_numpy(Q * 3.0, 5)  # scaling invisible post-normalize
    f1 = index_factory(VectorTable(spark, 1).add_numpy(Q[:, :1]), "Flat1D")
    from faiss_metal_spark.functions import explore_operating_points

    pts = explore_operating_points(
        ivf, qdf, k=5, param_grid={"nprobe": [1, 4]},
    )
    print(
        "[r11] "
        f"pq4fs recall={mean_recall(_as_df(spark, Lf), exact):.2f} "
        f"prq recall={mean_recall(_as_df(spark, Lr), exact):.2f} "
        f"l2norm recall={mean_recall(_as_df(spark, Ln), exact):.2f} "
        f"flat1d ntotal={f1.ntotal} "
        f"sweep={[(p['params']['nprobe'], round(p['recall'], 2)) for p in pts]}"
    )
    for i in (fs, prq, f1):
        i.release()
    print("OK")


def _as_df(spark, L):
    rows = [
        (int(q), int(r), int(L[q, r]), 0.0)
        for q in range(L.shape[0])
        for r in range(L.shape[1])
        if L[q, r] >= 0
    ]
    return spark.createDataFrame(rows, "qid long, rank int, label long, distance double")


if __name__ == "__main__":
    main()
