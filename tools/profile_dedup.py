#!/usr/bin/env python
"""Stage-level timing for the two most expensive headline queries
(`dedup_clusters`, `curate_corpus`) — the r4→r5 wall-clock watch items
(VERDICT r5 "What's wrong" #2).

Splits each query into its physical stages and times them separately,
plus counts the connected-components rounds, so a wall-time move can be
attributed to a stage instead of guessed at. Run:

    python tools/profile_dedup.py [sf_dir]

Prints one JSON object per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def t(fn):
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 3), out


def main() -> None:
    import bench
    from faiss_metal_spark.operators.dedup import (
        connected_components,
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )
    from faiss_metal_spark.session import get_spark

    spark = get_spark("profile-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    bench._warmup(spark)

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    # --- dedup_clusters ---------------------------------------------------
    prof: dict[str, float] = {}
    sig = minhash_signatures(docs, num_hashes=8, shingle_size=3)
    pairs = lsh_candidate_pairs(sig, num_hashes=8, bands=4)
    prof["lsh_pairs_sec"], n_pairs = t(pairs.persist().count)
    prof["n_pairs"] = n_pairs
    prof["cc_sec"], cc = t(lambda: connected_components(pairs))
    prof["cc_count_sec"], prof["n_nodes"] = t(cc.count)
    pairs.unpersist()
    print(json.dumps({"query": "dedup_clusters", **prof}))

    # --- curate_corpus ----------------------------------------------------
    prof = {}
    sig = minhash_signatures(docs, num_hashes=8, shingle_size=3)
    cand = lsh_candidate_pairs(sig, num_hashes=8, bands=4)
    prof["lsh_pairs_sec"], _ = t(cand.persist().count)
    verified = ngram_jaccard_pairs(
        docs, pair_candidates=cand, shingle_size=3, threshold=0.5, max_df=None
    ).select("id_a", "id_b")
    prof["jaccard_verify_sec"], prof["n_edges"] = t(verified.persist().count)
    prof["cc_sec"], cc = t(lambda: connected_components(verified))
    prof["cc_count_sec"], _ = t(cc.count)
    from faiss_metal_spark.pipeline import curate_corpus

    prof["full_pipeline_sec"], prof["n_out"] = t(
        curate_corpus(docs).count
    )
    cand.unpersist()
    verified.unpersist()
    print(json.dumps({"query": "curate_corpus", **prof}))


if __name__ == "__main__":
    main()
