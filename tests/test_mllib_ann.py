"""MLlib-backed index building: accuracy pinned against exact numpy.

MLlib hash families are engine-specific (no DuckDB oracle), so
correctness here means: k-means assignments are truly nearest-centroid,
LSH pairs all satisfy the threshold exactly, and recall against the
exact pair set is high enough to be useful.
"""

import numpy as np

from conftest import make_fixture, vectors_df
from faiss_metal_spark.operators.mllib_ann import (
    mllib_kmeans_ivf,
    mllib_lsh_pairs,
    mllib_minhash_pairs,
)


def test_kmeans_ivf_assigns_nearest_centroid(spark):
    V, _ = make_fixture(nv=600, nq=1, d=16)
    df = vectors_df(spark, V)
    centroids, assigned = mllib_kmeans_ivf(df, n_cells=8)
    assert centroids.shape == (8, 16)
    got = {r["id"]: r["cell"] for r in assigned.collect()}
    d2 = ((V[:, None, :].astype(np.float64) - centroids[None, :, :]) ** 2).sum(-1)
    want = d2.argmin(1)
    agree = sum(got[i] == want[i] for i in range(len(V)))
    # transform() assigns the nearest trained centroid — exact property
    assert agree == len(V), f"{len(V) - agree} non-nearest assignments"


def test_lsh_pairs_respect_threshold_and_recall(spark):
    rng = np.random.default_rng(5)
    base = rng.uniform(-1, 1, size=(120, 12)).astype(np.float32)
    # plant 30 near-duplicates: tiny perturbations of the first 30 rows
    dups = base[:30] + rng.normal(0, 0.01, size=(30, 12)).astype(np.float32)
    V = np.vstack([base, dups])
    df = vectors_df(spark, V)
    thr = 0.5
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in mllib_lsh_pairs(df, thr).collect()}

    Vd = V.astype(np.float64)
    D = np.sqrt(((Vd[:, None, :] - Vd[None, :, :]) ** 2).sum(-1))
    # 1) no false positives: every emitted pair's exact distance ≤ thr
    for (a, b), dist in got.items():
        assert abs(dist - D[a, b]) < 1e-6 and D[a, b] <= thr + 1e-9
    # 2) recall: the planted pairs are near-identical (dist ≈ 0.03 ≪ thr);
    #    multi-table LSH must surface essentially all of them
    planted = {(i, 120 + i) for i in range(30)}
    found = planted & set(got)
    assert len(found) >= 28, f"recall {len(found)}/30"


def test_minhash_pairs_find_token_overlap(spark):
    texts = []
    base_tokens = [f"tok{i}" for i in range(40)]
    texts.append((0, " ".join(base_tokens)))
    texts.append((1, " ".join(base_tokens[:38] + ["x", "y"])))   # ~0.9 jaccard
    texts.append((2, " ".join(f"other{i}" for i in range(40))))  # disjoint
    docs = spark.createDataFrame(texts, schema="doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]): r["jdist"] for r in
             mllib_minhash_pairs(docs, threshold=0.5).collect()}
    assert (0, 1) in pairs                    # near-dup found
    assert pairs[(0, 1)] < 0.3                # jaccard distance ≈ 1 − 38/42
    assert (0, 2) not in pairs and (1, 2) not in pairs
