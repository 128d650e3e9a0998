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


def _numpy_lloyd(V, init, iters, dp=6):
    """Driver-side replay of lloyd_kmeans (assign → rounded means →
    empty-cell carry) for exactness pins."""
    C = np.asarray(init, np.float64).copy()
    Vd = V.astype(np.float64)
    for _ in range(iters):
        d2 = ((Vd[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(1)
        newC = C.copy()
        for c in range(len(C)):
            if (a == c).any():
                newC[c] = np.round(Vd[a == c].mean(0), dp)
        C = newC
    d2 = ((Vd[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    return C, d2.argmin(1)


def test_lloyd_kmeans_matches_numpy_and_is_deterministic(spark):
    from faiss_metal_spark.operators.mllib_ann import lloyd_kmeans

    V, _ = make_fixture(nv=400, nq=1, d=16)
    df = vectors_df(spark, V)
    init = V[:6].astype(np.float64)
    C1, a1 = lloyd_kmeans(df, init, iters=3)
    C2, a2 = lloyd_kmeans(df, init, iters=3)
    np.testing.assert_array_equal(C1, C2)  # deterministic trainer
    wantC, wantA = _numpy_lloyd(V, init, 3)
    # rounded per-iteration centroids make the whole trajectory
    # engine-independent — numpy replays it bit-for-bit
    np.testing.assert_allclose(C1, wantC, atol=1e-12)
    got = {r["id"]: r["cell"] for r in a1.select("id", "cell").collect()}
    assert all(got[i] == wantA[i] for i in range(len(V)))


def test_lloyd_kmeans_empty_cell_keeps_previous_centroid(spark):
    from faiss_metal_spark.operators.mllib_ann import lloyd_kmeans

    V, _ = make_fixture(nv=100, nq=1, d=8)
    df = vectors_df(spark, V)
    # one far-away init centroid that can never win an assignment
    far = np.full((1, 8), 1e6)
    init = np.vstack([V[:3].astype(np.float64), far])
    C, assigned = lloyd_kmeans(df, init, iters=2)
    np.testing.assert_array_equal(C[3], far[0])  # carried, not NaN
    assert assigned.where("cell = 3").count() == 0


def test_brp_lsh_pairs_fixed_exact_candidate_semantics(spark):
    from faiss_metal_spark.operators.mllib_ann import brp_lsh_pairs_fixed

    rng = np.random.default_rng(7)
    base = rng.uniform(-1, 1, size=(100, 12)).astype(np.float32)
    dups = base[:25] + rng.normal(0, 0.01, size=(25, 12)).astype(np.float32)
    V = np.vstack([base, dups])
    df = vectors_df(spark, V)
    planes = rng.normal(size=(3, 12))
    blen, thr = 1.0, 0.5
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in brp_lsh_pairs_fixed(df, planes, blen, thr).collect()
    }
    # the family is caller-fixed, so the EXACT pair set is replayable:
    # pairs = (same floor-bucket in ANY table) AND exact dist ≤ thr
    Vd = V.astype(np.float64)
    P = planes / np.sqrt((planes**2).sum(1))[:, None]
    H = np.floor((Vd @ P.T) / blen).astype(np.int64)
    D = np.sqrt(((Vd[:, None, :] - Vd[None, :, :]) ** 2).sum(-1))
    want = {
        (a, b)
        for a in range(len(V))
        for b in range(a + 1, len(V))
        if (H[a] == H[b]).any() and D[a, b] <= thr
    }
    assert set(got) == want
    for (a, b), dist in got.items():
        assert abs(dist - D[a, b]) < 1e-9


def test_brp_lsh_exact_filter_paths_bit_identical(spark):
    """r11: the broadcast-gated Arrow exact filter folds Σ(aᵢ−bᵢ)² as
    a sequential column loop — the identical left-fold order and f64
    ops as the join+HOF plan, so the two paths' pair sets AND distance
    doubles must be bit-equal (exact_via="join" forces the HOF plan)."""
    from faiss_metal_spark.operators.mllib_ann import brp_lsh_pairs_fixed

    rng = np.random.default_rng(19)
    base = rng.uniform(-1, 1, size=(80, 12)).astype(np.float32)
    V = np.vstack([base, base[:20] + rng.normal(0, 0.01, (20, 12)).astype(np.float32)])
    df = vectors_df(spark, V)
    planes = rng.normal(size=(3, 12))
    fast = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in brp_lsh_pairs_fixed(df, planes, 1.0, 0.5).collect()
    }
    slow = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in brp_lsh_pairs_fixed(
            df, planes, 1.0, 0.5, exact_via="join"
        ).collect()
    }
    assert fast.keys() == slow.keys() and fast
    for k in fast:
        assert fast[k] == slow[k], (k, fast[k], slow[k])  # BIT-equal
