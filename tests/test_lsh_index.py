"""LSHIndex — faiss IndexLSH parity (rotation sign bits + Hamming scan).

Contract model: faiss IndexLSH with the default rotate_data=true,
train_thresholds=false encodes sign bits of a RandomRotationMatrix
projection and searches codes exhaustively by Hamming distance (the
reference inherits none of this — its table is flat-only,
/root/reference/include/faiss-metal/MetalIndexFlat.h:47 — so this is
superset surface). Pins here:

- the distributed Catalyst encode is bit-identical to the host numpy
  encode through the same rotation (sa_encode twin);
- Hamming ranking is deterministic per seed and matches a full numpy
  re-derivation exactly (codes are integers — no float tolerance);
- nbits > d works through the expanding rotation (faiss behavior) and
  more bits never hurt code-level recall on separated clusters;
- refine (IndexRefineFlat composition) returns exact L2 distances and
  recovers exact top-1 on separated clusters;
- write_index/read_index round-trips the class value-identically.
"""

import numpy as np
import pytest

from faiss_metal_spark import LSHIndex, VectorTable, read_index, write_index
from faiss_metal_spark.compact_index import index_factory

from conftest import make_fixture, numpy_oracle


def _table(spark, V) -> VectorTable:
    vt = VectorTable(spark, V.shape[1], metric="l2")
    return vt.add_numpy(V)


def _clustered(n_clusters=8, per=25, d=16, seed=3, spread=0.05):
    """Well-separated clusters: center distance ≫ intra-cluster spread,
    so Hamming over enough rotation bits must keep neighbors together."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-1, 1, size=(n_clusters, d)).astype(np.float32) * 4
    V = np.concatenate(
        [c + rng.normal(0, spread, size=(per, d)).astype(np.float32) for c in centers]
    )
    Q = centers + rng.normal(0, spread, size=centers.shape).astype(np.float32)
    return V.astype(np.float32), Q.astype(np.float32)


def _numpy_lsh_ranking(V, Q, R, k):
    """Full numpy re-derivation: project → sign bits → Hamming top-k,
    ties by ascending label (the hamming_knn contract)."""
    def bits(X):
        return (np.asarray(X, np.float64) @ R.T > 0)

    bv, bq = bits(V), bits(Q)
    ham = (bq[:, None, :] != bv[None, :, :]).sum(-1)
    # stable argsort on (distance, label)
    order = np.argsort(ham, axis=1, kind="stable")
    return order[:, :k], np.take_along_axis(ham, order, axis=1)[:, :k]


def test_lsh_matches_numpy_rederivation(spark):
    V, Q = make_fixture(120, 6, 16)
    idx = LSHIndex.from_table(_table(spark, V), nbits=64, seed=11)
    assert idx.ntotal == 120 and idx.nbits == 64
    D, L = idx.search_numpy(Q, 10)
    L_ref, D_ref = _numpy_lsh_ranking(V, Q, idx.rotation, 10)
    np.testing.assert_array_equal(L, L_ref)
    np.testing.assert_array_equal(D.astype(np.int64), D_ref)


def test_lsh_sa_encode_matches_distributed_words(spark):
    V, _ = make_fixture(50, 1, 16)
    idx = LSHIndex.from_table(_table(spark, V), nbits=40, seed=5)
    stored = {
        int(r["id"]): np.asarray(r["words"], np.int64)
        for r in idx.words.collect()
    }
    host = idx.sa_encode(V)
    for i in range(len(V)):
        np.testing.assert_array_equal(
            np.frombuffer(host[i], np.int64), stored[i]
        )


def test_lsh_nbits_exceeding_d_expands_rotation(spark):
    V, Q = _clustered(d=8)
    vt = _table(spark, V)
    wide = LSHIndex.from_table(vt, nbits=96, seed=7)
    assert wide.rotation.shape == (96, 8)
    # expanding regime = full columns of a Haar matrix in the nbits
    # space: columns stay orthonormal (an isometry d → nbits), rows
    # cannot be mutually orthogonal — only d directions exist
    np.testing.assert_allclose(
        wide.rotation.T @ wide.rotation, np.eye(8), atol=1e-9
    )
    # within a cluster the codes are near-identical (that's the point
    # of LSH), so exact-rank recall is ill-posed; the code-level pin is
    # CLUSTER recall: every returned neighbor lies in the query's own
    # cluster (labels i·25..i·25+24 for query i), and more bits help
    def cluster_recall(L):
        ok = [
            np.isin(L[i], np.arange(i * 25, (i + 1) * 25)).mean()
            for i in range(len(Q))
        ]
        return float(np.mean(ok))

    _, L_wide = wide.search_numpy(Q, 5)
    narrow = LSHIndex.from_table(vt, nbits=8, seed=7)
    _, L_narrow = narrow.search_numpy(Q, 5)
    assert cluster_recall(L_wide) >= 0.95, cluster_recall(L_wide)
    assert cluster_recall(L_wide) >= cluster_recall(L_narrow)


def test_lsh_refine_recovers_exact_top1(spark):
    V, Q = _clustered()
    idx = LSHIndex.from_table(_table(spark, V), nbits=128, seed=13)
    D, L = idx.refine_search_numpy(Q, 5, refine_factor=8)
    D_exact, L_exact = numpy_oracle(V, Q, 5)
    np.testing.assert_array_equal(L[:, 0], L_exact[:, 0])
    # refine distances are exact L2 of the returned labels
    for i in range(len(Q)):
        for j in range(5):
            d_true = ((Q[i].astype(np.float64) - V[L[i, j]].astype(np.float64)) ** 2).sum()
            assert abs(D[i, j] - d_true) < 1e-3


def test_lsh_roundtrip_and_factory(spark, tmp_path):
    V, Q = make_fixture(100, 4, 16)
    vt = _table(spark, V)
    idx = index_factory(vt, "LSH64", seed=9)
    assert isinstance(idx, LSHIndex) and idx.nbits == 64
    bare = index_factory(vt, "LSH")
    assert bare.nbits == vt.d
    D0, L0 = idx.search_numpy(Q, 8)

    write_index(idx, str(tmp_path / "lsh"))
    idx2 = read_index(spark, str(tmp_path / "lsh"))
    assert isinstance(idx2, LSHIndex)
    assert (idx2.d, idx2.nbits, idx2.ntotal) == (idx.d, idx.nbits, idx.ntotal)
    np.testing.assert_allclose(idx2.rotation, idx.rotation, atol=1e-12)
    D1, L1 = idx2.search_numpy(Q, 8)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_array_equal(D0, D1)
    # refine still works after reload (source table persisted)
    Dr, Lr = idx2.refine_search_numpy(Q, 3)
    assert Lr.shape == (4, 3)


def test_lsh_rejects_bad_nbits(spark):
    V, _ = make_fixture(10, 1, 8)
    with pytest.raises(ValueError, match="nbits"):
        LSHIndex.from_table(_table(spark, V), nbits=0)


def test_itq_beats_random_rotation_on_correlated_data(spark, tmp_path):
    """ITQ (Gong et al. 2011, faiss ITQMatrix / "ITQ,LSH"): the learned
    rotation's sign bits preserve neighborhoods better than a random
    rotation at the same bit budget on correlated data — pinned as
    code-level recall dominance — and the trained (mean, rotation)
    round-trip through write_index."""
    from faiss_metal_spark import read_index, write_index

    rng = np.random.default_rng(6)
    basis = rng.normal(size=(4, 32))
    X = (rng.normal(size=(500, 4)) @ basis + 0.05 * rng.normal(size=(500, 32))).astype(
        np.float32
    )
    Q = (rng.normal(size=(8, 4)) @ basis + 0.05 * rng.normal(size=(8, 32))).astype(
        np.float32
    )
    vt = _table(spark, X)
    itq = index_factory(vt, "ITQ16,LSH", sample_size=500)
    rr = LSHIndex.from_table(vt, nbits=16, seed=42)
    assert itq.mean is not None and np.abs(itq.mean).sum() > 0

    _, L_exact = numpy_oracle(X, Q, 10)

    def recall(L):
        return np.mean(
            [len(set(L[i]) & set(L_exact[i])) / 10 for i in range(len(Q))]
        )

    _, L_itq = itq.search_numpy(Q, 10)
    _, L_rr = rr.search_numpy(Q, 10)
    assert recall(L_itq) > recall(L_rr), (recall(L_itq), recall(L_rr))

    # determinism + IO round-trip carries the centering
    itq2 = index_factory(vt, "ITQ16,LSH", sample_size=500)
    np.testing.assert_array_equal(itq2.rotation, itq.rotation)
    write_index(itq, str(tmp_path / "itq"))
    back = read_index(spark, str(tmp_path / "itq"))
    np.testing.assert_allclose(back.mean, itq.mean, atol=1e-12)
    _, L_back = back.search_numpy(Q, 10)
    np.testing.assert_array_equal(L_back, L_itq)
