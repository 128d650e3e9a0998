"""Binary graph index (r13) — faiss ``IndexBinaryHNSW``
(binary_factory ``"BHNSW<M>"``; faiss/IndexBinaryHNSW.h: an HNSW walk
whose every distance is the Hamming distance of packed binary codes).

Engine shape: packed words resident (the BinaryIndex layout), graph
built with NN-Descent over the UNPACKED 0/1 bit vectors — squared L2
on 0/1 rows IS the packed Hamming distance — serving via
``graph_search`` with a word-unpack decode hook. Pins:

- recall@k vs the exhaustive flat Hamming scan (approximate tier —
  recall, not exactness) and EXACT distances: every returned label's
  distance equals its true packed Hamming distance;
- binary row contract: long distances, min(k, reached) rows, no
  sentinel padding;
- factory ("BHNSW8" / bare "BHNSW"), IO kind "bhnsw" (no arrays/
  dataset — the binary discipline) value-identical, clone;
- add refuses (read-only derived graph tier), range_search refuses
  (faiss parity);
- reconstruct returns the stored 0/1 bit vector.
"""

import numpy as np
import pytest

from faiss_metal_spark import (
    BinaryHNSWIndex,
    VectorTable,
    clone_index,
    index_factory,
    read_index,
    write_index,
)
from faiss_metal_spark.operators.binary import binarize_np, unpack_words_np


def _clustered(n, d, seed=5, rank=6):
    rng = np.random.default_rng(seed)
    B = rng.normal(size=(rank, d))
    return (
        rng.normal(size=(n, rank)) @ B + 0.3 * rng.normal(size=(n, d))
    ).astype(np.float32)


def _vt(spark, V):
    return VectorTable(spark, V.shape[1]).add_numpy(V)


def _exact_hamming(V, Q):
    """(nq, n) integer Hamming matrix via the packed twin."""
    W = binarize_np(V)
    Wq = binarize_np(Q)
    bits_v = unpack_words_np(W, V.shape[1])
    bits_q = unpack_words_np(Wq, Q.shape[1])
    return np.abs(bits_q[:, None, :] - bits_v[None, :, :]).sum(2).astype(np.int64)


def test_bhnsw_recall_and_exact_distances(spark):
    V = _clustered(600, 32, seed=3)
    Q = _clustered(20, 32, seed=4)
    vt = _vt(spark, V)
    idx = BinaryHNSWIndex.from_table(vt, M=12, iters=5, seed=7)
    k = 10
    D, L = idx.search_numpy(Q, k, ef=60)
    H = _exact_hamming(V, Q)
    hits = tot = 0
    for i in range(len(Q)):
        kth = np.partition(H[i], k - 1)[k - 1]
        got = L[i][L[i] >= 0]
        assert len(got) == k  # corpus >> k, walk reaches k rows
        # distances are the TRUE packed Hamming of the returned labels
        np.testing.assert_array_equal(D[i][: len(got)], H[i][got])
        # ordered (distance, label)
        pairs = list(zip(D[i][: len(got)].tolist(), got.tolist()))
        assert pairs == sorted(pairs)
        hits += (H[i][got] <= kth).sum()
        tot += k
    assert hits / tot >= 0.9, f"recall {hits / tot:.3f}"
    # deterministic
    D2, L2 = idx.search_numpy(Q, k, ef=60)
    np.testing.assert_array_equal(L, L2)
    idx.release()


def test_bhnsw_contract_and_io(spark, tmp_path):
    V = _clustered(300, 16, seed=11)
    Q = _clustered(5, 16, seed=12)
    vt = _vt(spark, V)
    idx = index_factory(vt, "BHNSW8", iters=4)
    assert isinstance(idx, BinaryHNSWIndex) and idx.M == 8
    bare = index_factory(vt, "BHNSW", iters=2)
    assert bare.M == 16
    bare.release()

    res = idx.search(_qdf(spark, Q), 5).collect()
    # long distances, no sentinels
    assert all(r["label"] >= 0 for r in res)
    assert all(isinstance(r["distance"], int) for r in res)

    D0, L0 = idx.search_numpy(Q, 5)
    p = str(tmp_path / "bhnsw")
    write_index(idx, p)
    import os

    vdirs = [x for x in os.listdir(p) if x.startswith("_v")]
    assert not any(
        "arrays" in os.listdir(os.path.join(p, v)) for v in vdirs
    )  # binary kind: no arrays/ dataset
    r = read_index(spark, p)
    assert isinstance(r, BinaryHNSWIndex)
    assert (r.d, r.M, r.ef_search, r.ntotal) == (16, 8, 64, 300)
    D1, L1 = r.search_numpy(Q, 5)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_array_equal(D0, D1)

    c = clone_index(idx)
    np.testing.assert_array_equal(c.search_numpy(Q, 5)[1], L0)

    with pytest.raises(NotImplementedError, match="read-only"):
        idx.add_numpy(V[:2])
    with pytest.raises(NotImplementedError, match="range"):
        idx.range_search(None, 3)

    # reconstruct = the stored 0/1 bit vector
    want = unpack_words_np(binarize_np(V[7:8]), 16)[0]
    np.testing.assert_array_equal(idx.reconstruct(7), want)
    with pytest.raises(KeyError):
        idx.reconstruct(10_000)
    idx.release()


def _qdf(spark, Q):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame({"qid": range(len(Q)), "vec": [r.tolist() for r in Q]})
    )


def test_bhnsw_k_exceeds_reached(spark):
    """k > ntotal: min(k, reached) rows, host twin fills −1."""
    V = _clustered(8, 16, seed=21)
    vt = _vt(spark, V)
    idx = BinaryHNSWIndex.from_table(vt, M=4, iters=3)
    D, L = idx.search_numpy(V[:2], 12, ef=16)
    for i in range(2):
        got = L[i][L[i] >= 0]
        assert 1 <= len(got) <= 8
        assert (L[i][len(got):] == -1).all() and (D[i][len(got):] == -1).all()
    idx.release()
