"""IVFPQRIndex — faiss IndexIVFPQR parity (IVFPQ + refine-PQ re-rank).

Contract model (faiss IndexIVFPQR: search probes the IVFPQ stage for
k·k_factor ADC candidates and re-ranks them on the reconstruction
through BOTH quantizers; the reference engine has no compressed tier —
/root/reference/include/faiss-metal/MetalIndexFlat.h:47). Pins:

- with every cell probed and k_factor covering the whole corpus, the
  result IS the exact top-k by two-level reconstruction distance — a
  full numpy re-derivation from the trained artifacts + stored codes
  must match label-for-label, distance to 1e-9;
- the refine PQ strictly shrinks corpus reconstruction MSE vs the
  first-stage-only decode (that is its entire purpose);
- re-ranked recall@k ≥ plain IVFPQ recall@k on the same trained
  coarse/PQ1 state;
- add_df after build ≡ one-shot build row-for-row (frozen-state
  encode); reconstruct goes through both quantizers;
- write_index/read_index round-trips kind 'ivfpqr' value-identically
  and the factory parses "IVF<n>,PQ<m>+<m2>".
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faiss_metal_spark import (
    IVFPQIndex,
    IVFPQRIndex,
    VectorTable,
    read_index,
    write_index,
)
from faiss_metal_spark.compact_index import index_factory
from faiss_metal_spark.operators.pq import pq_decode_np

from conftest import make_fixture, numpy_oracle


def _table(spark, V) -> VectorTable:
    vt = VectorTable(spark, V.shape[1], metric="l2")
    return vt.add_numpy(V)


def _collect_codes(idx):
    rows = idx.codes.orderBy("id").collect()
    ids = np.array([r["id"] for r in rows], np.int64)
    cells = np.array([r["cell"] for r in rows], np.int64)
    c1 = np.stack([np.frombuffer(r["code"], np.uint8) for r in rows])
    c2 = np.stack([np.frombuffer(r["code2"], np.uint8) for r in rows])
    return ids, cells, c1, c2


def _two_level_recon(idx, cells, c1, c2):
    return (
        idx.centroids[cells]
        + pq_decode_np(c1, idx.codebooks)
        + pq_decode_np(c2, idx.refine_books)
    )


def test_full_probe_full_factor_matches_numpy(spark):
    V, Q = make_fixture(300, 5, 16)
    idx = IVFPQRIndex.from_table(_table(spark, V), n_cells=4, m=4, m_refine=8,
                                 sample_size=300)
    assert idx.ntotal == 300 and idx.nlist == 4
    k = 10
    # candidates = entire corpus → result is exact top-k by two-level
    # reconstruction distance
    D, L = idx.search_numpy(Q, k, nprobe=4, k_factor=(300 // k) + 1)
    ids, cells, c1, c2 = _collect_codes(idx)
    rec = _two_level_recon(idx, cells, c1, c2)
    Dm = ((Q.astype(np.float64)[:, None, :] - rec[None, :, :]) ** 2).sum(-1)
    order = np.lexsort((ids[None, :].repeat(len(Q), 0), Dm), axis=1)[:, :k]
    np.testing.assert_array_equal(L, ids[order])
    np.testing.assert_allclose(
        D, np.take_along_axis(Dm, order, axis=1), atol=1e-9
    )


def test_refine_shrinks_reconstruction_mse(spark):
    V, _ = make_fixture(400, 1, 32)
    idx = IVFPQRIndex.from_table(_table(spark, V), n_cells=4, m=4, m_refine=8,
                                 sample_size=400)
    ids, cells, c1, c2 = _collect_codes(idx)
    rec1 = idx.centroids[cells] + pq_decode_np(c1, idx.codebooks)
    rec2 = _two_level_recon(idx, cells, c1, c2)
    Vd = V.astype(np.float64)[ids]
    mse1 = ((Vd - rec1) ** 2).mean()
    mse2 = ((Vd - rec2) ** 2).mean()
    assert mse2 < mse1 * 0.9, (mse1, mse2)


def test_rerank_recall_at_least_ivfpq(spark):
    V, Q = make_fixture(500, 8, 32)
    vt = _table(spark, V)
    pqr = IVFPQRIndex.from_table(vt, n_cells=4, m=4, m_refine=8, sample_size=500)
    plain = IVFPQIndex.from_table(vt, n_cells=4, m=4, sample_size=500)
    k = 10
    _, L_exact = numpy_oracle(V, Q, k)
    _, L_r = pqr.search_numpy(Q, k, nprobe=4, k_factor=8)
    _, L_p = plain.search_numpy(Q, k, nprobe=4)

    def recall(L):
        return np.mean(
            [len(set(L[i]) & set(L_exact[i])) / k for i in range(len(Q))]
        )

    assert recall(L_r) >= recall(L_p) - 1e-9, (recall(L_r), recall(L_p))


def test_add_after_build_equals_one_shot(spark):
    V, _ = make_fixture(400, 1, 16)
    vt_all = _table(spark, V)
    one_shot = IVFPQRIndex.from_table(vt_all, n_cells=3, m=4, sample_size=400,
                                      iters=6)
    # grow from the first 300 using the SAME frozen trained state
    grown = IVFPQRIndex(
        spark, one_shot.d, one_shot.centroids, one_shot.codebooks,
        one_shot.refine_books,
        one_shot.codes.where(F.col("id") < 300).persist(),
        300,
    )
    grown.add_numpy(V[300:], ids=np.arange(300, 400))
    assert grown.ntotal == 400
    a = sorted(map(tuple, _collect_codes(grown)[2].tolist()))
    b = sorted(map(tuple, _collect_codes(one_shot)[2].tolist()))
    assert a == b
    a2 = sorted(map(tuple, _collect_codes(grown)[3].tolist()))
    b2 = sorted(map(tuple, _collect_codes(one_shot)[3].tolist()))
    assert a2 == b2


def test_reconstruct_remove_and_roundtrip(spark, tmp_path):
    V, Q = make_fixture(300, 4, 16)
    idx = IVFPQRIndex.from_table(_table(spark, V), n_cells=3, m=4, m_refine=4,
                                 sample_size=300)
    ids, cells, c1, c2 = _collect_codes(idx)
    r7 = idx.reconstruct(7)
    np.testing.assert_allclose(
        r7, _two_level_recon(idx, cells[7:8], c1[7:8], c2[7:8])[0], atol=1e-12
    )
    with pytest.raises(KeyError):
        idx.reconstruct(10_000)

    D0, L0 = idx.search_numpy(Q, 5, nprobe=3, k_factor=4)
    write_index(idx, str(tmp_path / "pqr"))
    idx2 = read_index(spark, str(tmp_path / "pqr"))
    assert isinstance(idx2, IVFPQRIndex)
    assert (idx2.d, idx2.nlist, idx2.ntotal) == (idx.d, idx.nlist, idx.ntotal)
    D1, L1 = idx2.search_numpy(Q, 5, nprobe=3, k_factor=4)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_allclose(D0, D1, atol=1e-12)

    assert idx.remove_ids([0, 1, 99999]) == 2
    assert idx.ntotal == 298


def test_factory_spec_and_merge_guard(spark):
    V, _ = make_fixture(400, 1, 16)
    vt = _table(spark, V)
    idx = index_factory(vt, "IVF3,PQ4+8", sample_size=400)
    assert isinstance(idx, IVFPQRIndex)
    assert idx.codebooks.shape[0] == 4 and idx.refine_books.shape[0] == 8
    other = IVFPQRIndex.from_table(vt, n_cells=3, m=4, m_refine=8,
                                   sample_size=300)  # different sample → state
    if not np.array_equal(other.centroids, idx.centroids):
        with pytest.raises(ValueError, match="trained state"):
            idx.merge_from(other)
