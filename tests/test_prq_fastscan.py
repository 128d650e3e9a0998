"""Product-additive fast-scan tiers (r13) — faiss
``IndexProductResidualQuantizerFastScan`` /
``IndexProductLocalSearchQuantizerFastScan`` and their IVF forms
(factory ``PRQ<ns>x<m>x4fs`` / ``PLSQ<ns>x<m>x4fs`` /
``IVF<n>,PRQ<ns>x<m>x4fs``; faiss/IndexAdditiveQuantizerFastScan.h,
faiss/IndexIVFAdditiveQuantizerFastScan.h).

Composition of the r12 additive fast-scan machinery over the PRQ block
layout: the flattened (ns·m) 4-bit chain packs two stages per byte
(pairs run straight across block boundaries — inner products are
linear, so the fused byte table sums the same reals pair-associated
regardless of which block each nibble came from). Pins:

- packed search ≡ the unpacked nbits=4 PRQ tier on the same trained
  state: labels exactly, distances rtol 1e-12; stored bytes are
  exactly pq_pack4_np of the unpacked per-block codes
  (octet_length = ⌈ns·m/2⌉, including the odd-total padding byte);
- IVF form: full probe ≡ the unpacked IVFRQIndex(nsplits, nbits=4);
- factory (PRQ/PLSQ/LSQ x4fs + IVF forms), IO (kinds prq_fs,
  ivfrq_fs with rank-4 codebooks), clone, add, sa codec;
- range_search refuses (faiss IndexFastScan parity).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faiss_metal_spark import (
    IVFRQFastScanIndex,
    IVFRQIndex,
    PRQFastScanIndex,
    PRQIndex,
    RQFastScanIndex,
    VectorTable,
    clone_index,
    index_factory,
    read_index,
    write_index,
)
from faiss_metal_spark.operators.rq import prq_assign_np, prq_decode_np

from conftest import make_fixture


def _vt(spark, V):
    return VectorTable(spark, V.shape[1]).add_numpy(V)


def _unpacked_prq4(spark, vt, nsplits, m, sample_size=500, iters=4):
    """The plain nbits=4 PRQ tier over the same deterministic sample."""
    from faiss_metal_spark.operators.rq import prq_encode, prq_train

    base = vt.df.select("id", "vec")
    books = prq_train(base, nsplits, m, sample_size=sample_size,
                      iters=iters, nbits=4)
    codes = prq_encode(base, books)
    return PRQIndex(spark, vt.d, books, codes, -1)


def test_prq_fastscan_equals_unpacked(spark):
    V, Q = make_fixture(500, 5, 16)
    vt = _vt(spark, V)
    fs = PRQFastScanIndex.from_table(vt, nsplits=2, m=3, sample_size=500,
                                     iters=4)
    plain = _unpacked_prq4(spark, vt, 2, 3)
    np.testing.assert_array_equal(fs.codebooks, plain.codebooks)
    assert fs.codebooks.shape == (2, 3, 16, 8)  # (ns, m, 16, dsub)

    # stored bytes are the packed per-block codes (pairs cross the
    # block boundary at stage 3); ⌈6/2⌉ = 3 bytes
    from faiss_metal_spark.operators.pq import pq_pack4_np

    want = pq_pack4_np(prq_assign_np(V.astype(np.float64), fs.codebooks))
    rows = {r["id"]: r["code"] for r in fs.codes.collect()}
    for i in range(500):
        assert bytes(rows[i]) == want[i].tobytes()
    widths = fs.codes.select(
        F.octet_length("code").alias("w")
    ).distinct().collect()
    assert [r["w"] for r in widths] == [3]

    D0, L0 = plain.search_numpy(Q, 10)
    D1, L1 = fs.search_numpy(Q, 10)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_allclose(D0, D1, rtol=1e-12)

    with pytest.raises(NotImplementedError, match="range"):
        fs.range_search(None, 1.0)

    # reconstruct unpacks then per-block decodes
    np.testing.assert_allclose(
        fs.reconstruct(7),
        prq_decode_np(
            prq_assign_np(V[7:8].astype(np.float64), fs.codebooks),
            fs.codebooks,
        )[0],
        atol=1e-12,
    )

    # sa codec fixed point
    sa = fs.sa_encode(V[:5])
    assert all(len(c) == fs.sa_code_size == 3 for c in sa)
    np.testing.assert_allclose(
        fs.sa_decode(sa),
        prq_decode_np(
            prq_assign_np(V[:5].astype(np.float64), fs.codebooks),
            fs.codebooks,
        ).astype(np.float32),
        atol=0,
    )
    fs.release()


def test_prq_fastscan_odd_total_padding(spark):
    """ns·m odd (3 blocks × 3 stages = 9 nibbles → 5 bytes, padded
    high nibble): packed ≡ unpacked still label-exact."""
    V, Q = make_fixture(400, 4, 12)
    vt = _vt(spark, V)
    fs = PRQFastScanIndex.from_table(vt, nsplits=3, m=3, sample_size=400,
                                     iters=3)
    plain = _unpacked_prq4(spark, vt, 3, 3, sample_size=400, iters=3)
    widths = fs.codes.select(
        F.octet_length("code").alias("w")
    ).distinct().collect()
    assert [r["w"] for r in widths] == [5]
    D0, L0 = plain.search_numpy(Q, 8)
    D1, L1 = fs.search_numpy(Q, 8)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_allclose(D0, D1, rtol=1e-12)
    fs.release()


def test_ivf_prq_fastscan_equals_unpacked(spark):
    V, Q = make_fixture(500, 4, 16)
    vt = _vt(spark, V)
    fs = IVFRQFastScanIndex.from_table(vt, n_cells=8, nsplits=2, m=2,
                                       sample_size=500, iters=4)
    plain = IVFRQIndex.from_table(vt, n_cells=8, nsplits=2, m=2,
                                  sample_size=500, iters=4, nbits=4)
    np.testing.assert_array_equal(fs.centroids, plain.centroids)
    np.testing.assert_array_equal(fs.codebooks, plain.codebooks)
    assert fs.codebooks.ndim == 4 and fs.m == 4  # ns·m stages

    for nprobe in (2, 8):
        D0, L0 = plain.search_numpy(Q, 10, nprobe=nprobe)
        D1, L1 = fs.search_numpy(Q, 10, nprobe=nprobe)
        np.testing.assert_array_equal(L0, L1)
        mask = L0 >= 0
        np.testing.assert_allclose(D0[mask], D1[mask], rtol=1e-12)

    # reconstruct adds the centroid back (by_residual default)
    rec = fs.reconstruct(3)
    assert rec.shape == (16,)
    np.testing.assert_allclose(rec, plain.reconstruct(3), atol=1e-12)

    with pytest.raises(NotImplementedError, match="range"):
        fs.range_search(None, 1.0)
    fs.release(), plain.release()


def test_prq_fastscan_factory_io_clone(spark, tmp_path):
    V, Q = make_fixture(400, 3, 16)
    vt = _vt(spark, V)
    fs = index_factory(vt, "PRQ2x2x4fs", sample_size=400, iters=3)
    assert isinstance(fs, PRQFastScanIndex)
    lsq = index_factory(vt, "PLSQ2x2x4fs", sample_size=400, iters=3)
    assert isinstance(lsq, PRQFastScanIndex) and lsq.icm_sweeps == 2
    rlsq = index_factory(vt, "LSQ4x4fs", sample_size=400, iters=3)
    assert isinstance(rlsq, RQFastScanIndex) and rlsq.icm_sweeps == 2
    ivf = index_factory(vt, "IVF8,PRQ2x2x4fs", sample_size=400, iters=3)
    assert isinstance(ivf, IVFRQFastScanIndex) and ivf.codebooks.ndim == 4
    ivfl = index_factory(vt, "IVF8,PLSQ2x2x4fs", sample_size=400, iters=3)
    assert isinstance(ivfl, IVFRQFastScanIndex) and ivfl.icm_sweeps == 2

    D0, L0 = fs.search_numpy(Q, 5)
    p = str(tmp_path / "prqfs")
    write_index(fs, p)
    r = read_index(spark, p)
    assert isinstance(r, PRQFastScanIndex)
    np.testing.assert_array_equal(r.codebooks, fs.codebooks)
    D1, L1 = r.search_numpy(Q, 5)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_array_equal(D0, D1)

    p2 = str(tmp_path / "ivfprqfs")
    write_index(ivf, p2)
    r2 = read_index(spark, p2)
    assert isinstance(r2, IVFRQFastScanIndex) and r2.codebooks.ndim == 4
    Di, Li = ivf.search_numpy(Q, 5, nprobe=8)
    Dj, Lj = r2.search_numpy(Q, 5, nprobe=8)
    np.testing.assert_array_equal(Li, Lj)
    np.testing.assert_array_equal(Di, Dj)

    c = clone_index(fs)
    Dc, Lc = c.search_numpy(Q, 5)
    np.testing.assert_array_equal(L0, Lc)

    # add through the frozen codebooks: grow-by-add ≡ packed encode
    fs.add_numpy(V[:3], ids=[900, 901, 902])
    assert fs.ntotal == 403
    got = {r["id"]: r["code"] for r in
           fs.codes.where(F.col("id") >= 900).collect()}
    from faiss_metal_spark.operators.pq import pq_pack4_np

    want = pq_pack4_np(prq_assign_np(V[:3].astype(np.float64), fs.codebooks))
    for j, ext in enumerate([900, 901, 902]):
        assert bytes(got[ext]) == want[j].tobytes()
    fs.release()
