"""Additive-quantizer fast-scan tiers (r12) — faiss
``IndexAdditiveQuantizerFastScan`` / ``IndexIVFAdditiveQuantizerFastScan``
in their residual forms (factory ``RQ<m>x4fs`` / ``IVF<n>,RQ<m>x4fs``;
faiss/IndexAdditiveQuantizerFastScan.h).

The layout helpers are the PQ fast-scan pair (operators/pq.py
``pq_pack4_np`` / ``_fuse_lut4`` — codebook-agnostic by design, pinned
in tests/test_pq_fastscan.py); here they ride over 4-bit RQ stage
tables. Because the additive scan gathers INNER PRODUCTS (linear), the
fused byte table sums each byte's two stage terms pair-associated —
the same reals as the unpacked nbits=4 additive scan. Pins:

- packed search ≡ the unpacked 4-bit RQ tier trained on the same
  sample: labels exactly, distances to pair-association ulp
  (rtol 1e-12), and the stored bytes are exactly pq_pack4_np of the
  unpacked codes (storage halves: octet_length = ⌈m/2⌉);
- IVF form: full probe ≡ the unpacked IVFRQIndex at nbits=4 (same
  trained state), same tolerance discipline;
- range_search refuses on both (faiss IndexFastScan parity);
- factory / IO (kinds rq_fs, ivfrq_fs) / clone / add / merge /
  sa codec round-trips.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faiss_metal_spark import (
    IVFRQFastScanIndex,
    IVFRQIndex,
    RQFastScanIndex,
    VectorTable,
    clone_index,
    index_factory,
    read_index,
    write_index,
)
from faiss_metal_spark.operators.rq import rq_assign_np, rq_decode_np

from conftest import make_fixture


def _vt(spark, V):
    return VectorTable(spark, V.shape[1]).add_numpy(V)


def _unpacked_rq4(spark, vt, m):
    """The plain nbits=4 RQ tier over the same deterministic sample."""
    from faiss_metal_spark import RQIndex
    from faiss_metal_spark.operators.rq import rq_encode, rq_train

    base = vt.df.select("id", "vec")
    books = rq_train(base, m, sample_size=500, iters=4, nbits=4)
    codes = rq_encode(base, books)
    return RQIndex(spark, vt.d, books, codes, -1)


def test_rq_fastscan_equals_unpacked(spark):
    V, Q = make_fixture(500, 5, 16)
    vt = _vt(spark, V)
    fs = RQFastScanIndex.from_table(vt, m=4, sample_size=500, iters=4)
    plain = _unpacked_rq4(spark, vt, 4)
    np.testing.assert_array_equal(fs.codebooks, plain.codebooks)
    assert fs.codebooks.shape[1] == 16  # nbits=4 stages

    # stored bytes are the packed unpacked codes; storage halves
    from faiss_metal_spark.operators.pq import pq_pack4_np

    want = pq_pack4_np(rq_assign_np(V.astype(np.float64), fs.codebooks))
    rows = {r["id"]: r["code"] for r in fs.codes.collect()}
    for i in range(500):
        assert bytes(rows[i]) == want[i].tobytes()
    widths = fs.codes.select(
        F.octet_length("code").alias("w")
    ).distinct().collect()
    assert [r["w"] for r in widths] == [2]  # ⌈4/2⌉ bytes

    D0, L0 = plain.search_numpy(Q, 10)
    D1, L1 = fs.search_numpy(Q, 10)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_allclose(D0, D1, rtol=1e-12)

    with pytest.raises(NotImplementedError, match="range"):
        fs.range_search(None, 1.0)

    # reconstruct unpacks then additive-decodes
    np.testing.assert_allclose(
        fs.reconstruct(7),
        rq_decode_np(
            rq_assign_np(V[7:8].astype(np.float64), fs.codebooks),
            fs.codebooks,
        )[0],
        atol=1e-12,
    )

    # sa codec fixed point
    sa = fs.sa_encode(V[:5])
    assert all(len(c) == fs.sa_code_size == 2 for c in sa)
    np.testing.assert_allclose(
        fs.sa_decode(sa),
        rq_decode_np(
            rq_assign_np(V[:5].astype(np.float64), fs.codebooks),
            fs.codebooks,
        ).astype(np.float32),
        atol=0,
    )
    fs.release()


def test_ivfrq_fastscan_equals_unpacked(spark):
    V, Q = make_fixture(500, 4, 16)
    vt = _vt(spark, V)
    fs = IVFRQFastScanIndex.from_table(vt, n_cells=8, m=4,
                                       sample_size=500, iters=4)
    plain = IVFRQIndex.from_table(vt, n_cells=8, m=4, sample_size=500,
                                  iters=4, nbits=4)
    np.testing.assert_array_equal(fs.centroids, plain.centroids)
    np.testing.assert_array_equal(fs.codebooks, plain.codebooks)

    for nprobe in (2, 8):
        D0, L0 = plain.search_numpy(Q, 10, nprobe=nprobe)
        D1, L1 = fs.search_numpy(Q, 10, nprobe=nprobe)
        np.testing.assert_array_equal(L0, L1)
        np.testing.assert_allclose(D0, D1, rtol=1e-12)

    with pytest.raises(NotImplementedError, match="range"):
        fs.range_search(None, 1.0)

    # reconstruct = centroid + unpacked decode
    np.testing.assert_allclose(fs.reconstruct(3), plain.reconstruct(3),
                               atol=1e-12)
    fs.release(), plain.release()


def test_fastscan_factory_io_clone_add_merge(spark, tmp_path):
    V, Q = make_fixture(400, 3, 8)
    vt = _vt(spark, V)
    fs = index_factory(vt, "RQ2x4fs", sample_size=400, iters=3)
    assert isinstance(fs, RQFastScanIndex) and fs.m == 2
    ifs = index_factory(vt, "IVF4,RQ2x4fs_32", sample_size=400, iters=3)
    assert isinstance(ifs, IVFRQFastScanIndex) and ifs.nlist == 4

    # frozen-state add matches the host codec, packed
    from faiss_metal_spark.operators.pq import pq_pack4_np

    fs.add_numpy(V[:3] + 0.01, ids=np.arange(800, 803))
    assert fs.ntotal == 403
    rows = {r["id"]: r["code"] for r in fs.codes.where("id >= 800").collect()}
    want = pq_pack4_np(
        rq_assign_np((V[:3] + 0.01).astype(np.float64), fs.codebooks)
    )
    for i in range(3):
        assert bytes(rows[800 + i]) == want[i].tobytes()

    # IO round-trips both kinds value-identically
    D0, L0 = fs.search_numpy(Q, 5)
    write_index(fs, str(tmp_path / "rqfs"))
    fs2 = read_index(spark, str(tmp_path / "rqfs"))
    assert isinstance(fs2, RQFastScanIndex)
    D1, L1 = fs2.search_numpy(Q, 5)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_allclose(D0, D1, atol=0)

    Di0, Li0 = ifs.search_numpy(Q, 5, nprobe=4)
    write_index(ifs, str(tmp_path / "ivfrqfs"))
    ifs2 = read_index(spark, str(tmp_path / "ivfrqfs"))
    assert isinstance(ifs2, IVFRQFastScanIndex) and ifs2.by_residual
    Di1, Li1 = ifs2.search_numpy(Q, 5, nprobe=4)
    np.testing.assert_array_equal(Li0, Li1)
    np.testing.assert_allclose(Di0, Di1, atol=0)

    # clone detaches; merge moves entries under identical trained state
    cl = clone_index(ifs2)
    n0 = ifs2.ntotal
    ifs2.merge_from(cl, add_id=10_000)
    assert ifs2.ntotal == 2 * n0 and cl.ntotal == 0
    other = IVFRQFastScanIndex.from_table(vt, n_cells=2, m=2,
                                          sample_size=400, iters=3)
    with pytest.raises(ValueError, match="trained state"):
        ifs2.merge_from(other)
    assert fs.remove_ids([800, 55555]) == 1
    fs.release(), ifs.release(), other.release()
