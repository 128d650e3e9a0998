"""Scalar-quantizer uniform/direct variants (r13) — faiss
``ScalarQuantizer::QT_8bit_uniform`` / ``QT_4bit_uniform`` (one shared
(vmin, vmax) pair across all dimensions, represented as constant
trained arrays so the per-dim machinery serves both) and
``QT_8bit_direct`` (code = (uint8) x = clamp(floor(x), 0, 255),
decode = code verbatim, training-free). Factory specs ``SQ8u`` /
``SQ4u`` / ``SQ6u`` (aliases ``SQ8_uniform`` ...) and ``SQ8d`` /
``SQ8_direct``. Pins: numpy-oracle search parity, IO round-trip with
the direct flag, sa codec fixed point, guards."""

import numpy as np
import pytest

from faiss_metal_spark import (
    SQ8Index,
    VectorTable,
    index_factory,
    read_index,
    write_index,
)
from faiss_metal_spark.operators.sq import sq_decode_np, sq_encode_np


def _vt(spark, V):
    return VectorTable(spark, V.shape[1]).add_numpy(V)


def _exact_topk(V_rec, Q, k):
    D = ((Q[:, None, :].astype(np.float64) - V_rec[None, :, :]) ** 2).sum(2)
    L = np.empty((len(Q), k), np.int64)
    Dk = np.empty((len(Q), k))
    for i in range(len(Q)):
        order = np.lexsort((np.arange(len(V_rec)), D[i]))[:k]
        L[i], Dk[i] = order, D[i][order]
    return Dk, L


def test_sq_uniform_is_shared_range(spark):
    rng = np.random.default_rng(5)
    # dims on wildly different scales — uniform must use ONE range
    V = (rng.normal(size=(200, 8)) * np.array([1, 10, 100, 1, 1, 1, 1, 1])).astype(
        np.float32
    )
    Q = V[:4]
    vt = _vt(spark, V)
    idx = index_factory(vt, "SQ8u")
    assert isinstance(idx, SQ8Index) and not idx.direct
    # constant trained arrays = the global min/max
    assert np.unique(idx.vmin).size == 1 and np.unique(idx.vmax).size == 1
    assert idx.vmin[0] == V.astype(np.float64).min()
    assert idx.vmax[0] == V.astype(np.float64).max()
    # search ≡ numpy oracle through the same constant-range codec
    rec = sq_decode_np(sq_encode_np(V, idx.vmin, idx.vmax, 8), idx.vmin, idx.vmax, 8)
    Dk, Lk = _exact_topk(rec, Q, 5)
    D, L = idx.search_numpy(Q, 5)
    np.testing.assert_array_equal(L, Lk)
    np.testing.assert_allclose(D, Dk, rtol=1e-12)
    # 4-bit + faiss-literal spelling
    for spec in ("SQ4u", "SQ4_uniform", "SQ6u"):
        u = index_factory(vt, spec)
        assert np.unique(u.vmin).size == 1
        u.release()
    idx.release()


def test_sq_direct(spark, tmp_path):
    rng = np.random.default_rng(7)
    # byte-scale data (the QT_8bit_direct domain) + out-of-range rows
    V = rng.uniform(-3, 260, size=(150, 6)).astype(np.float32)
    Q = V[:4]
    vt = _vt(spark, V)
    idx = index_factory(vt, "SQ8d")
    assert isinstance(idx, SQ8Index) and idx.direct

    # codes are clamp(floor(x), 0, 255); decode returns them verbatim
    want = np.clip(np.floor(V.astype(np.float64)), 0, 255).astype(np.uint8)
    got = {r["id"]: r["code"] for r in idx.codes.collect()}
    for i in range(len(V)):
        assert got[i] == want[i].tolist()
    np.testing.assert_array_equal(idx.reconstruct(3), want[3].astype(np.float64))

    # search ≡ numpy oracle on the decoded (== code) matrix
    Dk, Lk = _exact_topk(want.astype(np.float64), Q, 5)
    D, L = idx.search_numpy(Q, 5)
    np.testing.assert_array_equal(L, Lk)
    np.testing.assert_allclose(D, Dk, rtol=1e-12)

    # sa codec fixed point
    sa = idx.sa_encode(V[:5].astype(np.float64))
    np.testing.assert_array_equal(
        idx.sa_decode(sa), want[:5].astype(np.float32)
    )

    # IO round-trips the direct flag; reloaded search value-identical
    p = str(tmp_path / "sqd")
    write_index(idx, p)
    r = read_index(spark, p)
    assert r.direct
    D1, L1 = r.search_numpy(Q, 5)
    np.testing.assert_array_equal(L, L1)
    np.testing.assert_array_equal(D, D1)

    # add encodes through the same direct codec
    idx.add_numpy(V[:2], ids=[900, 901])
    grown = {r["id"]: r["code"] for r in idx.codes.where("id >= 900").collect()}
    assert grown[900] == want[0].tolist() and grown[901] == want[1].tolist()
    idx.release()


def test_sq_direct_guards(spark):
    V = np.random.default_rng(1).uniform(0, 255, size=(50, 4)).astype(np.float32)
    vt = _vt(spark, V)
    with pytest.raises(ValueError, match="direct"):
        SQ8Index.from_table(vt, bits=4, direct=True)
    with pytest.raises(ValueError, match="direct"):
        SQ8Index.from_table(vt, uniform=True, direct=True)
    # merge refuses across variants (trained-state mismatch)
    a = SQ8Index.from_table(vt, direct=True)
    b = SQ8Index.from_table(vt)
    with pytest.raises(ValueError, match="trained state"):
        a.merge_from(b, add_id=1000)
    a.release(), b.release()


def test_sq_direct_signed(spark, tmp_path):
    """faiss QT_8bit_direct_signed (factory SQ8ds / SQ8_direct_signed):
    code = clamp(floor(x)+128, 0, 255), decode = code − 128."""
    rng = np.random.default_rng(9)
    V = rng.uniform(-140, 140, size=(100, 5)).astype(np.float32)
    Q = V[:3]
    vt = _vt(spark, V)
    idx = index_factory(vt, "SQ8ds")
    assert idx.direct == "signed"
    lit = index_factory(vt, "SQ8_direct_signed")
    assert lit.direct == "signed"
    lit.release()

    want_codes = np.clip(
        np.floor(V.astype(np.float64)) + 128, 0, 255
    ).astype(np.uint8)
    got = {r["id"]: r["code"] for r in idx.codes.collect()}
    for i in range(len(V)):
        assert got[i] == want_codes[i].tolist()
    dec = want_codes.astype(np.float64) - 128
    np.testing.assert_array_equal(idx.reconstruct(4), dec[4])

    Dk, Lk = _exact_topk(dec, Q, 5)
    D, L = idx.search_numpy(Q, 5)
    np.testing.assert_array_equal(L, Lk)
    np.testing.assert_allclose(D, Dk, rtol=1e-12)

    # sa codec fixed point in the signed domain
    sa = idx.sa_encode(V[:4].astype(np.float64))
    np.testing.assert_array_equal(idx.sa_decode(sa), dec[:4].astype(np.float32))

    # IO round-trips the "signed" marker (not collapsed to a bool)
    p = str(tmp_path / "sqds")
    write_index(idx, p)
    r = read_index(spark, p)
    assert r.direct == "signed"
    D1, L1 = r.search_numpy(Q, 5)
    np.testing.assert_array_equal(L, L1)
    np.testing.assert_array_equal(D, D1)

    with pytest.raises(ValueError, match="direct"):
        SQ8Index.from_table(vt, direct="sideways")
    # signed vs unsigned direct: trained-state mismatch refuses merge
    b = SQ8Index.from_table(vt, direct=True)
    with pytest.raises(ValueError, match="trained state"):
        idx.merge_from(b, add_id=1000)
    idx.release(), b.release()


def test_ivfsq_uniform(spark):
    """faiss IVF + QT_*bit_uniform (factory IVF<n>,SQ8u /
    IVF<n>,SQ4_uniform): one shared range; full probe ≡ the flat
    uniform tier exactly (the shared-train discipline)."""
    from faiss_metal_spark import IVFSQIndex

    rng = np.random.default_rng(13)
    V = (rng.normal(size=(250, 8)) * np.array([1, 40, 1, 1, 1, 1, 1, 1])).astype(
        np.float32
    )
    Q = V[:4]
    vt = _vt(spark, V)
    ivf = index_factory(vt, "IVF8,SQ8u", sample_size=250, iters=3)
    assert isinstance(ivf, IVFSQIndex)
    assert np.unique(ivf.vmin).size == 1 and np.unique(ivf.vmax).size == 1
    flat = SQ8Index.from_table(vt, uniform=True)
    np.testing.assert_array_equal(ivf.vmin, flat.vmin)
    D0, L0 = flat.search_numpy(Q, 6)
    D1, L1 = ivf.search_numpy(Q, 6, nprobe=8)  # full probe
    np.testing.assert_array_equal(L0, L1)
    # flat vs in-cell decode differ only in summation shape (~1e-11)
    np.testing.assert_allclose(D0, D1, rtol=1e-9)
    lit = index_factory(vt, "IVF8,SQ4_uniform", sample_size=250, iters=3)
    assert lit.bits == 4 and np.unique(lit.vmin).size == 1
    ivf.release(), flat.release(), lit.release()
