"""PQ fast-scan tiers (r11) — faiss ``IndexPQFastScan`` /
``IndexIVFPQFastScan`` (factory ``PQ<m>x4fs`` / ``IVF<n>,PQ<m>x4fs``;
faiss/IndexPQFastScan.h, faiss/impl/pq4_fast_scan.h).

The fast-scan layout packs two 4-bit codes per stored byte and gathers
ADC terms through fused per-byte 256-entry tables. faiss's SIMD
register interleave has no analog here; what the engine keeps is the
semantic core: storage/scan bytes halve vs one-code-per-byte nbits=4,
and the math is the same reals — pinned here: fast-scan search ≡ the
unpacked nbits=4 tier with labels exactly equal and distances equal up
to float summation order (the fused table adds each byte's two
subspace terms FIRST, a pair-association the flat j-loop doesn't make;
faiss's own fast-scan drifts much further — it quantizes LUTs to int8).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faiss_metal_spark import (
    IVFPQFastScanIndex,
    IVFPQIndex,
    PQFastScanIndex,
    PQIndex,
    VectorTable,
    clone_index,
    index_factory,
    read_index,
    write_index,
)
from tests.conftest import make_fixture


def _vt(spark, V):
    return VectorTable(spark, V.shape[1]).add_numpy(V)


def test_pack4_unpack4_roundtrip_and_validation():
    from faiss_metal_spark.operators.pq import pq_pack4_np, pq_unpack4_np

    rng = np.random.default_rng(7)
    for m in (8, 7):  # even and odd widths (odd pads a zero nibble)
        codes = rng.integers(0, 16, size=(50, m), dtype=np.uint8)
        packed = pq_pack4_np(codes)
        assert packed.shape == (50, (m + 1) // 2)
        np.testing.assert_array_equal(pq_unpack4_np(packed, m), codes)
    with pytest.raises(ValueError, match="4-bit"):
        pq_pack4_np(np.full((3, 4), 16, dtype=np.uint8))


def test_fused_lut_equals_nibble_gathers():
    """fused[q, p, byte] must equal lut[q, 2p, lo] + lut[q, 2p+1, hi]
    for every byte — one gather per byte ≡ two nibble gathers."""
    from faiss_metal_spark.operators.pq import _fuse_lut4

    rng = np.random.default_rng(11)
    lut = rng.normal(size=(3, 6, 16))
    fused = _fuse_lut4(lut)
    assert fused.shape == (3, 3, 256)
    for b in (0, 15, 16, 170, 255):
        np.testing.assert_allclose(
            fused[:, :, b], lut[:, 0::2, b & 15] + lut[:, 1::2, b >> 4],
            atol=0,
        )
    # odd m: the last byte's high nibble contributes zero
    fused_odd = _fuse_lut4(lut[:, :5, :])
    np.testing.assert_allclose(fused_odd[:, 2, 0x30], lut[:, 4, 0], atol=0)
    with pytest.raises(ValueError, match="16-entry"):
        _fuse_lut4(rng.normal(size=(2, 4, 256)))


def test_pq_fastscan_equals_unpacked_pq4(spark):
    """Packing is layout: PQFastScanIndex search must reproduce the
    plain nbits=4 PQIndex (same deterministic training sample → same
    codebooks): labels exactly equal, distances equal up to the fused
    pair-association (≤ last-ulp)."""
    V, Q = make_fixture(400, 6, 16, seed=71)
    vt = _vt(spark, V)
    plain = PQIndex.from_table(vt, m=8, nbits=4, sample_size=400)
    fs = PQFastScanIndex.from_table(vt, m=8, sample_size=400)
    np.testing.assert_allclose(plain.codebooks, fs.codebooks, atol=0)

    D0, L0 = plain.search_numpy(Q, 5)
    D1, L1 = fs.search_numpy(Q, 5)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_allclose(D0, D1, rtol=1e-12)  # pair-association ulp

    # stored bytes actually halve (m=8 → 4 bytes/code)
    w = fs.codes.select(F.octet_length("code").alias("w")).distinct().collect()
    assert [r["w"] for r in w] == [4]
    assert fs.sa_code_size == 4 and fs.nbits == 4 and fs.m == 8

    # reconstruct decodes through the packed layout identically
    np.testing.assert_allclose(plain.reconstruct(3), fs.reconstruct(3), atol=0)

    # standalone codec round-trips the packed bytes
    codes = fs.sa_encode(V[:10].astype(np.float64))
    dec = fs.sa_decode(codes)
    np.testing.assert_allclose(dec, plain.sa_decode(plain.sa_encode(V[:10])), atol=0)

    with pytest.raises(NotImplementedError, match="range search"):
        fs.range_search(None, 1.0)
    plain.release(), fs.release()


def test_pq_fastscan_add_remove_merge(spark):
    """Grow-by-add ≡ one-shot build row-for-row (frozen codebooks);
    remove drops explicit labels; merge shifts donor ids."""
    V, Q = make_fixture(300, 4, 16, seed=73)
    vt_all = _vt(spark, V)
    one_shot = PQFastScanIndex.from_table(vt_all, m=8, sample_size=300)

    vt_head = _vt(spark, V[:200])
    grown = PQFastScanIndex.from_table(vt_head, m=8, sample_size=300)
    # same training sample? No — different corpus. Re-encode the tail
    # against ITS OWN books instead: pin add ≡ its own one-shot search
    grown.add_numpy(V[200:])
    assert grown.ntotal == 300
    D_g, L_g = grown.search_numpy(Q, 5)
    # one-shot over the same books: rebuild by adding everything
    fresh = PQFastScanIndex(
        grown.spark, grown.d, grown.codebooks,
        grown.codes.limit(0).persist(), 0,
    ).add_numpy(V)
    D_f, L_f = fresh.search_numpy(Q, 5)
    np.testing.assert_array_equal(L_g, L_f)
    np.testing.assert_array_equal(D_g, D_f)

    assert grown.remove_ids([0, 1, 250]) == 3
    assert grown.ntotal == 297
    one_shot.release(), grown.release(), fresh.release()


def test_ivfpq_fastscan_equals_unpacked(spark):
    """Full probe ≡ the unpacked nbits=4 IVFPQIndex exactly (same
    deterministic trained state); max_codes/sel thread through like
    the rest of the IVF family."""
    V, Q = make_fixture(400, 4, 16, seed=79)
    vt = _vt(spark, V)
    plain = IVFPQIndex.from_table(vt, n_cells=6, m=8, nbits=4, sample_size=400)
    fs = IVFPQFastScanIndex.from_table(vt, n_cells=6, m=8, sample_size=400)
    np.testing.assert_allclose(plain.centroids, fs.centroids, atol=0)
    np.testing.assert_allclose(plain.codebooks, fs.codebooks, atol=0)

    D0, L0 = plain.search_numpy(Q, 5, nprobe=6)
    D1, L1 = fs.search_numpy(Q, 5, nprobe=6)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_allclose(D0, D1, rtol=1e-12)  # pair-association ulp

    # max_codes=1 ≡ nprobe=1; huge bound ≡ unrestricted
    Dp, Lp = fs.search_numpy(Q, 5, nprobe=1)
    Dm, Lm = fs.search_numpy(Q, 5, nprobe=4, max_codes=1)
    np.testing.assert_array_equal(Lp, Lm)
    np.testing.assert_allclose(Dp, Dm, atol=0)

    # sel restricts labels
    from faiss_metal_spark import IDSelectorRange

    _, Ls = fs.search_numpy(Q, 5, nprobe=6, sel=IDSelectorRange(0, 100))
    real = Ls[Ls >= 0]
    assert ((real >= 0) & (real < 100)).all()

    # reconstruct = centroid + decoded residual, same as unpacked
    np.testing.assert_allclose(plain.reconstruct(7), fs.reconstruct(7), atol=0)

    with pytest.raises(NotImplementedError, match="range search"):
        fs.range_search(None, 1.0)
    plain.release(), fs.release()


def test_fastscan_factory_io_clone(spark):
    """Factory specs parse (incl. the ignored _<bbs> block suffix);
    write/read round-trips value-identically; clone is independent."""
    V, Q = make_fixture(300, 3, 16, seed=83)
    vt = _vt(spark, V)

    fs = index_factory(vt, "PQ8x4fs", sample_size=300)
    assert isinstance(fs, PQFastScanIndex)
    fs_b = index_factory(vt, "PQ8x4fs_64", sample_size=300)
    assert isinstance(fs_b, PQFastScanIndex)
    ivf = index_factory(vt, "IVF4,PQ8x4fs", sample_size=300)
    assert isinstance(ivf, IVFPQFastScanIndex) and ivf.nlist == 4

    D0, L0 = fs.search_numpy(Q, 4)
    Di, Li = ivf.search_numpy(Q, 4, nprobe=4)

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        write_index(fs, f"{td}/fs")
        write_index(ivf, f"{td}/ivf")
        fs2 = read_index(spark, f"{td}/fs")
        ivf2 = read_index(spark, f"{td}/ivf")
        assert isinstance(fs2, PQFastScanIndex)
        assert isinstance(ivf2, IVFPQFastScanIndex)
        D2, L2 = fs2.search_numpy(Q, 4)
        np.testing.assert_array_equal(L0, L2)
        np.testing.assert_array_equal(D0, D2)
        D3, L3 = ivf2.search_numpy(Q, 4, nprobe=4)
        np.testing.assert_array_equal(Li, L3)
        np.testing.assert_array_equal(Di, D3)

        cl = clone_index(fs)
        cl.add_numpy(V[:5])  # mutate the clone only
        assert cl.ntotal == 305 and fs.ntotal == 300
    fs.release(), fs_b.release(), ivf.release()
