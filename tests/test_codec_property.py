"""Property-based fuzz of the pure-numpy codec helpers — the single
sources of quantization arithmetic shared by the stored-code encoders
and the sa_encode/sa_decode standalone codecs. No SparkSession: these
run in milliseconds and guard the numerics for ANY shape/range.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from faiss_metal_spark.operators.pq import pq_assign_np, pq_decode_np
from faiss_metal_spark.operators.sq import sq8_decode_np, sq8_encode_np
from faiss_metal_spark.quantize import (
    bf16_decode_np,
    bf16_encode_np,
    bf16_roundtrip_np,
    fp16_decode_np,
    fp16_encode_np,
    fp16_roundtrip_np,
)


@settings(max_examples=50, deadline=None, derandomize=True)
@given(
    n=st.integers(1, 40),
    d=st.integers(1, 64),
    scale=st.floats(1e-3, 1e3),
    seed=st.integers(0, 2**16),
)
def test_half_codecs_invert_their_roundtrips(n, d, scale, seed):
    """encode→decode equals the documented roundtrip quantization
    exactly, for both half formats, at any magnitude in fp16 range."""
    rng = np.random.default_rng(seed)
    X = (rng.normal(size=(n, d)) * scale).astype(np.float32)
    fp16 = np.stack([fp16_decode_np(b) for b in fp16_encode_np(X)])
    np.testing.assert_array_equal(fp16, fp16_roundtrip_np(X))
    bf16 = np.stack([bf16_decode_np(b) for b in bf16_encode_np(X)])
    np.testing.assert_array_equal(bf16, bf16_roundtrip_np(X))


@settings(max_examples=50, deadline=None, derandomize=True)
@given(
    n=st.integers(1, 40),
    d=st.integers(1, 32),
    seed=st.integers(0, 2**16),
)
def test_sq8_codec_error_bound_and_idempotence(n, d, seed):
    """Reconstruction error ≤ half a quantization step per dim
    (including constant dims, step 0); re-encoding a reconstruction
    returns the identical codes (the codec is idempotent)."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d)) * rng.uniform(0.01, 10)
    if rng.random() < 0.3:
        X[:, 0] = 7.0  # constant dim → zero range branch
    vmin, vmax = X.min(axis=0), X.max(axis=0)
    codes = sq8_encode_np(X, vmin, vmax)
    rec = sq8_decode_np(codes, vmin, vmax)
    step = (vmax - vmin) / 255.0
    assert (np.abs(rec - X) <= step * 0.5 + 1e-12).all()
    np.testing.assert_array_equal(sq8_encode_np(rec, vmin, vmax), codes)


@settings(max_examples=30, deadline=None, derandomize=True)
@given(
    n=st.integers(1, 30),
    m=st.sampled_from([1, 2, 4]),
    dsub=st.integers(1, 8),
    seed=st.integers(0, 2**16),
)
def test_pq_assign_is_true_nearest_codeword(n, m, dsub, seed):
    """pq_assign_np's decomposed argmin equals the brute-force nearest
    codeword per subspace, and decoding a codebook point re-assigns to
    itself (codebook points are fixed points of the codec)."""
    rng = np.random.default_rng(seed)
    d = m * dsub
    books = rng.normal(size=(m, 256, dsub)).astype(np.float32).astype(np.float64)
    X = rng.normal(size=(n, d))
    codes = pq_assign_np(X, books)
    for j in range(m):
        Xj = X[:, j * dsub : (j + 1) * dsub]
        true = ((Xj[:, None, :] - books[j][None, :, :]) ** 2).sum(-1).argmin(1)
        np.testing.assert_array_equal(codes[:, j], true)
    snapped = pq_decode_np(codes, books)
    np.testing.assert_array_equal(pq_assign_np(snapped, books), codes)


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    n=st.integers(1, 30),
    m=st.integers(1, 6),
    d=st.integers(1, 24),
    nbits=st.sampled_from([4, 8]),
    seed=st.integers(0, 2**16),
)
def test_rq_codec_properties(n, m, d, nbits, seed):
    """r12: additive (RQ) codec invariants at any shape/width —
    (a) stage codes are < 2^nbits and assignment is deterministic
    (beam=1 ≡ the default greedy chain bit-for-bit); (b) ICM
    refinement NEVER increases any vector's reconstruction error
    (coordinate descent — the one true per-vector monotonicity the
    additive family offers; the stage-prefix claim holds only
    in-distribution and is pinned on correlated data in test_rq.py);
    (c) for nbits=4, pack→fuse equals the unpacked gather exactly on
    inner-product LUTs and the pack round-trip is lossless."""
    from faiss_metal_spark.operators.pq import (
        _fuse_lut4,
        pq_pack4_np,
        pq_unpack4_np,
    )
    from faiss_metal_spark.operators.rq import (
        rq_assign_np,
        rq_decode_np,
        rq_icm_refine_np,
        rq_train_np,
    )

    rng = np.random.default_rng(seed)
    ksub = 1 << nbits
    X = rng.normal(size=(max(n, ksub), d)) * 3.0  # ≥ ksub train rows
    books = rq_train_np(X, m, iters=3, ksub=ksub)
    assert books.shape == (m, ksub, d)
    V = rng.normal(size=(n, d)) * 3.0
    codes = rq_assign_np(V, books)
    assert codes.max(initial=0) < ksub
    np.testing.assert_array_equal(rq_assign_np(V, books, beam=1), codes)

    # (b) ICM coordinate descent: per-vector error never increases
    err = lambda c: ((V - rq_decode_np(c, books)) ** 2).sum(1)  # noqa: E731
    refined = rq_icm_refine_np(V, books, codes, sweeps=2)
    assert (err(refined) <= err(codes) + 1e-9).all()

    # (d) packed layout: one fused gather ≡ two nibble gathers, and the
    # pack/unpack round-trip is lossless
    if nbits == 4:
        packed = pq_pack4_np(codes)
        assert packed.shape[1] == (m + 1) // 2
        np.testing.assert_array_equal(pq_unpack4_np(packed, m), codes)
        q = rng.normal(size=(3, d))
        lut = np.einsum("qd,mkd->qmk", q, books)
        fused = _fuse_lut4(lut)
        ip_plain = sum(lut[:, j, :][:, codes[:, j]] for j in range(m))
        ip_fused = sum(
            fused[:, p, :][:, packed[:, p]] for p in range(packed.shape[1])
        )
        np.testing.assert_allclose(ip_fused, ip_plain, rtol=1e-12)
