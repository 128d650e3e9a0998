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
