"""RowwiseMinMaxIndex — faiss IndexRowwiseMinMax[FP16] parity.

faiss contract (IndexRowwiseMinMax.cpp; the reference engine has no
codec family at all): per-row min-max normalization to [0, 1], codes
carry a (scaler, vmin) float32 (or float16) prefix ahead of the inner
code, decode = inner_decode · scaler + vmin; search is NOT implemented
upstream (codec index) and raises here too. The Spark-side value: the
inner index trains/encodes over an all-Catalyst normalized projection
(one scan, no shuffle, no Python per row).
"""

import numpy as np
import pytest

from faiss_metal_spark import RowwiseMinMaxIndex, VectorTable, index_factory

from conftest import make_fixture


def _vt(spark, V):
    return VectorTable(spark, V.shape[1]).add_numpy(V)


def test_codec_roundtrip_and_prefix_layout(spark):
    rng = np.random.default_rng(31)
    # rows at wildly different scales — the case the codec exists for
    V = (rng.normal(size=(40, 16)) * rng.uniform(0.01, 100, size=(40, 1))).astype(
        np.float32
    )
    idx = index_factory(_vt(spark, V), "MinMax,SQ8")
    assert isinstance(idx, RowwiseMinMaxIndex) and not idx.fp16
    codes = idx.sa_encode(V.astype(np.float64))
    # prefix: 8 bytes (2×float32) + inner SQ8 code
    assert all(len(c) == idx.sa_code_size for c in codes)
    assert idx.sa_code_size == 8 + idx.inner.sa_code_size
    pre = np.frombuffer(bytes(codes[0][:8]), np.float32)
    assert np.isclose(pre[0], V[0].max() - V[0].min(), rtol=1e-6)
    assert np.isclose(pre[1], V[0].min(), rtol=1e-6)
    dec = idx.sa_decode(codes)
    # SQ8 on the normalized [0,1] row: error ≤ scaler · step/2 per dim
    step = 1.0 / 255.0
    err = np.abs(dec - V)
    bound = (V.max(1) - V.min(1))[:, None] * step  # generous (≥ step/2)
    assert (err <= bound + 1e-6).all()

    # a constant row decodes back exactly (scaler 0 path)
    const = np.full((1, 16), 3.25, np.float64)
    c = idx.sa_encode(const)
    np.testing.assert_allclose(idx.sa_decode(c), const, atol=1e-7)

    with pytest.raises(NotImplementedError, match="codec"):
        idx.search(None, 5)


def test_fp16_variant_and_inner_training_space(spark):
    V, _ = make_fixture(60, 1, 16, seed=32)
    idx = index_factory(_vt(spark, V), "MinMaxFP16,SQ8")
    assert idx.fp16 and idx.sa_code_size == 4 + idx.inner.sa_code_size
    codes = idx.sa_encode(V.astype(np.float64))
    assert all(len(c) == idx.sa_code_size for c in codes)
    dec = idx.sa_decode(codes)
    # fp16 prefix rounds scaler/vmin — tolerance widens accordingly
    assert np.abs(dec - V).max() < 0.02 * max(1.0, np.abs(V).max())
    # the inner index really holds NORMALIZED rows: its stored range
    # is [0, 1] (the Catalyst normalize ran, not a passthrough)
    inner_dec = idx.inner.sa_decode(
        idx.inner.sa_encode(
            (V[:4] - V[:4].min(1, keepdims=True))
            / (V[:4].max(1, keepdims=True) - V[:4].min(1, keepdims=True))
        )
    )
    assert inner_dec.min() >= -1e-6 and inner_dec.max() <= 1 + 1e-6
    # ntotal/d delegate
    assert idx.ntotal == 60 and idx.d == 16


def test_bad_dim_refuses(spark):
    V, _ = make_fixture(30, 1, 8, seed=33)
    idx = index_factory(_vt(spark, V), "MinMax,SQ8")
    with pytest.raises(ValueError, match="expected d=8"):
        idx.sa_encode(np.zeros((2, 9)))
