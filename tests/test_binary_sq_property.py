"""Property-based fuzz of the binary Hamming index and SQ8 quantizer
over random (nv, nq, d, k) — the invariants (numpy agreement, tie
order, word-packing bounds, code bounds, reconstruction error bound)
must hold for ANY shape, including d not a multiple of the word width
and constant dimensions."""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from faiss_metal_spark.operators.binary import binarize, hamming_knn
from faiss_metal_spark.operators.sq import sq8_encode, sq8_search, sq8_train

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from faiss_metal_spark.session import get_spark

        _spark = get_spark("faiss-metal-spark-tests")
    return _spark


def _dfs(spark, V, Q):
    vdf = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(len(V)), "vec": [v.tolist() for v in V]}),
        "id long, vec array<float>",
    )
    qdf = spark.createDataFrame(
        pd.DataFrame({"qid": np.arange(len(Q)), "vec": [v.tolist() for v in Q]}),
        "qid long, vec array<float>",
    )
    return vdf, qdf


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    nv=st.integers(2, 200),
    nq=st.integers(1, 5),
    d=st.integers(1, 130),
    k=st.integers(1, 20),
    seed=st.integers(0, 2**16),
)
def test_hamming_knn_any_shape(nv, nq, d, k, seed):
    spark = _get_spark()
    rng = np.random.default_rng(seed)
    V = rng.uniform(-1, 1, (nv, d)).astype(np.float32)
    Q = rng.uniform(-1, 1, (nq, d)).astype(np.float32)
    vdf, qdf = _dfs(spark, V, Q)
    res = hamming_knn(vdf, qdf, k, d).toPandas().sort_values(["qid", "rank"])
    H = ((Q > 0)[:, None, :] != (V > 0)[None, :, :]).sum(-1)
    kk = min(k, nv)
    for q in range(nq):
        order = np.lexsort((np.arange(nv), H[q]))[:kk]
        got = res[res.qid == q]
        assert len(got) == kk
        assert (got.label.to_numpy() == order).all()
        assert (got.distance.to_numpy() == H[q][order]).all()
    # packed store invariants: non-negative 32-bit words, right count
    wp = binarize(vdf, d).toPandas()
    nwords = (d + 31) // 32
    for ws in wp["words"]:
        assert len(ws) == nwords
        assert all(0 <= w < 2**32 for w in ws)


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    nv=st.integers(2, 200),
    nq=st.integers(1, 5),
    d=st.integers(1, 48),
    k=st.integers(1, 15),
    seed=st.integers(0, 2**16),
)
def test_sq8_any_shape(nv, nq, d, k, seed):
    spark = _get_spark()
    rng = np.random.default_rng(seed)
    V = rng.uniform(-3, 3, (nv, d)).astype(np.float32)
    if d >= 2:
        V[:, 0] = 1.5  # always include a constant dimension
    Q = rng.uniform(-3, 3, (nq, d)).astype(np.float32)
    vdf, qdf = _dfs(spark, V, Q)
    vmin, vmax = sq8_train(vdf)
    Vd = V.astype(np.float64)
    assert np.array_equal(vmin, Vd.min(0)) and np.array_equal(vmax, Vd.max(0))
    codes = sq8_encode(vdf, vmin, vmax)
    cp = np.stack(codes.toPandas().sort_values("id")["code"].to_numpy())
    assert cp.min() >= 0 and cp.max() <= 255
    # stored values reconstruct within half a quantization step
    rngv = vmax - vmin
    recon = vmin + cp * (rngv / 255.0)
    step = np.where(rngv == 0, 0.0, rngv / 255.0)
    assert (np.abs(recon - Vd) <= step / 2 + 1e-12).all()
    # search agrees with numpy ADC over the same codes
    D = ((Q.astype(np.float64)[:, None, :] - recon[None, :, :]) ** 2).sum(-1)
    res = sq8_search(codes, vmin, vmax, qdf, k).toPandas().sort_values(["qid", "rank"])
    kk = min(k, nv)
    for q in range(nq):
        order = np.lexsort((np.arange(nv), D[q]))[:kk]
        got = res[res.qid == q]
        assert (got.label.to_numpy() == order).all()
        assert np.allclose(got.distance.to_numpy(), D[q][order])
