"""range_search across the compressed/binary tiers — numpy-pinned.

faiss gives every IndexBinary* and every PQ-family index a
``range_search`` (IndexBinaryFlat/IndexBinaryIVF keep Hamming
``dis < radius``; IndexPQ/IndexIVFPQ/IndexPreTransform keep the
asymmetric ADC distance under the float keep rule). These tests pin the
Spark twins against independent numpy reimplementations, plus the
cross-tier identities faiss itself guarantees: full-probe IVF variants
equal their flat tier exactly, partial probes are subsets with no false
positives.
"""

import numpy as np
import pandas as pd
import pytest

from faiss_metal_spark import (
    BinaryIndex,
    BinaryIVFIndex,
    IVFPQIndex,
    OPQIndex,
    PQIndex,
    VectorTable,
)
from faiss_metal_spark.operators.pq import pq_decode_np

from conftest import make_fixture


def _table(spark, V) -> VectorTable:
    return VectorTable(spark, V.shape[1]).add_numpy(V)


def _qdf(spark, Q):
    return spark.createDataFrame(
        pd.DataFrame({"qid": np.arange(len(Q)), "vec": [v.tolist() for v in Q]}),
        "qid long, vec array<float>",
    )


def _pairs(df):
    """{(qid, label): distance} — the unordered range-result view."""
    pdf = df.toPandas()
    return {
        (int(r.qid), int(r.label)): float(r.distance) for r in pdf.itertuples()
    }


def _hamming_np(V, Q):
    return ((Q > 0)[:, None, :] != (V > 0)[None, :, :]).sum(-1)


@pytest.mark.parametrize("d", [32, 45])  # 45: ragged tail in the last word
def test_binary_range_matches_numpy(spark, d):
    V, Q = make_fixture(200, 5, d, seed=3 + d)
    idx = BinaryIndex.from_table(_table(spark, V))
    H = _hamming_np(V, Q)
    radius = int(np.quantile(H, 0.15))  # keep a nontrivial, bounded set
    got = _pairs(idx.range_search(_qdf(spark, Q), radius))
    want = {
        (q, v): float(H[q, v])
        for q in range(len(Q))
        for v in range(len(V))
        if H[q, v] < radius
    }
    assert got == want
    idx.release()


def test_binary_ivf_range_full_probe_equals_flat(spark):
    V, Q = make_fixture(300, 6, 64, seed=9)
    vt = _table(spark, V)
    flat = BinaryIndex.from_table(vt)
    bivf = BinaryIVFIndex.from_table(vt, n_cells=6, sample_size=300)
    H = _hamming_np(V, Q)
    radius = int(np.quantile(H, 0.2))
    qdf = _qdf(spark, Q)
    want = _pairs(flat.range_search(qdf, radius))
    got = _pairs(bivf.range_search(qdf, radius, nprobe=bivf.nlist))
    assert got == want  # full probe ≡ flat, integer-exact
    # partial probe: subset, and every surviving pair keeps its distance
    part = _pairs(bivf.range_search(qdf, radius, nprobe=2))
    assert set(part) <= set(want)
    assert all(part[k] == want[k] for k in part)
    flat.release()
    bivf.release()


def _adc_dist_np(Q, codes, books):
    """(nq, n) asymmetric L2²: ‖q − decode(code)‖² in f64."""
    dec = pq_decode_np(codes, books)  # (n, d)
    diff = Q.astype(np.float64)[:, None, :] - dec[None, :, :]
    return np.einsum("qnd,qnd->qn", diff, diff)


def test_pq_range_matches_numpy_adc(spark):
    V, Q = make_fixture(300, 5, 16, seed=21)
    idx = PQIndex.from_table(_table(spark, V), m=4, sample_size=300)
    codes_pdf = idx.codes.orderBy("id").toPandas()
    codes = np.frombuffer(
        b"".join(codes_pdf["code"].tolist()), np.uint8
    ).reshape(len(codes_pdf), -1)
    D = _adc_dist_np(Q, codes, idx.codebooks)
    radius = float(np.quantile(D, 0.1))
    got = _pairs(idx.range_search(_qdf(spark, Q), radius))
    ids = codes_pdf["id"].to_numpy(np.int64)
    want = {
        (q, int(ids[v])): D[q, v]
        for q in range(len(Q))
        for v in range(len(ids))
        if D[q, v] < radius
    }
    assert set(got) == set(want)
    for key, dist in got.items():
        assert abs(dist - want[key]) < 1e-9
    idx.release()


def test_ivfpq_range_full_probe_and_subset(spark):
    V, Q = make_fixture(400, 4, 16, seed=33)
    idx = IVFPQIndex.from_table(_table(spark, V), n_cells=5, m=4, sample_size=400)
    # numpy twin of the residual-ADC distance from the index's own state
    pdf = idx.codes.orderBy("id").toPandas()
    codes = np.frombuffer(b"".join(pdf["code"].tolist()), np.uint8).reshape(
        len(pdf), -1
    )
    cells = pdf["cell"].to_numpy()
    ids = pdf["id"].to_numpy(np.int64)
    dec = pq_decode_np(codes, idx.codebooks) + idx.centroids[cells]
    diff = Q.astype(np.float64)[:, None, :] - dec[None, :, :]
    D = np.maximum(np.einsum("qnd,qnd->qn", diff, diff), 0.0)
    radius = float(np.quantile(D, 0.12))
    qdf = _qdf(spark, Q)
    full = _pairs(idx.range_search(qdf, radius, nprobe=idx.nlist))
    want = {
        (q, int(ids[v])): D[q, v]
        for q in range(len(Q))
        for v in range(len(ids))
        if D[q, v] < radius
    }
    assert set(full) == set(want)
    for key, dist in full.items():
        assert abs(dist - want[key]) < 1e-9
    part = _pairs(idx.range_search(qdf, radius, nprobe=1))
    assert set(part) <= set(full)  # subset, never a false positive
    idx.release()


def test_opq_range_matches_rotated_decode(spark):
    V, Q = make_fixture(300, 5, 16, seed=55)
    idx = OPQIndex.from_table(_table(spark, V), m=4, iters=3, sample_size=300)
    pdf = idx.codes.orderBy("id").toPandas()
    codes = np.frombuffer(b"".join(pdf["code"].tolist()), np.uint8).reshape(
        len(pdf), -1
    )
    ids = pdf["id"].to_numpy(np.int64)
    # distance in rotated space: ‖qR' − decode(code)‖² (L2 rotation-invariant)
    Qr = Q.astype(np.float64) @ np.asarray(idx.rotation, np.float64).T
    D = _adc_dist_np(Qr, codes, idx.codebooks)
    radius = float(np.quantile(D, 0.1))
    got = _pairs(idx.range_search(_qdf(spark, Q), radius))
    want = {
        (q, int(ids[v])): D[q, v]
        for q in range(len(Q))
        for v in range(len(ids))
        if D[q, v] < radius
    }
    assert set(got) == set(want)
    for key, dist in got.items():
        assert abs(dist - want[key]) < 1e-6
    idx.release()


def test_range_empty_queries(spark):
    V, _ = make_fixture(300, 1, 16, seed=70)
    idx = PQIndex.from_table(_table(spark, V), m=4, sample_size=300)
    empty = _qdf(spark, np.zeros((0, 16), np.float32))
    assert idx.range_search(empty, 1.0).count() == 0
    idx.release()
