"""Graph over compressed storage (r11) — faiss ``IndexHNSWSQ`` /
``IndexHNSWPQ`` (factory ``"HNSW<M>,SQ8"`` / ``"HNSW<M>,PQ<m>"``;
faiss/IndexHNSW.h).

faiss composes HNSW with SQ/PQ storage so the resident bytes shrink
while the graph walk computes distances through the storage's
DistanceComputer (decoded codes). The engine's twin: codes are the
persisted artifact, the build runs over decoded codes, and serving
decodes FETCHED candidates only (``graph_search(decode=)``). The
strongest pin available: the compressed tier's search must equal a
flat :class:`GraphIndex` built over the same table's SQ/PQ
RECONSTRUCTION, value for value — same build seed → same graph, same
beam walk, same decoded distances.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faiss_metal_spark import (
    GraphIndex,
    GraphPQIndex,
    GraphSQIndex,
    VectorTable,
    clone_index,
    index_factory,
    read_index,
    write_index,
)
from tests.conftest import make_fixture, numpy_oracle


def _vt(spark, V):
    return VectorTable(spark, V.shape[1]).add_numpy(V)


def _flat_over(spark, Vdec, M, seed, ef):
    # iters=2 everywhere in this file: the tests pin contracts (build
    # equality, IO, clone, degree caps), not graph quality — 2 descent
    # rounds exercise the identical code path at half the job count
    return GraphIndex.from_table(
        _vt(spark, Vdec.astype(np.float32)), M=M, seed=seed, ef_search=ef,
        iters=2,
    )


def _recall(L, L_true):
    hits = sum(
        len(set(l) & set(t)) for l, t in zip(L.tolist(), L_true.tolist())
    )
    return hits / L_true.size


def test_graph_sq_equals_flat_graph_over_reconstruction(spark):
    """GraphSQIndex ≡ GraphIndex over the table's SQ reconstruction at
    equal (M, seed, ef): identical graph, identical walk, identical
    decoded distances — and recall vs the exact answer matches the
    flat graph's (the VERDICT's equal-ef recall pin)."""
    from faiss_metal_spark.operators.sq import sq_decode_np, sq_encode_np, sq_train

    V, Q = make_fixture(300, 6, 16, seed=91)
    vt = _vt(spark, V)
    idx = GraphSQIndex.from_table(vt, M=8, bits=8, seed=5, ef_search=32, iters=2)
    assert idx.ntotal == 300 and idx.bits == 8

    # the reference twin: flat graph over the decoded codes
    base = idx.codes.orderBy("id").toPandas()
    codes = np.stack(base["code"].to_numpy()).astype(np.uint8)
    Vdec = sq_decode_np(codes, idx.vmin, idx.vmax, 8)
    # engine encode == numpy twin (the codes really are SQ codes)
    vmin, vmax = sq_train(vt.df.select("id", "vec"))
    np.testing.assert_array_equal(
        codes, sq_encode_np(V.astype(np.float64), vmin, vmax)
    )
    flat = _flat_over(spark, Vdec, M=8, seed=5, ef=32)

    D0, L0 = flat.search_numpy(Q, 5)
    D1, L1 = idx.search_numpy(Q, 5)
    np.testing.assert_array_equal(L0, L1)
    # the twin's VectorTable stores the reconstruction f32-rounded
    # (array<float> storage); GraphSQIndex decodes to f64 — same
    # values to f32 precision
    np.testing.assert_allclose(D0, D1, rtol=1e-6)

    # equal-ef recall parity vs the exact decoded answer
    Dt, Lt = numpy_oracle(Vdec.astype(np.float32), Q, 5)
    assert _recall(L1, Lt) == _recall(L0, Lt) and _recall(L1, Lt) >= 0.8

    # reconstruct = decoded code; range_search/add refuse
    np.testing.assert_allclose(idx.reconstruct(3), Vdec[3], atol=1e-9)
    with pytest.raises(NotImplementedError, match="range search"):
        idx.range_search(None, 1.0)
    with pytest.raises(NotImplementedError, match="read-only"):
        idx.add_numpy(V[:2])
    flat.release(), idx.release()


def test_graph_pq_equals_flat_graph_over_reconstruction(spark):
    """GraphPQIndex ≡ GraphIndex over the table's PQ reconstruction at
    equal (M, seed, ef) — m bytes/vector resident."""
    from faiss_metal_spark.operators.pq import pq_decode_np

    V, Q = make_fixture(300, 6, 16, seed=93)
    vt = _vt(spark, V)
    idx = GraphPQIndex.from_table(
        vt, M=8, m=8, seed=5, ef_search=32, sample_size=300, iters=2
    )
    assert idx.ntotal == 300 and idx.m == 8 and idx.nbits == 8

    base = idx.codes.orderBy("id").toPandas()
    codes = np.frombuffer(
        b"".join(base["code"].tolist()), dtype=np.uint8
    ).reshape(300, 8)
    Vdec = pq_decode_np(codes, idx.codebooks)
    flat = _flat_over(spark, Vdec, M=8, seed=5, ef=32)

    D0, L0 = flat.search_numpy(Q, 5)
    D1, L1 = idx.search_numpy(Q, 5)
    np.testing.assert_array_equal(L0, L1)
    # PQ codewords are f32-representable by construction, so the twin
    # matches to summation-order ulp
    np.testing.assert_allclose(D0, D1, rtol=1e-9)

    # stored bytes: m = 8 per vector
    w = idx.codes.select(F.octet_length("code").alias("w")).distinct().collect()
    assert [r["w"] for r in w] == [8]

    np.testing.assert_allclose(idx.reconstruct(3), Vdec[3], atol=1e-9)
    with pytest.raises(NotImplementedError, match="range search"):
        idx.range_search(None, 1.0)
    with pytest.raises(NotImplementedError, match="read-only"):
        idx.add_numpy(V[:2])
    flat.release(), idx.release()


def test_graph_compressed_factory_io_clone(spark):
    """Factory specs parse; write/read round-trips value-identically;
    clone is independent metadata."""
    V, Q = make_fixture(260, 3, 16, seed=97)
    vt = _vt(spark, V)

    sq = index_factory(vt, "HNSW8,SQ8", seed=5, iters=2)
    assert isinstance(sq, GraphSQIndex) and sq.M == 8
    sq6 = index_factory(vt, "HNSW8,SQ6", seed=5, iters=2)
    assert isinstance(sq6, GraphSQIndex) and sq6.bits == 6
    pq = index_factory(vt, "HNSW8,PQ8", seed=5, sample_size=260, iters=2)
    assert isinstance(pq, GraphPQIndex) and pq.m == 8
    pq4 = index_factory(vt, "HNSW8,PQ8x4", seed=5, sample_size=260, iters=2)
    assert isinstance(pq4, GraphPQIndex) and pq4.nbits == 4

    Ds, Ls = sq.search_numpy(Q, 4)
    Dp, Lp = pq.search_numpy(Q, 4)

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        write_index(sq, f"{td}/sq")
        write_index(pq, f"{td}/pq")
        sq2 = read_index(spark, f"{td}/sq")
        pq2 = read_index(spark, f"{td}/pq")
        assert isinstance(sq2, GraphSQIndex) and sq2.bits == 8
        assert isinstance(pq2, GraphPQIndex)
        D2, L2 = sq2.search_numpy(Q, 4)
        np.testing.assert_array_equal(Ls, L2)
        np.testing.assert_allclose(Ds, D2, rtol=1e-12)
        D3, L3 = pq2.search_numpy(Q, 4)
        np.testing.assert_array_equal(Lp, L3)
        np.testing.assert_allclose(Dp, D3, rtol=1e-12)

    cl = clone_index(sq)
    assert cl is not sq and cl.ntotal == sq.ntotal
    np.testing.assert_array_equal(cl.search_numpy(Q, 4)[1], Ls)
    for i in (sq, sq6, pq, pq4):
        i.release()


def test_graph_reconstruct_batch_and_nndescent_facade(spark):
    """r11: reconstruct_batch/reconstruct_n on the graph tier (exact —
    flat storage, id-order preserved, absent ids KeyError) and the
    faiss IndexNNDescentFlat facade ("NNDescent<K>" = the plain
    non-diversified GraphIndex build, value-identical)."""
    V, Q = make_fixture(150, 2, 8, seed=101)
    vt = _vt(spark, V)
    g = index_factory(vt, "NNDescent6", seed=7, iters=2)
    assert isinstance(g, GraphIndex) and g.M == 6

    plain = GraphIndex.from_table(vt, M=6, seed=7, iters=2)
    D0, L0 = plain.search_numpy(Q, 3)
    D1, L1 = g.search_numpy(Q, 3)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_allclose(D0, D1, atol=0)

    got = g.reconstruct_batch([5, 2, 9, 2])
    np.testing.assert_allclose(
        got, V[[5, 2, 9, 2]].astype(np.float32), atol=0
    )
    assert got.dtype == np.float32
    np.testing.assert_allclose(
        g.reconstruct_n(10, 4), V[10:14].astype(np.float32), atol=0
    )
    assert g.reconstruct_batch([]).shape == (0, 8)
    # n <= 0 returns empty (0, d) like VectorTable.reconstruct_n — no
    # opaque np.stack error on a negative n
    assert g.reconstruct_n(10, 0).shape == (0, 8)
    assert g.reconstruct_n(10, -3).shape == (0, 8)
    with pytest.raises(KeyError):
        g.reconstruct_batch([0, 10_000])
    plain.release(), g.release()


def test_nsg_over_compressed_factory(spark):
    """r11: "NSG<M>,SQ8" / "NSG<M>,PQ<m>" (faiss IndexNSGSQ/IndexNSGPQ)
    — the graph-over-codes tiers with the NSG build discipline: the
    MRNG diversification caps serving degree at M, exactly as the flat
    "NSG<M>" spec pins it."""
    V, Q = make_fixture(260, 3, 16, seed=101)
    vt = _vt(spark, V)
    nsq = index_factory(vt, "NSG6,SQ8", seed=5, iters=2)
    assert isinstance(nsq, GraphSQIndex) and nsq.M == 6
    npq = index_factory(vt, "NSG6,PQ8", seed=5, sample_size=260, iters=2)
    assert isinstance(npq, GraphPQIndex) and npq.m == 8
    for idx in (nsq, npq):
        deg = idx.graph.groupBy("id").count().agg(F.max("count")).collect()[0][0]
        assert deg <= 6  # MRNG-diversified build, not the 2M candidates
        D, L = idx.search_numpy(Q, 3)
        assert L.shape == (3, 3) and (L >= 0).all()
        idx.release()
