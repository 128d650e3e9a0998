"""Product additive quantizers (r11) — faiss
``IndexProductResidualQuantizer`` / ``IndexProductLocalSearchQuantizer``
(factory ``PRQ<ns>x<m>x8`` / ``PLSQ<ns>x<m>x8``; faiss/IndexAdditiveQuantizer.h,
faiss/impl/ProductAdditiveQuantizer.h) plus the ``LSQ<m>x8`` spec mapping
onto the existing ICM encode move.

Key invariants pinned here:

- distances returned by search are EXACTLY ``‖q − reconstruction‖²``
  (the disjoint-block additive identity) vs a decode-then-score numpy
  oracle;
- ``PRQ1x<m>x8`` with the same sample degenerates to ``RQ<m>x8``
  bit-identically (one block spanning all dims IS an RQ);
- sa_encode / sa_decode / add_sa_codes round-trip; write/read/clone.
"""

import numpy as np
import pytest

from faiss_metal_spark import (
    PRQIndex,
    RQIndex,
    VectorTable,
    clone_index,
    index_factory,
    read_index,
    write_index,
)
from tests.conftest import make_fixture


def _vt(spark, V):
    return VectorTable(spark, V.shape[1]).add_numpy(V)


def _decode_score_oracle(X, codes_df, codebooks, Q, k):
    """Decode every stored code, score exactly in fp64, take top-k."""
    from faiss_metal_spark.operators.rq import prq_decode_np

    pdf = codes_df.orderBy("id").toPandas()
    ids = pdf["id"].to_numpy(np.int64)
    C = np.stack([np.frombuffer(c, np.uint8) for c in pdf["code"]])
    R = prq_decode_np(C, codebooks)
    D = ((Q.astype(np.float64)[:, None, :] - R[None, :, :]) ** 2).sum(-1)
    order = np.lexsort((np.broadcast_to(ids, D.shape), D), axis=1)[:, :k]
    return np.take_along_axis(D, order, axis=1), ids[order]


def test_prq_search_equals_decode_oracle(spark):
    V, Q = make_fixture(400, 6, 32, seed=3)
    idx = PRQIndex.from_table(_vt(spark, V), nsplits=2, m=3, iters=4)
    k = 5
    D, L = idx.search_numpy(Q, k)
    oD, oL = _decode_score_oracle(V, idx.codes, idx.codebooks, Q, k)
    np.testing.assert_array_equal(L, oL)
    np.testing.assert_allclose(D, oD, rtol=1e-10, atol=1e-9)
    idx.release()


def test_prq1_degenerates_to_rq(spark):
    """One block spanning all dims IS an RQ — codes and search results
    must match bit-identically (same sample, same trainer path)."""
    V, Q = make_fixture(300, 4, 16, seed=5)
    vt = _vt(spark, V)
    prq = PRQIndex.from_table(vt, nsplits=1, m=3, iters=4)
    rq = RQIndex.from_table(vt, m=3, iters=4)
    np.testing.assert_allclose(prq.codebooks[0], rq.codebooks)
    p = prq.codes.orderBy("id").toPandas()
    r = rq.codes.orderBy("id").toPandas()
    assert list(p["code"]) == list(r["code"])
    Dp, Lp = prq.search_numpy(Q, 4)
    Dr, Lr = rq.search_numpy(Q, 4)
    np.testing.assert_array_equal(Lp, Lr)
    np.testing.assert_allclose(Dp, Dr, rtol=1e-12)
    prq.release()
    rq.release()


def test_prq_beats_single_rq_same_bytes_on_blocky_data(spark):
    """On data whose blocks are independent, PRQ's per-block books fit
    better than PQ-style comparisons would suggest; at minimum the
    encode must be exact on block-separable centroids (reconstruction
    error ~0 when each block has ≤256 distinct values)."""
    rng = np.random.default_rng(9)
    blocks = [rng.normal(size=(16, 8)) for _ in range(2)]
    pick = rng.integers(0, 16, size=(500, 2))
    V = np.concatenate([blocks[s][pick[:, s]] for s in range(2)], axis=1).astype(
        np.float32
    )
    idx = PRQIndex.from_table(_vt(spark, V), nsplits=2, m=2, iters=15)
    from faiss_metal_spark.operators.rq import prq_decode_np

    pdf = idx.codes.orderBy("id").toPandas()
    C = np.stack([np.frombuffer(c, np.uint8) for c in pdf["code"]])
    R = prq_decode_np(C, idx.codebooks)
    err = ((V.astype(np.float64) - R) ** 2).sum(1).mean()
    base = (V.astype(np.float64) ** 2).sum(1).mean()
    assert err < 0.05 * base
    idx.release()


def test_factory_specs_and_validation(spark):
    V, Q = make_fixture(300, 3, 24, seed=7)
    vt = _vt(spark, V)
    prq = index_factory(vt, "PRQ2x3x8", iters=3)
    assert isinstance(prq, PRQIndex) and prq.nsplits == 2
    assert prq.sa_code_size == 6
    plsq = index_factory(vt, "PLSQ2x2x8", iters=3)
    assert isinstance(plsq, PRQIndex) and plsq.icm_sweeps == 2
    lsq = index_factory(vt, "LSQ3x8", iters=3)
    assert isinstance(lsq, RQIndex) and lsq.icm_sweeps == 2
    with pytest.raises(ValueError, match="not divisible"):
        index_factory(vt, "PRQ5x2x8", iters=3)
    # ICM encode must not WORSEN reconstruction error vs greedy
    from faiss_metal_spark.operators.rq import prq_assign_np, prq_decode_np

    X = V.astype(np.float64)
    for sweeps in (0, 2):
        codes = prq_assign_np(X, prq.codebooks, icm_sweeps=sweeps)
        err = ((X - prq_decode_np(codes, prq.codebooks)) ** 2).sum()
        if sweeps == 0:
            greedy_err = err
    assert err <= greedy_err + 1e-9
    for i in (prq, plsq, lsq):
        i.release()


def test_sa_codec_and_add_sa_codes(spark):
    V, _ = make_fixture(350, 1, 16, seed=11)
    idx = PRQIndex.from_table(_vt(spark, V[:300]), nsplits=2, m=2, iters=4)
    codes = idx.sa_encode(V[300:])
    assert all(len(c) == idx.sa_code_size for c in codes)
    rec = idx.sa_decode(codes)
    # round-trip: re-encoding the reconstruction is a fixed point
    codes2 = idx.sa_encode(rec)
    assert [bytes(a) for a in codes] == [bytes(b) for b in codes2]
    n0 = idx.ntotal
    idx.add_sa_codes(codes)
    assert idx.ntotal == n0 + 50
    got = idx.reconstruct(n0)  # first appended id
    # sa_decode narrows to float32 by contract; reconstruct stays f64
    np.testing.assert_allclose(got, rec[0], rtol=1e-6)
    with pytest.raises(ValueError, match="sa_code_size"):
        idx.add_sa_codes([b"\x00" * (idx.sa_code_size + 1)])
    idx.release()


def test_io_roundtrip_and_clone(spark, tmp_path):
    V, Q = make_fixture(300, 4, 16, seed=13)
    idx = PRQIndex.from_table(_vt(spark, V), nsplits=2, m=2, iters=4, icm_sweeps=1)
    D0, L0 = idx.search_numpy(Q, 3)
    path = str(tmp_path / "prq_idx")
    write_index(idx, path)
    back = read_index(spark, path)
    assert isinstance(back, PRQIndex)
    assert back.icm_sweeps == 1 and back.ntotal == idx.ntotal
    D1, L1 = back.search_numpy(Q, 3)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_allclose(D0, D1, rtol=1e-12)
    cl = clone_index(idx)
    D2, L2 = cl.search_numpy(Q, 3)
    np.testing.assert_array_equal(L0, L2)
    # mutating the clone must not touch the original
    cl.add_numpy(V[:10])
    assert cl.ntotal == idx.ntotal + 10
    idx.release()


def test_merge_and_remove(spark):
    V, Q = make_fixture(300, 2, 16, seed=17)
    vt = _vt(spark, V)
    a = PRQIndex.from_table(vt, nsplits=2, m=2, iters=4)
    with pytest.raises(ValueError, match="same index type"):
        a.merge_from(RQIndex.from_table(vt, m=2, iters=4))
    removed = a.remove_ids(np.array([0, 1, 2]))
    assert removed == 3 and a.ntotal == 297
    a.release()


def test_prq_codec_properties():
    """Property check (hypothesis): for random data and random split
    shapes, (a) per-block encode == concatenated per-slice RQ encodes,
    (b) ICM refinement never worsens total reconstruction error,
    (c) disjoint blocks make the total reconstruction error decompose
    exactly into the per-block errors (the identity PRQ search rests
    on). NOT asserted: encode(decode(x)) == x — multi-stage greedy
    chains are not a fixed point in general (equal-error chains can
    differ on the reconstruction)."""
    from hypothesis import given, settings, strategies as st

    from faiss_metal_spark.operators.rq import (
        prq_assign_np,
        prq_decode_np,
        rq_assign_np,
        rq_decode_np,
        rq_train_np,
    )

    @settings(max_examples=20, deadline=None)
    @given(
        seed=st.integers(0, 10_000),
        ns=st.sampled_from([1, 2, 4]),
        m=st.integers(1, 3),
        dsub=st.sampled_from([2, 4]),
    )
    def prop(seed, ns, m, dsub):
        rng = np.random.default_rng(seed)
        d = ns * dsub
        X = rng.normal(size=(300, d))
        books = np.stack(
            [
                rq_train_np(X[:, s * dsub : (s + 1) * dsub], m, iters=3)
                for s in range(ns)
            ]
        )
        codes = prq_assign_np(X, books)
        # (a) block independence: each block's chain is its own RQ encode
        for s in range(ns):
            np.testing.assert_array_equal(
                codes[:, s * m : (s + 1) * m],
                rq_assign_np(X[:, s * dsub : (s + 1) * dsub], books[s]),
            )
        # (b) ICM monotonicity on the TOTAL error
        rec = prq_decode_np(codes, books)
        err0 = ((X - rec) ** 2).sum()
        codes_icm = prq_assign_np(X, books, icm_sweeps=2)
        err1 = ((X - prq_decode_np(codes_icm, books)) ** 2).sum()
        assert err1 <= err0 + 1e-9
        # (c) disjoint-block error decomposition: total == Σ per-block
        per_block = sum(
            (
                (
                    X[:, s * dsub : (s + 1) * dsub]
                    - rq_decode_np(codes[:, s * m : (s + 1) * m], books[s])
                )
                ** 2
            ).sum()
            for s in range(ns)
        )
        np.testing.assert_allclose(err0, per_block, rtol=1e-12)

    prop()


def test_rq_prq_range_search(spark):
    """faiss IndexFlatCodes range_search on the additive tiers: every
    (qid, label) with exact asymmetric distance STRICTLY under radius,
    nothing else, unordered — vs the decode-then-score numpy oracle."""
    from faiss_metal_spark.operators.rq import prq_decode_np

    V, Q = make_fixture(300, 4, 16, seed=29)
    vt = _vt(spark, V)
    for idx in (
        PRQIndex.from_table(vt, nsplits=2, m=2, iters=4),
        RQIndex.from_table(vt, m=2, iters=4),
    ):
        books = idx.codebooks if isinstance(idx, PRQIndex) else idx.codebooks[None][0]
        pdf = idx.codes.orderBy("id").toPandas()
        ids = pdf["id"].to_numpy(np.int64)
        C = np.stack([np.frombuffer(c, np.uint8) for c in pdf["code"]])
        if isinstance(idx, PRQIndex):
            R = prq_decode_np(C, idx.codebooks)
        else:
            from faiss_metal_spark.operators.rq import rq_decode_np

            R = rq_decode_np(C, idx.codebooks)
        D = ((Q.astype(np.float64)[:, None, :] - R[None, :, :]) ** 2).sum(-1)
        radius = float(np.quantile(D, 0.05))
        import pandas as pd

        qdf = spark.createDataFrame(
            pd.DataFrame({"qid": np.arange(len(Q)), "vec": list(Q)})
        )
        got = {
            (r["qid"], r["label"]): r["distance"]
            for r in idx.range_search(qdf, radius).collect()
        }
        want = {
            (int(q), int(ids[v])): D[q, v]
            for q, v in zip(*np.nonzero(D < radius))
        }
        assert set(got) == set(want)
        for kk, dv in got.items():
            assert abs(dv - want[kk]) <= 1e-9 * max(1.0, want[kk])
        # strictness: a radius exactly AT a stored distance excludes it
        dmin = D.min()
        at = idx.range_search(qdf, float(dmin)).collect()
        assert all(r["distance"] < dmin for r in at)
        idx.release()
