"""Kmeans (faiss::Kmeans/Clustering) and clone_index (faiss
clone_index) — numpy-pinned semantics plus the independence contract.
"""

import numpy as np
import pytest

from faiss_metal_spark import Kmeans, VectorTable, clone_index
from pyspark.sql import functions as F

from conftest import make_fixture


def _np_assign(X, C):
    cn = (C * C).sum(1)
    return (cn[None, :] - 2.0 * (X.astype(np.float64) @ C.T)).argmin(1)


def test_kmeans_train_obj_and_assign(spark):
    """obj is the monotone-nonincreasing Lloyd trace on the training
    sample; distributed assign() and assign_numpy() agree with the
    exact numpy nearest-centroid rule; index property serves the faiss
    search-for-assignment idiom."""
    V, _ = make_fixture(600, 1, 16, seed=41)
    km = Kmeans(spark, 16, 8, niter=6, sample_size=600)
    final = km.train(V)
    assert km.centroids.shape == (8, 16)
    assert len(km.obj) == 6 and final == km.obj[-1]
    assert all(b <= a + 1e-9 for a, b in zip(km.obj, km.obj[1:]))

    want = _np_assign(V, km.centroids)
    np.testing.assert_array_equal(km.assign_numpy(V), want)

    vt = VectorTable(spark, 16).add_numpy(V)
    got = (
        km.assign(vt.df)
        .select("id", "cell")
        .orderBy("id")
        .toPandas()["cell"]
        .to_numpy()
    )
    np.testing.assert_array_equal(got, want)

    # the faiss idiom: index over centroids, search x with k=1.
    # f32 storage + f32 compute ⇒ only pin where the margin is clear;
    # assign_numpy above is the exact-arithmetic pin.
    D, L = km.index.search_numpy(V[:50], 1)
    agree = (L[:, 0] == want[:50]).mean()
    assert agree >= 0.9

    # retrain replaces state
    km2_obj = list(km.obj)
    km.train(V)
    assert km.obj == km2_obj  # deterministic retrain reproduces


def test_kmeans_spherical_unit_centroids(spark):
    V, _ = make_fixture(400, 1, 12, seed=43)
    km = Kmeans(spark, 12, 5, niter=4, spherical=True, sample_size=400)
    km.train(V)
    np.testing.assert_allclose(np.linalg.norm(km.centroids, axis=1), 1.0, atol=1e-12)


def test_kmeans_guards(spark):
    with pytest.raises(ValueError):
        Kmeans(spark, 8, 0)
    km = Kmeans(spark, 8, 2)
    with pytest.raises(RuntimeError):
        km.assign_numpy(np.zeros((1, 8)))
    with pytest.raises(ValueError):
        km.train(np.zeros((10, 5)))  # wrong d


def test_clone_index_vector_table_independent(spark):
    """Mutating the original after cloning never changes the clone
    (faiss deep-copy contract), and vice versa."""
    V, Q = make_fixture(100, 3, 8, seed=45)
    vt = VectorTable(spark, 8).add_numpy(V)
    cl = clone_index(vt)
    D0, L0 = cl.search_numpy(Q, 5)

    vt.add_numpy(V[:10])  # original grows
    assert vt.ntotal == 110 and cl.ntotal == 100
    D1, L1 = cl.search_numpy(Q, 5)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_array_equal(D0, D1)

    cl.remove_ids(np.arange(50))  # clone shrinks; original untouched
    assert cl.ntotal == 50 and vt.ntotal == 110


def test_clone_index_derived_tiers_and_sharded(spark):
    from faiss_metal_spark import IVFIndex, SQ8Index, ShardedIndex

    V, Q = make_fixture(300, 3, 12, seed=47)
    vt = VectorTable(spark, 12).add_numpy(V)

    sq = SQ8Index.from_table(vt)
    csq = clone_index(sq)
    assert csq is not sq and csq.vmin is not sq.vmin
    np.testing.assert_array_equal(*(i.search_numpy(Q, 5)[1] for i in (sq, csq)))

    ivf = IVFIndex.from_table(vt, n_cells=4, sample_size=300)
    civf = clone_index(ivf)
    np.testing.assert_array_equal(
        ivf.search_numpy(Q, 5, nprobe=2)[1], civf.search_numpy(Q, 5, nprobe=2)[1]
    )

    sh = ShardedIndex.from_indexes(
        VectorTable(spark, 12).add_numpy(V[:100]),
        VectorTable(spark, 12).add_numpy(V[100:]),
        successive_ids=True,
    )
    csh = clone_index(sh)
    assert type(csh) is ShardedIndex and len(csh.shards) == 2
    np.testing.assert_array_equal(sh.search_numpy(Q, 5)[1], csh.search_numpy(Q, 5)[1])

    from faiss_metal_spark import IVFPQRIndex, LSHIndex

    lsh = LSHIndex.from_table(vt, nbits=24, seed=5)
    clsh = clone_index(lsh)
    assert clsh.rotation is not lsh.rotation
    np.testing.assert_array_equal(
        lsh.search_numpy(Q, 5)[1], clsh.search_numpy(Q, 5)[1]
    )

    pqr = IVFPQRIndex.from_table(vt, n_cells=3, m=4, sample_size=300)
    cpqr = clone_index(pqr)
    assert cpqr.refine_books is not pqr.refine_books
    np.testing.assert_array_equal(
        pqr.search_numpy(Q, 5, nprobe=3)[1], cpqr.search_numpy(Q, 5, nprobe=3)[1]
    )

    with pytest.raises(TypeError):
        clone_index(object())


def test_reconstruct_all_compressed_tiers(spark):
    """Every derived tier reconstructs (faiss: reconstruct is part of
    the Index contract): IVF,Flat is exact; SQ/IVFSQ within the per-dim
    step/2 bound; PQ/IVFPQ/OPQ reproduce their own decode arithmetic
    exactly (pinned against the numpy decode of the stored code)."""
    from faiss_metal_spark import (
        IVFIndex,
        IVFPQIndex,
        IVFSQIndex,
        OPQIndex,
        PQIndex,
    )
    from faiss_metal_spark.operators.pq import pq_decode_np

    V, _ = make_fixture(300, 1, 16, seed=51)
    vt = VectorTable(spark, 16).add_numpy(V)
    x0 = V[7].astype(np.float64)

    ivf = IVFIndex.from_table(vt, n_cells=4, sample_size=300)
    np.testing.assert_allclose(ivf.reconstruct(7), x0, atol=1e-6)  # f32 storage

    ivfsq = IVFSQIndex.from_table(vt, n_cells=4, sample_size=300)
    step = (ivfsq.vmax - ivfsq.vmin) / 255.0
    assert (np.abs(ivfsq.reconstruct(7) - x0) <= step / 2 + 1e-9).all()

    pq = PQIndex.from_table(vt, m=4, iters=2, sample_size=300)
    code = np.frombuffer(
        pq.codes.where(F.col("id") == 7).collect()[0]["code"], np.uint8
    )[None, :]
    np.testing.assert_allclose(
        pq.reconstruct(7), pq_decode_np(code, pq.codebooks)[0], atol=0
    )

    ivfpq = IVFPQIndex.from_table(vt, n_cells=4, m=4, sample_size=300, iters=2)
    row = ivfpq.codes.where(F.col("id") == 7).collect()[0]
    want = ivfpq.centroids[row["cell"]] + pq_decode_np(
        np.frombuffer(row["code"], np.uint8)[None, :], ivfpq.codebooks
    )[0]
    np.testing.assert_allclose(ivfpq.reconstruct(7), want, atol=0)

    opq = OPQIndex.from_table(vt, m=4, iters=2, sample_size=300)
    # reverse transform sanity: reconstruction error in input space is
    # bounded and far below the vector norm (R is orthonormal)
    rel = np.linalg.norm(opq.reconstruct(7) - x0) / np.linalg.norm(x0)
    assert rel < 0.9

    for idx in (ivf, ivfsq, pq, ivfpq, opq):
        with pytest.raises(KeyError):
            idx.reconstruct(10_000)


def test_sq_range_search_matches_numpy(spark):
    from faiss_metal_spark import SQ8Index
    from faiss_metal_spark.operators.sq import sq_decode_np, sq_encode_np

    V, Q = make_fixture(250, 4, 12, seed=53)
    vt = VectorTable(spark, 12).add_numpy(V)
    idx = SQ8Index.from_table(vt)
    R = sq_decode_np(sq_encode_np(V, idx.vmin, idx.vmax, 8), idx.vmin, idx.vmax, 8)
    D = ((Q.astype(np.float64)[:, None, :] - R[None, :, :]) ** 2).sum(-1)
    radius = float(np.quantile(D, 0.15))
    want = {(qi, vi) for qi, vi in zip(*np.nonzero(D < radius))}

    import pandas as pd

    qdf = spark.createDataFrame(
        pd.DataFrame({"qid": np.arange(len(Q)), "vec": [v.tolist() for v in Q]}),
        "qid long, vec array<float>",
    )
    rows = idx.range_search(qdf, radius).collect()
    got = {(int(r["qid"]), int(r["label"])) for r in rows}
    assert got == want
    for r in rows:
        assert abs(r["distance"] - D[int(r["qid"]), int(r["label"])]) <= 1e-9
    idx.release()


def test_ivf_family_remove_ids(spark):
    """faiss IndexIVF::remove_ids across the IVF family: entries drop
    from the inverted lists WITHOUT renumbering (stored labels are
    explicit), ntotal shrinks by the count removed, absent ids are
    ignored, and post-removal full-probe search never returns a
    removed label."""
    from faiss_metal_spark import (
        BinaryIVFIndex,
        IVFIndex,
        IVFPQIndex,
        IVFSQIndex,
    )

    V, Q = make_fixture(300, 3, 16, seed=55)
    vt = VectorTable(spark, 16).add_numpy(V)
    kw = {"sample_size": 300}
    tiers = [
        IVFIndex.from_table(vt, n_cells=4, **kw),
        IVFSQIndex.from_table(vt, n_cells=4, **kw),
        IVFPQIndex.from_table(vt, n_cells=4, m=4, iters=2, **kw),
        BinaryIVFIndex.from_table(vt, n_cells=4, **kw),
    ]
    drop = np.array([0, 5, 10, 299, 4242])  # 4242 absent → ignored
    for idx in tiers:
        removed = idx.remove_ids(drop)
        assert removed == 4, type(idx).__name__
        assert idx.ntotal == 296
        _, L = idx.search_numpy(Q, 10, nprobe=idx.nlist)
        assert not (set(L.ravel().tolist()) & {0, 5, 10, 299})
        # remaining labels keep their original ids (no renumbering)
        assert 298 in set(L.ravel().tolist()) or idx.ntotal == 296
        idx.release()


def test_sharded_add_shard(spark):
    from faiss_metal_spark import ShardedIndex

    V, Q = make_fixture(300, 3, 8, seed=57)
    a = VectorTable(spark, 8).add_numpy(V[:100])
    b = VectorTable(spark, 8).add_numpy(V[100:200])
    c = VectorTable(spark, 8).add_numpy(V[200:])

    grown = ShardedIndex.from_indexes(a, b, successive_ids=True).add_shard(c)
    full = ShardedIndex.from_indexes(a, b, c, successive_ids=True)
    assert grown.ntotal == 300
    np.testing.assert_array_equal(
        grown.search_numpy(Q, 7)[1], full.search_numpy(Q, 7)[1]
    )

    with pytest.raises(ValueError):
        grown.add_shard(VectorTable(spark, 9))


def test_ivf_family_search_params_sel(spark):
    """faiss SearchParametersIVF::sel (r10): IVF-family searches accept
    an IDSelector restricting the stored-id subset — excluded ids never
    surface, a full probe over the subset equals the exact subset
    answer, combinators compose, and range_search(sel=) equals the
    unrestricted result filtered to the selector."""
    from faiss_metal_spark import (
        IDSelectorNot,
        IDSelectorRange,
        IVFIndex,
        IVFPQIndex,
        IVFSQIndex,
    )

    V, Q = make_fixture(300, 4, 16, seed=57)
    vt = VectorTable(spark, 16).add_numpy(V)
    lo, hi = 50, 200
    sel = IDSelectorRange(lo, hi)

    idx = IVFIndex.from_table(vt, n_cells=4, sample_size=300)
    D, L = idx.search_numpy(Q, 5, nprobe=4, sel=sel)  # full probe = exact
    Vd = V.astype(np.float64)
    Dx = ((Q[:, None, :].astype(np.float64) - Vd[None, :, :]) ** 2).sum(-1)
    for qi in range(len(Q)):
        subset = [(Dx[qi, i], i) for i in range(lo, hi)]
        want = [i for _, i in sorted(subset)[:5]]
        assert [int(x) for x in L[qi]] == want
    # Not-combinator: the complement — no returned label inside [lo, hi)
    _, Ln = idx.search_numpy(Q, 5, nprobe=4, sel=IDSelectorNot(sel))
    assert not ((Ln >= lo) & (Ln < hi)).any()
    # range_search(sel=) == unrestricted rows filtered to the selector
    radius = float(np.quantile(Dx, 0.02))
    full = {(int(r["qid"]), int(r["label"]))
            for r in idx.range_search(_qdf(spark, Q), radius, nprobe=4).collect()}
    got = {(int(r["qid"]), int(r["label"]))
           for r in idx.range_search(_qdf(spark, Q), radius, nprobe=4, sel=sel).collect()}
    assert got == {(q, l) for q, l in full if lo <= l < hi}
    idx.release()

    # coded tiers: labels obey the selector; an all-inclusive selector
    # reproduces the unrestricted search exactly
    for cls, kw in ((IVFSQIndex, {}), (IVFPQIndex, {"m": 4, "nbits": 4})):
        cidx = cls.from_table(vt, n_cells=4, sample_size=300, **kw)
        _, Ls = cidx.search_numpy(Q, 5, nprobe=4, sel=sel)
        real = Ls[Ls >= 0]
        assert ((real >= lo) & (real < hi)).all(), (cls.__name__, Ls)
        D0, L0 = cidx.search_numpy(Q, 5, nprobe=4)
        D1, L1 = cidx.search_numpy(Q, 5, nprobe=4, sel=IDSelectorRange(0, 300))
        np.testing.assert_array_equal(L0, L1)
        np.testing.assert_allclose(D0, D1, atol=1e-12)
        cidx.release()


def _qdf(spark, Q):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame({"qid": np.arange(len(Q), dtype=np.int64),
                      "vec": [v.tolist() for v in Q]}),
        "qid long, vec array<float>",
    )


def test_ivf_max_codes_bounds_scanned_lists(spark):
    """faiss SearchParametersIVF::max_codes (r10): probe cells are kept
    in ranking order only while the running scan count stays under the
    bound — the crossing list still scans in full, at least one list
    always does (whole-list granularity, faiss's own pre-list check).
    Pinned exactly: a bound >= ntotal reproduces the unrestricted
    search; max_codes=1 reproduces nprobe=1 (only the first list ever
    scans); and positive-bound validation."""
    from faiss_metal_spark import IVFIndex

    V, Q = make_fixture(300, 4, 16, seed=59)
    vt = VectorTable(spark, 16).add_numpy(V)
    idx = IVFIndex.from_table(vt, n_cells=6, sample_size=300)

    D0, L0 = idx.search_numpy(Q, 5, nprobe=4)
    D1, L1 = idx.search_numpy(Q, 5, nprobe=4, max_codes=10_000)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_allclose(D0, D1, atol=1e-12)

    Dp, Lp = idx.search_numpy(Q, 5, nprobe=1)
    Dm, Lm = idx.search_numpy(Q, 5, nprobe=4, max_codes=1)
    np.testing.assert_array_equal(Lp, Lm)
    np.testing.assert_allclose(Dp, Dm, atol=1e-12)

    with pytest.raises(ValueError, match="max_codes"):
        idx.search_numpy(Q, 5, nprobe=4, max_codes=0)
    idx.release()


def test_ivf_family_remove_ids_accepts_selectors(spark):
    """faiss IndexIVF::remove_ids takes an IDSelector& (r10 review:
    the refusal message used to point at a path that crashed):
    IDSelectorRange and combinators remove via one negated predicate
    on every coded tier; the 2-tuple refusal stands; the binary
    refine source shrinks in step."""
    from faiss_metal_spark import (
        BinaryIndex,
        IDSelectorNot,
        IDSelectorRange,
        IVFIndex,
        SQ8Index,
    )

    V, _ = make_fixture(200, 1, 16, seed=61)
    vt = VectorTable(spark, 16).add_numpy(V)

    idx = IVFIndex.from_table(vt, n_cells=4, sample_size=200)
    assert idx.remove_ids(IDSelectorRange(50, 100)) == 50
    assert idx.ntotal == 150
    left = {r["id"] for r in idx.assigned.select("id").collect()}
    assert not (left & set(range(50, 100)))
    # combinator: drop everything OUTSIDE [0, 20)
    assert idx.remove_ids(IDSelectorNot(IDSelectorRange(0, 20))) == 130
    assert idx.ntotal == 20
    with pytest.raises(TypeError, match="2-tuple is ambiguous"):
        idx.remove_ids((3, 7))
    idx.release()

    sq = SQ8Index.from_table(vt)
    assert sq.remove_ids(IDSelectorRange(0, 10)) == 10
    assert sq.ntotal == 190
    sq.release()

    # binary tier: the refine _source must shrink through the same
    # selector path
    b = BinaryIndex.from_table(vt)
    assert b.remove_ids(IDSelectorRange(0, 5)) == 5
    D, L = b.refine_search_numpy(V[:1], 3)
    assert 0 not in set(int(x) for x in L[0])
    b.release()


def test_ivf_sel_large_batch_semi_join_path(spark):
    """A literal sel batch above the IN-list threshold must route
    through the broadcast semi-join (r10 review: it used to raise) —
    pinned by equality with the equivalent range selector."""
    from faiss_metal_spark import IDSelectorRange, IVFIndex

    V, Q = make_fixture(300, 2, 8, seed=63)
    vt = VectorTable(spark, 8).add_numpy(V)
    idx = IVFIndex.from_table(vt, n_cells=4, sample_size=300)
    big = list(range(100, 250)) + list(range(100_000, 110_000))  # >10k ids
    D0, L0 = idx.search_numpy(Q, 5, nprobe=4, sel=big)
    D1, L1 = idx.search_numpy(Q, 5, nprobe=4, sel=IDSelectorRange(100, 250))
    np.testing.assert_array_equal(L0, L1)  # absent ids match nothing
    np.testing.assert_allclose(D0, D1, atol=1e-12)
    idx.release()
