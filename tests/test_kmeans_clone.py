"""Kmeans (faiss::Kmeans/Clustering) and clone_index (faiss
clone_index) — numpy-pinned semantics plus the independence contract.
"""

import numpy as np
import pytest

from faiss_metal_spark import Kmeans, VectorTable, clone_index

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

    with pytest.raises(TypeError):
        clone_index(object())
