"""PCA / normalization transforms — faiss PCAMatrix + NormalizationTransform
parity pins (the VectorTransform family; see operators/pca.py docstring).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from conftest import make_fixture, vectors_df
from faiss_metal_spark.operators.pca import (
    normalize_vectors,
    pca_apply,
    pca_apply_np,
    pca_reverse_np,
    pca_train,
)


def _correlated(n, d, seed=5):
    """Low-rank-plus-noise data where PCA genuinely concentrates energy."""
    rng = np.random.default_rng(seed)
    basis = rng.normal(size=(4, d))
    X = rng.normal(size=(n, 4)) @ basis + 0.05 * rng.normal(size=(n, d))
    return X.astype(np.float32)


def test_pca_matches_numpy_and_is_orthonormal(spark):
    X = _correlated(400, 16)
    vdf = vectors_df(spark, X)
    mu, W, eigvals = pca_train(vdf, d_out=4, sample_size=400)
    # orthonormal rows
    np.testing.assert_allclose(W @ W.T, np.eye(4), atol=1e-9)
    # eigvals descending, non-negative
    assert (np.diff(eigvals) <= 1e-9).all() and (eigvals >= 0).all()
    # projection matches a from-scratch numpy PCA up to the shared sign
    # convention (components are identical because the trainer saw the
    # full 400-row table as its sample)
    Xc = X.astype(np.float64) - X.astype(np.float64).mean(0)
    _, _, Vt = np.linalg.svd(Xc, full_matrices=False)
    Vt = Vt[:4]
    flips = np.sign(Vt[np.arange(4), np.abs(Vt).argmax(1)])
    np.testing.assert_allclose(W, Vt * flips[:, None], atol=1e-6)


def test_pca_distributed_apply_equals_host(spark):
    X = _correlated(300, 12)
    vdf = vectors_df(spark, X)
    mu, W, _ = pca_train(vdf, d_out=5, sample_size=300)
    got = pca_apply(vdf, mu, W).orderBy("id").toPandas()
    Y = np.stack(got["vec"].to_numpy())
    want = pca_apply_np(X, mu, W).astype(np.float32)
    np.testing.assert_allclose(Y, want, atol=1e-5)
    assert Y.shape == (300, 5)
    # pure projection: no shuffle in the plan
    plan = pca_apply(vdf, mu, W)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pca_reconstruction_error_bounded_by_dropped_energy(spark):
    """MSE of reverse(apply(x)) ≤ mean dropped-eigenvalue energy (the
    PCA optimality property), and d_out = d reconstructs exactly."""
    X = _correlated(500, 16)
    vdf = vectors_df(spark, X)
    mu, W, eigvals = pca_train(vdf, d_out=6, sample_size=500)
    rec = pca_reverse_np(pca_apply_np(X, mu, W), mu, W)
    mse = ((rec - X.astype(np.float64)) ** 2).sum(1).mean()
    dropped = eigvals[6:].sum()
    assert mse <= dropped * 1.05 + 1e-9
    mu2, W2, _ = pca_train(vdf, d_out=16, sample_size=500)
    rec2 = pca_reverse_np(pca_apply_np(X, mu2, W2), mu2, W2)
    np.testing.assert_allclose(rec2, X.astype(np.float64), atol=1e-6)


def test_pca_whiten_unit_variance(spark):
    X = _correlated(600, 10)
    vdf = vectors_df(spark, X)
    mu, W, _ = pca_train(vdf, d_out=3, sample_size=600, whiten=True)
    Y = pca_apply_np(X, mu, W)
    np.testing.assert_allclose(Y.var(axis=0, ddof=1), 1.0, rtol=0.05)


def test_pca_validates_dout(spark):
    X = _correlated(50, 8)
    with pytest.raises(ValueError):
        pca_train(vectors_df(spark, X), d_out=9, sample_size=50)
    with pytest.raises(ValueError):
        pca_train(vectors_df(spark, X), d_out=0, sample_size=50)


def test_normalize_transform(spark):
    """Unit norms; zero vectors pass through; all-Catalyst (no Python
    stage in the plan)."""
    V, _ = make_fixture(40, 1, 8)
    V[7] = 0.0
    vdf = vectors_df(spark, V)
    out = normalize_vectors(vdf).orderBy("id").toPandas()
    U = np.stack(out["vec"].to_numpy())
    norms = np.linalg.norm(U, axis=1)
    mask = np.arange(40) != 7
    np.testing.assert_allclose(norms[mask], 1.0, rtol=1e-5)
    assert norms[7] == 0.0
    # direction preserved
    cos = (U[mask] * V[mask]).sum(1) / (
        np.linalg.norm(V[mask], axis=1) * norms[mask]
    )
    np.testing.assert_allclose(cos, 1.0, rtol=1e-5)
    plan = normalize_vectors(vdf)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_pca_feeds_knn_pipeline(spark):
    """The standard compress-then-index shape: PCA to d_out, search in
    reduced space — top-1 self-hit survives the projection."""
    from faiss_metal_spark.operators.knn import knn_search

    X = _correlated(200, 24, seed=11)
    vdf = vectors_df(spark, X)
    mu, W, _ = pca_train(vdf, d_out=8, sample_size=200)
    red = pca_apply(vdf, mu, W)
    queries = red.limit(5).select(F.col("id").alias("qid"), "vec")
    res = knn_search(red, queries, k=1).toPandas()
    assert (res["qid"].to_numpy() == res["label"].to_numpy()).all()


def test_pretransform_index(spark):
    """IndexPreTransform parity: queries are projected through the SAME
    trained transform as the stored vectors; results equal a manual
    project-both-sides search; host and DataFrame paths agree."""
    from faiss_metal_spark.operators.knn import knn_search
    from faiss_metal_spark.operators.pca import pca_apply, pretransform_table

    X = _correlated(250, 20, seed=3)
    vdf = vectors_df(spark, X)
    idx = pretransform_table(vdf, d_out=6, sample_size=250)
    assert idx.ntotal == 250 and idx.d_in == 20

    D, L = idx.search_numpy(X[:4], k=3)
    assert (L[:, 0] == np.arange(4)).all()  # self top-1 survives
    np.testing.assert_allclose(D[:, 0], 0.0, atol=1e-4)

    # equals a manual both-sides projection
    red = pca_apply(vdf, idx.mean, idx.components)
    q = red.where(F.col("id") < 4).select(F.col("id").alias("qid"), "vec")
    want = (
        knn_search(red, q, k=3).orderBy("qid", "rank").toPandas()
    )
    np.testing.assert_array_equal(L.ravel(), want["label"].to_numpy())

    # DataFrame query path (raw d_in queries in, projected internally)
    qraw = vdf.where(F.col("id") < 4).select(F.col("id").alias("qid"), "vec")
    got = idx.search(qraw, k=3).orderBy("qid", "rank").toPandas()
    np.testing.assert_array_equal(got["label"].to_numpy(), want["label"].to_numpy())

    with pytest.raises(ValueError):
        idx.search_numpy(np.zeros((2, 6), np.float32), k=1)  # wrong d_in


def test_random_rotation_is_isometry(spark):
    """faiss RandomRotationMatrix: Haar-seeded orthonormal rows; at
    d_out = d_in the distributed apply preserves pairwise L2 exactly
    (to float rounding), so kNN through the rotation ≡ kNN raw."""
    import pandas as pd

    from faiss_metal_spark.operators.knn import knn_search
    from faiss_metal_spark.operators.pca import pca_apply, random_rotation

    rng = np.random.default_rng(4)
    X = rng.normal(size=(80, 12)).astype(np.float32)
    vdf = spark.createDataFrame(
        pd.DataFrame({"id": range(80), "vec": [v.tolist() for v in X]}),
        "id long, vec array<float>",
    )
    Q = random_rotation(12, seed=7)
    assert np.allclose(Q @ Q.T, np.eye(12), atol=1e-12)
    assert np.array_equal(Q, random_rotation(12, seed=7))  # deterministic
    rot = pca_apply(vdf, np.zeros(12), Q)
    q_raw = vdf.where(F.col("id") < 5).select(F.col("id").alias("qid"), "vec")
    q_rot = rot.where(F.col("id") < 5).select(F.col("id").alias("qid"), "vec")
    a = knn_search(vdf, q_raw, k=6, compute="f64").orderBy("qid", "rank").toPandas()
    b = knn_search(rot, q_rot, k=6, compute="f64").orderBy("qid", "rank").toPandas()
    np.testing.assert_array_equal(a["label"].to_numpy(), b["label"].to_numpy())
    np.testing.assert_allclose(
        a["distance"].to_numpy(), b["distance"].to_numpy(), atol=1e-9
    )


def test_remap_dimensions_selects_and_pads(spark):
    """faiss RemapDimensionsTransform as a 0/1 components matrix over
    the shared apply path: selection, reorder and −1 zero-pads."""
    import pandas as pd

    from faiss_metal_spark.operators.pca import pca_apply, remap_dimensions

    vdf = spark.createDataFrame(
        pd.DataFrame({"id": [0, 1], "vec": [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]}),
        "id long, vec array<float>",
    )
    W = remap_dimensions(3, [2, 0, -1, 1])
    out = pca_apply(vdf, np.zeros(3), W).orderBy("id").toPandas()
    assert out["vec"][0] == pytest.approx([3.0, 1.0, 0.0, 2.0])
    assert out["vec"][1] == pytest.approx([6.0, 4.0, 0.0, 5.0])
    with pytest.raises(ValueError):
        remap_dimensions(3, [3])
    # random_rotation expands when d_out > d_in (faiss IndexLSH's
    # rotate_data path for nbits > d): full Haar columns, so the map
    # stays an isometry d_in → d_out
    from faiss_metal_spark.operators.pca import random_rotation

    R = random_rotation(4, 7, seed=3)
    assert R.shape == (7, 4)
    np.testing.assert_allclose(R.T @ R, np.eye(4), atol=1e-9)
    with pytest.raises(ValueError):
        random_rotation(4, 0)


def test_index_factory_transform_prefixes(spark):
    """faiss spec composition: "PCA8,Flat" / "RR16,SQ8" /
    "PCA8,IVF4,Flat" build a PreTransformIndex whose inner tier came
    from the PROJECTED table; queries go through the same transform, so
    RR,Flat (an isometry) must reproduce the flat search exactly."""
    import numpy as np
    from faiss_metal_spark import SQ8Index, VectorTable
    from faiss_metal_spark.compact_index import IVFIndex, index_factory
    from faiss_metal_spark.operators.pca import PreTransformIndex

    rng = np.random.default_rng(8)
    V = rng.normal(size=(300, 16)).astype(np.float32)
    Q = rng.normal(size=(4, 16)).astype(np.float32)
    vt = VectorTable(spark, 16).add_numpy(V)

    iso = index_factory(vt, "RR16,Flat")
    assert isinstance(iso, PreTransformIndex)
    _, L_iso = iso.search_numpy(Q, 5)
    _, L_flat = vt.search_numpy(Q, 5)
    np.testing.assert_array_equal(L_iso, L_flat)  # rotation is an isometry

    pca = index_factory(vt, "PCA8,Flat", sample_size=300)
    assert isinstance(pca.inner, VectorTable) and pca.inner.d == 8
    D, L = pca.search_numpy(Q, 5)
    assert L.shape == (4, 5) and (L >= 0).all()

    nested = index_factory(vt, "PCA8,IVF4,Flat", sample_size=300)
    assert isinstance(nested.inner, IVFIndex) and nested.inner.d == 8
    _, Ln = nested.search_numpy(Q, 5, nprobe=4)
    # full probe in PCA space ≡ flat search in PCA space
    _, Lp = pca.search_numpy(Q, 5)
    np.testing.assert_array_equal(Ln, Lp)

    rrsq = index_factory(vt, "RR16,SQ8", seed=5)
    assert isinstance(rrsq.inner, SQ8Index)
    _, Ls = rrsq.search_numpy(Q, 5)
    assert Ls.shape == (4, 5)


def test_pretransform_write_read_clone(spark, tmp_path):
    """IndexPreTransform persistence + clone (faiss write_index handles
    the composite): the transform arrays and the recursive inner
    payload round-trip value-identically; clone is independent."""
    import numpy as np
    from faiss_metal_spark import VectorTable, clone_index, read_index, write_index
    from faiss_metal_spark.compact_index import index_factory
    from faiss_metal_spark.operators.pca import PreTransformIndex

    rng = np.random.default_rng(14)
    V = rng.normal(size=(300, 16)).astype(np.float32)
    Q = rng.normal(size=(3, 16)).astype(np.float32)
    vt = VectorTable(spark, 16).add_numpy(V)
    idx = index_factory(vt, "PCA8,IVF4,Flat", sample_size=300)
    D0, L0 = idx.search_numpy(Q, 5, nprobe=4)

    write_index(idx, str(tmp_path / "pt"))
    idx2 = read_index(spark, str(tmp_path / "pt"))
    assert isinstance(idx2, PreTransformIndex) and idx2.d_in == 16
    np.testing.assert_allclose(idx2.mean, idx.mean, atol=1e-12)
    np.testing.assert_allclose(idx2.components, idx.components, atol=1e-12)
    D1, L1 = idx2.search_numpy(Q, 5, nprobe=4)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_allclose(D0, D1, atol=1e-9)

    cl = clone_index(idx)
    assert cl is not idx and cl.components is not idx.components
    _, Lc = cl.search_numpy(Q, 5, nprobe=4)
    np.testing.assert_array_equal(L0, Lc)


def test_opq_transform_prefix_composes_with_ivfpq(spark, tmp_path):
    """faiss's most common recipe "OPQ<m>,IVF<n>,PQ<m>" (r10): the OPQ
    rotation is a TRUE transform prefix — the factory result must
    equal an IVFPQIndex built over the manually pre-rotated table
    (identical deterministic training on both paths), and the
    composite must IO-round-trip as kind "pretransform"."""
    import numpy as np
    from faiss_metal_spark import (
        IVFPQIndex, VectorTable, read_index, write_index,
    )
    from faiss_metal_spark.compact_index import index_factory
    from faiss_metal_spark.operators.opq import opq_train
    from faiss_metal_spark.operators.pca import PreTransformIndex

    rng = np.random.default_rng(27)
    V = rng.normal(size=(300, 16)).astype(np.float32)
    Q = rng.normal(size=(4, 16)).astype(np.float32)
    vt = VectorTable(spark, 16).add_numpy(V)

    idx = index_factory(vt, "OPQ4,IVF4,PQ4x4", sample_size=300, opq_iters=3)
    assert isinstance(idx, PreTransformIndex)
    assert isinstance(idx.inner, IVFPQIndex)
    D0, L0 = idx.search_numpy(Q, 5, nprobe=4)

    # manual pre-rotation with the SAME deterministic training
    from faiss_metal_spark.vector_table import SearchParams  # noqa: F401
    base = vt.df.select("id", "vec")
    R, _ = opq_train(base, 4, iters=3, sample_size=300)
    np.testing.assert_allclose(R, idx.components, atol=1e-12)
    Vr = (V.astype(np.float64) @ R.T).astype(np.float32)
    vt_r = VectorTable(spark, 16).add_numpy(Vr)
    manual = IVFPQIndex.from_table(vt_r, n_cells=4, m=4, nbits=4, sample_size=300)
    Qr = (Q.astype(np.float64) @ R.T).astype(np.float32)
    Dm, Lm = manual.search_numpy(Qr, 5, nprobe=4)
    np.testing.assert_array_equal(L0, Lm)
    np.testing.assert_allclose(D0, Dm, atol=1e-6)

    # IO round-trip keeps the composite + the rotation
    write_index(idx, str(tmp_path / "opqpt"))
    idx2 = read_index(spark, str(tmp_path / "opqpt"))
    assert isinstance(idx2, PreTransformIndex)
    np.testing.assert_allclose(idx2.components, R, atol=1e-12)
    D1, L1 = idx2.search_numpy(Q, 5, nprobe=4)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_allclose(D0, D1, atol=1e-9)

    # ",RFlat" composes OUTSIDE the prefix: refinement in input space
    from faiss_metal_spark import RefineIndex
    r = index_factory(vt, "OPQ4,IVF4,PQ4x4,RFlat", sample_size=300, opq_iters=3)
    assert isinstance(r, RefineIndex)
    assert isinstance(r.base, PreTransformIndex)
    Dr, Lr = r.search_numpy(Q, 3, nprobe=4)
    # refined distances are exact input-space L2² of returned labels
    for qi in range(len(Q)):
        for rr in range(3):
            lab = int(Lr[qi, rr])
            if lab < 0:
                continue
            true = float(((Q[qi].astype(np.float64) - V[lab].astype(np.float64)) ** 2).sum())
            assert abs(Dr[qi, rr] - true) < 1e-6


def test_opq_dout_reducing_prefix(spark):
    """faiss "OPQ<m>_<dout>,<inner>" (r10): the dimension-reducing OPQ
    form — PCA to d_out composed with the reduced-space rotation in
    ONE (d_out, d) PreTransform matrix; the inner tier builds at
    d_out. Pinned: parses (incl. a bare-PQ inner, legal here), the
    matrix shape/isometry-on-components, the inner dimensionality, a
    sane recall floor vs exact flat search, and the refusals."""
    import numpy as np
    import pytest
    from faiss_metal_spark import PQIndex, VectorTable
    from faiss_metal_spark.compact_index import index_factory
    from faiss_metal_spark.operators.pca import PreTransformIndex

    rng = np.random.default_rng(31)
    # correlated data so an 8-dim projection retains structure
    Z = rng.normal(size=(300, 8)).astype(np.float64)
    M = rng.normal(size=(8, 16))
    V = (Z @ M + 0.01 * rng.normal(size=(300, 16))).astype(np.float32)
    Q = V[:5] + 0.01 * rng.normal(size=(5, 16)).astype(np.float32)
    vt = VectorTable(spark, 16).add_numpy(V)

    idx = index_factory(vt, "OPQ4_8,PQ4", sample_size=300, opq_iters=3)
    assert isinstance(idx, PreTransformIndex)
    assert isinstance(idx.inner, PQIndex)
    assert idx.components.shape == (8, 16)
    assert idx.inner.codebooks.shape[0] == 4  # m=4 over d_out=8
    D, L = idx.search_numpy(Q, 5)
    # exact flat answer in input space; queries are tiny perturbations
    # of stored rows, so top-1 recall through the 8-dim OPQ+PQ chain
    # must be high on this low-rank data
    Dx = ((Q[:, None, :].astype(np.float64) - V[None, :, :].astype(np.float64)) ** 2).sum(-1)
    top1 = Dx.argmin(1)
    hits = sum(int(top1[i]) in set(int(x) for x in L[i] if x >= 0) for i in range(len(Q)))
    assert hits >= 4, (hits, L)

    with pytest.raises(ValueError, match="divisible"):
        index_factory(vt, "OPQ4_10,PQ4", sample_size=300)
    with pytest.raises(ValueError, match="expand"):
        index_factory(vt, "OPQ4_32,PQ4", sample_size=300)


def test_l2norm_transform_prefix(spark, tmp_path):
    """faiss "L2norm,<inner>" (NormalizationTransform): the inner tier
    is built over unit vectors and queries normalize identically — L2
    over the normalized table at unit queries ranks EXACTLY like cosine
    similarity over the raw table, which is the pinnable invariant."""
    from faiss_metal_spark import (
        NormTransformIndex,
        VectorTable,
        clone_index,
        index_factory,
        read_index,
        write_index,
    )
    from tests.conftest import make_fixture, numpy_oracle

    V, Q = make_fixture(300, 5, 16, seed=23)
    # scale rows wildly so raw-L2 and cosine DISAGREE (the footgun case)
    scales = np.linspace(0.1, 10.0, len(V)).astype(np.float32)[:, None]
    Vs = V * scales
    vt = VectorTable(spark, 16).add_numpy(Vs)
    idx = index_factory(vt, "L2norm,Flat")
    assert isinstance(idx, NormTransformIndex) and idx.ntotal == 300
    D, L = idx.search_numpy(Q, k=5)
    _, oL = numpy_oracle(Vs, Q, 5, metric="cosine")
    # top-1 exact; top-5 as sets (f32 normalize+GEMM vs the f64 oracle
    # can flip near-equal neighbors at the tail)
    np.testing.assert_array_equal(L[:, 0], oL[:, 0])
    for i in range(len(Q)):
        assert len(set(L[i]) & set(oL[i])) >= 4, (i, L[i], oL[i])
    # composes recursively with a linear prefix
    deep = index_factory(vt, "L2norm,PCA8,Flat", sample_size=300)
    assert isinstance(deep, NormTransformIndex)
    assert deep.search_numpy(Q, k=3)[1].shape == (5, 3)
    # IO round-trip + clone
    path = str(tmp_path / "l2n")
    write_index(idx, path)
    back = read_index(spark, path)
    assert isinstance(back, NormTransformIndex)
    D2, L2 = back.search_numpy(Q, k=5)
    np.testing.assert_array_equal(L, L2)
    np.testing.assert_allclose(D, D2, rtol=1e-6)
    cl = clone_index(idx)
    np.testing.assert_array_equal(cl.search_numpy(Q, k=5)[1], L)
