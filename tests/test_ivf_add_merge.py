"""IVF-family add / merge_from — the faiss distributed-build workflow.

faiss ``IndexIVF::add_with_ids`` appends to a TRAINED index without
retraining; ``IndexIVF::merge_from(other, add_id)`` unions the inverted
lists of two indexes trained the same way (the standard shard-merge:
train once, add each data shard on its own worker, merge). Pinned here:
add ≡ building from the concatenation when the trained state is shared,
merge empties the donor and shifts ids by add_id, and mismatched
trained state refuses.
"""

import numpy as np
from pyspark.sql import functions as F
import pytest

from faiss_metal_spark import (
    BinaryIVFIndex,
    IVFIndex,
    IVFPQIndex,
    IVFSQIndex,
    VectorTable,
)

from conftest import make_fixture


def _table(spark, V) -> VectorTable:
    return VectorTable(spark, V.shape[1]).add_numpy(V)


def _res(idx, Q, k=5, **kw):
    D, L = idx.search_numpy(Q, k, **kw)
    return D, L


@pytest.mark.parametrize(
    "kind",
    ["ivf", "ivfsq", "ivfpq", "bivf"],
)
def test_add_equals_full_build_under_shared_quantizer(spark, kind):
    """add(tail) onto an index trained on the FULL data ≡ the index
    built on the full data in one shot — the trained state is the
    same, so the inverted lists must be identical."""
    V, Q = make_fixture(400, 4, 16, seed=101)
    tail = V[300:]
    vt_full = _table(spark, V)
    builders = {
        "ivf": lambda vt: IVFIndex.from_table(vt, n_cells=5, sample_size=400),
        "ivfsq": lambda vt: IVFSQIndex.from_table(vt, n_cells=5, sample_size=400),
        "ivfpq": lambda vt: IVFPQIndex.from_table(vt, n_cells=5, m=4, sample_size=400),
        "bivf": lambda vt: BinaryIVFIndex.from_table(vt, n_cells=5, sample_size=400),
    }
    frame_attr = {"ivf": "assigned", "ivfsq": "codes", "ivfpq": "codes", "bivf": "words"}

    full = builders[kind](vt_full)
    # grown: drop the tail rows, then add them back with their own ids
    grown = builders[kind](vt_full)
    removed = grown.remove_ids(range(300, 400))
    assert removed == 100 and grown.ntotal == 300
    grown.add_numpy(tail, ids=np.arange(300, 400))
    assert grown.ntotal == 400

    fa = frame_attr[kind]
    cols = list(getattr(full, fa).columns)
    a = getattr(full, fa).orderBy("id").toPandas()[cols]
    b = getattr(grown, fa).orderBy("id").toPandas()[cols]
    assert a.equals(b)  # inverted file identical row-for-row

    # and searches agree exactly
    Df, Lf = _res(full, Q, nprobe=full.nlist)
    Dg, Lg = _res(grown, Q, nprobe=grown.nlist)
    assert (Lf == Lg).all()
    np.testing.assert_allclose(Df, Dg, rtol=0, atol=0)
    full.release()
    grown.release()


def test_add_numpy_default_ids_after_remove(spark):
    """Default ids continue from max(id)+1, never recycling labels a
    remove_ids freed (the faiss add-after-remove foot-gun)."""
    V, _ = make_fixture(300, 1, 16, seed=11)
    idx = IVFIndex.from_table(_table(spark, V), n_cells=4, sample_size=300)
    idx.remove_ids([250])  # a hole in the middle
    idx.add_numpy(V[:3])
    ids = [r.id for r in idx.assigned.select("id").collect()]
    assert 250 not in ids
    assert {300, 301, 302} <= set(ids)  # continued past the old max
    idx.release()


def test_merge_from_shifts_and_empties(spark):
    V, Q = make_fixture(400, 4, 16, seed=202)
    vt = _table(spark, V)
    a = IVFIndex.from_table(vt, n_cells=5, sample_size=400)
    b = IVFIndex.from_table(vt, n_cells=5, sample_size=400)  # same train
    a.merge_from(b, add_id=1000)
    assert a.ntotal == 800 and b.ntotal == 0
    assert b.assigned.count() == 0  # donor truly emptied
    ids = {r.id for r in a.assigned.select("id").collect()}
    assert ids == set(range(400)) | set(range(1000, 1400))
    # merged index still searches: every original id's top-1 is itself
    D, L = a.search_numpy(Q, 3, nprobe=a.nlist)
    assert (D[:, 0] >= 0).all()
    a.release()
    b.release()


def test_merge_from_refuses_mismatched_state(spark):
    V, _ = make_fixture(300, 1, 16, seed=303)
    W, _ = make_fixture(300, 1, 16, seed=404)  # different data → different train
    a = IVFIndex.from_table(_table(spark, V), n_cells=4, sample_size=300)
    b = IVFIndex.from_table(_table(spark, W), n_cells=4, sample_size=300)
    with pytest.raises(ValueError, match="trained state"):
        a.merge_from(b)
    c = IVFSQIndex.from_table(_table(spark, V), n_cells=4, sample_size=300)
    with pytest.raises(ValueError, match="same index type"):
        a.merge_from(c)
    for i in (a, b, c):
        i.release()


def test_merge_from_ivfpq_and_sq_state_checked(spark):
    V, _ = make_fixture(400, 1, 16, seed=55)
    vt = _table(spark, V)
    p1 = IVFPQIndex.from_table(vt, n_cells=4, m=4, sample_size=400)
    p2 = IVFPQIndex.from_table(vt, n_cells=4, m=4, sample_size=400)
    p1.merge_from(p2, add_id=500)
    assert p1.ntotal == 800 and p2.ntotal == 0
    s1 = IVFSQIndex.from_table(vt, n_cells=4, bits=8, sample_size=400)
    s2 = IVFSQIndex.from_table(vt, n_cells=4, bits=4, sample_size=400)
    with pytest.raises(ValueError, match="trained state"):
        s1.merge_from(s2)  # different SQ width → codes incompatible
    for i in (p1, p2, s1, s2):
        i.release()


def test_ivf_update_vectors_moves_cells_and_keeps_ids(spark):
    """faiss IndexIVFFlat::update_vectors: in-place replacement against
    the frozen quantizer — an update may move an entry to a different
    inverted list; labels and ntotal never change; absent ids raise."""
    V, Q = make_fixture(300, 4, 16, seed=505)
    idx = IVFIndex.from_table(_table(spark, V), n_cells=5, sample_size=300)
    n0 = idx.ntotal

    # replace ids 10..12 with copies of far-away rows 200..202: the
    # updated entries must be found AT the updated location under their
    # OLD labels, and the old vectors at those labels must be gone
    new_vecs = V[200:203]
    idx.update_vectors([10, 11, 12], new_vecs)
    assert idx.ntotal == n0
    D, L = idx.search_numpy(new_vecs, 2, nprobe=5)
    # exact duplicates now exist: (10,200), (11,201), (12,202) — the
    # (distance, label) tie order puts the smaller label first
    assert L[:, 0].tolist() == [10, 11, 12]
    assert np.allclose(D[:, 0], 0.0, atol=1e-9)
    assert L[:, 1].tolist() == [200, 201, 202]
    # the replaced originals are no longer findable at distance 0
    D_old, L_old = idx.search_numpy(V[10:13], 1, nprobe=5)
    assert not np.allclose(D_old[:, 0], 0.0, atol=1e-12)

    # cells were genuinely re-assigned (not left in the old lists)
    from faiss_metal_spark.operators.similarity import ivf_assign
    import pandas as pd  # noqa: F401
    got = {
        r["id"]: r["cell"]
        for r in idx.assigned.where(F.col("id").isin([10, 11, 12])).collect()
    }
    want = {
        r["id"] - 190: r["cell"]
        for r in idx.assigned.where(F.col("id").isin([200, 201, 202])).collect()
    }
    assert got == want

    with pytest.raises(KeyError):
        idx.update_vectors([99999], V[:1])
    with pytest.raises(ValueError):
        idx.update_vectors([1, 1], V[:2])
    assert idx.update_vectors([], np.zeros((0, 16), np.float32)) is idx


def test_ivf_search_preassigned(spark):
    """faiss IndexIVF::search_preassigned: caller-supplied probe cells.
    Feeding the engine's own ranking back reproduces search() exactly;
    a deliberately wrong single-cell assignment returns only that
    cell's rows (subset, never a false positive); full coverage ≡
    exact."""
    V, Q = make_fixture(300, 6, 16, seed=606)
    idx = IVFIndex.from_table(_table(spark, V), n_cells=5, sample_size=300)
    C = idx.centroids
    Qd = Q.astype(np.float64)
    cn = (C * C).sum(1)
    order = (cn[None, :] - 2.0 * (Qd @ C.T)).argsort(1, kind="stable")

    D_ref, L_ref = idx.search_numpy(Q, 5, nprobe=2)
    D_pre, L_pre = idx.search_preassigned_numpy(Q, 5, order[:, :2])
    assert np.array_equal(L_ref, L_pre) and np.allclose(D_ref, D_pre)

    # full coverage ≡ exact full probe
    D_all, L_all = idx.search_preassigned_numpy(Q, 5, order)
    D_full, L_full = idx.search_numpy(Q, 5, nprobe=5)
    assert np.array_equal(L_all, L_full) and np.allclose(D_all, D_full)

    # a wrong single cell only ever returns members of that cell
    wrong = order[:, -1:]  # every query probes its FARTHEST cell
    _, L_w = idx.search_preassigned_numpy(Q, 5, wrong)
    cells = {r["id"]: r["cell"] for r in idx.assigned.collect()}
    for qi in range(len(Q)):
        want_cell = wrong[qi, 0]
        for lab in L_w[qi]:
            if lab >= 0:
                assert cells[lab] == want_cell


def test_search_preassigned_bounds_and_sentinel(spark):
    """assign is indexed by qid: an uncovered qid raises a clear
    ValueError up front (not a bare numpy IndexError at collect time);
    a -1 entry is the faiss 'skip this probe slot' sentinel — it
    matches no cell and simply contributes nothing."""
    V, Q = make_fixture(200, 4, 16, seed=607)
    idx = IVFIndex.from_table(_table(spark, V), n_cells=4, sample_size=200)
    C = idx.centroids
    cn = (C * C).sum(1)
    order = (cn[None, :] - 2.0 * (Q.astype(np.float64) @ C.T)).argsort(
        1, kind="stable"
    )

    # assign covers only 2 of the 4 queries → refuse with the shapes
    with pytest.raises(ValueError, match="search_preassigned.*covers 2"):
        idx.search_preassigned_numpy(Q, 3, order[:2, :2])

    # -1 slots: (best, -1) ≡ (best,) — the sentinel adds nothing
    one = order[:, :1]
    padded = np.concatenate([one, np.full_like(one, -1)], axis=1)
    D1, L1 = idx.search_preassigned_numpy(Q, 3, one)
    D2, L2 = idx.search_preassigned_numpy(Q, 3, padded)
    assert np.array_equal(L1, L2) and np.allclose(D1, D2)
    idx.release()


def test_ivfpq_search_preassigned(spark):
    """faiss IndexIVFPQ::search_preassigned: engine-ranked assignment
    fed back ≡ search() exactly; -1 slots skip; uncovered qids refuse
    up front."""
    from faiss_metal_spark import IVFPQIndex

    V, Q = make_fixture(300, 4, 16, seed=608)
    idx = IVFPQIndex.from_table(_table(spark, V), n_cells=5, m=4, sample_size=300)
    C = idx.centroids
    cn = (C * C).sum(1)
    order = (cn[None, :] - 2.0 * (Q.astype(np.float64) @ C.T)).argsort(
        1, kind="stable"
    )
    D_ref, L_ref = idx.search_numpy(Q, 5, nprobe=2)
    D_pre, L_pre = idx.search_preassigned_numpy(Q, 5, order[:, :2])
    assert np.array_equal(L_ref, L_pre) and np.allclose(D_ref, D_pre)
    # -1 sentinel contributes nothing
    one = order[:, :1]
    padded = np.concatenate([one, np.full_like(one, -1)], axis=1)
    D1, L1 = idx.search_preassigned_numpy(Q, 5, one)
    D2, L2 = idx.search_preassigned_numpy(Q, 5, padded)
    assert np.array_equal(L1, L2) and np.allclose(D1, D2)
    with pytest.raises(ValueError, match="search_preassigned.*covers 2"):
        idx.search_preassigned_numpy(Q, 3, order[:2, :2])
    idx.release()


def test_ivfsq_search_preassigned(spark):
    """IndexIVFScalarQuantizer inherits IndexIVF::search_preassigned:
    engine-ranked assignment fed back ≡ search() exactly over the
    SQ-coded inverted file; bounds validated."""
    from faiss_metal_spark import IVFSQIndex

    V, Q = make_fixture(250, 4, 16, seed=609)
    idx = IVFSQIndex.from_table(_table(spark, V), n_cells=5, sample_size=250)
    C = idx.centroids
    cn = (C * C).sum(1)
    order = (cn[None, :] - 2.0 * (Q.astype(np.float64) @ C.T)).argsort(
        1, kind="stable"
    )
    D_ref, L_ref = idx.search_numpy(Q, 5, nprobe=2)
    D_pre, L_pre = idx.search_preassigned_numpy(Q, 5, order[:, :2])
    assert np.array_equal(L_ref, L_pre) and np.allclose(D_ref, D_pre)
    with pytest.raises(ValueError, match="search_preassigned"):
        idx.search_preassigned_numpy(Q, 3, order[:1, :2])
    idx.release()


def test_range_search_preassigned(spark):
    """faiss IndexIVF::range_search_preassigned (IVF + IVFSQ):
    engine-ranked assignment fed back ≡ range_search exactly; a
    partial single-cell assignment returns a subset, never a false
    positive; -1 slots contribute nothing."""
    from faiss_metal_spark import IVFIndex, IVFSQIndex

    V, Q = make_fixture(250, 4, 16, seed=610)
    for cls, kw in ((IVFIndex, {}), (IVFSQIndex, {})):
        idx = cls.from_table(_table(spark, V), n_cells=4, sample_size=250, **kw)
        C = idx.centroids
        cn = (C * C).sum(1)
        order = (cn[None, :] - 2.0 * (Q.astype(np.float64) @ C.T)).argsort(
            1, kind="stable"
        )
        radius = 18.0

        def rows(df):
            # distances drift in the last ulp between runs whose
            # per-cell GEMM batch shapes differ (BLAS summation
            # order), so compare keys exactly and values with isclose
            return {(r.qid, r.label): r.distance for r in df.collect()}

        want = rows(idx.range_search(_q(spark, Q), radius, nprobe=2))
        got = rows(
            idx.range_search_preassigned(_q(spark, Q), radius, order[:, :2])
        )
        assert set(got) == set(want)
        assert all(np.isclose(got[k], want[k], atol=1e-9) for k in got)
        # partial probe subset + -1 padding
        one = order[:, :1]
        padded = np.concatenate([one, np.full_like(one, -1)], axis=1)
        r1 = rows(idx.range_search_preassigned(_q(spark, Q), radius, one))
        r2 = rows(idx.range_search_preassigned(_q(spark, Q), radius, padded))
        assert r1 == r2
        assert set(r1) <= set(want)
        idx.release()


def _q(spark, Q):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame({"qid": np.arange(len(Q), dtype=np.int64), "vec": list(Q)}),
        "qid long, vec array<float>",
    )
