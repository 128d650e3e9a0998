"""IVFRQIndex — the faiss IndexIVFResidualQuantizer family
(IVF+RQ / IVF+LSQ / IVF+PRQ / IVF+PLSQ; factory "IVF<n>,RQ<m>x8",
"IVF<n>,LSQ<m>x8", "IVF<n>,PRQ<ns>x<m>x8", "IVF<n>,PLSQ<ns>x<m>x8").

Contract model (faiss IndexIVFAdditiveQuantizer with the default
by_residual=true: each entry's additive code encodes x − centroid(cell);
the reference engine has no compressed tier at all —
/root/reference/include/faiss-metal/MetalIndexFlat.h:47). Pins:

- full-probe search returns EXACTLY the top-k by decode-then-score
  distance over centroid + codeword-sum reconstructions (the extended
  additive identity is algebraically exact — labels equal, distances
  to 1e-9) under the engine's (distance, label) tie order;
- with ``by_residual=False`` and shared training, full-probe search is
  VALUE-IDENTICAL to the flat RQ tier over the same table (the verdict
  done-criterion: codes, labels, and distances all equal);
- the stored codes equal the host codec applied to the per-cell
  residuals, and ``recn`` equals ‖full reconstruction‖²;
- partial-probe range_search results are a subset of the full probe's,
  never a false positive; top-k partial probes only see probed cells;
- add_df after build ≡ one-shot build row-for-row (frozen state);
  merge_from moves entries and refuses mismatched trained state;
  search_preassigned with the engine's own assignment ≡ search;
- write_index/read_index round-trips kind 'ivfrq' value-identically
  (beam / icm_sweeps / by_residual survive), factory specs parse,
  clone_index detaches.
"""

import numpy as np
import pytest

from faiss_metal_spark import (
    IVFRQIndex,
    RQIndex,
    VectorTable,
    clone_index,
    read_index,
    write_index,
)
from faiss_metal_spark.compact_index import index_factory
from faiss_metal_spark.operators.rq import addq_assign_np, addq_decode_np

from conftest import make_fixture


def _table(spark, V) -> VectorTable:
    vt = VectorTable(spark, V.shape[1], metric="l2")
    return vt.add_numpy(V)


def _collect_codes(idx):
    rows = idx.codes.orderBy("id").collect()
    ids = np.array([r["id"] for r in rows], np.int64)
    cells = np.array([r["cell"] for r in rows], np.int64)
    codes = np.stack([np.frombuffer(r["code"], np.uint8) for r in rows])
    recn = np.array([r["recn"] for r in rows], np.float64)
    return ids, cells, codes, recn


def _recon(idx, cells, codes):
    rec = addq_decode_np(codes, idx.codebooks)
    return rec + idx.centroids[cells] if idx.by_residual else rec


def _oracle_topk(R, Q, k):
    """Exact top-k by reconstruction distance, (distance, label) ties."""
    D = ((Q[:, None, :] - R[None, :, :]) ** 2).sum(2)
    lab = np.broadcast_to(np.arange(R.shape[0]), D.shape)
    idx = np.lexsort((lab, D), axis=1)[:, :k]
    return np.take_along_axis(D, idx, axis=1), idx


def test_full_probe_equals_decode_oracle(spark):
    V, Q = make_fixture(500, 6, 16)
    idx = IVFRQIndex.from_table(_table(spark, V), n_cells=8, m=4,
                                sample_size=500, iters=4)
    ids, cells, codes, recn = _collect_codes(idx)
    assert np.array_equal(ids, np.arange(500))
    R = _recon(idx, cells, codes)
    # codes are the host codec on per-cell residuals; recn is exact
    want = addq_assign_np(V.astype(np.float64) - idx.centroids[cells],
                          idx.codebooks)
    np.testing.assert_array_equal(codes, want)
    np.testing.assert_allclose(recn, (R * R).sum(1), atol=1e-9)
    De, Le = _oracle_topk(R, Q, 10)
    D, L = idx.search_numpy(Q, 10, nprobe=8)
    np.testing.assert_array_equal(L, Le)
    np.testing.assert_allclose(D, De, atol=1e-9)


def test_by_residual_false_full_probe_equals_flat_rq(spark):
    """The verdict done-criterion: under by_residual=False the cells
    only gate WHICH rows scan, so a full probe is value-identical to
    the flat RQ tier (shared deterministic training sample → shared
    codebooks → identical codes)."""
    V, Q = make_fixture(500, 4, 16)
    vt = _table(spark, V)
    ivf = IVFRQIndex.from_table(vt, n_cells=8, m=4, sample_size=500,
                                iters=4, by_residual=False)
    flat = RQIndex.from_table(vt, m=4, sample_size=500, iters=4)
    np.testing.assert_array_equal(ivf.codebooks, flat.codebooks)
    frows = {r["id"]: r["code"] for r in flat.codes.collect()}
    for r in ivf.codes.collect():
        assert bytes(r["code"]) == bytes(frows[r["id"]])
    Df, Lf = flat.search_numpy(Q, 10)
    D, L = ivf.search_numpy(Q, 10, nprobe=8)
    np.testing.assert_array_equal(L, Lf)
    np.testing.assert_allclose(D, Df, atol=1e-12)


def test_product_and_icm_forms(spark):
    """IVF+PRQ: block codes are the per-block host codec on the cell
    residual; IVF+LSQ (icm_sweeps) matches the refined host codec."""
    V, Q = make_fixture(500, 3, 16)
    vt = _table(spark, V)
    p = index_factory(vt, "IVF8,PRQ2x2x8", sample_size=500, iters=4)
    assert isinstance(p, IVFRQIndex) and p.codebooks.ndim == 4
    ids, cells, codes, recn = _collect_codes(p)
    want = addq_assign_np(V.astype(np.float64) - p.centroids[cells],
                          p.codebooks)
    np.testing.assert_array_equal(codes, want)
    R = _recon(p, cells, codes)
    De, Le = _oracle_topk(R, Q, 5)
    D, L = p.search_numpy(Q, 5, nprobe=8)
    np.testing.assert_array_equal(L, Le)
    np.testing.assert_allclose(D, De, atol=1e-9)

    lsq = index_factory(vt, "IVF8,LSQ2x8", sample_size=500, iters=4)
    assert isinstance(lsq, IVFRQIndex) and lsq.icm_sweeps == 2
    _, lc, lcodes, _ = _collect_codes(lsq)
    lwant = addq_assign_np(V.astype(np.float64) - lsq.centroids[lc],
                           lsq.codebooks, icm_sweeps=2)
    np.testing.assert_array_equal(lcodes, lwant)
    plsq = index_factory(vt, "IVF8,PLSQ2x2x8", sample_size=500, iters=4)
    assert isinstance(plsq, IVFRQIndex) and plsq.icm_sweeps == 2
    assert plsq.codebooks.ndim == 4


def test_partial_probe_and_range_subset(spark):
    V, Q = make_fixture(500, 4, 8)
    idx = IVFRQIndex.from_table(_table(spark, V), n_cells=8, m=3,
                                sample_size=500, iters=4)
    ids, cells, codes, _ = _collect_codes(idx)
    R = _recon(idx, cells, codes)
    # top-k partial probe: every hit comes from a probed cell and is
    # that probe set's exact best (re-derive the probe order)
    cn = (idx.centroids ** 2).sum(1)
    order = (cn[None, :] - 2.0 * (Q @ idx.centroids.T)).argsort(
        1, kind="stable")[:, :2]
    D, L = idx.search_numpy(Q, 5, nprobe=2)
    for i in range(len(Q)):
        in_probe = np.isin(cells, order[i])
        got = L[i][L[i] >= 0]
        assert in_probe[got].all()
        Dp, Lp = _oracle_topk(R[in_probe], Q[i : i + 1], 5)
        np.testing.assert_array_equal(got, np.where(in_probe)[0][Lp[0]])
    # range: partial ⊆ full, never a false positive; full ≡ oracle
    r = float(np.quantile(((Q[0] - R) ** 2).sum(1), 0.02))
    qdf = spark.createDataFrame(
        [(0, [float(x) for x in Q[0]])], "qid long, vec array<double>"
    )
    full = {(row["label"], round(row["distance"], 9))
            for row in idx.range_search(qdf, r, nprobe=8).collect()}
    part = {(row["label"], round(row["distance"], 9))
            for row in idx.range_search(qdf, r, nprobe=2).collect()}
    assert part <= full
    want = {(int(j), round(float(d), 9))
            for j, d in enumerate(((Q[0] - R) ** 2).sum(1)) if d < r}
    assert full == want


def test_add_merge_preassigned_io_clone(spark, tmp_path):
    V, Q = make_fixture(500, 3, 8)
    vt = _table(spark, V)
    idx = index_factory(vt, "IVF8,RQ3x8", sample_size=500, iters=4)
    assert isinstance(idx, IVFRQIndex) and idx.sa_code_size == 3

    # frozen-state add ≡ one-shot build row-for-row
    idx.add_numpy(V[:4] + 0.01, ids=np.arange(900, 904))
    assert idx.ntotal == 504
    rows = {r["id"]: r for r in idx.codes.where("id >= 900").collect()}
    cells = np.array([rows[900 + i]["cell"] for i in range(4)])
    want = addq_assign_np(
        (V[:4] + 0.01).astype(np.float64) - idx.centroids[cells],
        idx.codebooks,
    )
    for i in range(4):
        np.testing.assert_array_equal(
            np.frombuffer(rows[900 + i]["code"], np.uint8), want[i]
        )

    # reconstruct = centroid + decode; absent id raises
    ids, cls_, codes, _ = _collect_codes(idx)
    R = _recon(idx, cls_, codes)
    np.testing.assert_allclose(idx.reconstruct(7), R[7], atol=1e-12)
    with pytest.raises(KeyError):
        idx.reconstruct(77777)

    # search_preassigned with the engine's own assignment ≡ search
    cn = (idx.centroids ** 2).sum(1)
    assign = (cn[None, :] - 2.0 * (Q @ idx.centroids.T)).argsort(
        1, kind="stable")[:, :4]
    D0, L0 = idx.search_numpy(Q, 5, nprobe=4)
    D1, L1 = idx.search_preassigned_numpy(Q, 5, assign)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_allclose(D0, D1, atol=1e-12)

    # IO round-trip value-identical, params survive
    write_index(idx, str(tmp_path / "ivfrq"))
    idx2 = read_index(spark, str(tmp_path / "ivfrq"))
    assert isinstance(idx2, IVFRQIndex)
    assert (idx2.beam, idx2.icm_sweeps, idx2.by_residual) == (1, 0, True)
    D2, L2 = idx2.search_numpy(Q, 5, nprobe=8)
    D3, L3 = idx.search_numpy(Q, 5, nprobe=8)
    np.testing.assert_array_equal(L2, L3)
    np.testing.assert_allclose(D2, D3, atol=0)

    # remove without renumbering
    assert idx.remove_ids([900, 77777]) == 1
    assert idx.ntotal == 503

    # merge: same trained state moves entries; mismatched state refuses
    donor = clone_index(idx2)
    n0 = idx2.ntotal
    idx2.merge_from(donor, add_id=10_000)
    assert idx2.ntotal == 2 * n0 and donor.ntotal == 0
    other = IVFRQIndex.from_table(vt, n_cells=4, m=3, sample_size=500,
                                  iters=4)
    with pytest.raises(ValueError, match="trained state"):
        idx2.merge_from(other)
    idx.release(), idx2.release(), other.release()


def test_guards(spark):
    """Dim guard, LUT ceiling, width mismatch — the additive-tier
    discipline carried onto the IVF composition."""
    from faiss_metal_spark.operators import knn as knn_mod
    from faiss_metal_spark.operators import rq as rq_mod

    V, Q = make_fixture(400, 2, 8)
    idx = IVFRQIndex.from_table(_table(spark, V), n_cells=4, m=4,
                                sample_size=400, iters=3)
    with pytest.raises(ValueError, match="query dim"):
        idx.search_numpy(np.zeros((1, 9)), 3)
    qdf = spark.createDataFrame(
        [(int(i), [float(v) for v in Q[i]]) for i in range(len(Q))],
        "qid long, vec array<double>",
    )
    import pytest as _pt
    orig = knn_mod._MAX_BROADCAST_ELEMS
    try:
        knn_mod._MAX_BROADCAST_ELEMS = 1000
        with pytest.raises(ValueError, match="chunked_queries"):
            rq_mod.ivfrq_search(idx.codes, idx.centroids, idx.codebooks,
                                qdf, 3, 4)
        with pytest.raises(ValueError, match="chunked_queries"):
            rq_mod.ivfrq_range_search(idx.codes, idx.centroids,
                                      idx.codebooks, qdf, 1.0, 4)
    finally:
        knn_mod._MAX_BROADCAST_ELEMS = orig
    stale = idx.codebooks[:2]
    with pytest.raises(Exception, match="code width"):
        rq_mod.ivfrq_search(idx.codes, idx.centroids, stale, qdf, 3, 4).collect()
    # empty queries
    empty = idx.search(
        spark.createDataFrame([], "qid long, vec array<double>"), 3
    )
    assert empty.count() == 0


def test_sel_and_max_codes(spark):
    """faiss SearchParametersIVF on the additive file: `sel` restricts
    candidates to the selected ids (≡ search over the subsetted code
    table); `max_codes=1` behaves like nprobe=1 (the first probed list
    always scans), a huge bound is unrestricted."""
    from faiss_metal_spark.vector_table import IDSelectorRange

    V, Q = make_fixture(500, 4, 8)
    idx = IVFRQIndex.from_table(_table(spark, V), n_cells=8, m=3,
                                sample_size=500, iters=4)
    # sel: results ≡ full search with non-selected rows removed
    D0, L0 = idx.search_numpy(Q, 5, nprobe=8, sel=IDSelectorRange(0, 250))
    assert (L0[L0 >= 0] < 250).all()
    ids, cells, codes, _ = _collect_codes(idx)
    keep = ids < 250
    R = _recon(idx, cells, codes)[keep]
    De, Le = _oracle_topk(R, Q, 5)
    np.testing.assert_array_equal(L0, ids[keep][Le])
    np.testing.assert_allclose(D0, De, atol=1e-9)

    # max_codes: 1 ≡ nprobe=1; huge ≡ unrestricted
    D1, L1 = idx.search_numpy(Q, 5, nprobe=8, max_codes=1)
    D2, L2 = idx.search_numpy(Q, 5, nprobe=1)
    np.testing.assert_array_equal(L1, L2)
    np.testing.assert_allclose(D1, D2, atol=1e-12)
    D3, L3 = idx.search_numpy(Q, 5, nprobe=8, max_codes=10**9)
    D4, L4 = idx.search_numpy(Q, 5, nprobe=8)
    np.testing.assert_array_equal(L3, L4)
    idx.release()
