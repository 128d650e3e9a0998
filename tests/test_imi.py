"""IMIIndex — faiss MultiIndexQuantizer inverted multi-index parity.

Contract model (faiss IndexIVFFlat over MultiIndexQuantizer,
index_factory "IMI2x<b>": composite cell = two independent b-bit
half-space quantizers, probe ranking = sum of the two per-half
distance tables; the reference has no coarse quantizer at all —
/root/reference/include/faiss-metal/MetalIndexFlat.h:47). Pins:

- assignment is numpy-exact (per-half argmin by the cn − 2vc
  decomposition, composite id a0·|C1| + a1);
- FULL probe (nprobe = 4^b) degrades to exact flat search exactly
  (labels and distances);
- partial-probe candidates come only from probed cells (no false
  positives relative to the probe set) and recall grows with nprobe;
- frozen-state add ≡ one-shot assignment; IO kind 'imi' round-trips
  with the cell-partitioned layout.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faiss_metal_spark import IMIIndex, VectorTable, read_index, write_index
from faiss_metal_spark.compact_index import index_factory

from conftest import make_fixture, numpy_oracle


def _table(spark, V) -> VectorTable:
    vt = VectorTable(spark, V.shape[1], metric="l2")
    return vt.add_numpy(V)


def _numpy_assign(V, C0, C1):
    dh = C0.shape[1]
    V = np.asarray(V, np.float64)
    a0 = ((C0 * C0).sum(1)[None, :] - 2.0 * (V[:, :dh] @ C0.T)).argmin(1)
    a1 = ((C1 * C1).sum(1)[None, :] - 2.0 * (V[:, dh:] @ C1.T)).argmin(1)
    return a0 * len(C1) + a1


def test_assignment_matches_numpy(spark):
    V, _ = make_fixture(300, 1, 16)
    idx = IMIIndex.from_table(_table(spark, V), b=3, sample_size=300)
    assert idx.nlist == 64
    got = {r["id"]: r["cell"] for r in idx.assigned.collect()}
    want = _numpy_assign(V, idx.C0, idx.C1)
    for i in range(300):
        assert got[i] == want[i]


def test_full_probe_equals_flat(spark):
    V, Q = make_fixture(250, 5, 16)
    vt = _table(spark, V)
    idx = IMIIndex.from_table(vt, b=2, sample_size=250)  # 16 cells
    D, L = idx.search_numpy(Q, 10, nprobe=idx.nlist)
    D_e, L_e = numpy_oracle(V, Q, 10)
    np.testing.assert_array_equal(L, L_e)
    np.testing.assert_allclose(D, D_e, atol=1e-9)


def test_partial_probe_subset_and_recall_grows(spark):
    V, Q = make_fixture(400, 6, 16)
    idx = IMIIndex.from_table(_table(spark, V), b=3, sample_size=400)
    cells = {r["id"]: r["cell"] for r in idx.assigned.collect()}
    from faiss_metal_spark.operators.similarity import imi_probe_cells

    probe = imi_probe_cells(idx.C0, idx.C1)(Q.astype(np.float64))
    _, L2 = idx.search_numpy(Q, 10, nprobe=2)
    for i in range(len(Q)):
        probed = set(probe[i, :2].tolist())
        for lab in L2[i]:
            if lab >= 0:
                assert cells[int(lab)] in probed  # only probed cells

    _, L_exact = numpy_oracle(V, Q, 10)

    def recall(L):
        return np.mean(
            [len(set(L[i]) & set(L_exact[i])) / 10 for i in range(len(Q))]
        )

    _, L16 = idx.search_numpy(Q, 10, nprobe=16)
    assert recall(L16) >= recall(L2) - 1e-9
    _, L_all = idx.search_numpy(Q, 10, nprobe=idx.nlist)
    assert recall(L_all) == 1.0


def test_add_reconstruct_roundtrip_factory(spark, tmp_path):
    V, Q = make_fixture(300, 3, 16)
    vt = _table(spark, V)
    idx = index_factory(vt, "IMI2x3", sample_size=300)
    assert isinstance(idx, IMIIndex) and idx.nlist == 64

    idx.add_numpy(V[:4] + 0.01, ids=np.arange(300, 304))
    assert idx.ntotal == 304
    added = {r["id"]: r["cell"] for r in idx.assigned.where(F.col("id") >= 300).collect()}
    want = _numpy_assign(V[:4] + 0.01, idx.C0, idx.C1)
    assert [added[300 + i] for i in range(4)] == want.tolist()

    np.testing.assert_allclose(
        idx.reconstruct(7), V[7].astype(np.float64), atol=1e-6
    )
    with pytest.raises(KeyError):
        idx.reconstruct(99999)

    D0, L0 = idx.search_numpy(Q, 5, nprobe=8)
    write_index(idx, str(tmp_path / "imi"))
    idx2 = read_index(spark, str(tmp_path / "imi"))
    assert isinstance(idx2, IMIIndex) and (idx2.b, idx2.ntotal) == (3, 304)
    D1, L1 = idx2.search_numpy(Q, 5, nprobe=8)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_allclose(D0, D1, atol=1e-12)

    assert idx.remove_ids([300, 99999]) == 1

    with pytest.raises(ValueError):
        IMIIndex.from_table(_table(spark, make_fixture(50, 1, 15)[0]), b=2)


def test_merge_from_shifts_and_refuses(spark):
    V, _ = make_fixture(400, 1, 16)
    vt = _table(spark, V)
    a = IMIIndex.from_table(vt, b=2, sample_size=400)
    b_idx = IMIIndex(spark, a.d, a.b, a.C0, a.C1,
                     a.assigned.where(F.col("id") < 50).persist(), 50)
    n0 = a.ntotal
    a.merge_from(b_idx, add_id=1000)
    assert a.ntotal == n0 + 50 and b_idx.ntotal == 0
    assert a.assigned.where(F.col("id") >= 1000).count() == 50

    other = IMIIndex.from_table(vt, b=2, sample_size=300)
    if not np.array_equal(other.C0, a.C0):
        with pytest.raises(ValueError, match="trained state"):
            a.merge_from(other)


def test_refine_index_wraps_any_base(spark):
    """RefineIndex (faiss IndexRefineFlat over any base): exact-L2
    re-rank of the base's candidates — recall ≥ the base's at the same
    k, distances are exact, and any tier (IMI here, LSH too) can be
    the base."""
    from faiss_metal_spark import LSHIndex, RefineIndex

    V, Q = make_fixture(400, 6, 16)
    vt = _table(spark, V)
    _, L_exact = numpy_oracle(V, Q, 10)

    def recall(L):
        return np.mean(
            [len(set(L[i]) & set(L_exact[i])) / 10 for i in range(len(Q))]
        )

    imi = IMIIndex.from_table(vt, b=3, sample_size=400)
    ref = RefineIndex.from_table(vt, imi, k_factor=4)
    D_b, L_b = imi.search_numpy(Q, 10, nprobe=8)
    D_r, L_r = ref.search_numpy(Q, 10, nprobe=8)
    assert recall(L_r) >= recall(L_b) - 1e-9
    for i in range(len(Q)):
        for j in range(10):
            if L_r[i, j] >= 0:
                true = ((Q[i].astype(np.float64) - V[L_r[i, j]].astype(np.float64)) ** 2).sum()
                assert abs(D_r[i, j] - true) < 1e-6

    lsh = LSHIndex.from_table(vt, nbits=32, seed=3)
    ref2 = RefineIndex.from_table(vt, lsh, k_factor=8)
    _, L_r2 = ref2.search_numpy(Q, 10)
    _, L_l = lsh.search_numpy(Q, 10)
    assert recall(L_r2) >= recall(L_l) - 1e-9
