"""Generalized Refine(<spec>) — faiss ``IndexRefine`` with an
ARBITRARY refine tier (r12; factory ``"...,Refine(SQfp16)"``,
``"...,Refine(PQ<m>)"``, ``"...,Refine(RQ<m>x8)"``).

faiss lets the refine storage be any codec index: the base retrieves
k·k_factor candidates, the refine tier rescores them through ITS OWN
reconstruction, the wrapper re-ranks. RFlat (r8) is the Flat special
case. Pins:

- factory parses the suffix; ``Refine(Flat)`` ≡ ``,RFlat`` exactly;
- the rescored distances are EXACTLY the refine tier's decode
  distances (numpy re-derivation from sa_encode/sa_decode to 1e-6 —
  the SQfp16 decode is f32-rounded);
- recall@k of the refined index ≥ the base's recall@k at equal k
  (the point of refinement) on the fixture where the base is lossy;
- IO round-trip of the wrapper is value-identical (the refine source
  plan materializes into the stored source frame);
- clone carries the refine handle; unsupported refine tiers refuse
  with a clear TypeError.
"""

import numpy as np
import pytest

from faiss_metal_spark import (
    RefineIndex,
    VectorTable,
    clone_index,
    index_factory,
    read_index,
    write_index,
)

from conftest import make_fixture, numpy_oracle


def _vt(spark, V):
    return VectorTable(spark, V.shape[1]).add_numpy(V)


def _recall(L, Le):
    hits = sum(
        len(set(L[i][L[i] >= 0]) & set(Le[i])) for i in range(len(L))
    )
    return hits / Le.size


def test_refine_flat_equals_rflat(spark):
    V, Q = make_fixture(400, 4, 16)
    vt = _vt(spark, V)
    a = index_factory(vt, "PQ4,RFlat", sample_size=400, iters=3)
    b = index_factory(vt, "PQ4,Refine(Flat)", sample_size=400, iters=3)
    Da, La = a.search_numpy(Q, 5)
    Db, Lb = b.search_numpy(Q, 5)
    np.testing.assert_array_equal(La, Lb)
    np.testing.assert_allclose(Da, Db, atol=0)


def test_refine_sqfp16_distances_are_the_decode(spark):
    """Refine(SQfp16): rescored distances ≡ ‖q − fp16_roundtrip(v)‖²
    — the refine tier's reconstruction, not exact L2."""
    V, Q = make_fixture(400, 4, 16)
    vt = _vt(spark, V)
    idx = index_factory(vt, "PQ4,Refine(SQfp16)", sample_size=400,
                        iters=3, k_factor=8)
    assert isinstance(idx, RefineIndex) and idx.refine is not None
    D, L = idx.search_numpy(Q, 5)
    R16 = V.astype(np.float16).astype(np.float64)  # the fp16 decode
    for i in range(len(Q)):
        for j, lab in enumerate(L[i]):
            if lab < 0:
                continue
            want = ((Q[i] - R16[lab]) ** 2).sum()
            assert abs(D[i, j] - want) < 1e-6 * max(1.0, want)


def test_refine_pq_and_rq_decode_distances(spark):
    """Refine(PQ8) / Refine(RQ2x8): rescored distances equal the
    refine tier's own sa_decode distances for the returned labels."""
    V, Q = make_fixture(400, 3, 16)
    vt = _vt(spark, V)
    for spec, refine_spec in (("PQ2", "PQ8"), ("PQ2", "RQ2x8")):
        idx = index_factory(vt, f"{spec},Refine({refine_spec})",
                            sample_size=400, iters=3, k_factor=8)
        ref = idx.refine
        dec = ref.sa_decode(ref.sa_encode(V.astype(np.float64))).astype(
            np.float64
        )
        D, L = idx.search_numpy(Q, 5)
        for i in range(len(Q)):
            for j, lab in enumerate(L[i]):
                if lab < 0:
                    continue
                want = ((Q[i] - dec[lab]) ** 2).sum()
                assert abs(D[i, j] - want) < 1e-6 * max(1.0, want)


def test_refine_improves_recall_over_base(spark):
    """The refinement's purpose: a finer refine tier lifts recall@k of
    a lossy base at equal k."""
    rng = np.random.default_rng(3)
    B = rng.normal(size=(4, 32))
    V = (rng.normal(size=(600, 4)) @ B + 0.05 * rng.normal(size=(600, 32))
         ).astype(np.float32)
    Q = (rng.normal(size=(8, 4)) @ B).astype(np.float64)
    vt = _vt(spark, V)
    base = index_factory(vt, "PQ2", sample_size=600, iters=4)
    refined = index_factory(vt, "PQ2,Refine(SQfp16)", sample_size=600,
                            iters=4, k_factor=8)
    _, Le = numpy_oracle(V.astype(np.float64), Q, 5)
    _, Lb = base.search_numpy(Q, 5)
    _, Lr = refined.search_numpy(Q, 5)
    rb, rr = _recall(Lb, Le), _recall(Lr, Le)
    assert rr >= rb
    assert rr > 0.9  # fp16 rescore is near-exact on this fixture


def test_refine_spec_io_clone_and_refusal(spark, tmp_path):
    V, Q = make_fixture(300, 3, 16)
    vt = _vt(spark, V)
    idx = index_factory(vt, "PQ4,Refine(SQ8)")  # SQ8 takes no train kw
    D0, L0 = idx.search_numpy(Q, 5)

    write_index(idx, str(tmp_path / "ref"))
    idx2 = read_index(spark, str(tmp_path / "ref"))
    assert isinstance(idx2, RefineIndex)
    D1, L1 = idx2.search_numpy(Q, 5)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_allclose(D0, D1, atol=1e-9)

    cl = clone_index(idx)
    assert cl is not idx and cl.refine is idx.refine
    D2, L2 = cl.search_numpy(Q, 5)
    np.testing.assert_array_equal(L0, L2)

    # unsupported refine tier refuses clearly
    with pytest.raises(TypeError, match="fast-scan"):
        index_factory(vt, "PQ4,Refine(PQ4x4fs)", sample_size=300)
    with pytest.raises(TypeError, match="Refine"):
        index_factory(vt, "PQ4,Refine(HNSW4)")
