"""Polysemous codes — faiss IndexPQ polysemous training parity.

faiss contract (PolysemousTraining + IndexPQ::search ST_polysemous,
Douze et al. ECCV 2016; the reference engine has no PQ tier —
/root/reference/include/faiss-metal/MetalIndexFlat.h:47): training
permutes each subquantizer's codewords so Hamming(code bits) tracks
codeword distance; codes + codebooks relabel TOGETHER, so every
distance-visible quantity is unchanged; at search time ht bounds which
codes get ADC-evaluated, never perturbing a returned distance.

Pinned here:
- training returns true permutations and improves the Hamming↔distance
  alignment score;
- relabeling is invisible: reconstruct + plain search bit-identical
  before/after, sa-decode of remapped codes unchanged;
- the gate is STRICT (faiss search_core_polysemous: hd < polysemous_ht):
  ht = m·nbits + 1 ≡ plain ADC search exactly (labels AND distances —
  faiss's own accept-all default), ht = 0 admits nothing;
- ht = 1 returns only codes EQUAL to the query's own code;
- filter semantics: every returned label's stored code is strictly
  within ht bits of the query code (numpy re-derivation);
- determinism for fixed seed.
"""

import numpy as np
import pytest

from faiss_metal_spark import PQIndex, VectorTable
from faiss_metal_spark.operators.polysemous import (
    apply_polysemous,
    hamming_reproduction_score,
    polysemous_train_books,
)

from conftest import make_fixture


def _table(spark, V):
    return VectorTable(spark, V.shape[1]).add_numpy(V)


def _build(spark, V, m=4, nbits=4):
    return PQIndex.from_table(_table(spark, V), m=m, nbits=nbits, sample_size=len(V))


def test_train_is_permutation_and_improves_alignment(spark):
    V, _ = make_fixture(300, 1, 16, seed=801)
    idx = _build(spark, V, m=4, nbits=4)
    perms = polysemous_train_books(idx.codebooks, n_iter=8_000, seed=5)
    m, ksub, _ = idx.codebooks.shape
    assert perms.shape == (m, ksub)
    for j in range(m):
        assert sorted(perms[j].tolist()) == list(range(ksub))
    before = hamming_reproduction_score(idx.codebooks)
    new_books, _ = apply_polysemous(idx.codebooks, idx.codes, perms)
    after = hamming_reproduction_score(new_books)
    assert after > before, (before, after)
    # determinism
    perms2 = polysemous_train_books(idx.codebooks, n_iter=8_000, seed=5)
    np.testing.assert_array_equal(perms, perms2)


def test_relabeling_is_distance_invisible(spark):
    V, Q = make_fixture(250, 4, 16, seed=802)
    idx = _build(spark, V, m=4, nbits=4)
    D0, L0 = idx.search_numpy(Q, 5)
    rec0 = idx.reconstruct(7)
    codes0 = {r["id"]: bytes(r["code"]) for r in idx.codes.collect()}
    idx.polysemous_train(n_iter=6_000, seed=9)
    D1, L1 = idx.search_numpy(Q, 5)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_allclose(D0, D1, rtol=0, atol=1e-12)
    np.testing.assert_allclose(idx.reconstruct(7), rec0, atol=1e-12)
    # codes really changed bit patterns (relabeling happened)...
    codes1 = {r["id"]: bytes(r["code"]) for r in idx.codes.collect()}
    assert any(codes0[i] != codes1[i] for i in codes0)
    # ...but decode to the same vectors
    from faiss_metal_spark.operators.pq import pq_decode_np

    ids = sorted(codes0)
    old = pq_decode_np(
        np.stack([np.frombuffer(codes0[i], np.uint8) for i in ids]),
        _OLD_BOOKS[0],
    )
    new = pq_decode_np(
        np.stack([np.frombuffer(codes1[i], np.uint8) for i in ids]),
        idx.codebooks,
    )
    np.testing.assert_allclose(old, new, atol=1e-12)
    idx.release()


_OLD_BOOKS = [None]


@pytest.fixture(autouse=True)
def _capture_books(spark):
    # stash the pre-train books for the decode-equality check above
    orig = PQIndex.polysemous_train

    def wrapper(self, *a, **kw):
        _OLD_BOOKS[0] = self.codebooks.copy()
        return orig(self, *a, **kw)

    PQIndex.polysemous_train = wrapper
    yield
    PQIndex.polysemous_train = orig


def test_ht_full_equals_plain_and_ht_one_is_code_equality(spark):
    V, Q = make_fixture(250, 4, 16, seed=803)
    idx = _build(spark, V, m=4, nbits=4).polysemous_train(n_iter=6_000, seed=9)
    # faiss gate is STRICT hd < ht, so accept-all is m·nbits + 1 (faiss
    # IndexPQ's own polysemous_ht default)
    full = idx.nbits * 4 + 1
    Dp, Lp = idx.search_numpy(Q, 5)
    Dh, Lh = idx.search_numpy(Q, 5, ht=full)
    np.testing.assert_array_equal(Lp, Lh)
    np.testing.assert_allclose(Dp, Dh, atol=1e-12)

    # ht=0 admits NOTHING under the strict gate (faiss: hd < 0 never)
    D0, L0 = idx.search_numpy(Q, 8, ht=0)
    assert (L0 == -1).all()

    # ht=1: survivors are exactly the rows whose stored code equals the
    # query's own code (hd < 1 ⇔ hd == 0)
    from faiss_metal_spark.operators.pq import pq_assign_np

    qc = pq_assign_np(Q.astype(np.float64), idx.codebooks)
    codes = {r["id"]: np.frombuffer(bytes(r["code"]), np.uint8) for r in idx.codes.collect()}
    D1, L1 = idx.search_numpy(Q, 8, ht=1)
    for qi in range(len(Q)):
        got = {int(l) for l in L1[qi] if l >= 0}
        want = {i for i, c in codes.items() if (c == qc[qi]).all()}
        assert got <= want  # top-8 slice of the equal-code set
        assert len(got) == min(8, len(want))
    idx.release()


def test_ht_filter_semantics_and_exact_distances(spark):
    V, Q = make_fixture(300, 3, 16, seed=804)
    idx = _build(spark, V, m=4, nbits=4).polysemous_train(n_iter=6_000, seed=11)
    ht = 6
    from faiss_metal_spark.operators.pq import pq_assign_np, pq_decode_np
    from faiss_metal_spark.operators.polysemous import _POPCOUNT8

    qc = pq_assign_np(Q.astype(np.float64), idx.codebooks)
    rows = {r["id"]: np.frombuffer(bytes(r["code"]), np.uint8) for r in idx.codes.collect()}
    D, L = idx.search_numpy(Q, 5, ht=ht)
    dec = pq_decode_np(np.stack([rows[i] for i in sorted(rows)]), idx.codebooks)
    for qi in range(len(Q)):
        for r in range(5):
            lab = int(L[qi, r])
            if lab < 0:
                continue
            ham = int(_POPCOUNT8[np.bitwise_xor(qc[qi], rows[lab])].sum())
            assert ham < ht, (lab, ham)  # strict, like faiss hd < polysemous_ht
            true = float(((Q[qi].astype(np.float64) - dec[lab]) ** 2).sum())
            assert abs(D[qi, r] - true) < 1e-9
        # numpy re-derivation of the whole result row
        surv = [i for i, c in rows.items() if _POPCOUNT8[np.bitwise_xor(qc[qi], c)].sum() < ht]
        want = sorted(
            ((float(((Q[qi].astype(np.float64) - dec[i]) ** 2).sum()), i) for i in surv)
        )[:5]
        got = [(float(D[qi, r]), int(L[qi, r])) for r in range(min(5, len(want)))]
        for (wd, wi), (gd, gi) in zip(want, got):
            assert gi == wi and abs(gd - wd) < 1e-9
    idx.release()


def test_apply_polysemous_rejects_non_permutation(spark):
    V, _ = make_fixture(100, 1, 16, seed=805)
    idx = _build(spark, V, m=4, nbits=4)
    bad = np.zeros((4, 16), dtype=np.int64)  # all-zero: not a bijection
    with pytest.raises(ValueError, match="not a permutation"):
        apply_polysemous(idx.codebooks, idx.codes, bad)
    with pytest.raises(ValueError, match="perms shape"):
        apply_polysemous(idx.codebooks, idx.codes, np.zeros((2, 16), np.int64))
    idx.release()


def test_tune_polysemous_ht(spark):
    """ParameterSpace sweep over polysemous_ht: returns the smallest ht
    meeting the recall target vs the index's own plain ADC baseline;
    the curve is monotone-ish in ht and the chosen point meets the
    target."""
    from faiss_metal_spark.functions.evaluate import tune_polysemous_ht

    V, Q = make_fixture(300, 6, 16, seed=806)
    idx = _build(spark, V, m=4, nbits=4).polysemous_train(n_iter=6_000, seed=7)
    out = tune_polysemous_ht(idx, _qdf(spark, Q), k=5, target_recall=0.9)
    assert out["points"], out
    bits = 4 * idx.nbits
    assert 0 < out["ht"] <= bits + 1  # strict gate: accept-all is bits+1
    # the chosen point meets the target (or is the accept-all fallback)
    last = out["points"][-1]
    assert last["recall"] >= 0.9 or out["ht"] == bits + 1
    # sanity: recall at the chosen ht really is >= target when not the
    # fallback — re-measure independently
    if out["ht"] <= bits:
        from faiss_metal_spark.functions.evaluate import mean_recall

        exact = idx.search(_qdf(spark, Q), 5)
        got = mean_recall(idx.search(_qdf(spark, Q), 5, ht=out["ht"]), exact)
        assert got >= 0.9
    idx.release()


def _qdf(spark, Q):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame({"qid": np.arange(len(Q), dtype=np.int64), "vec": list(Q)}),
        "qid long, vec array<float>",
    )


def test_opq_polysemous_composes_through_rotation(spark):
    """faiss IndexPreTransform(OPQ, IndexPQ) + polysemous: the reorder
    runs in rotated space — plain search is bit-identical after
    training, ht=max ≡ plain exactly, and a moderate ht keeps the
    self-hit (rotation is an isometry, so the query's own code always
    passes at Hamming 0)."""
    from faiss_metal_spark import OPQIndex

    V, Q = make_fixture(250, 4, 16, seed=807)
    idx = OPQIndex.from_table(_table(spark, V), m=4, nbits=4, sample_size=250)
    D0, L0 = idx.search_numpy(Q, 5)
    idx.polysemous_train(n_iter=6_000, seed=13)
    D1, L1 = idx.search_numpy(Q, 5)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_allclose(D0, D1, atol=1e-12)
    full = 4 * 4 + 1  # strict gate: accept-all is m·nbits + 1
    Dh, Lh = idx.search_numpy(Q, 5, ht=full)
    np.testing.assert_array_equal(L1, Lh)
    np.testing.assert_allclose(D1, Dh, atol=1e-12)
    # stored rows searched AT their own vector pass at Hamming 0 (< 1)
    Ds, Ls = idx.search_numpy(V[:4], 1, ht=1)
    assert (Ls[:, 0] >= 0).all()
    idx.release()


def test_ivfpq_polysemous_in_cell_gate(spark):
    """faiss IndexIVFPQ polysemous: residual books + codes relabel
    together (cell column survives — the inverted file stays
    partitioned), plain search is bit-identical after training, the
    full-width gate ≡ plain exactly, and every gated result's stored
    residual code is within ht bits of the query's own residual code
    in that cell (numpy re-derivation)."""
    from faiss_metal_spark import IVFPQIndex
    from faiss_metal_spark.operators.pq import pq_assign_np
    from faiss_metal_spark.operators.polysemous import _POPCOUNT8

    V, Q = make_fixture(300, 4, 16, seed=808)
    idx = IVFPQIndex.from_table(
        _table(spark, V), n_cells=4, m=4, nbits=4, sample_size=300
    )
    D0, L0 = idx.search_numpy(Q, 5, nprobe=4)
    idx.polysemous_train(n_iter=6_000, seed=17)
    assert "cell" in idx.codes.columns  # partition column survived
    D1, L1 = idx.search_numpy(Q, 5, nprobe=4)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_allclose(D0, D1, atol=1e-12)

    full = 4 * 4 + 1  # strict gate: accept-all is m·nbits + 1 (17)
    Dh, Lh = idx.search_numpy(Q, 5, nprobe=4, ht=full)
    np.testing.assert_array_equal(L1, Lh)
    np.testing.assert_allclose(D1, Dh, atol=1e-12)

    ht = 5
    Dt, Lt = idx.search_numpy(Q, 5, nprobe=4, ht=ht)
    rows = {
        r["id"]: (np.frombuffer(bytes(r["code"]), np.uint8), r["cell"])
        for r in idx.codes.collect()
    }
    C = idx.centroids
    for qi in range(len(Q)):
        for r in range(5):
            lab = int(Lt[qi, r])
            if lab < 0:
                continue
            code, cell = rows[lab]
            resid = Q[qi].astype(np.float64) - C[cell]
            qc = pq_assign_np(resid[None, :], idx.codebooks)[0]
            ham = int(_POPCOUNT8[np.bitwise_xor(qc, code)].sum())
            assert ham < ht, (lab, ham)  # strict, like faiss
            # gated results are a subset of the ungated ranking
            assert lab in set(int(x) for x in L1[qi] if x >= 0) or Dt[qi, r] >= D1[qi, 4] - 1e-12
    idx.release()


def test_polysemous_state_survives_io(spark, tmp_path):
    """write_index persists codebooks + codes, which together ARE the
    polysemous state — a reloaded index reproduces both the plain and
    the ht-gated search value-identically."""
    from faiss_metal_spark import read_index, write_index

    V, Q = make_fixture(200, 3, 16, seed=809)
    idx = _build(spark, V, m=4, nbits=4).polysemous_train(n_iter=6_000, seed=19)
    D0, L0 = idx.search_numpy(Q, 5)
    Dt, Lt = idx.search_numpy(Q, 5, ht=6)
    write_index(idx, str(tmp_path / "poly"))
    idx2 = read_index(spark, str(tmp_path / "poly"))
    np.testing.assert_array_equal(idx2.codebooks, idx.codebooks)
    D1, L1 = idx2.search_numpy(Q, 5)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_allclose(D0, D1, atol=1e-12)
    D2, L2 = idx2.search_numpy(Q, 5, ht=6)
    np.testing.assert_array_equal(Lt, L2)
    np.testing.assert_allclose(Dt, D2, atol=1e-12)
    idx.release()
