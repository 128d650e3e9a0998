"""Round-13 ADVICE closures, each pinned at its anchor:

1. ``RefineIndex.search`` rescoring runs in the BASE's metric (faiss
   ``IndexRefine`` re-ranks in the index's own metric_type) — an
   IP-metric base returns dot-product-ranked rows, not L2-ranked
   (compact_index.py, RefineIndex.search).
2. ``c4_clean_lines`` marker boundaries: ``\\b`` is added only where the
   marker edge is a word character, so a caller-supplied marker that
   starts/ends with punctuation ('© 2024', 'cookie:') still matches
   (functions/text.py).
3. ``HNSWCoarseQuantizer._beam`` keeps a PER-ROW beam width — one
   converged/degenerate query no longer shrinks the beam of every other
   query in its 1024-row chunk, so assignment/probe output for a vector
   is independent of which other vectors share its batch
   (operators/coarse.py).
"""

import numpy as np

from faiss_metal_spark import HNSWCoarseQuantizer, RefineIndex, VectorTable


def _clustered(n, d, seed=5, rank=8):
    rng = np.random.default_rng(seed)
    B = rng.normal(size=(rank, d))
    return (
        rng.normal(size=(n, rank)) @ B + 0.2 * rng.normal(size=(n, d))
    ).astype(np.float32)


# -- 1. Refine rescoring in the base metric --------------------------------


def test_refine_rescored_in_base_metric_ip(spark):
    rng = np.random.default_rng(11)
    V = rng.normal(size=(300, 12)).astype(np.float32)
    Q = rng.normal(size=(6, 12)).astype(np.float32)
    vt = VectorTable(spark, 12, metric="ip").add_numpy(V)
    ref = RefineIndex.from_table(vt, vt, k_factor=2)
    D, L = ref.search_numpy(Q, 5)
    # the exact IP answer: largest dot first, (score desc, id asc) ties
    S = Q.astype(np.float64) @ V.astype(np.float64).T
    for i in range(len(Q)):
        order = np.lexsort((np.arange(len(V)), -S[i]))[:5]
        assert L[i].tolist() == order.tolist()
        np.testing.assert_allclose(D[i], S[i][order], rtol=1e-5)
    # descending distances — IP ranks by similarity, not L2
    assert (np.diff(D, axis=1) <= 1e-9).all()
    vt.unpersist()


def test_refine_rejects_unknown_metric(spark):
    rng = np.random.default_rng(12)
    V = rng.normal(size=(50, 8)).astype(np.float32)
    vt = VectorTable(spark, 8).add_numpy(V)
    ref = RefineIndex.from_table(vt, vt, k_factor=2)
    ref.base = type("Fake", (), {"metric": "hamming", "search": None})()
    try:
        import pytest

        with pytest.raises(ValueError, match="hamming"):
            ref.search(vt.spark.createDataFrame([], "qid long, vec array<float>"), 3)
    finally:
        vt.unpersist()


# -- 2. c4_clean_lines marker edges -----------------------------------------


def test_c4_marker_with_nonword_edges(spark):
    from faiss_metal_spark.functions.text import c4_clean_lines

    import pyspark.sql.functions as F

    doc = "\n".join(
        [
            "this page is © 2024 example corp and fully reserved.",
            "our cookie: banner is annoying but the site works fine.",
            "this perfectly ordinary sentence survives the cleaner.",
            "the javascript is required to view this page properly.",
            "her javascripting hobby survives the whole word match.",
        ]
    )
    df = spark.createDataFrame([(doc,)], ["text"])
    out = df.select(
        c4_clean_lines(
            "text", bad_markers=["© 2024", "cookie:", "javascript"]
        ).alias("t")
    ).collect()[0]["t"]
    lines = out.split("\n")
    assert "this perfectly ordinary sentence survives the cleaner." in lines
    # punctuation-edged markers now match (old \b...\b could never)
    assert not any("© 2024" in ln for ln in lines)
    assert not any("cookie:" in ln for ln in lines)
    # word-edged markers keep whole-word semantics
    assert not any("javascript is required" in ln for ln in lines)
    assert any("javascripting" in ln for ln in lines)


# -- 3. per-row beam width ---------------------------------------------------


def test_coarse_assignment_batch_independent():
    """A degenerate co-resident (an exact centroid copy, converged in
    round 1) must not shrink other rows' beams: chunked output rows ==
    the same rows searched alone."""
    C = _clustered(600, 16, seed=3).astype(np.float64)
    q = HNSWCoarseQuantizer.train(C, M=8, seed=7)
    rng = np.random.default_rng(9)
    X = _clustered(64, 16, seed=4).astype(np.float32)
    # plant degenerate queries: exact centroid copies at random slots
    X[5] = C[17].astype(np.float32)
    X[40] = C[2].astype(np.float32)
    cells_b, dists_b = q.search_np(X, 8)
    for i in rng.choice(len(X), size=12, replace=False).tolist() + [5, 40, 6, 41]:
        ci, di = q.search_np(X[i : i + 1], 8)
        assert np.array_equal(cells_b[i], ci[0]), f"row {i} batch-dependent"
        # distances: BLAS reduction order varies with the GEMM batch
        # shape (documented ~1e-5 f32 jitter in coarse.py) — the pin is
        # the CELL SET/ORDER, distances only to that tolerance
        np.testing.assert_allclose(dists_b[i], di[0], rtol=1e-5, atol=1e-4)


def test_coarse_sentinels_only_when_graph_exhausted():
    """Tiny nlist, nprobe == nlist: a row's reachable-cell set is its
    OWN (graph connectivity), never shrunk by a converged co-resident —
    sentinels sit only at the tail, and each row's batched output
    equals its solo output cell-for-cell."""
    rng = np.random.default_rng(21)
    C = rng.normal(size=(24, 8))
    q = HNSWCoarseQuantizer.train(C, M=4, beam=24, rounds=8, seed=1)
    X = rng.normal(size=(40, 8)).astype(np.float32)
    X[0] = C[3].astype(np.float32)  # converged row co-resident
    cells, dists = q.search_np(X, 24)
    for i in range(len(X)):
        row = cells[i]
        real = row[row >= 0]
        assert len(set(real.tolist())) == len(real)
        # sentinels (if the graph walk genuinely exhausted) only at the
        # tail — never interleaved with real cells
        assert (row[: len(real)] >= 0).all() and (row[len(real):] == -1).all()
        ci, _ = q.search_np(X[i : i + 1], 24)
        assert np.array_equal(row, ci[0]), f"row {i} lost cells to a co-resident"
    assert np.isfinite(dists[cells >= 0]).all()
