"""kNN correctness vs exact numpy oracle — the FIXTURES.md e2e matrix.

Mirrors the reference's oracle-comparison strategy
(/root/reference/tests/test_metal_flat.mm): top-1 label exact, remaining
ranks distance-tolerance with tie-tolerant labels, plus the invariants
list (ordering, label domain, sentinel placement, async ≡ sync).
"""

import math

import numpy as np
import pytest

from conftest import make_fixture, numpy_oracle, queries_df, vectors_df
from faiss_metal_spark.operators.knn import knn_search


def run_engine(spark, V, Q, k, metric="l2", method="gemm"):
    res = (
        knn_search(vectors_df(spark, V), queries_df(spark, Q), k, metric=metric, method=method)
        .orderBy("qid", "rank")
        .toPandas()
    )
    nq = len(Q)
    D = res["distance"].to_numpy(np.float64).reshape(nq, k)
    L = res["label"].to_numpy(np.int64).reshape(nq, k)
    return D, L


def check_against_oracle(V, Q, k, D, L, metric="l2", rtol=1e-3):
    oD, oL = numpy_oracle(V, Q, k, metric)
    kk = min(k, len(V))
    # top-1 label exact (hard assert — test_metal_flat.mm:51-58)
    if kk > 0:
        assert (L[:, 0] == oL[:, 0]).all(), "top-1 label mismatch"
    # distances within tolerance at every real rank
    scale = np.maximum(np.abs(oD[:, :kk]), 1e-9)
    assert (np.abs(D[:, :kk] - oD[:, :kk]) / scale < rtol).all()
    # padded ranks: sentinel
    sent = math.inf if metric in ("l2", "l1") else -math.inf
    assert (D[:, kk:] == sent).all()
    assert (L[:, kk:] == -1).all()
    # invariant 1: rank ordering monotone among real ranks
    diffs = np.diff(D[:, :kk], axis=1)
    if metric in ("l2", "l1"):
        assert (diffs >= -1e-12).all()
    else:
        assert (diffs <= 1e-12).all()
    # invariant 2: labels in range, no dup labels per query
    for row in L[:, :kk]:
        assert ((row >= 0) & (row < len(V))).all()
        assert len(set(row.tolist())) == kk


# The reference e2e matrix (FIXTURES T1-T5, T8) on both physical paths.
MATRIX = [
    ("l2_32d", 1000, 10, 32, 5, "l2"),
    ("l2_128d", 1000, 10, 128, 10, "l2"),
    ("l2_768d", 500, 5, 768, 5, "l2"),
    ("ip_128d", 1000, 10, 128, 10, "ip"),
    ("l1_64d", 1000, 10, 64, 10, "l1"),
    ("edge_single", 100, 1, 32, 1, "l2"),
]


@pytest.mark.parametrize("method", ["gemm", "sql"])
@pytest.mark.parametrize("name,nv,nq,d,k,metric", MATRIX)
def test_knn_matrix(spark, name, nv, nq, d, k, metric, method):
    V, Q = make_fixture(nv, nq, d)
    D, L = run_engine(spark, V, Q, k, metric, method)
    rtol = 1e-3 if metric == "l2" else 1e-2
    check_against_oracle(V, Q, k, D, L, metric, rtol)


def test_knn_1536d(spark):
    V, Q = make_fixture(500, 5, 1536)
    D, L = run_engine(spark, V, Q, 5, "l2", "gemm")
    check_against_oracle(V, Q, 5, D, L, "l2", 1e-3)


def test_highk_beyond_reference(spark):
    """T9: k=100 > 32 — the case the reference never value-checks."""
    V, Q = make_fixture(10000, 10, 128)
    D, L = run_engine(spark, V, Q, 100, "l2", "gemm")
    check_against_oracle(V, Q, 100, D, L, "l2", 1e-3)


def test_cosine_metric(spark):
    V, Q = make_fixture(1000, 10, 64)
    D, L = run_engine(spark, V, Q, 10, "cosine", "gemm")
    check_against_oracle(V, Q, 10, D, L, "cosine", 1e-2)


def test_k_gt_ntotal_sentinels(spark):
    """T12: k clamp + sentinel padding (MetalIndexFlat.mm:336-337,387-399)."""
    V, Q = make_fixture(3, 2, 8)
    for method in ("gemm", "sql"):
        D, L = run_engine(spark, V, Q, 5, "l2", method)
        check_against_oracle(V, Q, 5, D, L, "l2", 1e-3)
        assert (L[:, 3:] == -1).all()
        assert np.isinf(D[:, 3:]).all()


def test_empty_index(spark):
    """T11: empty index → all sentinels, no error (MetalIndexFlat.mm:328-334)."""
    import pandas as pd

    from faiss_metal_spark.vector_table import VECTOR_SCHEMA

    _, Q = make_fixture(1, 1, 32)
    empty = spark.createDataFrame([], VECTOR_SCHEMA)
    res = (
        knn_search(empty, queries_df(spark, Q), 5).orderBy("qid", "rank").toPandas()
    )
    assert len(res) == 5
    assert (res["label"] == -1).all()
    assert np.isinf(res["distance"]).all()


def test_empty_queries(spark):
    V, _ = make_fixture(10, 1, 8)
    q = queries_df(spark, np.zeros((0, 8), np.float32))
    assert knn_search(vectors_df(spark, V), q, 3).count() == 0


def test_k_zero_raises(spark):
    V, Q = make_fixture(4, 1, 4)
    with pytest.raises(ValueError):
        knn_search(vectors_df(spark, V), queries_df(spark, Q), 0)


def test_paths_agree(spark):
    """gemm and sql physical paths produce identical labels and close
    distances (≙ default-vs-forced-MPS cross-check,
    test_metal_distance.mm:233-337). The f64 gemm run pins exactness
    against the declarative (double HOF) path; the default f32 run pins
    that the fast path keeps identical labels at fp32 tolerance."""
    V, Q = make_fixture(800, 8, 48)
    vdf, qdf = vectors_df(spark, V), queries_df(spark, Q)

    def run(method, compute):
        res = (
            knn_search(vdf, qdf, 7, metric="l2", method=method, compute=compute)
            .orderBy("qid", "rank")
            .toPandas()
        )
        return (
            res["distance"].to_numpy(np.float64).reshape(8, 7),
            res["label"].to_numpy(np.int64).reshape(8, 7),
        )

    Ds, Ls = run("sql", "auto")
    Dg64, Lg64 = run("gemm", "f64")
    assert (Lg64 == Ls).all()
    assert np.allclose(Dg64, Ds, rtol=1e-9)
    Dg32, Lg32 = run("gemm", "auto")  # library default = f32 accumulators
    assert (Lg32 == Ls).all()
    assert np.allclose(Dg32, Ds, rtol=1e-4)


def test_two_level_merge_at_extreme_partition_counts(spark):
    """parts·k above the gate inserts a salted partial merge; results
    must be identical to the single-level merge and the numpy oracle,
    and the plan must show one extra aggregate only above the gate."""
    from faiss_metal_spark.operators import knn as knn_mod

    # r15: cross the parts·k gate with 131 partitions × k=501 instead
    # of 701 × k=100 — same gate semantics (131·501 = 65,631 > 65,536;
    # plain k=10 → 1,310 stays under), a fifth of the per-task
    # scheduling floor this test pays (it was 28 s of the suite)
    V, Q = make_fixture(4000, 5, 32)
    vdf = vectors_df(spark, V).repartition(131).persist()
    qdf = queries_df(spark, Q)
    try:
        res = (
            knn_search(vdf, qdf, 501, metric="l2", method="gemm")
            .orderBy("qid", "rank")
            .toPandas()
        )
        D = res["distance"].to_numpy(np.float64).reshape(5, 501)
        L = res["label"].to_numpy(np.int64).reshape(5, 501)
        check_against_oracle(V, Q, 501, D, L, "l2", 1e-3)
        # the salted plan has two HashAggregate pairs on qid paths; the
        # un-gated k=10 plan (131*10 < gate) has one partial stage less
        gated = knn_search(vdf, qdf, 501, metric="l2", method="gemm")
        plain = knn_search(vdf, qdf, 10, metric="l2", method="gemm")
        assert "_salt" in gated._jdf.queryExecution().optimizedPlan().toString()
        assert "_salt" not in plain._jdf.queryExecution().optimizedPlan().toString()
    finally:
        vdf.unpersist()


def test_multi_metric_equals_per_metric(spark):
    """knn_search_multi ≡ four independent knn_search calls, from ONE
    scan (exactly one Arrow python-map node in the plan)."""
    from faiss_metal_spark.operators.knn import knn_search_multi

    V, Q = make_fixture(2000, 6, 48)
    vdf, qdf = vectors_df(spark, V), queries_df(spark, Q)
    multi = knn_search_multi(vdf, qdf, 7)
    got = multi.orderBy("metric", "qid", "rank").toPandas()
    for m in ("l2", "ip", "cosine", "l1"):
        want = (
            knn_search(vdf, qdf, 7, metric=m, method="gemm")
            .orderBy("qid", "rank")
            .toPandas()
        )
        sub = got[got["metric"] == m].reset_index(drop=True)
        assert (sub["label"].to_numpy() == want["label"].to_numpy()).all(), m
        np.testing.assert_allclose(
            sub["distance"].to_numpy(), want["distance"].to_numpy(), rtol=1e-12
        )
    plan = multi._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") == 1


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine", "l1"])
def test_range_search_paths_agree_and_match_numpy(spark, metric):
    """range_search: gemm and sql paths emit the identical pair set,
    matching a numpy reference with FAISS's strict keep rule (< radius
    for min-metrics, > radius for max-metrics)."""
    from faiss_metal_spark.operators.knn import range_search

    V, Q = make_fixture(400, 5, 24)
    vdf, qdf = vectors_df(spark, V), queries_df(spark, Q)

    Vd, Qd = V.astype(np.float64), Q.astype(np.float64)
    if metric == "l2":
        D = np.maximum(
            (Qd * Qd).sum(1)[:, None] + (Vd * Vd).sum(1)[None, :]
            - 2.0 * (Qd @ Vd.T),
            0.0,
        )
    elif metric == "ip":
        D = Qd @ Vd.T
    elif metric == "cosine":
        U = Vd / np.linalg.norm(Vd, axis=1, keepdims=True)
        W = Qd / np.linalg.norm(Qd, axis=1, keepdims=True)
        D = W @ U.T
    else:
        D = np.abs(Qd[:, None, :] - Vd[None, :, :]).sum(-1)
    want_min = metric in ("l2", "l1")
    radius = float(np.quantile(D, 0.03)) if want_min else float(np.quantile(D, 0.97))
    mask = D < radius if want_min else D > radius
    want = {
        (qi, vi): D[qi, vi] for qi, vi in zip(*np.nonzero(mask))
    }
    assert want, "radius produced no pairs — bad fixture"

    for method in ("gemm", "sql"):
        # f64 pins exact pair-set equality with the double oracle (the
        # boundary pairs are precision-sensitive by construction)
        got = range_search(
            vdf, qdf, radius, metric=metric, method=method, compute="f64"
        ).toPandas()
        got_pairs = {
            (int(r.qid), int(r.label)): r.distance for r in got.itertuples()
        }
        assert set(got_pairs) == set(want), method
        for kk in want:
            assert abs(got_pairs[kk] - want[kk]) < 1e-9, (method, kk)

    # default f32 path: distances at fp32 tolerance; pair set may only
    # differ on pairs within fp32 eps of the radius boundary
    got32 = range_search(vdf, qdf, radius, metric=metric, method="gemm").toPandas()
    for r in got32.itertuples():
        true_d = D[int(r.qid), int(r.label)]
        assert abs(r.distance - true_d) <= 1e-3 * max(1.0, abs(true_d))
        edge = abs(true_d - radius) <= 1e-3 * max(1.0, abs(radius))
        assert ((int(r.qid), int(r.label)) in want) or edge


def test_range_search_empty_and_shuffle_free(spark):
    """Radius below every distance → zero rows (no sentinels — FAISS
    range semantics); the gemm path plan has no shuffle at all."""
    from faiss_metal_spark.operators.knn import range_search
    from faiss_metal_spark.plans.report import assert_plan

    V, Q = make_fixture(300, 3, 16)
    vdf, qdf = vectors_df(spark, V), queries_df(spark, Q)
    r = range_search(vdf, qdf, 1e-9, metric="l2", method="gemm")
    assert r.count() == 0
    assert_plan(r, max_shuffles=0)


def test_chunked_queries_exact_and_beats_broadcast_ceiling(spark, monkeypatch):
    """chunked_queries(fn) over disjoint query chunks equals the
    single-shot search row-for-row, and succeeds where the query
    broadcast guard makes the single shot refuse."""
    from faiss_metal_spark.operators import knn as knn_mod
    from faiss_metal_spark.operators.chunked import chunked_queries
    from faiss_metal_spark.operators.knn import knn_search

    V, Q = make_fixture(300, 24, 16)
    vdf, qdf = vectors_df(spark, V), queries_df(spark, Q)
    key = ["qid", "rank"]

    def norm(df):
        return df.sort_values(key).reset_index(drop=True)

    def same(a, b):
        # labels/ranks exact; distances to fp tolerance (per-chunk GEMM
        # blocking differs from the full batch at the last ulp)
        a, b = norm(a), norm(b)
        assert (a[["qid", "rank", "label"]].values == b[["qid", "rank", "label"]].values).all()
        assert np.allclose(a.distance.values, b.distance.values)

    single = knn_search(vdf, qdf, 5).toPandas()
    same(single, chunked_queries(qdf, 7, lambda c: knn_search(vdf, c, 5)).toPandas())

    # force the ceiling low enough that 24 queries x 16 dims exceed it
    monkeypatch.setattr(knn_mod, "_MAX_BROADCAST_ELEMS", 200)
    with pytest.raises(ValueError, match="too large to broadcast"):
        knn_search(vdf, qdf, 5).count()
    same(single, chunked_queries(qdf, 10, lambda c: knn_search(vdf, c, 5)).toPandas())


def test_compute_default_is_f32(spark):
    """The library default (compute='auto') must stay float32 — the
    reference's accumulator width and the 100 TB fast path. Pin: on a
    wide fixture the auto run is bitwise-identical to an explicit f32
    run and NOT bitwise-identical to f64 (if someone flips the default
    back to f64, auto ≡ f64 and this fails)."""
    V, Q = make_fixture(500, 4, 256)
    vdf, qdf = vectors_df(spark, V), queries_df(spark, Q)

    def run(compute):
        return (
            knn_search(vdf, qdf, 5, metric="l2", method="gemm", compute=compute)
            .orderBy("qid", "rank")
            .toPandas()["distance"]
            .to_numpy(np.float64)
        )

    auto, f32, f64 = run("auto"), run("f32"), run("f64")
    np.testing.assert_array_equal(auto, f32)
    assert not np.array_equal(auto, f64)
    np.testing.assert_allclose(auto, f64, rtol=1e-4)


def test_finalize_broadcast_gate(spark, monkeypatch):
    """Below the nq·k gate the merge join broadcasts the packed side;
    above it the hint is withheld (planner's choice — never a hard
    broadcast failure) with identical results."""
    from faiss_metal_spark.operators import knn as knn_mod

    V, Q = make_fixture(300, 6, 16)
    vdf, qdf = vectors_df(spark, V), queries_df(spark, Q)
    small = knn_search(vdf, qdf, 5).orderBy("qid", "rank").toPandas()
    monkeypatch.setattr(knn_mod, "_BROADCAST_MERGE_ELEMS", 10)  # 6*5 > 10
    big = knn_search(vdf, qdf, 5).orderBy("qid", "rank").toPandas()
    import pandas as pd

    pd.testing.assert_frame_equal(small, big)
