"""NN-Descent kNN-graph construction — recall / determinism / fixed point.

Iterative algorithm, so no SQL oracle row; these tests are its
correctness pin (COVERAGE.md)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from faiss_metal_spark.operators.knn_graph import nn_descent

from conftest import make_fixture


def _vdf(spark, V):
    return spark.createDataFrame(
        pd.DataFrame({"id": np.arange(len(V)), "vec": [v.tolist() for v in V]}),
        "id long, vec array<float>",
    )


def _exact_graph(V, k):
    Vd = V.astype(np.float64)
    D = ((Vd[:, None, :] - Vd[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(D, np.inf)
    out = {}
    for i in range(len(V)):
        order = np.lexsort((np.arange(len(V)), D[i]))[:k]
        out[i] = set(order.tolist())
    return out


def test_nn_descent_recall(spark):
    V, _ = make_fixture(400, 1, 16, seed=13)
    k = 10
    g = nn_descent(_vdf(spark, V), k=k, iters=4).toPandas()
    assert (g.groupby("id").size() <= k).all()
    assert (g.id != g.nbr).all()
    exact = _exact_graph(V, k)
    hits = sum(
        len(set(grp.nbr.tolist()) & exact[i]) for i, grp in g.groupby("id")
    )
    recall = hits / (len(V) * k)
    assert recall >= 0.9, f"recall {recall:.3f}"


def test_nn_descent_deterministic(spark):
    V, _ = make_fixture(150, 1, 8, seed=3)
    a = nn_descent(_vdf(spark, V), k=5, iters=3).toPandas()
    b = nn_descent(_vdf(spark, V), k=5, iters=3).toPandas()
    key = ["id", "nbr"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.shape == b.shape and (a[key].values == b[key].values).all()
    assert np.allclose(a.dist.values, b.dist.values)


def test_nn_descent_distances_are_exact_l2(spark):
    """The graph's distances must be true FP64 squared-L2 values, not
    approximations — only the neighbor SET is approximate."""
    V, _ = make_fixture(120, 1, 8, seed=7)
    g = nn_descent(_vdf(spark, V), k=5, iters=2).toPandas()
    Vd = V.astype(np.float64)
    for _, r in g.iterrows():
        d = ((Vd[int(r.id)] - Vd[int(r.nbr)]) ** 2).sum()
        assert abs(r.dist - d) < 1e-9


def test_nn_descent_small_n_clamps_k(spark):
    V, _ = make_fixture(4, 1, 4, seed=1)
    g = nn_descent(_vdf(spark, V), k=10, iters=2).toPandas()
    # k clamps to n-1 = 3 and every node reaches everyone: exact graph
    assert (g.groupby("id").size() == 3).all()


# -- graph_search: beam search over the built graph (NSW-style serving) -----

from faiss_metal_spark.operators.knn_graph import graph_search  # noqa: E402

import pytest  # noqa: E402


def _qdf(spark, Q):
    return spark.createDataFrame(
        pd.DataFrame({"qid": range(len(Q)), "vec": [v.tolist() for v in Q]}),
        "qid long, vec array<float>",
    )


def test_graph_search_recall_and_exact_distances(spark):
    """Beam search over the NN-Descent graph: recall@10 ≥ 0.9 vs the
    exact answer, and every returned distance is the true f64 L2² of
    its (query, label) pair — the beam approximates WHICH neighbors
    surface, never their distances."""
    V, Q = make_fixture(400, 8, 16, seed=61)
    vdf, qdf = _vdf(spark, V), _qdf(spark, Q)
    g = nn_descent(vdf, k=10, iters=4)
    res = graph_search(vdf, g, qdf, k=10).toPandas()
    D = ((Q.astype(np.float64)[:, None] - V.astype(np.float64)[None]) ** 2).sum(-1)
    hits = 0
    for qi in range(len(Q)):
        exact = set(np.argsort(D[qi])[:10])
        got = res[(res.qid == qi) & (res.label != -1)]
        hits += len(exact & set(got.label))
        assert np.allclose(
            got.distance.to_numpy(), D[qi][got.label.to_numpy()], rtol=1e-10
        )
        # best-first within the beam's answer
        assert (np.diff(got.sort_values("rank").distance.to_numpy()) >= 0).all()
    assert hits / (len(Q) * 10) >= 0.9


def test_graph_search_deterministic(spark):
    V, Q = make_fixture(250, 4, 12, seed=13)
    vdf, qdf = _vdf(spark, V), _qdf(spark, Q)
    g = nn_descent(vdf, k=8, iters=3)
    a = graph_search(vdf, g, qdf, k=8).toPandas().sort_values(["qid", "rank"])
    b = graph_search(vdf, g, qdf, k=8).toPandas().sort_values(["qid", "rank"])
    assert (a.reset_index(drop=True) == b.reset_index(drop=True)).all().all()


def test_graph_search_sentinels_and_validation(spark):
    V, Q = make_fixture(6, 2, 8, seed=2)
    vdf, qdf = _vdf(spark, V), _qdf(spark, Q)
    g = nn_descent(vdf, k=3, iters=2)
    res = graph_search(vdf, g, qdf, k=10, n_seeds=6).toPandas()
    for qi in range(2):
        got = res[res.qid == qi].sort_values("rank")
        assert len(got) == 10
        # all 6 vectors reachable (seeds cover the corpus) + 4 sentinels
        assert (got.label.to_numpy()[:6] != -1).all()
        assert (got.label.to_numpy()[6:] == -1).all()
        assert np.isinf(got.distance.to_numpy()[6:]).all()
    with pytest.raises(ValueError, match="beam"):
        graph_search(vdf, g, qdf, k=10, beam=5)
    with pytest.raises(ValueError, match="k must be positive"):
        graph_search(vdf, g, qdf, k=0)
    with pytest.raises(ValueError, match="unknown entry"):
        graph_search(vdf, g, qdf, k=3, entry="bogus")

    # faiss IndexHNSW refuses range_search — same explicit refusal
    from faiss_metal_spark import GraphIndex, VectorTable

    idx = GraphIndex.from_table(VectorTable(spark, 8).add_numpy(V), M=3, iters=2)
    with pytest.raises(NotImplementedError, match="range search"):
        idx.range_search(qdf, 1.0)


def test_mrng_diversify_heuristic_and_graph_quality(spark):
    """HNSW shrink_neighbor_list / NSG MRNG edge select: a hand-built
    case pins the keep/drop rule exactly; on clustered data the
    diversified build keeps degree ≤ M, stays deterministic, and beam
    search over it still recalls ≥ 0.8 — the plain-vs-diversified
    quality comparison (diversified reaches ACROSS clusters) is pinned
    structurally: at least one kept edge leaves the node's own cluster."""
    import numpy as np
    import pandas as pd
    from faiss_metal_spark import GraphIndex, VectorTable
    from faiss_metal_spark.operators.knn_graph import graph_search, mrng_diversify

    # hand case: node q at origin; c0 = (1,0) kept (nearest); c1 = (1.2,
    # 0.1) is closer to c0 (0.05) than to q (1.45) -> DROPPED; c2 =
    # (0,1.3) farther from q than c1 but far from c0 -> KEPT.
    node = np.zeros(2, np.float32)
    cand = np.array([[1, 0], [1.2, 0.1], [0, 1.3]], np.float32)
    V = np.vstack([node[None, :], cand])
    vdf = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(4, dtype=np.int64), "vec": list(map(list, V))}),
        "id long, vec array<float>",
    )
    dq = ((cand.astype(np.float64)) ** 2).sum(1)
    gdf = spark.createDataFrame(
        pd.DataFrame({"id": [0, 0, 0], "nbr": [1, 2, 3], "dist": dq}),
        "id long, nbr long, dist double",
    )
    out = mrng_diversify(gdf, vdf, M=3).orderBy("nbr").toPandas()
    assert out["nbr"].tolist() == [1, 3]  # c1 covered by c0, dropped

    # clustered corpus: clusters SMALLER than the 2M candidate width,
    # so candidate lists span clusters and the select can reach across
    rng = np.random.default_rng(11)
    centers = rng.uniform(-10, 10, size=(6, 8))
    X = np.concatenate(
        [c + 0.1 * rng.normal(size=(8, 8)) for c in centers]
    ).astype(np.float32)
    vt = VectorTable(spark, 8).add_numpy(X)
    g = GraphIndex.from_table(vt, M=6, iters=3, diversify=True)
    deg = g.graph.groupBy("id").count().agg(F.max("count")).first()[0]
    assert deg <= 6
    # determinism
    g2 = GraphIndex.from_table(vt, M=6, iters=3, diversify=True)
    e1 = set(map(tuple, g.graph.select("id", "nbr").collect()))
    e2 = set(map(tuple, g2.graph.select("id", "nbr").collect()))
    assert e1 == e2
    # at least one node keeps an edge that LEAVES its own cluster (the
    # diversification effect a plain M-nearest graph suppresses: every
    # node has 7 in-cluster neighbors ≥ M, so a plain build would stay
    # entirely in-cluster)
    cluster = lambda i: i // 8  # noqa: E731
    assert any(cluster(a) != cluster(b) for a, b in e1)
    # serving quality holds
    Q = X[::9][:6]
    res = graph_search(g.vectors, g.graph, _qdf(spark, Q), k=5, beam=48, seed=3)
    exact_ids = {
        (qi, int(j))
        for qi in range(len(Q))
        for j in np.argsort(((X.astype(np.float64) - Q[qi]) ** 2).sum(1))[:5]
    }
    got = {
        (int(r["qid"]), int(r["label"]))
        for r in res.collect()
        if r["label"] >= 0
    }
    recall = len(got & exact_ids) / len(exact_ids)
    assert recall >= 0.8
    g.release(); g2.release()


def test_connect_graph_repairs_disconnected_islands(spark):
    """faiss IndexNSG tree_grow parity (connect_graph): MRNG pruning on
    two far-apart tight clusters can leave no inter-cluster edge — beam
    search entering one cluster then never reaches the other. The
    repair links each island's min-id node to its exact nearest
    main-component neighbor both ways; a connected input passes through
    unchanged; index_factory("NSG<M>") applies it."""
    from faiss_metal_spark import VectorTable, index_factory
    from faiss_metal_spark.operators.knn_graph import connect_graph

    rng = np.random.default_rng(23)
    # two tight clusters, very far apart: every node's 2M candidates
    # are in-cluster, so the MRNG graph has ZERO cross edges
    A = (rng.normal(size=(12, 6)) * 0.05).astype(np.float32)
    B = (rng.normal(size=(12, 6)) * 0.05 + 50.0).astype(np.float32)
    X = np.concatenate([A, B])
    vdf = _vdf(spark, X)

    g = nn_descent(vdf, k=4, iters=3)
    cross = lambda df: [  # noqa: E731
        (a, b) for a, b in df.select("id", "nbr").collect()
        if (a < 12) != (b < 12)
    ]
    assert not cross(g)  # fixture is genuinely disconnected

    repaired = connect_graph(g, vdf)
    bridges = cross(repaired)
    assert bridges  # at least one inter-cluster edge now exists
    # both directions of the bridge present (search can cross either way)
    assert any((b, a) in bridges for a, b in bridges)
    # repair edges carry true L2²
    rows = {(a, b): d for a, b, d in repaired.collect()}
    for a, b in bridges:
        true = float(((X[a].astype(np.float64) - X[b].astype(np.float64)) ** 2).sum())
        assert abs(rows[(a, b)] - true) < 1e-9

    # a connected graph returns unchanged rows
    g_conn = nn_descent(_vdf(spark, A), k=4, iters=3)
    same = connect_graph(g_conn, _vdf(spark, A))
    assert sorted(map(tuple, same.collect())) == sorted(map(tuple, g_conn.collect()))

    # end-to-end: the factory NSG build reaches across clusters — every
    # query's top-1 is itself even when seeds land in the other cluster
    vt = VectorTable(spark, 6).add_numpy(X)
    idx = index_factory(vt, "NSG4", iters=3)
    cc_edges = cross(idx.graph.select("id", "nbr"))
    assert cc_edges  # repair ran inside the factory
    D, L = idx.search_numpy(X[::5], k=3, ef=24)
    hits = sum(int(L[i, 0]) == int(i * 5) for i in range(len(L)))
    assert hits >= int(0.9 * len(L)), (hits, len(L))


def test_nn_descent_iters0_init_has_no_duplicate_edges(spark):
    """The hash-mod init can propose the same neighbor twice; an
    iters=0 build must still emit each (id, nbr) edge at most once on
    BOTH vector-fetch paths (the broadcast path used to skip the init
    dedup — ADVICE r9)."""
    V, _ = make_fixture(120, 1, 8, seed=31)
    g = nn_descent(_vdf(spark, V), k=8, iters=0).toPandas()
    assert len(g) == len(g.drop_duplicates(["id", "nbr"])), "duplicate edges"
    assert (g.id != g.nbr).all()


def test_nn_descent_null_vectors_raise_clearly(spark):
    """An all-null vec column fails with a ValueError naming the
    problem, not a NoneType subscript inside the broadcast gate."""
    import pytest

    df = spark.createDataFrame(
        pd.DataFrame({"id": [0, 1, 2]}),
    ).select("id", F.lit(None).cast("array<float>").alias("vec"))
    with pytest.raises(ValueError, match="no vectors"):
        nn_descent(df, k=2, iters=1)


def test_landmark_entry_layer_recall_parity_at_half_the_rounds(spark):
    """r10 layered entry: starting the beam from the query's nearest
    ~sqrt(n) landmarks (the HNSW upper-layer / NSG navigating-node
    role) must reach AT LEAST the recall of the legacy hash entry at
    HALF the beam-expansion rounds — rounds are driver-synchronized
    stage barriers, the quantity that grows with corpus diameter at
    scale — while the extra nq×sqrt(n) entry pass keeps total scored
    candidates within a bounded factor. Pinned on clustered data,
    where random entries start in the wrong cluster and burn rounds
    escaping it. Fully deterministic (fixed seeds), so the comparison
    is exact, not statistical."""
    from faiss_metal_spark.operators.knn_graph import connect_graph, graph_search

    rng = np.random.default_rng(99)
    centers = rng.uniform(-10, 10, size=(8, 16))
    X = np.vstack(
        [c + rng.normal(0, 0.5, size=(75, 16)) for c in centers]
    ).astype(np.float32)
    vdf = _vdf(spark, X)
    g = nn_descent(vdf, k=8, iters=4)
    g = connect_graph(g, vdf).persist()
    g.count()
    Q = X[::10]
    qdf = spark.createDataFrame(
        pd.DataFrame(
            {"qid": np.arange(len(Q), dtype=np.int64), "vec": [v.tolist() for v in Q]}
        ),
        "qid long, vec array<float>",
    )
    D = ((Q[:, None, :].astype(np.float64) - X[None, :, :].astype(np.float64)) ** 2).sum(-1)
    exact = {qi: set(np.lexsort((np.arange(len(X)), D[qi]))[:5].tolist()) for qi in range(len(Q))}

    def recall(res):
        pdf = res.toPandas()
        hits = sum(
            len(set(int(x) for x in grp.label if x >= 0) & exact[qi])
            for qi, grp in pdf.groupby("qid")
        )
        return hits / (len(Q) * 5)

    st_hash, st_land = {}, {}
    r_hash = recall(
        graph_search(vdf, g, qdf, 5, beam=15, iters=6, entry="hash", stats=st_hash)
    )
    r_land = recall(
        graph_search(vdf, g, qdf, 5, beam=15, iters=3, entry="landmarks", stats=st_land)
    )
    # HALF the rounds, better-or-equal recall, bounded extra candidates
    assert r_land >= r_hash, (r_land, r_hash)
    assert st_land["n_dist_evals"] <= 1.3 * st_hash["n_dist_evals"], (
        st_land, st_hash,
    )
    # and at EQUAL rounds the landmark entry wins recall outright
    st2 = {}
    r_land2 = recall(
        graph_search(vdf, g, qdf, 5, beam=15, iters=2, entry="landmarks", stats=st2)
    )
    r_hash2 = recall(graph_search(vdf, g, qdf, 5, beam=15, iters=2, entry="hash"))
    assert r_land2 > r_hash2, (r_land2, r_hash2)
    g.unpersist()


def test_landmark_entry_keeps_all_scored_landmarks_reachable(spark):
    """Regression (r10 review): every scored landmark is marked
    visited, so the initial beam must keep the layer's top-BEAM
    members — a smaller n_seeds cut would drop scored true neighbors
    that can then never re-enter (blocked by the visited anti-join).
    Construction: the query's true top-3 are all landmarks; only the
    nearest would have survived an n_seeds=1 cut."""
    from faiss_metal_spark.operators.knn_graph import graph_search

    n, d = 16, 4
    # replicate the engine's landmark selection (hash order over ids)
    id_df = spark.range(n).select(F.col("id"))
    lands = [
        int(r["id"])
        for r in id_df.orderBy(F.xxhash64("id", F.lit(42)), "id").limit(5).collect()
    ]
    L1, L2, L3 = lands[:3]
    X = np.full((n, d), 10.0, dtype=np.float32)
    X += np.random.default_rng(3).normal(0, 0.3, size=(n, d)).astype(np.float32)
    X[L1] = [0.1, 0, 0, 0]
    X[L2] = [0.2, 0, 0, 0]
    X[L3] = [0.3, 0, 0, 0]
    vdf = _vdf(spark, X)
    g = nn_descent(vdf, k=4, iters=3)
    qdf = spark.createDataFrame(
        pd.DataFrame({"qid": [0], "vec": [[0.0, 0.0, 0.0, 0.0]]}),
        "qid long, vec array<float>",
    )
    res = graph_search(
        vdf, g, qdf, k=3, n_seeds=1, iters=2, entry="landmarks"
    ).collect()
    got = [int(r["label"]) for r in sorted(res, key=lambda r: r["rank"])]
    assert got == [L1, L2, L3], (got, lands)
