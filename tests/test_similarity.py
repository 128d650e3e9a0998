"""Property tests for similarity.py: blocked exact kNN join equals the
brute-force oracle; LSH self-recall; IVF degrades to exact at full
probe and keeps usable recall at partial probe."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faiss_metal_spark.operators.knn import knn_search
from faiss_metal_spark.operators.similarity import (
    ann_lsh_search,
    ivf_assign,
    ivf_search,
    ivf_train_centroids,
    knn_join_blocked,
    lsh_planes,
)
from tests.conftest import make_fixture, numpy_oracle, queries_df, vectors_df


def test_knn_join_blocked_exact(spark):
    V, Q = make_fixture(nv=200, nq=23, d=16)
    res = (
        knn_join_blocked(
            vectors_df(spark, V), queries_df(spark, Q), k=5,
            metric="l2", num_qblocks=3, num_vblocks=4, compute="f64",
        )
        .orderBy("qid", "rank")
        .toPandas()
    )
    D, L = numpy_oracle(V, Q, 5, "l2")
    got_d = res["distance"].to_numpy().reshape(23, 5)
    np.testing.assert_allclose(got_d, D, rtol=1e-9)
    # top-1 label exact (reference test discipline, test_metal_flat.mm:51-58)
    np.testing.assert_array_equal(res["label"].to_numpy().reshape(23, 5)[:, 0], L[:, 0])


def test_knn_join_blocked_ip(spark):
    V, Q = make_fixture(nv=150, nq=11, d=8)
    res = (
        knn_join_blocked(
            vectors_df(spark, V), queries_df(spark, Q), k=3, metric="ip", compute="f64",
        )
        .orderBy("qid", "rank")
        .toPandas()
    )
    D, L = numpy_oracle(V, Q, 3, "ip")
    np.testing.assert_allclose(res["distance"].to_numpy().reshape(11, 3), D, rtol=1e-9)


def test_ann_lsh_self_recall(spark):
    """A query identical to a stored vector lands in the same buckets,
    so it must find itself at rank 0 with cosine ≈ 1."""
    V, _ = make_fixture(nv=300, nq=1, d=32)
    planes = lsh_planes(32, num_planes=6, num_tables=2)
    vdf = vectors_df(spark, V)
    qdf = queries_df(spark, V[:10])
    res = ann_lsh_search(vdf, qdf, k=5, planes=planes).orderBy("qid", "rank").toPandas()
    top1 = res[res["rank"] == 0]
    assert len(top1) == 10
    np.testing.assert_array_equal(top1["label"].to_numpy(), np.arange(10))
    np.testing.assert_allclose(top1["distance"].to_numpy(), 1.0, atol=1e-9)


def test_ann_lsh_candidates_only(spark):
    """Results are a subset of true neighbors by construction: every
    returned distance must equal the exact cosine for that pair."""
    V, Q = make_fixture(nv=120, nq=4, d=16)
    planes = lsh_planes(16, num_planes=4, num_tables=2)
    res = ann_lsh_search(
        vectors_df(spark, V), queries_df(spark, Q), k=3, planes=planes
    ).toPandas()
    Vd, Qd = V.astype(np.float64), Q.astype(np.float64)
    for r in res.itertuples():
        exact = (Qd[r.qid] @ Vd[r.label]) / (
            np.linalg.norm(Qd[r.qid]) * np.linalg.norm(Vd[r.label])
        )
        assert r.distance == pytest.approx(exact, rel=1e-9)


@pytest.fixture(scope="module")
def ivf_setup(spark):
    V, Q = make_fixture(nv=400, nq=8, d=16)
    vdf = vectors_df(spark, V)
    C = ivf_train_centroids(vdf, n_cells=8, sample_size=400)
    assigned = ivf_assign(vdf, C).persist()
    assigned.count()
    return V, Q, C, assigned


def test_ivf_full_probe_is_exact(spark, ivf_setup):
    V, Q, C, assigned = ivf_setup
    res = (
        ivf_search(assigned, C, queries_df(spark, Q), k=5, nprobe=8)
        .orderBy("qid", "rank")
        .toPandas()
    )
    D, L = numpy_oracle(V, Q, 5, "l2")
    np.testing.assert_allclose(res["distance"].to_numpy().reshape(8, 5), D, rtol=1e-9)
    np.testing.assert_array_equal(res["label"].to_numpy().reshape(8, 5)[:, 0], L[:, 0])


def test_ivf_partial_probe_recall(spark, ivf_setup):
    V, Q, C, assigned = ivf_setup
    res = ivf_search(assigned, C, queries_df(spark, Q), k=5, nprobe=3).toPandas()
    _, L = numpy_oracle(V, Q, 5, "l2")
    hits = 0
    for qid in range(8):
        got = set(res[res["qid"] == qid]["label"])
        hits += len(got & set(L[qid]))
    assert hits / (8 * 5) >= 0.5  # nprobe 3/8 keeps most true neighbors


def test_ivf_matches_knn_on_probed_subset(spark, ivf_setup):
    """IVF results with nprobe=1 are exact within the probed cell."""
    V, Q, C, assigned = ivf_setup
    res = ivf_search(assigned, C, queries_df(spark, Q[:2]), k=3, nprobe=1).toPandas()
    probe = ((C * C).sum(1)[None, :] - 2.0 * (Q[:2].astype(np.float64) @ C.T)).argmin(1)
    apdf = assigned.select("id", "cell").toPandas().set_index("id")["cell"]
    for r in res.itertuples():
        assert apdf[r.label] == probe[r.qid]


def test_ivf_no_probe_crowd_out(spark):
    """Two queries probing disjoint cells of very different density must
    EACH get exactly k results from their own cells (regression: the old
    union-then-filter over-fetch let a dense foreign cell crowd a sparse
    query's candidates out of the global top-k·nprobe)."""
    rng = np.random.default_rng(3)
    dense = rng.uniform(-0.1, 0.1, size=(300, 8)).astype(np.float32) + 5.0
    sparse = rng.uniform(-0.1, 0.1, size=(12, 8)).astype(np.float32) - 5.0
    V = np.concatenate([dense, sparse])
    vdf = vectors_df(spark, V)
    C = np.array([[5.0] * 8, [-5.0] * 8], dtype=np.float64)
    assigned = ivf_assign(vdf, C)
    # q0 probes the dense cell, q1 the sparse one (nprobe=1, disjoint)
    Q = np.array([[5.0] * 8, [-5.0] * 8], dtype=np.float32)
    res = ivf_search(assigned, C, queries_df(spark, Q), k=10, nprobe=1).toPandas()
    per_q = res.groupby("qid").size()
    assert per_q[0] == 10 and per_q[1] == 10
    # and every hit came from the query's own probed cell
    cells = assigned.select("id", "cell").toPandas().set_index("id")["cell"]
    for r in res.itertuples():
        assert cells[r.label] == r.qid  # cell 0 ↔ q0, cell 1 ↔ q1


def test_ivf_write_partition_pruning(spark, ivf_setup, tmp_path):
    """A cell-partitioned inverted file turns the probe filter into
    parquet partition pruning — the scan must carry PartitionFilters on
    cell and read only probed directories."""
    from faiss_metal_spark.operators.similarity import ivf_write

    V, Q, C, assigned = ivf_setup
    path = str(tmp_path / "ivf")
    ivf_write(assigned, path)
    back = spark.read.parquet(path)
    probed = back.where(F.col("cell").isin([0, 3]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:120]
    # pruned scan returns exactly the probed cells' rows
    want = assigned.where(F.col("cell").isin([0, 3])).count()
    assert probed.count() == want
    # and search over the reloaded inverted file still works end-to-end
    res = ivf_search(back, C, queries_df(spark, Q[:2]), k=3, nprobe=2)
    assert res.count() == 2 * 3


def test_lsh_bucket_vectorized_equals_expression(spark):
    """The numpy integer-matmul bucketing must equal the Catalyst
    expression form bit-for-bit (both are 'integer-exact' — this is the
    claim the SQL oracle relies on)."""
    from faiss_metal_spark.operators.similarity import (
        _bucket_expr,
        _quantized,
        lsh_buckets,
    )

    V, _ = make_fixture(nv=80, nq=1, d=24)
    planes = lsh_planes(24, num_planes=5, num_tables=3)
    df = vectors_df(spark, V)
    fast = {
        (r["id"], r["tbl"]): r["bucket"]
        for r in lsh_buckets(df, planes).collect()
    }
    q = _quantized(F.col("vec"))
    slow_df = df.select(
        "id", *[_bucket_expr(q, planes[t]).alias(f"b{t}") for t in range(3)]
    )
    for r in slow_df.collect():
        for t in range(3):
            assert fast[(r["id"], t)] == r[f"b{t}"]


def test_recall_at_k_evaluation(spark):
    """recall_at_k joins approx vs exact and handles sentinel rows,
    missing queries (recall 0) and perfect matches; mean_recall
    aggregates. Driven against the real operators: LSH-ANN vs exact
    knn_search over one fixture."""
    import pandas as pd

    from faiss_metal_spark.functions.evaluate import mean_recall, recall_at_k

    # synthetic exactness checks
    exact = spark.createDataFrame(
        [(0, r, r, 0.0) for r in range(4)] + [(1, r, 10 + r, 0.0) for r in range(4)],
        "qid long, rank int, label long, distance double",
    )
    approx = spark.createDataFrame(
        [(0, 0, 0, 0.0), (0, 1, 2, 0.0), (0, 2, 99, 0.0), (0, 3, -1, 0.0)],
        "qid long, rank int, label long, distance double",
    )
    r = {x["qid"]: x for x in recall_at_k(approx, exact, k=4).collect()}
    assert r[0]["n_hit"] == 2 and r[0]["recall"] == pytest.approx(0.5)
    assert r[1]["n_hit"] == 0 and r[1]["recall"] == 0.0
    assert mean_recall(approx, exact, k=4) == pytest.approx(0.25)
    assert mean_recall(exact, exact, k=4) == 1.0


def test_multiprobe_lsh_recall_dominates_single_probe(spark):
    """Query-side multiprobe must produce a candidate superset of the
    single-probe search (same planes, same corpus bucketing), hence
    recall vs exact cosine top-k that is >= single-probe — and on this
    fixture strictly more candidates overall."""
    import numpy as np
    import pandas as pd

    from faiss_metal_spark.functions.evaluate import mean_recall
    from faiss_metal_spark.operators.similarity import ann_lsh_search, lsh_planes

    rng = np.random.default_rng(42)
    V = rng.normal(size=(400, 16)).astype(np.float32)
    vdf = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(400), "vec": [v.tolist() for v in V]}),
        "id long, vec array<float>",
    )
    qdf = spark.createDataFrame(
        pd.DataFrame({"qid": np.arange(8), "vec": [v.tolist() for v in V[:8]]}),
        "qid long, vec array<float>",
    )
    planes = lsh_planes(16, 8, 2, seed=5)
    k = 10
    sp = ann_lsh_search(vdf, qdf, k, planes)
    mp = ann_lsh_search(vdf, qdf, k, planes, n_probes=4)

    # exact cosine top-k (numpy)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn[:8] @ Vn.T
    rows = []
    for q in range(8):
        order = np.lexsort((np.arange(400), -S[q]))[:k]
        rows += [(q, r, int(l), 0.0) for r, l in enumerate(order)]
    exact = spark.createDataFrame(rows, "qid long, rank int, label long, distance double")

    r_sp = mean_recall(sp, exact)
    r_mp = mean_recall(mp, exact)
    assert r_mp >= r_sp
    assert mp.count() >= sp.count()
    # multiprobe candidates are a superset per query
    sp_set = {(r["qid"], r["label"]) for r in sp.collect()}
    mp_all = ann_lsh_search(vdf, qdf, 400, planes, n_probes=4)
    mp_set = {(r["qid"], r["label"]) for r in mp_all.collect()}
    sp_all = ann_lsh_search(vdf, qdf, 400, planes)
    assert {(r["qid"], r["label"]) for r in sp_all.collect()} <= mp_set


def test_knn_join_blocked_f32_default(spark):
    """The default (auto→f32) ships array<float> through the grid
    shuffle and keeps labels identical to the f64 run at fp32 distance
    tolerance — the same default-width policy as knn_search."""
    from faiss_metal_spark.operators.similarity import knn_join_blocked

    V, Q = make_fixture(nv=200, nq=9, d=16)
    vdf, qdf = vectors_df(spark, V), queries_df(spark, Q)
    f32 = knn_join_blocked(vdf, qdf, k=4).orderBy("qid", "rank").toPandas()
    f64 = knn_join_blocked(vdf, qdf, k=4, compute="f64").orderBy("qid", "rank").toPandas()
    np.testing.assert_array_equal(f32["label"].to_numpy(), f64["label"].to_numpy())
    np.testing.assert_allclose(f32["distance"].to_numpy(), f64["distance"].to_numpy(), rtol=1e-4)
    # the replicated vectors really ride the shuffle as array<float>
    plan = knn_join_blocked(vdf, qdf, k=4)._jdf.queryExecution().analyzed().toString()
    assert "array<float>" in plan and "array<double>" not in plan


# -- ivf_range_search (faiss IndexIVF::range_search) ------------------------


def test_ivf_range_full_probe_is_exact(spark, ivf_setup):
    """nprobe = n_cells degrades to the exact flat range answer: same
    pairs, same f64 distances, strict < keep rule."""
    from faiss_metal_spark.operators.similarity import ivf_range_search

    V, Q, C, assigned = ivf_setup
    radius = 6.0
    res = ivf_range_search(
        assigned, C, queries_df(spark, Q), radius, nprobe=8
    ).toPandas()
    D = ((Q.astype(np.float64)[:, None] - V.astype(np.float64)[None]) ** 2).sum(-1)
    want = {(qi, vi) for qi, vi in zip(*np.nonzero(D < radius))}
    got = {(r.qid, r.label) for r in res.itertuples()}
    assert got == want and len(want) > 0
    for r in res.itertuples():
        assert r.distance == pytest.approx(D[r.qid, r.label], rel=1e-12)


def test_ivf_range_partial_probe_subset(spark, ivf_setup):
    """Partial probe returns a SUBSET of the exact answer (never a
    false positive) and stays exact within probed cells; the IVFIndex
    facade routes the same call."""
    from faiss_metal_spark.operators.similarity import ivf_range_search

    V, Q, C, assigned = ivf_setup
    radius = 6.0
    res = ivf_range_search(
        assigned, C, queries_df(spark, Q), radius, nprobe=2
    ).toPandas()
    D = ((Q.astype(np.float64)[:, None] - V.astype(np.float64)[None]) ** 2).sum(-1)
    exact = {(qi, vi) for qi, vi in zip(*np.nonzero(D < radius))}
    got = {(r.qid, r.label) for r in res.itertuples()}
    assert got <= exact and len(got) > 0


def test_ivf_index_range_search_facade(spark):
    from faiss_metal_spark import IVFIndex, VectorTable

    V, Q = make_fixture(nv=200, nq=4, d=8, seed=19)
    vt = VectorTable(spark, d=8, metric="l2").add_numpy(V)
    idx = IVFIndex.from_table(vt, n_cells=4, sample_size=200)
    res = idx.range_search(queries_df(spark, Q), radius=3.0, nprobe=4).toPandas()
    D = ((Q.astype(np.float64)[:, None] - V.astype(np.float64)[None]) ** 2).sum(-1)
    want = {(qi, vi) for qi, vi in zip(*np.nonzero(D < 3.0))}
    assert {(r.qid, r.label) for r in res.itertuples()} == want
