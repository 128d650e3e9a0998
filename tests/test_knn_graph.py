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
