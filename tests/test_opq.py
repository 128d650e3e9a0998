"""OPQ (learned rotation + PQ) — quality and consistency pins.

No SQL-oracle row (the alternating SVD training is iterative); these
tests are the correctness pin (COVERAGE.md): rotation orthogonality,
equivalence of opq_search with pq_search in pre-rotated space, and the
property OPQ exists for — lower quantization error than plain PQ on
data whose correlations cross subspace boundaries."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from faiss_metal_spark.operators.opq import (
    _assign_np,
    opq_encode,
    opq_reconstruct_np,
    opq_rotate,
    opq_search,
    opq_train,
)
from faiss_metal_spark.operators.pq import pq_encode, pq_search, pq_train


def _correlated(n, d, seed):
    """Gaussian data mixed by a fixed random linear map — correlations
    deliberately span PQ slice boundaries (the case OPQ fixes)."""
    rng = np.random.default_rng(seed)
    Z = rng.normal(size=(n, d))
    # anisotropic spectrum + dense mixing
    A = rng.normal(size=(d, d)) * np.linspace(2.0, 0.1, d)[None, :]
    return (Z @ A).astype(np.float32)


def _vdf(spark, V):
    return spark.createDataFrame(
        pd.DataFrame({"id": np.arange(len(V)), "vec": [v.tolist() for v in V]}),
        "id long, vec array<float>",
    )


def test_opq_rotation_is_orthogonal_and_beats_pq(spark):
    V = _correlated(600, 16, seed=4)
    vdf = _vdf(spark, V)
    m = 4
    R, books = opq_train(vdf, m=m, iters=6, pq_iters=4)
    assert np.allclose(R @ R.T, np.eye(16), atol=1e-8)

    Vd = V.astype(np.float64)
    opq_codes = _assign_np(Vd @ R.T, books)
    opq_mse = ((opq_reconstruct_np(opq_codes, R, books) - Vd) ** 2).mean()

    pq_books = pq_train(vdf, m=m, iters=4)
    pq_codes = _assign_np(Vd, pq_books)
    from faiss_metal_spark.operators.opq import _reconstruct_np

    pq_mse = ((_reconstruct_np(pq_codes, pq_books) - Vd) ** 2).mean()
    # the whole point of the rotation: strictly better quantization
    assert opq_mse < pq_mse, f"OPQ {opq_mse:.4f} !< PQ {pq_mse:.4f}"


def test_opq_search_equals_pq_search_in_rotated_space(spark):
    V = _correlated(400, 16, seed=9)
    vdf = _vdf(spark, V)
    R, books = opq_train(vdf, m=4, iters=3, pq_iters=3)
    codes = opq_encode(vdf, R, books)
    qdf = spark.createDataFrame(
        pd.DataFrame({"qid": np.arange(5), "vec": [v.tolist() for v in V[:5]]}),
        "qid long, vec array<float>",
    )
    got = opq_search(codes, R, books, qdf, k=8).toPandas()

    rot_v = opq_rotate(vdf, R)
    rot_q = opq_rotate(qdf, R, id_col="qid").select(
        F.col("id").alias("qid"), "vec"
    )
    exp = pq_search(pq_encode(rot_v, books), books, rot_q, k=8).toPandas()
    key = ["qid", "rank"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    assert (got[["qid", "rank", "label"]].values == exp[["qid", "rank", "label"]].values).all()
    assert np.allclose(got.distance.values, exp.distance.values)


def test_opq_self_query_top1_is_self(spark):
    V = _correlated(300, 16, seed=2)
    vdf = _vdf(spark, V)
    R, books = opq_train(vdf, m=4, iters=3, pq_iters=3)
    codes = opq_encode(vdf, R, books)
    qdf = spark.createDataFrame(
        pd.DataFrame({"qid": [7, 42], "vec": [V[7].tolist(), V[42].tolist()]}),
        "qid long, vec array<float>",
    )
    top = (
        opq_search(codes, R, books, qdf, k=1)
        .toPandas()
        .set_index("qid")
    )
    assert top.loc[7].label == 7 and top.loc[42].label == 42
