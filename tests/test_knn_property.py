"""Property-based fuzz of knn_search over random (nv, nq, d, k, metric)
— the invariants (oracle agreement, ordering, sentinels, label domain)
must hold for ANY shape, not just the curated matrix. A handful of
examples per run keeps wall-clock sane; shapes still vary run-to-run
via hypothesis' deterministic derandomized search."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from faiss_metal_spark.operators.knn import knn_search
from tests.conftest import numpy_oracle, queries_df, vectors_df
from tests.test_knn import check_against_oracle

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from faiss_metal_spark.session import get_spark

        _spark = get_spark("faiss-metal-spark-tests")
    return _spark


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    nv=st.integers(1, 400),
    nq=st.integers(1, 8),
    d=st.integers(1, 96),
    k=st.integers(1, 50),
    metric=st.sampled_from(["l2", "ip", "cosine"]),
    seed=st.integers(0, 2**16),
)
def test_knn_invariants_random_shapes(nv, nq, d, k, metric, seed):
    spark = _get_spark()
    rng = np.random.default_rng(seed)
    V = rng.uniform(-1, 1, size=(nv, d)).astype(np.float32)
    Q = rng.uniform(-1, 1, size=(nq, d)).astype(np.float32)
    res = (
        knn_search(vectors_df(spark, V), queries_df(spark, Q), k, metric=metric)
        .orderBy("qid", "rank")
        .toPandas()
    )
    assert len(res) == nq * k
    D = res["distance"].to_numpy(np.float64).reshape(nq, k)
    L = res["label"].to_numpy(np.int64).reshape(nq, k)
    rtol = 1e-3 if metric == "l2" else 1e-2
    # degenerate cosine ties (zero-norm vectors can't occur with this
    # generator; d=1 duplicates can) — oracle handles via exact compare
    check_against_oracle(V, Q, k, D, L, metric, rtol)


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    nv=st.integers(1, 300),
    nq=st.integers(1, 6),
    d=st.integers(1, 64),
    q_radius=st.floats(0.05, 0.95),
    metric=st.sampled_from(["l2", "ip", "cosine", "l1"]),
    seed=st.integers(0, 2**16),
)
def test_range_search_invariants_random_shapes(nv, nq, d, q_radius, metric, seed):
    """For ANY shape/radius: both physical paths return exactly the
    numpy reference's pair set with matching distances."""
    from faiss_metal_spark.operators.knn import range_search

    spark = _get_spark()
    rng = np.random.default_rng(seed)
    V = rng.uniform(-1, 1, size=(nv, d)).astype(np.float32)
    Q = rng.uniform(-1, 1, size=(nq, d)).astype(np.float32)
    Vd, Qd = V.astype(np.float64), Q.astype(np.float64)
    if metric == "l2":
        D = np.maximum(
            (Qd * Qd).sum(1)[:, None] + (Vd * Vd).sum(1)[None, :]
            - 2.0 * (Qd @ Vd.T), 0.0,
        )
    elif metric == "ip":
        D = Qd @ Vd.T
    elif metric == "cosine":
        vn = np.linalg.norm(Vd, axis=1, keepdims=True)
        qn = np.linalg.norm(Qd, axis=1, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            D = np.where(
                (qn @ vn.T) > 0, (Qd @ Vd.T) / (qn @ vn.T), 0.0
            )
    else:
        D = np.abs(Qd[:, None, :] - Vd[None, :, :]).sum(-1)
    want_min = metric in ("l2", "l1")
    radius = float(np.quantile(D, q_radius))
    mask = D < radius if want_min else D > radius
    want = set(zip(*np.nonzero(mask)))

    for method in ("gemm", "sql"):
        got = range_search(
            vectors_df(spark, V), queries_df(spark, Q), radius,
            metric=metric, method=method, compute="f64",
        ).toPandas()
        pairs = {(int(r.qid), int(r.label)) for r in got.itertuples()}
        assert pairs == want, (method, len(pairs), len(want))
        for r in got.itertuples():
            assert abs(r.distance - D[int(r.qid), int(r.label)]) < 1e-9
