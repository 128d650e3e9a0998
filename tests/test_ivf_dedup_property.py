"""Property-based fuzz of IVFFlatDedupIndex over random duplication
patterns — the logical-top-k equality proof (stored-top-k expansion ≡
top-k over the duplicated corpus under (distance, label) tie order with
min-id representatives) must hold for ANY duplication multiset, cell
count, and k, not just the curated fixture."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from faiss_metal_spark import IVFFlatDedupIndex, VectorTable
from tests.conftest import numpy_oracle

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from faiss_metal_spark.session import get_spark

        _spark = get_spark("faiss-metal-spark-tests")
    return _spark


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    n_distinct=st.integers(5, 80),
    n_dup=st.integers(0, 60),
    d=st.integers(2, 32),
    k=st.integers(1, 12),
    n_cells=st.integers(1, 6),
    seed=st.integers(0, 2**16),
)
def test_dedup_logical_topk_random_duplication(
    n_distinct, n_dup, d, k, n_cells, seed
):
    spark = _get_spark()
    rng = np.random.default_rng(seed)
    base = rng.uniform(-1, 1, size=(n_distinct, d)).astype(np.float32)
    # arbitrary duplication multiset: any base row, any multiplicity
    dup_of = rng.integers(0, n_distinct, size=n_dup)
    V = np.concatenate([base, base[dup_of]]) if n_dup else base
    Q = rng.uniform(-1, 1, size=(3, d)).astype(np.float32)

    vt = VectorTable(spark, d).add_numpy(V)
    idx = IVFFlatDedupIndex.from_table(
        vt, n_cells=n_cells, sample_size=len(V), iters=3
    )
    assert idx.ntotal == n_distinct          # every duplicate folded
    assert idx.n_instances == n_dup
    assert idx.n_logical == len(V)

    # full probe ⇒ exact logical top-k, sentinel-padded past n_logical
    D, L = idx.search_numpy(Q, k, nprobe=idx.nlist)
    Do, Lo = numpy_oracle(V, Q, k)  # (nq, min(k, n_logical)) — unpadded
    kk = Lo.shape[1]
    assert np.array_equal(L[:, :kk], Lo)
    assert np.allclose(D[:, :kk], Do, rtol=1e-9, atol=1e-12)
    assert (L[:, kk:] == -1).all() and np.isinf(D[:, kk:]).all()
    idx.release()
