"""Property fuzz of write_index/read_index: for ANY (nv, d, storage,
kind), a reloaded index searches value-identically — persistence must
not depend on curated shapes. Few examples per run (each builds a
Spark table + writes parquet); shapes vary via derandomized search."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

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
    nv=st.integers(2, 300),
    d=st.integers(2, 64),
    storage=st.sampled_from(["fp32", "fp16", "bf16"]),
    compact=st.booleans(),
    kind=st.sampled_from(["flat", "sq8", "binary", "lsh"]),
    seed=st.integers(0, 2**16),
)
def test_roundtrip_any_shape(tmp_path_factory, nv, d, storage, compact, kind, seed):
    from faiss_metal_spark import (
        BinaryIndex,
        LSHIndex,
        SQ8Index,
        VectorTable,
        read_index,
        write_index,
    )

    spark = _get_spark()
    if storage == "fp32":
        compact = False  # compact layout requires a 2-byte storage type
    rng = np.random.default_rng(seed)
    V = rng.uniform(-1, 1, size=(nv, d)).astype(np.float32)
    Q = rng.uniform(-1, 1, size=(3, d)).astype(np.float32)
    vt = VectorTable(spark, d, storage=storage, compact=compact).add_numpy(V)
    idx = {
        "flat": lambda: vt,
        "sq8": lambda: SQ8Index.from_table(vt),
        "binary": lambda: BinaryIndex.from_table(vt),
        # nbits decoupled from d exercises both rotation regimes
        "lsh": lambda: LSHIndex.from_table(vt, nbits=min(2 * d, 48), seed=seed),
    }[kind]()
    k = min(5, nv)
    D0, L0 = idx.search_numpy(Q, k)
    path = str(tmp_path_factory.mktemp("idx") / "x")
    write_index(idx, path)
    back = read_index(spark, path)
    D1, L1 = back.search_numpy(Q, k)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_array_equal(np.asarray(D0), np.asarray(D1))
