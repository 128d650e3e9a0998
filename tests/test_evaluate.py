

def test_explore_operating_points(spark):
    """faiss ParameterSpace::explore + OperatingPoints analog over the
    IVF tier: recall is non-decreasing in nprobe on the swept grid, the
    full-probe point has recall 1.0 vs its own ceiling, and the Pareto
    flags keep exactly the points no faster point dominates."""
    import numpy as np

    from faiss_metal_spark import IVFIndex, VectorTable
    from faiss_metal_spark.functions.evaluate import explore_operating_points
    from tests.conftest import make_fixture

    V, Q = make_fixture(600, 8, 16, seed=41)
    vt = VectorTable(spark, 16).add_numpy(V)
    idx = IVFIndex.from_table(vt, n_cells=16, iters=4)
    import pandas as pd

    qdf = spark.createDataFrame(
        pd.DataFrame({"qid": np.arange(len(Q)), "vec": list(Q)})
    )
    pts = explore_operating_points(idx, qdf, k=5, param_grid={"nprobe": [1, 4, 16]})
    by_np = {p["params"]["nprobe"]: p for p in pts}
    assert set(by_np) == {1, 4, 16}
    assert by_np[1]["recall"] <= by_np[4]["recall"] <= by_np[16]["recall"]
    assert by_np[16]["recall"] == 1.0  # ceiling vs itself
    # Pareto: fastest-first scan keeps only strict recall improvements
    best = -1.0
    for p in pts:
        assert p["optimal"] == (p["recall"] > best)
        best = max(best, p["recall"])
    assert any(p["optimal"] for p in pts)
    idx.assigned.unpersist()
