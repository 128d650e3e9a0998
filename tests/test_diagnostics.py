"""vector_stats (faiss MatrixStats twin) and ivf_imbalance — pinned
against numpy on data with planted pathologies (NaN, inf, constant
dim, zero entries, wrong-length row)."""

import numpy as np
import pandas as pd
import pytest

from faiss_metal_spark.operators.diagnostics import ivf_imbalance, vector_stats


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame({"id": range(len(rows)), "vec": rows}),
        "id long, vec array<double>",
    )


def test_vector_stats_per_dim_and_summary(spark):
    rng = np.random.default_rng(7)
    X = rng.normal(size=(50, 4))
    X[:, 2] = 1.5  # constant dim
    X[3, 0] = 0.0  # planted zero
    rows = [r.tolist() for r in X]
    rows[5] = [float("nan"), 1.0, 1.5, 2.0]  # NaN row
    rows[9] = [1.0, float("inf"), 1.5, 2.0]  # inf row
    rows.append([1.0, 2.0])  # wrong length

    out = vector_stats(_df(spark, rows), d=4).toPandas().set_index("dim")

    clean = np.array(
        [r for i, r in enumerate(X) if i not in (5, 9)], dtype=np.float64
    )
    d0 = out.loc[0]
    # dim 0: 51 entries total (wrong-length row contributes 2 dims)
    assert d0["n"] == 51 and d0["n_nonfinite"] == 1
    got_min = min(clean[:, 0].min(), 1.0, 1.0)  # planted rows contribute 1.0
    assert abs(d0["vmin"] - got_min) < 1e-12
    assert d0["n_zero"] == 1
    d2 = out.loc[2]
    assert d2["vmin"] == d2["vmax"] == 1.5 and abs(d2["std"]) < 1e-12

    s = out.loc[-1]
    # 50 originals (5 and 9 replaced in place) + 1 appended short row
    assert s["n"] == len(rows) == 51
    assert s["n_nonfinite"] == 2  # the NaN row and the inf row
    assert s["n_zero"] == 1  # the wrong-length row
    norms = (clean**2).sum(1)
    extra = np.array([1.0 + 4.0])  # the [1,2] row is finite: norm 5
    all_norms = np.concatenate([norms, extra])
    assert abs(s["vmin"] - all_norms.min()) < 1e-9
    assert abs(s["vmax"] - all_norms.max()) < 1e-9
    assert abs(s["mean"] - all_norms.mean()) < 1e-9


def test_ivf_imbalance_factor(spark):
    # 3 cells with sizes 6, 3, 1 → imbalance = 3·(36+9+1)/100 = 1.38
    rows = [(i, c) for c, sz in [(0, 6), (1, 3), (2, 1)] for i in range(sz)]
    df = spark.createDataFrame(rows, "id long, cell int")
    rep = ivf_imbalance(df)
    assert rep["ntotal"] == 10 and rep["nonempty"] == 3
    assert abs(rep["imbalance"] - 1.38) < 1e-12
    assert rep["min_size"] == 1 and rep["max_size"] == 6
    # trained nlist=4 counts the empty list: 4·46/100 = 1.84
    rep4 = ivf_imbalance(df, nlist=4)
    assert abs(rep4["imbalance"] - 1.84) < 1e-12
    assert rep4["min_size"] == 0

    empty = spark.createDataFrame([], "id long, cell int")
    assert np.isnan(ivf_imbalance(empty)["imbalance"])
