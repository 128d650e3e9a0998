"""Flat1DIndex (r11) — faiss ``IndexFlat1D`` (faiss/IndexFlat.h, the
1-d specialized flat index). Pinned here:

- distances are ABSOLUTE differences |q − v| (the documented upstream
  deviation from squared-L2 IndexFlatL2), exactly equal to a numpy
  sort oracle;
- the positional-window search is exact for interior, boundary and
  out-of-range queries (window [pos−k, pos+k−1] covers the true top-k);
- k > ntotal pads sentinels; add/remove re-rank; IO kind "flat1d";
  factory "Flat1D" refuses d != 1.
"""

import numpy as np
import pytest

from faiss_metal_spark import (
    Flat1DIndex,
    VectorTable,
    clone_index,
    index_factory,
    read_index,
    write_index,
)


def _oracle(vals, ids, q, k):
    d = np.abs(vals[None, :] - np.asarray(q, np.float64)[:, None])
    order = np.lexsort((np.broadcast_to(ids, d.shape), d), axis=1)[:, :k]
    return np.take_along_axis(d, order, axis=1), ids[order]


def _build(spark, vals, ids=None):
    import pandas as pd

    vals = np.asarray(vals, np.float64)
    ids = np.arange(len(vals), dtype=np.int64) if ids is None else np.asarray(ids)
    return (
        Flat1DIndex.from_df(
            spark.createDataFrame(pd.DataFrame({"id": ids, "val": vals}))
        ),
        vals,
        ids,
    )


def test_search_equals_abs_diff_oracle(spark):
    rng = np.random.default_rng(31)
    vals = rng.uniform(-100, 100, 500)
    idx, vals, ids = _build(spark, vals)
    q = np.concatenate([rng.uniform(-100, 100, 6), [-1e6, 1e6, vals[7]]])
    D, L = idx.search_numpy(q, k=5)
    oD, oL = _oracle(vals, ids, q, 5)
    np.testing.assert_array_equal(L, oL)
    np.testing.assert_allclose(D, oD, rtol=1e-12)
    # |q−v|, NOT squared: the exact-hit query has distance exactly 0,
    # its runner-up a first-power gap
    assert D[-1][0] == 0.0
    idx.release()


def test_rank_permutation_is_global(spark):
    """The two-level distributed ranking must produce the exact global
    (val, id) permutation — every rank 0..n−1 once."""
    rng = np.random.default_rng(33)
    vals = rng.uniform(0, 1, 300)
    idx, vals, ids = _build(spark, vals)
    pdf = idx.ranked.orderBy("rank").toPandas()
    assert list(pdf["rank"]) == list(range(300))
    order = np.lexsort((ids, vals))
    np.testing.assert_array_equal(pdf["id"].to_numpy(), ids[order])
    idx.release()


def test_sentinels_and_duplicates(spark):
    idx, vals, ids = _build(spark, [1.0, 1.0, 1.0, 5.0])
    D, L = idx.search_numpy([1.0], k=6)  # k > ntotal → 2 sentinel slots
    assert list(L[0][:4]) == [0, 1, 2, 3] and list(L[0][4:]) == [-1, -1]
    assert D[0][3] == 4.0 and np.isinf(D[0][4])
    idx.release()


def test_add_remove_rerank(spark):
    idx, vals, ids = _build(spark, [10.0, 20.0, 30.0])
    idx.add_numpy([15.0, 25.0])  # ids continue: 3, 4
    D, L = idx.search_numpy([16.0], k=2)
    assert list(L[0]) == [3, 1] and list(D[0]) == [1.0, 4.0]
    removed = idx.remove_ids([3])
    assert removed == 1 and idx.ntotal == 4
    D2, L2 = idx.search_numpy([16.0], k=2)
    assert list(L2[0]) == [1, 0]  # re-ranked store stays exact
    with pytest.raises(TypeError, match="2-tuple"):
        idx.remove_ids((0, 1))
    idx.release()


def test_factory_and_io(spark, tmp_path):
    import pandas as pd

    rng = np.random.default_rng(37)
    vals = rng.uniform(-5, 5, 200).astype(np.float32)
    vt = VectorTable(spark, 1).add_numpy(vals[:, None])
    idx = index_factory(vt, "Flat1D")
    assert isinstance(idx, Flat1DIndex) and idx.ntotal == 200
    q = rng.uniform(-5, 5, 4)
    D, L = idx.search_numpy(q, k=3)
    oD, oL = _oracle(vals.astype(np.float64), np.arange(200), q, 3)
    np.testing.assert_array_equal(L, oL)
    np.testing.assert_allclose(D, oD, rtol=1e-6)  # f32 storage rounding
    with pytest.raises(ValueError, match="d=1"):
        index_factory(VectorTable(spark, 4).add_numpy(np.zeros((4, 4), np.float32)), "Flat1D")
    path = str(tmp_path / "f1d")
    write_index(idx, path)
    back = read_index(spark, path)
    assert isinstance(back, Flat1DIndex)
    D2, L2 = back.search_numpy(q, k=3)
    np.testing.assert_array_equal(L, L2)
    np.testing.assert_allclose(D, D2, rtol=1e-12)
    cl = clone_index(idx)
    np.testing.assert_array_equal(cl.search_numpy(q, k=3)[1], L)
    idx.release()


def test_range_search(spark):
    """|q−v| < radius, strict, unordered — vs a numpy filter; the
    radius unit is |q−v| (consistent with search, unlike the upstream
    inherited squared-radius wart, documented in the method)."""
    import pandas as pd

    rng = np.random.default_rng(43)
    vals = rng.uniform(0, 10, 400)
    idx, vals, ids = _build(spark, vals)
    q = np.array([2.5, 9.9, vals[3]])
    r = 0.35
    qdf = spark.createDataFrame(
        pd.DataFrame({"qid": np.arange(len(q), dtype=np.int64), "val": q})
    )
    got = {(row["qid"], row["label"]): row["distance"]
           for row in idx.range_search(qdf, r).collect()}
    d = np.abs(vals[None, :] - q[:, None])
    want = {(int(i), int(ids[j])): d[i, j] for i, j in zip(*np.nonzero(d < r))}
    assert set(got) == set(want) and len(want) > 0
    for kk in got:
        assert abs(got[kk] - want[kk]) < 1e-12
    # strict boundary: radius exactly at an existing distance excludes it
    dmin = d.min()
    assert all(
        row["distance"] < dmin for row in idx.range_search(qdf, float(dmin)).collect()
    )
    # empty query batch
    empty = spark.createDataFrame([], "qid long, val double")
    assert idx.range_search(empty, 1.0).count() == 0
    idx.release()


def test_positions_single_scan_at_large_nq(spark):
    """r12: insertion-position probing is ONE Spark job at ANY query
    count (the r11 implementation ran ⌈nq/128⌉ sequential full-store
    aggregates) — pinned with a job-group count around the position
    pass, plus oracle equality at nq > 2·128 so the new path is proven
    on the multi-chunk regime the old one chunked."""
    rng = np.random.default_rng(9)
    vals = np.sort(rng.normal(size=400)).astype(np.float64)
    idx, vals, ids = _build(spark, vals)
    q = rng.normal(size=300).astype(np.float64)

    sc = spark.sparkContext
    sc.setJobGroup("flat1d-pos", "position probe", interruptOnCancel=False)
    try:
        pos = idx._positions(q.tolist())
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("flat1d-pos")
    assert len(jobs) == 1, f"position probe ran {len(jobs)} jobs, want 1"
    # positions are exactly count(val < q)
    want = [int((vals < v).sum()) for v in q]
    assert pos == want

    # end-to-end at nq=300: search ≡ the abs-diff oracle
    D, L = idx.search_numpy(q, 3)
    De, Le = _oracle(vals, ids, q, 3)
    np.testing.assert_array_equal(L, Le)
    np.testing.assert_allclose(D, De, atol=1e-12)
    idx.release()
