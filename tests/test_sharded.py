"""ShardedIndex (faiss::IndexShards) — merge-of-members semantics.

The composite must be indistinguishable from one index over the union
of the members' vectors: same labels (offset under successive_ids),
same best-first order, same sentinel padding. faiss never value-tests
its IndexShards merge beyond that equivalence; these pin it exactly.
"""

import numpy as np
import pandas as pd
import pytest

from faiss_metal_spark import SQ8Index, ShardedIndex, VectorTable

from conftest import make_fixture


def _tables(spark, V, parts):
    """Split V into `parts` contiguous VectorTables (private 0-based ids)."""
    chunks = np.array_split(V, parts)
    return [
        VectorTable(spark, d=V.shape[1], metric="l2").add_numpy(c) for c in chunks
    ], chunks


def test_sharded_successive_ids_equals_flat(spark):
    """3 shards with successive_ids ≡ one flat table over the
    concatenation: identical labels, distances to f32 tolerance."""
    V, Q = make_fixture(240, 5, 16, seed=51)
    shards, _ = _tables(spark, V, 3)
    sh = ShardedIndex.from_indexes(*shards, successive_ids=True)
    assert sh.ntotal == 240 and sh.d == 16
    flat = VectorTable(spark, d=16, metric="l2").add_numpy(V)
    Ds, Ls = sh.search_numpy(Q, k=9)
    Df, Lf = flat.search_numpy(Q, k=9)
    assert np.array_equal(Ls, Lf)
    assert np.allclose(Ds, Df, atol=1e-5)


def test_sharded_verbatim_ids_collide(spark):
    """successive_ids=False passes member labels through verbatim —
    faiss behavior: shard-local ids may collide across members, and the
    merge keeps both rows."""
    V, Q = make_fixture(100, 3, 8, seed=7)
    shards, chunks = _tables(spark, V, 2)
    sh = ShardedIndex.from_indexes(*shards)  # default: verbatim ids
    res = sh.search(
        spark.createDataFrame(
            pd.DataFrame({"qid": [0], "vec": [Q[0].tolist()]}),
            "qid long, vec array<float>",
        ),
        k=100,
    ).toPandas()
    labels = res[res.label != -1].label.to_numpy()
    # both shards contribute a label 0 (their own first vector)
    assert (labels == 0).sum() == 2
    assert len(labels) == 100  # k == ntotal: every vector surfaces


def test_sharded_merge_is_global_topk(spark):
    """The composite top-k is the true top-k of the union, not a
    per-shard interleave: numpy-verified on the concatenated corpus."""
    V, Q = make_fixture(180, 4, 12, seed=23)
    shards, _ = _tables(spark, V, 4)
    sh = ShardedIndex.from_indexes(*shards, successive_ids=True)
    D, L = sh.search_numpy(Q, k=7)
    Dn = ((Q.astype(np.float64)[:, None] - V.astype(np.float64)[None]) ** 2).sum(-1)
    for qi in range(len(Q)):
        order = np.lexsort((np.arange(len(V)), Dn[qi]))[:7]
        assert np.array_equal(L[qi], order)


def test_sharded_heterogeneous_members(spark):
    """Members can mix tiers (flat + SQ8), as any faiss::Index* slots
    into IndexShards: search runs and each member's semantics hold —
    a vector stored in the FLAT shard is found exactly."""
    V, _ = make_fixture(120, 1, 10, seed=3)
    flat = VectorTable(spark, d=10, metric="l2").add_numpy(V[:60])
    sq = SQ8Index.from_table(
        VectorTable(spark, d=10, metric="l2").add_numpy(V[60:])
    )
    sh = ShardedIndex.from_indexes(flat, sq, successive_ids=True)
    assert sh.ntotal == 120
    D, L = sh.search_numpy(V[:2], k=3)
    assert (L[:, 0] == [0, 1]).all() and (np.abs(D[:, 0]) <= 1e-5).all()


def test_sharded_sentinel_padding(spark):
    """k > Σ ntotal pads with label −1 / +inf, the engine-wide
    sentinel contract."""
    V, Q = make_fixture(10, 2, 6, seed=9)
    shards, _ = _tables(spark, V, 2)
    sh = ShardedIndex.from_indexes(*shards, successive_ids=True)
    D, L = sh.search_numpy(Q, k=15)
    assert (L[:, 10:] == -1).all() and np.isinf(D[:, 10:]).all()
    assert (L[:, :10] != -1).all()


def test_sharded_validation_and_refusals(spark):
    a = VectorTable(spark, d=8, metric="l2").add_numpy(
        np.zeros((4, 8), np.float32)
    )
    b = VectorTable(spark, d=9, metric="l2").add_numpy(
        np.zeros((4, 9), np.float32)
    )
    with pytest.raises(ValueError, match="dimension mismatch"):
        ShardedIndex.from_indexes(a, b)
    with pytest.raises(ValueError, match="at least one"):
        ShardedIndex.from_indexes()
    c = VectorTable(spark, d=8, metric="ip").add_numpy(np.zeros((4, 8), np.float32))
    with pytest.raises(ValueError, match="metric mismatch"):
        ShardedIndex.from_indexes(a, c)
    sh = ShardedIndex.from_indexes(a)
    with pytest.raises(RuntimeError, match="read-only composite"):
        sh.add(np.zeros((1, 8), np.float32))
    with pytest.raises(ValueError, match="k must be positive"):
        sh.search(a.df.select("id"), 0)


def test_sharded_write_read_roundtrip(spark, tmp_path):
    """write_index/read_index on the composite: members persist as
    self-describing payloads, composite meta commits LAST, the reload
    searches value-identically (including a heterogeneous member)."""
    from faiss_metal_spark import read_index, write_index

    V, Q = make_fixture(90, 3, 8, seed=31)
    flat = VectorTable(spark, d=8, metric="l2").add_numpy(V[:45])
    sq = SQ8Index.from_table(
        VectorTable(spark, d=8, metric="l2").add_numpy(V[45:])
    )
    sh = ShardedIndex.from_indexes(flat, sq, successive_ids=True)
    p = str(tmp_path / "composite")
    write_index(sh, p)
    sh2 = read_index(spark, p)
    assert isinstance(sh2, ShardedIndex)
    assert sh2.ntotal == 90 and sh2.successive_ids and len(sh2.shards) == 2
    assert isinstance(sh2.shards[0], VectorTable)
    assert isinstance(sh2.shards[1], SQ8Index)
    D1, L1 = sh.search_numpy(Q, k=6)
    D2, L2 = sh2.search_numpy(Q, k=6)
    assert np.array_equal(L1, L2) and np.allclose(D1, D2)
