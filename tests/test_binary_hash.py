"""BinaryHashIndex — faiss IndexBinaryHash / IndexBinaryMultiHash parity.

Contract model (IndexBinaryHash: bucket = b-bit code prefix, search
probes buckets within ``nflip`` prefix-bit flips and reranks by exact
Hamming; IndexBinaryMultiHash ORs candidates over nhash disjoint
b-bit slices; the reference has no binary tier at all —
/root/reference/include/faiss-metal/MetalIndexFlat.h:47). Pins:

- bucket keys are bit-identical between the Catalyst fold and numpy;
- probed search ≡ flat Hamming search RESTRICTED to the probed
  candidate set (numpy re-derivation, integer-exact distances);
- full-coverage probing (nflip = b) ≡ flat Hamming search exactly;
- multi-hash candidates ⊇ single-hash candidates at the same b
  (OR-construction recall dominance), never a false positive;
- training-free add appends bit-identical rows; IO kind 'bhash'
  round-trips with the h0-partitioned layout.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faiss_metal_spark import BinaryHashIndex, BinaryIndex, VectorTable, read_index, write_index
from faiss_metal_spark.compact_index import index_factory
from faiss_metal_spark.operators.binary import (
    _flip_set,
    binarize_np,
    sign_prefix_np,
)

from conftest import make_fixture


def _table(spark, V) -> VectorTable:
    vt = VectorTable(spark, V.shape[1], metric="l2")
    return vt.add_numpy(V)


def _numpy_hash_search(V, Q, k, b, nflip, n_slices):
    """Full numpy re-derivation of the probe + rerank."""
    bv, bq = binarize_np(V) , binarize_np(Q)
    out_L, out_D = [], []
    for qi in range(len(Q)):
        cand = set()
        for s in range(n_slices):
            hq = int(sign_prefix_np(Q[qi : qi + 1], s * b, b)[0])
            probes = set(_flip_set(hq, b, nflip))
            hv = sign_prefix_np(V, s * b, b)
            cand |= set(np.nonzero(np.isin(hv, list(probes)))[0].tolist())
        cand = sorted(cand)
        if not cand:
            out_L.append([]), out_D.append([])
            continue
        ham = [
            (sum(bin(int(bq[qi, w]) ^ int(bv[c, w])).count("1") for w in range(bv.shape[1])), c)
            for c in cand
        ]
        ham.sort()
        out_L.append([c for _, c in ham[:k]])
        out_D.append([h for h, _ in ham[:k]])
    return out_D, out_L


def test_bucket_keys_match_numpy(spark):
    V, _ = make_fixture(100, 1, 16)
    idx = BinaryHashIndex.from_table(_table(spark, V), b=8, n_slices=2)
    rows = idx.hashed.orderBy("id").collect()
    h0 = np.array([r["h0"] for r in rows])
    h1 = np.array([r["h1"] for r in rows])
    np.testing.assert_array_equal(h0, sign_prefix_np(V, 0, 8))
    np.testing.assert_array_equal(h1, sign_prefix_np(V, 8, 8))


@pytest.mark.parametrize("nflip,n_slices", [(0, 1), (1, 1), (0, 2)])
def test_probed_search_matches_numpy(spark, nflip, n_slices):
    V, Q = make_fixture(200, 4, 16)
    idx = BinaryHashIndex.from_table(_table(spark, V), b=8, n_slices=n_slices)
    D, L = idx.search_numpy(Q, 5, nflip=nflip)
    D_ref, L_ref = _numpy_hash_search(V, Q, 5, 8, nflip, n_slices)
    for i in range(len(Q)):
        n = len(L_ref[i][:5])
        np.testing.assert_array_equal(L[i, :n], L_ref[i])
        np.testing.assert_array_equal(D[i, :n].astype(int), D_ref[i])
        assert (L[i, n:] == -1).all()  # sentinel pad past coverage


def test_full_flip_equals_flat_hamming(spark):
    V, Q = make_fixture(150, 3, 16)
    vt = _table(spark, V)
    idx = BinaryHashIndex.from_table(vt, b=6)
    flat = BinaryIndex.from_table(vt)
    D_h, L_h = idx.search_numpy(Q, 8, nflip=6)  # all 2^6 buckets probed
    D_f, L_f = flat.search_numpy(Q, 8)
    np.testing.assert_array_equal(L_h, L_f)
    np.testing.assert_array_equal(D_h, D_f)


def test_multihash_dominates_single(spark):
    V, Q = make_fixture(300, 6, 32)
    vt = _table(spark, V)
    single = BinaryHashIndex.from_table(vt, b=8, n_slices=1)
    multi = BinaryHashIndex.from_table(vt, b=8, n_slices=4)
    _, L1 = single.search_numpy(Q, 10)
    _, L4 = multi.search_numpy(Q, 10)
    # OR-construction sees strictly more candidates → at least as many
    # real (non-sentinel) results per query
    assert ((L4 >= 0).sum(1) >= (L1 >= 0).sum(1)).all()


def test_add_roundtrip_factory(spark, tmp_path):
    V, Q = make_fixture(120, 3, 16)
    vt = _table(spark, V)
    idx = index_factory(vt, "BMHash2x6")
    assert isinstance(idx, BinaryHashIndex) and (idx.b, idx.n_slices) == (6, 2)
    assert isinstance(index_factory(vt, "BHash12"), BinaryHashIndex)

    idx.add_numpy(V[:4] * 0.5, ids=np.arange(120, 124))
    assert idx.ntotal == 124
    D0, L0 = idx.search_numpy(Q, 5, nflip=1)

    write_index(idx, str(tmp_path / "bh"))
    idx2 = read_index(spark, str(tmp_path / "bh"))
    assert isinstance(idx2, BinaryHashIndex)
    assert (idx2.d, idx2.b, idx2.n_slices, idx2.ntotal) == (16, 6, 2, 124)
    D1, L1 = idx2.search_numpy(Q, 5, nflip=1)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_array_equal(D0, D1)

    assert idx.remove_ids([120, 9999]) == 1
    assert idx.ntotal == 123

    with pytest.raises(ValueError):
        BinaryHashIndex.from_table(vt, b=10, n_slices=2)  # 20 > d=16


def test_range_search_subset_never_false_positive(spark):
    """range_search: full-coverage probing ≡ flat Hamming radius filter
    exactly; bucket-restricted probing returns a subset with exact
    distances (never a false positive)."""
    V, Q = make_fixture(150, 3, 16)
    vt = _table(spark, V)
    idx = BinaryHashIndex.from_table(vt, b=6)
    flat = BinaryIndex.from_table(vt)

    full = idx.range_search(_qdf(spark, Q), radius=5, nflip=6)
    want = flat.range_search(_qdf(spark, Q), radius=5)
    a = sorted(map(tuple, full.collect()))
    b = sorted(map(tuple, want.collect()))
    assert a == b

    part = sorted(map(tuple, idx.range_search(_qdf(spark, Q), radius=5).collect()))
    assert set(part) <= set(b)
    for qid, label, dist in part:
        bv, bq = binarize_np(V), binarize_np(Q)
        true = sum(
            bin(int(bq[qid, w]) ^ int(bv[label, w])).count("1")
            for w in range(bv.shape[1])
        )
        assert dist == true < 5


def _qdf(spark, Q):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame({"qid": np.arange(len(Q), dtype=np.int64), "vec": list(Q)}),
        "qid long, vec array<float>",
    )


def test_search_plan_never_broadcasts_candidates(spark):
    """Scale pin: the hash-bucket candidate set is corpus-occupancy-
    bounded (one hot bucket at 1e11 rows is millions of rows per
    query), so the words-fetch join must NOT broadcast it — the plan
    must carry a ShuffledHashJoin on ``label`` instead, and the rerank
    must go through knn._finalize's groupBy merge (no Window rank)."""
    V, Q = make_fixture(200, 4, 16)
    idx = BinaryHashIndex.from_table(_table(spark, V), b=6)
    res = idx.search(_qdf(spark, Q), k=5, nflip=1)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    # no qid-partitioned Window rank (input lineage may carry the
    # id-assignment window over _pid — that one is not the rerank)
    assert "windowspecdefinition(qid" not in plan
    # the only broadcasts are the query-bounded sides (probe frame + q)
    joins = [ln for ln in plan.splitlines() if "BroadcastHashJoin" in ln]
    assert len(joins) <= 2, plan


def test_range_search_plan_has_no_window(spark):
    """The range path filters the probed pairs directly — no Window,
    no top-k rank, no k=ntotal scan — and returns the same rows as the
    old rank-then-filter route."""
    V, Q = make_fixture(150, 3, 16)
    vt = _table(spark, V)
    idx = BinaryHashIndex.from_table(vt, b=6)

    res = idx.range_search(_qdf(spark, Q), radius=5, nflip=1)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(qid" not in plan

    # equality with the generic rank-everything-then-filter route
    old = (
        idx.search(_qdf(spark, Q), k=int(idx.ntotal), nflip=1)
        .where(F.col("distance") < 5)
        .select("qid", "label", "distance")
    )
    assert sorted(map(tuple, res.collect())) == sorted(map(tuple, old.collect()))
