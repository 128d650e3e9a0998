"""IVFFlatDedupIndex — faiss ``IndexIVFFlatDedup`` parity.

faiss stores each distinct vector once in the inverted lists and keeps
duplicate ids in an ``instances`` multimap; search expands a stored hit
back to its duplicate ids, remove_ids promotes a surviving duplicate
when a stored representative is removed, add dedups against both the
existing lists and the incoming batch. Pinned here: the expanded search
is EXACTLY the top-k over the logical (duplicated) corpus under the
engine's (distance, label) tie order, plus the full mutate/IO surface.
"""

import numpy as np
import pytest

from faiss_metal_spark import (
    IVFFlatDedupIndex,
    RefineIndex,
    VectorTable,
    index_factory,
)

from conftest import make_fixture, numpy_oracle


def _dup_fixture(seed=202):
    """120 distinct vectors + 40 planted exact duplicates.

    ids 0..119 are the distinct originals (and the min-id
    representatives), 120..149 duplicate 0..29, 150..159 duplicate
    0..9 (so ids 0..9 carry TWO duplicates each)."""
    base, Q = make_fixture(120, 5, 12, seed=seed)
    V = np.concatenate([base, base[:30], base[:10]])
    return base, V, Q


def _table(spark, V) -> VectorTable:
    return VectorTable(spark, V.shape[1]).add_numpy(V)


def _build(spark, V, n_cells=4) -> IVFFlatDedupIndex:
    return IVFFlatDedupIndex.from_table(
        _table(spark, V), n_cells=n_cells, sample_size=len(V)
    )


def test_dedup_build_counts_and_logical_search(spark):
    base, V, Q = _dup_fixture()
    idx = _build(spark, V)
    assert idx.ntotal == 120            # stored = distinct
    assert idx.n_instances == 40        # duplicates live in the side map
    assert idx.n_logical == len(V) == 160
    assert idx.nlist == 4

    # full probe ⇒ exact — and exact here means top-k over the LOGICAL
    # corpus: duplicates come back as separate labels at the identical
    # distance, ordered by id (the numpy oracle's stable sort is the
    # same (distance, id) order)
    k = 6
    D, L = idx.search_numpy(Q, k, nprobe=idx.nlist)
    Do, Lo = numpy_oracle(V, Q, k)
    assert np.array_equal(L, Lo)
    assert np.allclose(D, Do, rtol=1e-9, atol=1e-12)
    # the planted duplicates actually surface: query AT a duplicated
    # vector returns the representative and both duplicate ids at 0
    D0, L0 = idx.search_numpy(base[:1], 3, nprobe=idx.nlist)
    assert list(L0[0]) == [0, 120, 150]
    assert np.allclose(D0[0], 0.0, atol=1e-9)


def test_dedup_remove_promotes_duplicate(spark):
    base, V, Q = _dup_fixture()
    idx = _build(spark, V)
    # removing a representative with survivors promotes the smallest
    # surviving duplicate — the vector itself stays findable
    assert idx.remove_ids([0]) == 1
    assert idx.ntotal == 120 and idx.n_instances == 39
    D0, L0 = idx.search_numpy(base[:1], 3, nprobe=idx.nlist)
    assert list(L0[0]) == [120, 150] + [L0[0][2]]
    assert np.allclose(D0[0][:2], 0.0, atol=1e-9)
    # removing a plain instance only shrinks the map
    assert idx.remove_ids([150]) == 1
    assert idx.ntotal == 120 and idx.n_instances == 38
    # removing the whole remaining duplicate set drops the vector
    assert idx.remove_ids([120]) == 1
    assert idx.ntotal == 119 and idx.n_instances == 38
    _, L1 = idx.search_numpy(base[:1], 1, nprobe=idx.nlist)
    assert L1[0][0] not in (0, 120, 150)
    # unknown ids remove nothing
    assert idx.remove_ids([10_000]) == 0


def test_dedup_add_dedups_against_existing_and_within_batch(spark):
    base, V, Q = _dup_fixture()
    idx = _build(spark, V)
    rng = np.random.default_rng(7)
    fresh = rng.uniform(-1, 1, size=(1, 12)).astype(np.float32)
    # batch = copy of stored vector 15 (whose only planted duplicate is
    # id 135), a fresh vector, and the SAME fresh vector again
    # (intra-batch duplicate)
    batch = np.concatenate([base[15:16], fresh, fresh])
    idx.add_numpy(batch, ids=np.array([200, 201, 202]))
    assert idx.ntotal == 121          # only the fresh vector stored
    assert idx.n_instances == 42      # 200 → rep 15, 202 → rep 201
    D5, L5 = idx.search_numpy(base[15:16], 3, nprobe=idx.nlist)
    assert list(L5[0]) == [15, 135, 200]
    Df, Lf = idx.search_numpy(fresh, 2, nprobe=idx.nlist)
    assert list(Lf[0]) == [201, 202]
    assert np.allclose(Df[0], 0.0, atol=1e-9)
    # ids=None continues past instance ids too (202 is only in the map)
    idx.add_numpy(fresh * 0.5)
    hi = idx.assigned.toPandas()["id"].max()
    assert hi == 203


def test_dedup_add_reelects_min_id_representative(spark):
    """The class invariant rep = min external id must survive add: an
    incoming duplicate with a SMALLER id than the stored representative
    takes over as rep (stored row relabels, old rep demotes to the
    instances map, surviving instances follow), so a logical top-k
    under distance ties keeps the smallest-id duplicate first."""
    base, Q = make_fixture(20, 2, 12, seed=11)
    # rebuild with ids 100.. so a later smaller id can arrive
    idx = IVFFlatDedupIndex.from_table(
        VectorTable(spark, 12).add_numpy(base), n_cells=2, sample_size=64
    )
    idx.remove_ids(np.arange(20))
    idx.add_numpy(
        np.concatenate([base, base[:5]]), ids=np.arange(100, 125)
    )
    assert idx.ntotal == 20 and idx.n_instances == 5
    # id 3 duplicates stored vector whose rep is 102 (instance 122)
    idx.add_numpy(base[2:3], ids=np.array([3]))
    assert idx.ntotal == 20 and idx.n_instances == 6
    reps = {r["id"] for r in idx.assigned.select("id").collect()}
    assert 3 in reps and 102 not in reps
    inst = {
        (r["id"], r["dup_id"])
        for r in idx.instances.collect()
    }
    # old rep demoted, its surviving instance relabeled to the new rep
    assert (3, 102) in inst and (3, 122) in inst
    assert not any(rep == 102 for rep, _ in inst)
    # logical search: all three duplicate ids at distance 0, min first
    D, L = idx.search_numpy(base[2:3], 3, nprobe=idx.nlist)
    assert list(L[0]) == [3, 102, 122]
    assert np.allclose(D[0], 0.0, atol=1e-9)


def test_dedup_io_roundtrip_and_clone(spark, tmp_path):
    from faiss_metal_spark.sources.index_io import (
        clone_index,
        read_index,
        write_index,
    )

    base, V, Q = _dup_fixture()
    idx = _build(spark, V)
    D, L = idx.search_numpy(Q, 5, nprobe=idx.nlist)
    path = str(tmp_path / "dedup_idx")
    write_index(idx, path)
    idx2 = read_index(spark, path)
    assert isinstance(idx2, IVFFlatDedupIndex)
    assert idx2.ntotal == 120 and idx2.n_instances == 40
    D2, L2 = idx2.search_numpy(Q, 5, nprobe=idx2.nlist)
    assert np.array_equal(L, L2) and np.allclose(D, D2)
    cl = clone_index(idx)
    D3, L3 = cl.search_numpy(Q, 5, nprobe=cl.nlist)
    assert np.array_equal(L, L3)
    # mutating the clone never touches the original
    cl.remove_ids([0, 120, 150])
    _, L4 = idx.search_numpy(base[:1], 3, nprobe=idx.nlist)
    assert list(L4[0]) == [0, 120, 150]
    with pytest.raises(NotImplementedError):
        idx.reconstruct(0)


def test_factory_flatdedup_and_rflat_suffix(spark):
    base, V, Q = _dup_fixture()
    vt = _table(spark, V)
    idx = index_factory(vt, "IVF4,FlatDedup", sample_size=len(V))
    assert isinstance(idx, IVFFlatDedupIndex) and idx.ntotal == 120

    # ",RFlat" suffix wraps any spec in the exact-rescore refine stage
    ref = index_factory(vt, "SQ8,RFlat", k_factor=8)
    assert isinstance(ref, RefineIndex) and ref.k_factor == 8
    D, L = ref.search_numpy(Q, 3)
    Do, Lo = numpy_oracle(V, Q, 3)
    # refined distances are EXACT L2 on the refine path; with k_factor=8
    # over 8-bit codes the top-1 must be recovered
    assert np.array_equal(L[:, 0], Lo[:, 0])
    assert np.allclose(D[:, 0], Do[:, 0], rtol=1e-9)
    with pytest.raises(ValueError):
        index_factory(vt, "NoSuchThing,RFlat")


def test_dedup_refuses_unsupported_ops(spark):
    """faiss IndexIVFFlatDedup marks reconstruct / range_search /
    update_vectors 'not implemented' — ours refuses explicitly too."""
    base, V, Q = _dup_fixture()
    idx = _build(spark, V)
    with pytest.raises(NotImplementedError):
        idx.range_search(None, 1.0)
    with pytest.raises(NotImplementedError):
        idx.update_vectors([0], V[:1])


def test_refine_index_io_roundtrip_and_clone(spark, tmp_path):
    """faiss persists IndexRefineFlat: the wrapper round-trips as a
    recursive base payload + the full-precision source frame +
    k_factor, value-identical pre/post reload, for two different base
    kinds (the generic-wrapper point)."""
    from faiss_metal_spark import IVFIndex
    from faiss_metal_spark.sources.index_io import (
        clone_index,
        read_index,
        write_index,
    )

    base, V, Q = _dup_fixture()
    vt = _table(spark, V)
    for spec, kw in (
        ("SQ8,RFlat", {}),
        ("IVF4,RFlat", {"sample_size": len(V)}),
    ):
        ref = index_factory(vt, spec, k_factor=6, **kw)
        assert isinstance(ref, RefineIndex)
        D, L = ref.search_numpy(Q, 4)
        path = str(tmp_path / spec.replace(",", "_"))
        write_index(ref, path)
        back = read_index(spark, path)
        assert isinstance(back, RefineIndex) and back.k_factor == 6
        D2, L2 = back.search_numpy(Q, 4)
        assert np.array_equal(L, L2) and np.allclose(D, D2)
        cl = clone_index(ref)
        _, L3 = cl.search_numpy(Q, 4)
        assert np.array_equal(L, L3)


def test_dedup_remove_ids_accepts_selectors(spark):
    """faiss passes an IDSelector& to IndexIVFFlatDedup::remove_ids
    too (r10): a range selector resolves to the matching LOGICAL ids
    (representatives AND side-map instances) and runs the same
    promotion bookkeeping; a bare 2-tuple refuses."""
    import pytest

    from faiss_metal_spark import IDSelectorRange

    base, V, Q = _dup_fixture()
    idx = _build(spark, V)
    # [0, 2): removes rep 0 (its duplicates 120/150 survive via
    # promotion) and rep 1 (likewise 121/151)
    removed = idx.remove_ids(IDSelectorRange(0, 2))
    assert removed == 2
    assert idx.ntotal == 120 and idx.n_instances == 38
    D0, L0 = idx.search_numpy(base[:1], 2, nprobe=idx.nlist)
    assert list(L0[0]) == [120, 150]  # promoted duplicates still serve
    # selector over side-map-only ids removes instances
    assert idx.remove_ids(IDSelectorRange(150, 152)) == 2
    assert idx.n_instances == 36
    with pytest.raises(TypeError, match="2-tuple is ambiguous"):
        idx.remove_ids((0, 5))
    # empty selector removes nothing
    assert idx.remove_ids(IDSelectorRange(90_000, 90_001)) == 0
