"""Post-train add on the FLAT compressed tiers — faiss parity.

faiss allows ``add`` after ``train`` on every flat code index
(IndexScalarQuantizer, IndexBinaryFlat, IndexPQ, IndexPreTransform,
IndexLSH): encode against the frozen trained state and append, never
retrain (the reference inherits the same contract through its
faiss::Index base, /root/reference/include/faiss-metal/
MetalIndexFlat.h:47). Pin: building a tier from the first part of a
corpus and adding the rest yields EXACTLY the code/word rows of a
one-shot build over everything, provided the trained state is shared
— and the refine tiers' rescore source grows in step with the add.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faiss_metal_spark import (
    BinaryIndex,
    LSHIndex,
    OPQIndex,
    PQIndex,
    SQ8Index,
    VectorTable,
)

from conftest import make_fixture


def _table(spark, V) -> VectorTable:
    vt = VectorTable(spark, V.shape[1], metric="l2")
    return vt.add_numpy(V)


def _rows(df, cols):
    return sorted(
        tuple(bytes(r[c]) if isinstance(r[c], (bytes, bytearray)) else tuple(r[c]) if isinstance(r[c], list) else r[c] for c in cols)
        for r in df.collect()
    )


@pytest.mark.parametrize("kind", ["sq8", "binary", "pq", "opq", "lsh"])
def test_flat_add_equals_one_shot(spark, kind):
    V, _ = make_fixture(400, 1, 16)
    vt_all = _table(spark, V)
    cut = 300

    if kind == "sq8":
        one = SQ8Index.from_table(vt_all, bits=8)
        grown = SQ8Index(
            spark, one.d, one.vmin, one.vmax,
            one.codes.where(F.col("id") < cut).persist(), cut, one.bits,
        )
        frame, cols = "codes", ("id", "code")
    elif kind == "binary":
        one = BinaryIndex.from_table(vt_all)
        grown = BinaryIndex(
            spark, one.d,
            one.words.where(F.col("id") < cut).persist(),
            one._source.where(F.col("id") < cut), cut,
        )
        frame, cols = "words", ("id", "words")
    elif kind == "pq":
        one = PQIndex.from_table(vt_all, m=4, sample_size=400)
        grown = PQIndex(
            spark, one.d, one.codebooks,
            one.codes.where(F.col("id") < cut).persist(), cut,
        )
        frame, cols = "codes", ("id", "code")
    elif kind == "opq":
        one = OPQIndex.from_table(vt_all, m=4, sample_size=400, iters=4)
        grown = OPQIndex(
            spark, one.d, one.rotation, one.codebooks,
            one.codes.where(F.col("id") < cut).persist(), cut,
        )
        frame, cols = "codes", ("id", "code")
    else:
        one = LSHIndex.from_table(vt_all, nbits=32, seed=9)
        grown = LSHIndex(
            spark, one.d, one.nbits, one.rotation,
            one.words.where(F.col("id") < cut).persist(),
            one._source.where(F.col("id") < cut), cut,
        )
        frame, cols = "words", ("id", "words")

    grown.add_numpy(V[cut:], ids=np.arange(cut, 400))
    assert grown.ntotal == 400
    assert _rows(getattr(grown, frame), cols) == _rows(getattr(one, frame), cols)


def test_flat_add_default_ids_continue(spark):
    V, _ = make_fixture(300, 1, 16)
    idx = SQ8Index.from_table(_table(spark, V), bits=8)
    idx.add_numpy(V[:3])
    top = idx.codes.agg(F.max("id")).first()[0]
    assert top == 302  # continues from max(id)+1
    assert idx.ntotal == 303


def test_binary_refine_source_grows_with_add(spark):
    V, Q = make_fixture(300, 3, 16)
    extra = (V[:3] + 0.01).astype(np.float32)
    idx = BinaryIndex.from_table(_table(spark, V))
    idx.add_numpy(extra, ids=np.arange(300, 303))
    D, L = idx.refine_search_numpy(extra, k=1, refine_factor=8)
    # the added rows are findable AND their refine distances are the
    # exact L2 against the grown source (0 to themselves)
    np.testing.assert_array_equal(np.sort(L[:, 0]), np.arange(300, 303))
    np.testing.assert_allclose(D[:, 0], 0.0, atol=1e-9)


def test_lsh_add_searchable_and_exact_words(spark):
    V, _ = make_fixture(200, 1, 16)
    idx = LSHIndex.from_table(_table(spark, V), nbits=32, seed=4)
    new = V[:5] * 0.5
    idx.add_numpy(new, ids=np.arange(200, 205))
    got = {
        int(r["id"]): np.asarray(r["words"], np.int64)
        for r in idx.words.where(F.col("id") >= 200).collect()
    }
    want = idx.sa_encode(new)
    for i in range(5):
        np.testing.assert_array_equal(
            got[200 + i], np.frombuffer(want[i], np.int64)
        )


@pytest.mark.parametrize("kind", ["sq8", "binary", "pq", "opq", "lsh"])
def test_flat_remove_ids(spark, kind):
    """remove_ids on the flat tiers: count returned, absent ids ignored,
    no renumbering (explicit labels), removed rows unfindable."""
    V, Q = make_fixture(300, 2, 16)
    vt = _table(spark, V)
    if kind == "sq8":
        idx = SQ8Index.from_table(vt)
    elif kind == "binary":
        idx = BinaryIndex.from_table(vt)
    elif kind == "pq":
        idx = PQIndex.from_table(vt, m=4, sample_size=300)
    elif kind == "opq":
        idx = OPQIndex.from_table(vt, m=4, sample_size=300, iters=3)
    else:
        idx = LSHIndex.from_table(vt, nbits=32, seed=6)
    assert idx.remove_ids([5, 6, 7, 99999]) == 3
    assert idx.ntotal == 297
    frame = idx.words if kind in ("binary", "lsh") else idx.codes
    left = {r["id"] for r in frame.select("id").collect()}
    assert left == set(range(300)) - {5, 6, 7}  # no renumbering
    _, L = idx.search_numpy(Q, k=297)
    assert not ({5, 6, 7} & set(L.ravel().tolist()))
    if kind in ("binary", "lsh"):  # refine source shrank in step
        src = {r["id"] for r in idx._source.select("id").collect()}
        assert src == left


def test_graph_add_incremental_insertion(spark):
    """GraphIndex.add (faiss IndexHNSW::add, NSW insertion): new nodes
    link bidirectionally into the existing graph, adjacency lists stay
    degree-capped at M, added vectors are reachable (self-query top-1),
    and the grown index keeps its recall on old queries."""
    from faiss_metal_spark import GraphIndex
    from conftest import numpy_oracle

    V, _ = make_fixture(360, 1, 16, seed=13)
    base, extra = V[:300], V[300:]
    vt = _table(spark, base)
    idx = GraphIndex.from_table(vt, M=10, iters=4, seed=3, ef_search=64)
    # grow in two chunks (the sequential-faiss pattern)
    idx.add_numpy(extra[:30], ids=np.arange(300, 330))
    idx.add_numpy(extra[30:], ids=np.arange(330, 360))
    assert idx.ntotal == 360

    deg = idx.graph.groupBy("id").count().agg(F.max("count")).first()[0]
    assert deg <= 10  # shrink-on-insert keeps the M cap

    D, L = idx.search_numpy(extra, k=1)
    self_hit = float((L[:, 0] == np.arange(300, 360)).mean())
    assert self_hit >= 0.85, self_hit

    _, L_exact = numpy_oracle(V, V[:20], 10)
    _, L_got = idx.search_numpy(V[:20], 10)
    recall = np.mean([
        len(set(L_got[i]) & set(L_exact[i])) / 10 for i in range(20)
    ])
    assert recall >= 0.8, recall

    r = idx.reconstruct(305)
    np.testing.assert_allclose(r, extra[5].astype(np.float64), atol=1e-6)


@pytest.mark.parametrize("kind", ["sq8", "pq", "rq"])
def test_flat_tier_merge_from(spark, kind):
    """faiss IndexFlatCodes::merge_from — the flat compressed tiers
    merge like the IVF family: identical trained state required
    (checked exactly), donor codes append with ids shifted by add_id,
    donor emptied; merged search ≡ one-shot build over the union."""
    from faiss_metal_spark import PQIndex, RQIndex, SQ8Index

    V, Q = make_fixture(400, 4, 16, seed=701)
    head, tail = V[:300], V[300:]
    vt_full = _table(spark, V)
    vt_head = _table(spark, head)
    builders = {
        "sq8": lambda vt: SQ8Index.from_table(vt),
        "pq": lambda vt: PQIndex.from_table(vt, m=4, sample_size=400),
        "rq": lambda vt: RQIndex.from_table(vt, m=2, sample_size=400),
    }
    # identical trained state: derive BOTH from the full table's
    # trainer, then strip the acceptor down to the head rows
    full = builders[kind](vt_full)
    acceptor = builders[kind](vt_full)
    acceptor.remove_ids(range(300, 400))
    donor = builders[kind](vt_full)
    donor.remove_ids(range(0, 300))
    # donor ids are 300..399 already; merge with add_id=0 keeps them
    acceptor.merge_from(donor, add_id=0)
    assert acceptor.ntotal == 400 and donor.ntotal == 0

    D1, L1 = full.search_numpy(Q, 5)
    D2, L2 = acceptor.search_numpy(Q, 5)
    assert np.array_equal(L1, L2) and np.allclose(D1, D2)

    # mismatched trained state refuses
    other = builders[kind](_table(spark, V * 1.7))
    with pytest.raises(ValueError):
        acceptor.merge_from(other)
    # cross-type refuses
    with pytest.raises(ValueError):
        acceptor.merge_from(
            builders["pq" if kind != "pq" else "sq8"](vt_full)
        )


def test_add_sa_codes_ingests_codes_verbatim(spark):
    """faiss Index::add_sa_codes — the other half of the standalone
    codec: pre-encoded codes append WITHOUT re-encoding on the
    compressed tiers (byte-identical stored codes; RQ derives its
    recn search term from the codes), and the flat table's decode→add
    is lossless on code values. Wrong-width codes refuse."""
    from faiss_metal_spark import PQIndex, RQIndex, SQ8Index, VectorTable

    V, Q = make_fixture(300, 2, 16, seed=702)
    extra = make_fixture(8, 1, 16, seed=703)[0]
    vt = _table(spark, V)

    for build in (
        lambda: SQ8Index.from_table(vt),
        lambda: PQIndex.from_table(vt, m=4, sample_size=300),
        lambda: RQIndex.from_table(vt, m=2, sample_size=300),
    ):
        idx = build()
        codes = idx.sa_encode(extra.astype(np.float64))
        idx.add_sa_codes(codes, ids=np.arange(500, 508))
        assert idx.ntotal == 308
        # stored codes for the new ids round-trip to the input bytes
        # exactly (PQ/RQ store the bytes verbatim; SQ8 stores the
        # unpacked array<int> form — re-encode via the codec to compare)
        stored = idx.codes.where("id >= 500").orderBy("id").collect()
        assert [r["id"] for r in stored] == list(range(500, 508))
        re_enc = idx.sa_encode(idx.sa_decode([bytes(c) for c in codes]).astype(np.float64))
        assert [bytes(c) for c in re_enc] == [bytes(c) for c in codes]
        if "code" in stored[0].asDict() and isinstance(stored[0]["code"], (bytes, bytearray)):
            assert [bytes(r["code"]) for r in stored] == [bytes(c) for c in codes]
        # searching AT an ingested vector's reconstruction finds it
        rec = idx.sa_decode(codes[:1])
        _, L = idx.search_numpy(rec, 1)
        assert L[0][0] == 500
        with pytest.raises(ValueError):
            idx.add_sa_codes([b"\x00"])
        idx.release()

    # flat table: decode→add, lossless on code values (fp16 storage)
    cvt = VectorTable(spark, 16, storage="fp16", compact=True).add_numpy(V)
    codes = cvt.sa_encode(extra)
    cvt.add_sa_codes(codes)
    assert cvt.ntotal == 308
    assert [bytes(c) for c in cvt.sa_encode(cvt.reconstruct_n(300, 8))] == [
        bytes(c) for c in codes
    ]


def test_merge_from_refuses_duplicate_labels(spark):
    """Two independently built indexes both carry ids 0..n-1; merging
    with the default add_id=0 would silently create duplicate labels —
    a state upstream faiss IndexFlatCodes cannot reach (positional
    ids). The clash is detected exactly (id semi-join) and refused;
    re-basing with add_id succeeds."""
    from faiss_metal_spark import SQ8Index

    V, _ = make_fixture(100, 1, 16, seed=711)
    vt = _table(spark, V)
    a = SQ8Index.from_table(vt)
    b = SQ8Index.from_table(vt)
    with pytest.raises(ValueError, match="collide"):
        a.merge_from(b)          # default add_id=0, ids overlap
    assert a.ntotal == 100 and b.ntotal == 100  # refusal mutated nothing
    a.merge_from(b, add_id=100)
    assert a.ntotal == 200 and b.ntotal == 0
    a.release()

    # the refusal is a DELIBERATE faiss deviation (upstream IVF allows
    # duplicate labels) — check_duplicates=False restores faiss
    # semantics: the merge succeeds and both labels are served
    c = SQ8Index.from_table(vt)
    d = SQ8Index.from_table(vt)
    c.merge_from(d, check_duplicates=False)
    assert c.ntotal == 200 and d.ntotal == 0
    assert int(c.codes.where(F.col("id") == 0).count()) == 2
    c.release()


def test_add_sa_codes_validates_narrow_code_bytes(spark):
    """With nbits<8 a code byte >= 2^nbits must refuse at INGEST (it
    would otherwise explode later as an out-of-bounds codebook gather
    inside an executor during search) — faiss codes are packed so the
    state is unreachable upstream; here bytes carry one sub-code each,
    so the check is explicit."""
    from faiss_metal_spark import PQIndex

    V, _ = make_fixture(200, 1, 16, seed=712)
    idx = PQIndex.from_table(_table(spark, V), m=4, nbits=4, sample_size=200)
    good = idx.sa_encode(V[:2].astype(np.float64))
    idx.add_sa_codes(good, ids=[500, 501])
    assert idx.ntotal == 202
    with pytest.raises(ValueError, match="add_sa_codes.*out of range"):
        idx.add_sa_codes([b"\x10\x00\x00\x00"])  # 16 >= 2^4
    assert idx.ntotal == 202
    idx.release()


def test_idmap_factory_prefix(spark):
    """r12: factory "IDMap,Flat"/"IDMap2,Flat" → the real wrapper
    classes (add refuses without ids — the faiss IndexIDMap contract);
    over a derived tier the prefix refuses with actionable guidance
    (external ids are first-class on every tier here)."""
    import numpy as np
    import pytest

    from faiss_metal_spark import VectorTable, index_factory
    from faiss_metal_spark.vector_table import (
        IDMap2VectorTable,
        IDMapVectorTable,
    )
    from conftest import make_fixture

    V, Q = make_fixture(50, 2, 8)
    vt = VectorTable(spark, 8).add_numpy(V)
    im = index_factory(vt, "IDMap,Flat")
    assert type(im) is IDMapVectorTable and im.ntotal == 50
    with pytest.raises(NotImplementedError, match="add_with_ids"):
        im.add_numpy(V[:1])
    im.add_with_ids(V[:2], np.array([1000, 2000]))
    assert im.ntotal == 52
    D, L = im.search_numpy(Q, 3)
    assert D.shape == (2, 3)

    im2 = index_factory(vt, "IDMap2,Flat")
    assert type(im2) is IDMap2VectorTable
    im2.add_with_ids(V[:1] + 0.5, np.array([7777]))
    np.testing.assert_allclose(
        im2.reconstruct(7777), V[0] + 0.5, rtol=1e-6
    )

    with pytest.raises(ValueError, match="first-class"):
        index_factory(vt, "IDMap,PQ4")
