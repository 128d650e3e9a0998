"""Binary (Hamming) index and SQ8 scalar quantizer — numpy-pinned.

Both operators are Catalyst-only paths whose driver-gate oracle lives in
__spark_entry__ (ann_binary / ann_sq8); these tests pin the semantics
against independent numpy reimplementations on random data, including
the edge shapes the oracle queries don't reach (d not a multiple of 32,
constant dimensions, k > ntotal candidates in the refine prefilter).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from faiss_metal_spark.operators.binary import (
    binarize,
    hamming_knn,
    hamming_refine,
)
from faiss_metal_spark.operators.sq import (
    sq8_encode,
    sq8_encode_binary,
    sq8_decode_binary,
    sq8_search,
    sq8_train,
)

from conftest import make_fixture


def _dfs(spark, V, Q):
    vdf = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(len(V)), "vec": [v.tolist() for v in V]}),
        "id long, vec array<float>",
    )
    qdf = spark.createDataFrame(
        pd.DataFrame({"qid": np.arange(len(Q)), "vec": [v.tolist() for v in Q]}),
        "qid long, vec array<float>",
    )
    return vdf, qdf


def _hamming_np(V, Q):
    return ((Q > 0)[:, None, :] != (V > 0)[None, :, :]).sum(-1)


@pytest.mark.parametrize("d", [32, 45, 64])  # 45: NULL tail in last word
def test_hamming_knn_matches_numpy(spark, d):
    V, Q = make_fixture(150, 6, d, seed=11 + d)
    vdf, qdf = _dfs(spark, V, Q)
    k = 12
    res = hamming_knn(vdf, qdf, k, d).toPandas().sort_values(["qid", "rank"])
    H = _hamming_np(V, Q)
    for q in range(len(Q)):
        order = np.lexsort((np.arange(len(V)), H[q]))[:k]
        got = res[res.qid == q]
        assert (got.label.to_numpy() == order).all()
        assert (got.distance.to_numpy() == H[q][order]).all()


def test_hamming_packed_store_equals_on_the_fly(spark):
    d = 45
    V, Q = make_fixture(120, 4, d, seed=3)
    vdf, qdf = _dfs(spark, V, Q)
    direct = hamming_knn(vdf, qdf, 8, d).toPandas()
    packed = binarize(vdf, d)
    # stored words are non-negative 32-bit packs (DuckDB-expressible)
    wp = packed.select(F.explode("words").alias("w")).toPandas()["w"]
    assert (wp >= 0).all() and (wp < 2**32).all()
    via_store = hamming_knn(
        packed, qdf, 8, d, vec_col="words", packed=True
    ).toPandas()
    key = ["qid", "rank"]
    assert (
        direct.sort_values(key).reset_index(drop=True)
        == via_store.sort_values(key).reset_index(drop=True)
    ).all().all()


def test_hamming_refine_rescores_exactly(spark):
    d, k, factor = 64, 5, 4
    V, Q = make_fixture(200, 5, d, seed=9)
    vdf, qdf = _dfs(spark, V, Q)
    res = (
        hamming_refine(vdf, qdf, k, d, refine_factor=factor)
        .toPandas()
        .sort_values(["qid", "rank"])
    )
    H = _hamming_np(V, Q)
    for q in range(len(Q)):
        cand = np.lexsort((np.arange(len(V)), H[q]))[: k * factor]
        l2 = ((Q[q].astype(np.float64) - V[cand].astype(np.float64)) ** 2).sum(-1)
        order = cand[np.lexsort((cand, l2))][:k]
        got = res[res.qid == q]
        assert (got.label.to_numpy() == order).all()
        assert np.allclose(got.distance.to_numpy(), l2[np.lexsort((cand, l2))][:k])


def _sq8_np(V):
    Vd = V.astype(np.float64)
    vmin, vmax = Vd.min(0), Vd.max(0)
    rng = vmax - vmin
    safe = np.where(rng == 0.0, 1.0, rng)
    codes = np.clip(np.floor((Vd - vmin) / safe * 255.0 + 0.5), 0, 255)
    codes[:, rng == 0.0] = 0.0
    return vmin, vmax, codes.astype(np.int64)


def test_sq8_train_encode_match_numpy(spark):
    V, _ = make_fixture(250, 1, 24, seed=21)
    V[:, 7] = 0.5  # constant dim must encode 0 / reconstruct exactly
    vdf, _ = _dfs(spark, V, V[:1])
    vmin, vmax = sq8_train(vdf)
    nvmin, nvmax, ncodes = _sq8_np(V)
    assert np.array_equal(vmin, nvmin) and np.array_equal(vmax, nvmax)
    got = np.stack(
        sq8_encode(vdf, vmin, vmax).toPandas().sort_values("id")["code"].to_numpy()
    )
    assert (got == ncodes).all()


def test_sq8_binary_layout_roundtrip(spark):
    """BINARY store: codes identical to the Catalyst array codes; decode
    reconstructs within half a quantization step everywhere."""
    V, _ = make_fixture(100, 1, 16, seed=5)
    vdf, _ = _dfs(spark, V, V[:1])
    vmin, vmax = sq8_train(vdf)
    _, _, ncodes = _sq8_np(V)
    pdf = vdf.select(
        "id",
        sq8_encode_binary("vec", vmin, vmax).alias("b"),
        sq8_decode_binary(sq8_encode_binary("vec", vmin, vmax), vmin, vmax).alias("r"),
    ).toPandas().sort_values("id")
    packed = np.stack([np.frombuffer(b, np.uint8) for b in pdf["b"]])
    assert (packed == ncodes).all()
    recon = np.stack(pdf["r"].to_numpy())
    step = (vmax - vmin) / 255.0
    assert (np.abs(recon - V.astype(np.float64)) <= step / 2 + 1e-12).all()


def test_sq8_search_matches_numpy(spark):
    V, Q = make_fixture(300, 6, 24, seed=33)
    vdf, qdf = _dfs(spark, V, Q)
    k = 10
    vmin, vmax = sq8_train(vdf)
    codes = sq8_encode(vdf, vmin, vmax)
    res = sq8_search(codes, vmin, vmax, qdf, k).toPandas().sort_values(["qid", "rank"])
    _, _, ncodes = _sq8_np(V)
    R = vmin + ncodes * ((vmax - vmin) / 255.0)
    D = ((Q.astype(np.float64)[:, None, :] - R[None, :, :]) ** 2).sum(-1)
    for q in range(len(Q)):
        order = np.lexsort((np.arange(len(V)), D[q]))[:k]
        got = res[res.qid == q]
        assert (got.label.to_numpy() == order).all()
        assert np.allclose(got.distance.to_numpy(), D[q][order])


def test_binary_sq8_plans_stay_jvm_side(spark):
    """Plan discipline: both compact-index search paths are pure
    Catalyst — broadcast query side, no Python stage anywhere, and the
    only shuffle is the per-qid top-k window."""
    from faiss_metal_spark.plans.report import assert_plan

    V, Q = make_fixture(100, 4, 32, seed=2)
    vdf, qdf = _dfs(spark, V, Q)
    r = assert_plan(hamming_knn(vdf, qdf, 5, 32), min_broadcasts=1)
    assert not r.has_python_stage
    vmin, vmax = sq8_train(vdf)
    codes = sq8_encode(vdf, vmin, vmax)
    r = assert_plan(sq8_search(codes, vmin, vmax, qdf, 5), min_broadcasts=1)
    assert not r.has_python_stage


def test_sq8_quantization_error_bounded(spark):
    """End-to-end sanity: SQ8 top-1 of a stored vector queried by itself
    is itself, with distance ≤ d·(step/2)² (sum of per-dim max error²)."""
    V, _ = make_fixture(120, 1, 32, seed=8)
    vdf, _ = _dfs(spark, V, V[:1])
    vmin, vmax = sq8_train(vdf)
    codes = sq8_encode(vdf, vmin, vmax)
    qdf = spark.createDataFrame(
        pd.DataFrame({"qid": [17], "vec": [V[17].tolist()]}),
        "qid long, vec array<float>",
    )
    top = sq8_search(codes, vmin, vmax, qdf, 1).toPandas()
    assert top.label[0] == 17
    bound = (((vmax - vmin) / 255.0 / 2.0) ** 2).sum() + 1e-12
    assert top.distance[0] <= bound


# -- b-bit generalization: SQ4 / SQ6 (faiss QT_4bit / QT_6bit) --------------

from faiss_metal_spark.operators.sq import (  # noqa: E402
    sq_code_size,
    sq_decode_binary,
    sq_decode_np,
    sq_encode,
    sq_encode_binary,
    sq_encode_np,
    sq_pack_np,
    sq_search,
    sq_train,
    sq_unpack_np,
)


@pytest.mark.parametrize("bits", [4, 6, 8])
@pytest.mark.parametrize("d", [1, 7, 8, 33])
def test_sq_pack_unpack_roundtrip(bits, d):
    """Bit-packing is lossless at every width × ragged tail shape, and
    the packed row is exactly ceil(d·bits/8) bytes (faiss code_size)."""
    rng = np.random.default_rng(bits * 100 + d)
    codes = rng.integers(0, 1 << bits, size=(9, d)).astype(np.uint8)
    packed = sq_pack_np(codes, bits)
    assert packed.shape == (9, sq_code_size(d, bits))
    assert np.array_equal(sq_unpack_np(packed, d, bits), codes)


@pytest.mark.parametrize("bits", [4, 6])
def test_sq_bbit_search_matches_numpy(spark, bits):
    """Asymmetric b-bit search ≡ numpy: L = 2^bits − 1 levels, exact
    query vs reconstructed codes, ties by label."""
    V, Q = make_fixture(200, 5, 16, seed=40 + bits)
    V[:, 3] = -0.25  # constant dim: encodes 0, reconstructs exactly
    vdf, qdf = _dfs(spark, V, Q)
    k = 8
    vmin, vmax = sq_train(vdf)
    codes = sq_encode(vdf, vmin, vmax, bits)
    res = (
        sq_search(codes, vmin, vmax, qdf, k, bits)
        .toPandas()
        .sort_values(["qid", "rank"])
    )
    ncodes = sq_encode_np(V, vmin, vmax, bits)
    R = sq_decode_np(ncodes, vmin, vmax, bits)
    assert (ncodes < (1 << bits)).all()
    assert np.allclose(R[:, 3], -0.25)
    D = ((Q.astype(np.float64)[:, None, :] - R[None, :, :]) ** 2).sum(-1)
    for q in range(len(Q)):
        order = np.lexsort((np.arange(len(V)), D[q]))[:k]
        got = res[res.qid == q]
        assert (got.label.to_numpy() == order).all()
        assert np.allclose(got.distance.to_numpy(), D[q][order])


@pytest.mark.parametrize("bits", [4, 6])
def test_sq_bbit_binary_layout_roundtrip(spark, bits):
    """Packed BINARY store: bytes ≡ numpy pack of the Catalyst codes;
    decode reconstructs within half a quantization step."""
    d = 21  # ragged at both widths (21·4 = 84 bits, 21·6 = 126 bits)
    V, _ = make_fixture(80, 1, d, seed=bits)
    vdf, _ = _dfs(spark, V, V[:1])
    vmin, vmax = sq_train(vdf)
    enc = sq_encode_binary("vec", vmin, vmax, bits)
    pdf = (
        vdf.select("id", enc.alias("b"), sq_decode_binary(enc, vmin, vmax, bits).alias("r"))
        .toPandas()
        .sort_values("id")
    )
    expect = sq_pack_np(sq_encode_np(V, vmin, vmax, bits), bits)
    got = np.stack([np.frombuffer(b, np.uint8) for b in pdf["b"]])
    assert got.shape[1] == sq_code_size(d, bits)
    assert np.array_equal(got, expect)
    recon = np.stack(pdf["r"].to_numpy())
    step = (vmax - vmin) / float((1 << bits) - 1)
    assert (np.abs(recon - V.astype(np.float64)) <= step / 2 + 1e-12).all()


def test_sq_error_shrinks_with_bits():
    """Mean reconstruction error strictly improves with width — the
    accuracy/footprint dial the tiers exist for."""
    rng = np.random.default_rng(77)
    X = rng.normal(size=(500, 32))
    vmin, vmax = X.min(0), X.max(0)
    errs = {
        b: np.abs(sq_decode_np(sq_encode_np(X, vmin, vmax, b), vmin, vmax, b) - X).mean()
        for b in (4, 6, 8)
    }
    assert errs[8] < errs[6] < errs[4]


def test_sq_bbit_index_factory_and_io_roundtrip(spark, tmp_path):
    """index_factory('SQ4'/'SQ6'/'SQfp16') → the right tier; the b-bit
    SQ index round-trips through write_index/read_index (bits survives)
    with value-identical search; sa codec honors the packed code size."""
    from faiss_metal_spark import SQ8Index, VectorTable, index_factory
    from faiss_metal_spark.sources.index_io import read_index, write_index

    V, Q = make_fixture(150, 4, 12, seed=9)
    vt = VectorTable.from_pandas(
        spark,
        pd.DataFrame({"vec": [v.tolist() for v in V]}),
        d=12,
    )
    idx = index_factory(vt, "SQ4")
    assert isinstance(idx, SQ8Index) and idx.bits == 4
    assert index_factory(vt, "SQ6").bits == 6
    half = index_factory(vt, "SQfp16")
    assert isinstance(half, VectorTable) and half.compact and half.storage == "fp16"
    assert half.ntotal == 150

    assert idx.sa_code_size == sq_code_size(12, 4)
    codes = idx.sa_encode(V[:5].astype(np.float64))
    assert all(len(c) == idx.sa_code_size for c in codes)
    back = idx.sa_decode(codes)
    step = (idx.vmax - idx.vmin) / 15.0
    assert (np.abs(back - V[:5].astype(np.float64)) <= step / 2 + 1e-6).all()

    p = str(tmp_path / "sq4_idx")
    write_index(idx, p)
    idx2 = read_index(spark, p)
    assert isinstance(idx2, SQ8Index) and idx2.bits == 4
    D1, L1 = idx.search_numpy(Q, 6)
    D2, L2 = idx2.search_numpy(Q, 6)
    assert np.array_equal(L1, L2) and np.allclose(D1, D2)


# ---------------------------------------------------------------------------
# IVFSQ: IVF cells over SQ codes (faiss IndexIVFScalarQuantizer)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bits", [8, 4])
def test_ivfsq_full_probe_equals_flat_sq(spark, bits):
    """nprobe = nlist degrades IVFSQ to the flat SQ answer exactly: the
    SQ range train is deterministic over the same corpus, so the codes
    are identical — only the cell routing differs, and a full probe
    makes it a no-op (faiss's own IVF degradation contract)."""
    from faiss_metal_spark import IVFSQIndex, SQ8Index, VectorTable

    V, Q = make_fixture(500, 6, 16, seed=23)
    vt = VectorTable(spark, 16).add_numpy(V)
    flat = SQ8Index.from_table(vt, bits=bits)
    ivfsq = IVFSQIndex.from_table(vt, n_cells=8, bits=bits, sample_size=500)
    np.testing.assert_array_equal(flat.vmin, ivfsq.vmin)
    np.testing.assert_array_equal(flat.vmax, ivfsq.vmax)
    D0, L0 = flat.search_numpy(Q, 10)
    D1, L1 = ivfsq.search_numpy(Q, 10, nprobe=ivfsq.nlist)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_allclose(D0, D1, rtol=0, atol=1e-9)
    # partial probe: results are a subset of the corpus with correctly
    # computed asymmetric distances (never a false distance)
    D2, L2 = ivfsq.search_numpy(Q, 10, nprobe=2)
    from faiss_metal_spark.operators.sq import sq_decode_np, sq_encode_np

    R = sq_decode_np(sq_encode_np(V, ivfsq.vmin, ivfsq.vmax, bits),
                     ivfsq.vmin, ivfsq.vmax, bits)
    for qi in range(len(Q)):
        for j in range(10):
            lbl = L2[qi, j]
            if lbl < 0:
                continue
            exact = ((Q[qi].astype(np.float64) - R[lbl]) ** 2).sum()
            assert abs(D2[qi, j] - exact) <= 1e-9
    flat.release()
    ivfsq.release()


def test_ivfsq_range_search_full_probe_exact(spark):
    """Full-probe IVFSQ range_search returns exactly the pairs whose
    asymmetric (decoded-code) distance beats the radius."""
    from faiss_metal_spark import IVFSQIndex, VectorTable
    from faiss_metal_spark.operators.sq import sq_decode_np, sq_encode_np

    V, Q = make_fixture(300, 5, 12, seed=29)
    vt = VectorTable(spark, 12).add_numpy(V)
    idx = IVFSQIndex.from_table(vt, n_cells=4, sample_size=300)
    R = sq_decode_np(sq_encode_np(V, idx.vmin, idx.vmax, 8), idx.vmin, idx.vmax, 8)
    D = ((Q.astype(np.float64)[:, None, :] - R[None, :, :]) ** 2).sum(-1)
    radius = float(np.quantile(D, 0.1))
    want = {(qi, vi) for qi, vi in zip(*np.nonzero(D < radius))}

    qdf = _dfs(spark, V, Q)[1]
    got_rows = idx.range_search(qdf, radius, nprobe=idx.nlist).collect()
    got = {(int(r["qid"]), int(r["label"])) for r in got_rows}
    assert got == want
    for r in got_rows:
        assert abs(r["distance"] - D[int(r["qid"]), int(r["label"])]) <= 1e-9
    # partial probe: subset, never a false positive
    sub = {
        (int(r["qid"]), int(r["label"]))
        for r in idx.range_search(qdf, radius, nprobe=1).collect()
    }
    assert sub <= want
    idx.release()


# ---------------------------------------------------------------------------
# Binary IVF (faiss IndexBinaryIVF): Hamming coarse quantizer
# ---------------------------------------------------------------------------


def test_binary_ivf_full_probe_equals_flat_and_roundtrips(spark, tmp_path):
    """nprobe = nlist makes BinaryIVF ≡ flat Hamming search exactly
    (integer distances — no tolerance); partial probe yields a subset
    of the corpus with exact Hamming distances; write_index round-trips
    the tier with the cell-partitioned words layout."""
    from faiss_metal_spark import (
        BinaryIndex,
        BinaryIVFIndex,
        VectorTable,
        index_factory,
        read_index,
        write_index,
    )
    from faiss_metal_spark.operators.binary import binarize_np

    V, Q = make_fixture(400, 6, 40, seed=31)  # d=40: ragged last word
    vt = VectorTable(spark, 40).add_numpy(V)
    flat = BinaryIndex.from_table(vt)
    idx = index_factory(vt, "BIVF8", sample_size=400)
    assert isinstance(idx, BinaryIVFIndex) and idx.nlist == 8

    D0, L0 = flat.search_numpy(Q, 10)
    D1, L1 = idx.search_numpy(Q, 10, nprobe=idx.nlist)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_array_equal(D0, D1)

    # partial probe: every distance is the true Hamming distance
    Hq = binarize_np(Q)
    Hv = binarize_np(V)
    H = np.zeros((len(Q), len(V)), np.int64)
    for w in range(Hq.shape[1]):
        H += np.vectorize(lambda x: bin(x).count("1"))(
            np.bitwise_xor(Hq[:, w][:, None], Hv[:, w][None, :])
        )
    D2, L2 = idx.search_numpy(Q, 10, nprobe=2)
    for qi in range(len(Q)):
        for j in range(10):
            if L2[qi, j] >= 0:
                assert D2[qi, j] == H[qi, L2[qi, j]]

    write_index(idx, str(tmp_path / "bivf"))
    idx2 = read_index(spark, str(tmp_path / "bivf"))
    assert isinstance(idx2, BinaryIVFIndex) and idx2.ntotal == 400
    assert idx2.centroid_words.dtype == np.int64
    np.testing.assert_array_equal(idx.centroid_words, idx2.centroid_words)
    D3, L3 = idx2.search_numpy(Q, 10, nprobe=2)
    np.testing.assert_array_equal(L2, L3)
    np.testing.assert_array_equal(D2, D3)
    flat.release()
    idx.release()


def test_binary_ivf_assignment_matches_numpy(spark):
    """The Catalyst Hamming cell assignment ties out against numpy
    argmin (ties → lowest cell id) exactly."""
    from faiss_metal_spark import BinaryIVFIndex, VectorTable
    from faiss_metal_spark.operators.binary import binarize_np

    V, _ = make_fixture(300, 1, 24, seed=37)
    vt = VectorTable(spark, 24).add_numpy(V)
    idx = BinaryIVFIndex.from_table(vt, n_cells=6, sample_size=300)
    Hv = binarize_np(V)
    Hc = idx.centroid_words
    H = np.zeros((len(V), len(Hc)), np.int64)
    for w in range(Hv.shape[1]):
        H += np.vectorize(lambda x: bin(x).count("1"))(
            np.bitwise_xor(Hv[:, w][:, None], Hc[:, w][None, :])
        )
    want = H.argmin(1)  # numpy argmin already ties to the lowest index
    got = (
        idx.words.select("id", "cell").orderBy("id").toPandas()["cell"].to_numpy()
    )
    np.testing.assert_array_equal(got, want)
    idx.release()
