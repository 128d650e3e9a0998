"""RQIndex — faiss IndexResidualQuantizer (greedy additive quantizer).

Contract model (faiss ResidualQuantizer with beam_size=1 — greedy
stage-wise training/encoding; the reference engine has no compressed
tier at all, /root/reference/include/faiss-metal/MetalIndexFlat.h:47).
Pins:

- the distributed encode is byte-identical to the host codec
  (``rq_assign_np``), and the stored ``recn`` equals the squared norm
  of the additive reconstruction;
- asymmetric LUT search returns EXACTLY the distances a
  decode-then-score float64 oracle computes (the additive identity is
  algebraically exact, not an approximation over the codes);
- mean reconstruction error is non-increasing in the stage prefix
  (stage j is trained on stage j−1's residual);
- frozen-state ``add`` ≡ the host codec; ``sa_encode``/``sa_decode``
  round-trip; IO kind 'rq' round-trips value-identically;
- ``index_factory("RQ<m>x8")`` builds the tier.
"""

import numpy as np
import pytest

from faiss_metal_spark import RQIndex, VectorTable, read_index, write_index
from faiss_metal_spark.compact_index import index_factory
from faiss_metal_spark.operators.rq import rq_assign_np, rq_decode_np

from conftest import make_fixture, numpy_oracle


def _table(spark, V) -> VectorTable:
    vt = VectorTable(spark, V.shape[1], metric="l2")
    return vt.add_numpy(V)


def _correlated(n, d, seed=7):
    """Low-rank + noise — the regime where additive beats sliced."""
    rng = np.random.default_rng(seed)
    B = rng.normal(size=(4, d))
    return (rng.normal(size=(n, 4)) @ B + 0.05 * rng.normal(size=(n, d))).astype(
        np.float32
    )


def test_encode_matches_host_codec(spark):
    V, _ = make_fixture(300, 1, 16)
    idx = RQIndex.from_table(_table(spark, V), m=4, sample_size=300)
    rows = {r["id"]: r for r in idx.codes.collect()}
    want = rq_assign_np(V.astype(np.float64), idx.codebooks)
    for i in range(300):
        got = np.frombuffer(rows[i]["code"], np.uint8)
        np.testing.assert_array_equal(got, want[i])
        rec = rq_decode_np(want[i][None, :], idx.codebooks)[0]
        assert abs(rows[i]["recn"] - (rec * rec).sum()) < 1e-9


def test_search_equals_decode_oracle(spark):
    V, Q = make_fixture(320, 6, 16)
    idx = RQIndex.from_table(_table(spark, V), m=4, sample_size=320)
    codes = rq_assign_np(V.astype(np.float64), idx.codebooks)
    R = rq_decode_np(codes, idx.codebooks)  # (n, d) reconstructions
    D_e, L_e = numpy_oracle(R, Q, 10)
    D, L = idx.search_numpy(Q, 10)
    np.testing.assert_array_equal(L, L_e)
    np.testing.assert_allclose(D, D_e, atol=1e-9)


def test_reconstruction_error_non_increasing_in_stages(spark):
    V = _correlated(400, 16)
    vt = _table(spark, V)
    idx = RQIndex.from_table(vt, m=4, sample_size=400)
    codes = rq_assign_np(V.astype(np.float64), idx.codebooks)
    errs = []
    for m_pfx in (1, 2, 4):
        R = rq_decode_np(codes[:, :m_pfx], idx.codebooks[:m_pfx])
        errs.append(((V - R) ** 2).sum(1).mean())
    assert errs[0] >= errs[1] >= errs[2]
    assert errs[2] < errs[0]  # extra stages actually help


def test_add_remove_reconstruct_io_factory(spark, tmp_path):
    V, Q = make_fixture(300, 3, 16)
    vt = _table(spark, V)
    idx = index_factory(vt, "RQ4x8", sample_size=300)
    assert isinstance(idx, RQIndex) and idx.ntotal == 300
    assert idx.sa_code_size == 4

    # frozen-state add ≡ host codec
    idx.add_numpy(V[:4] + 0.01, ids=np.arange(300, 304))
    assert idx.ntotal == 304
    rows = {r["id"]: r["code"] for r in idx.codes.where("id >= 300").collect()}
    want = rq_assign_np((V[:4] + 0.01).astype(np.float64), idx.codebooks)
    for i in range(4):
        np.testing.assert_array_equal(
            np.frombuffer(rows[300 + i], np.uint8), want[i]
        )

    # reconstruct = additive decode of the stored code
    np.testing.assert_allclose(
        idx.reconstruct(7),
        rq_decode_np(
            rq_assign_np(V[7:8].astype(np.float64), idx.codebooks), idx.codebooks
        )[0],
        atol=1e-12,
    )
    with pytest.raises(KeyError):
        idx.reconstruct(99999)

    # sa codec round-trip
    sa = idx.sa_encode(V[:5])
    np.testing.assert_allclose(
        idx.sa_decode(sa),
        rq_decode_np(
            rq_assign_np(V[:5].astype(np.float64), idx.codebooks), idx.codebooks
        ).astype(np.float32),
        atol=0,
    )

    # IO round-trip value-identical
    D0, L0 = idx.search_numpy(Q, 5)
    write_index(idx, str(tmp_path / "rq"))
    idx2 = read_index(spark, str(tmp_path / "rq"))
    assert isinstance(idx2, RQIndex) and idx2.ntotal == 304
    D1, L1 = idx2.search_numpy(Q, 5)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_allclose(D0, D1, atol=1e-12)

    assert idx.remove_ids([300, 99999]) == 1
    assert idx.ntotal == 303


def test_empty_queries_and_dim_guard(spark):
    V, _ = make_fixture(300, 1, 8)
    idx = RQIndex.from_table(_table(spark, V), m=2, sample_size=300)
    empty = idx.search(
        idx.spark.createDataFrame([], "qid long, vec array<double>"), 5
    )
    assert empty.count() == 0
    with pytest.raises(ValueError, match="dim"):
        idx.search_numpy(np.zeros((1, 9)), 5)


def test_rq_beam_encode(spark):
    """faiss ResidualQuantizer::max_beam_size: beam=1 is bit-identical
    to the greedy chain; a wider beam lowers mean reconstruction error
    on correlated data; the index carries its beam through add and the
    sa codec, and IO round-trips it."""
    import numpy as np
    from faiss_metal_spark import RQIndex
    from faiss_metal_spark.operators.rq import (
        rq_assign_np,
        rq_decode_np,
        rq_train,
    )
    from faiss_metal_spark.sources.index_io import read_index, write_index
    from conftest import make_fixture

    rng = np.random.default_rng(77)
    # cross-dimension correlated data (the regime where additive stages
    # and a wider beam both earn their keep)
    Z = rng.normal(size=(600, 4))
    V = (Z @ rng.normal(size=(4, 16)) + 0.05 * rng.normal(size=(600, 16))).astype(
        np.float32
    )
    from faiss_metal_spark import VectorTable

    vt = VectorTable(spark, 16).add_numpy(V)
    X = V.astype(np.float64)
    books = rq_train(vt.df.select("id", "vec"), 4, sample_size=600, iters=5)

    greedy = rq_assign_np(X, books)
    assert np.array_equal(rq_assign_np(X, books, beam=1), greedy)
    b4 = rq_assign_np(X, books, beam=4)
    mse = lambda c: ((X - rq_decode_np(c, books)) ** 2).sum(1).mean()  # noqa: E731
    assert mse(b4) < mse(greedy)

    idx = RQIndex.from_table(vt, m=4, sample_size=600, iters=5, beam=4)
    assert idx.beam == 4
    # the stored codes are the beam codes, and the sa codec agrees
    stored = idx.codes.orderBy("id").toPandas()
    got = np.stack([np.frombuffer(c, np.uint8) for c in stored["code"]])
    assert np.array_equal(got, b4)
    sa = idx.sa_encode(V[:5])
    assert np.array_equal(
        np.stack([np.frombuffer(c, np.uint8) for c in sa]), b4[:5]
    )

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        write_index(idx, f"{td}/rq")
        idx2 = read_index(spark, f"{td}/rq")
        assert idx2.beam == 4
        # add after reload keeps encoding with the same beam
        idx2.add_numpy(V[:3], ids=np.array([9000, 9001, 9002]))
        tail = idx2.codes.where("id >= 9000").orderBy("id").toPandas()
        got2 = np.stack([np.frombuffer(c, np.uint8) for c in tail["code"]])
        assert np.array_equal(got2, b4[:3])


def test_rq_icm_refinement(spark):
    """LSQ's ICM encode move over the residual codebooks: coordinate
    descent, so per-vector reconstruction error NEVER increases (the
    invariant beam search cannot offer), composes with beam, strictly
    helps on correlated data, and the index carries its sweeps through
    add + the sa codec + IO."""
    import numpy as np
    from faiss_metal_spark import RQIndex, VectorTable
    from faiss_metal_spark.operators.rq import (
        rq_assign_np,
        rq_decode_np,
        rq_icm_refine_np,
        rq_train,
    )
    from faiss_metal_spark.sources.index_io import read_index, write_index

    rng = np.random.default_rng(88)
    Z = rng.normal(size=(500, 4))
    V = (Z @ rng.normal(size=(4, 12)) + 0.05 * rng.normal(size=(500, 12))).astype(
        np.float32
    )
    vt = VectorTable(spark, 12).add_numpy(V)
    X = V.astype(np.float64)
    books = rq_train(vt.df.select("id", "vec"), 4, sample_size=500, iters=5)

    greedy = rq_assign_np(X, books)
    err = lambda c: ((X - rq_decode_np(c, books)) ** 2).sum(1)  # noqa: E731
    refined = rq_icm_refine_np(X, books, greedy, sweeps=2)
    # per-vector monotone (coordinate descent); greedy can already be
    # an ICM fixed point, so strict descent is pinned from a perturbed
    # start instead: scramble stage 0 and ICM must strictly recover
    assert (err(refined) <= err(greedy) + 1e-9).all()
    bad = greedy.copy()
    bad[:, 0] = (bad[:, 0] + 7) % books.shape[1]
    fixed = rq_icm_refine_np(X, books, bad, sweeps=2)
    assert (err(fixed) <= err(bad) + 1e-9).all()
    assert err(fixed).mean() < err(bad).mean()
    # and the recovery lands at-or-below the greedy chain everywhere
    assert (err(fixed) <= err(greedy) + 1e-9).all()
    # composes with beam, same invariant
    b2 = rq_assign_np(X, books, beam=2)
    b2_icm = rq_assign_np(X, books, beam=2, icm_sweeps=2)
    assert (err(b2_icm) <= err(b2) + 1e-9).all()
    # zero sweeps is the identity path
    assert np.array_equal(rq_assign_np(X, books, icm_sweeps=0), greedy)

    idx = RQIndex.from_table(vt, m=4, sample_size=500, iters=5, icm_sweeps=2)
    assert idx.icm_sweeps == 2
    stored = idx.codes.orderBy("id").toPandas()
    got = np.stack([np.frombuffer(c, np.uint8) for c in stored["code"]])
    assert np.array_equal(got, refined)
    sa = idx.sa_encode(V[:4])
    assert np.array_equal(
        np.stack([np.frombuffer(c, np.uint8) for c in sa]), refined[:4]
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        write_index(idx, f"{td}/rq")
        assert read_index(spark, f"{td}/rq").icm_sweeps == 2


def test_lut_broadcast_ceiling_guard(spark, monkeypatch):
    """The (nq, m_total, 256) ADC LUT broadcast gets the same
    _MAX_BROADCAST_ELEMS discipline as pq.py: past the ceiling every
    RQ/PRQ entry point (top-k AND range) raises with the
    chunked_queries remedy instead of OOMing an executor."""
    from faiss_metal_spark import PRQIndex
    from faiss_metal_spark.operators import knn as knn_mod
    from faiss_metal_spark.operators import rq as rq_mod

    V, Q = make_fixture(300, 3, 16)
    vt = _table(spark, V)
    idx = RQIndex.from_table(vt, m=4, sample_size=300, iters=3)
    pidx = PRQIndex.from_table(vt, nsplits=2, m=2, sample_size=300, iters=3)
    qdf = spark.createDataFrame(
        [(int(i), [float(v) for v in Q[i]]) for i in range(len(Q))],
        "qid long, vec array<double>",
    )
    # 3 queries × 4 stages × 256 = 3072 elems — a ceiling of 1000 trips
    monkeypatch.setattr(knn_mod, "_MAX_BROADCAST_ELEMS", 1000)
    for call in (
        lambda: rq_mod.rq_search(idx.codes, idx.codebooks, qdf, 5),
        lambda: rq_mod.prq_search(pidx.codes, pidx.codebooks, qdf, 5),
        lambda: rq_mod.rq_range_search(idx.codes, idx.codebooks, qdf, 1.0),
        lambda: rq_mod.prq_range_search(pidx.codes, pidx.codebooks, qdf, 1.0),
    ):
        with pytest.raises(ValueError, match="chunked_queries"):
            call()
    # under the ceiling everything still runs
    monkeypatch.setattr(knn_mod, "_MAX_BROADCAST_ELEMS", 8_000_000)
    assert rq_mod.rq_search(idx.codes, idx.codebooks, qdf, 5).count() == 15


def test_code_width_mismatch_raises(spark):
    """Stale/mismatched codebooks (fewer stages than the stored code
    width, same d) must raise, not silently score a prefix of each
    code while recn reflects the full reconstruction — the pq.py
    ivfpq_search width-guard discipline on the additive tiers."""
    V, Q = make_fixture(300, 2, 8)
    idx = RQIndex.from_table(_table(spark, V), m=4, sample_size=300, iters=3)
    from faiss_metal_spark.operators.rq import rq_range_search, rq_search

    qdf = spark.createDataFrame(
        [(int(i), [float(v) for v in Q[i]]) for i in range(len(Q))],
        "qid long, vec array<double>",
    )
    stale = idx.codebooks[:2]  # same d, fewer stages
    with pytest.raises(Exception, match="code width"):
        rq_search(idx.codes, stale, qdf, 3).collect()
    with pytest.raises(Exception, match="code width"):
        rq_range_search(idx.codes, stale, qdf, 10.0).collect()


def test_range_search_dim_guard(spark):
    """rq/prq range_search validate the query dimension up front (the
    same 'query dim X != codebook dim Y' ValueError as top-k search),
    instead of an opaque einsum broadcast error."""
    from faiss_metal_spark import PRQIndex

    V, _ = make_fixture(300, 1, 8)
    vt = _table(spark, V)
    idx = RQIndex.from_table(vt, m=2, sample_size=300, iters=3)
    pidx = PRQIndex.from_table(vt, nsplits=2, m=2, sample_size=300, iters=3)
    bad = spark.createDataFrame(
        [(0, [0.0] * 9)], "qid long, vec array<double>"
    )
    with pytest.raises(ValueError, match="query dim 9"):
        idx.range_search(bad, 1.0)
    with pytest.raises(ValueError, match="query dim 9"):
        pidx.range_search(bad, 1.0)
