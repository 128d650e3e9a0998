"""PQ code-width parameter (faiss ProductQuantizer nbits; factory
``PQ<m>x<b>`` / ``IVF<n>,PQ<m>x<b>``).

faiss trains 2^nbits codewords per subspace; every consumer here reads
the width from ``codebooks.shape``, so the parameter only touches the
trainer. Pinned: codes stay below 2^nbits, search ≡ the numpy ADC
oracle exactly at 4 bits, reconstruction error is monotone in width,
IO round-trips the narrow codebooks, bad widths refuse.
"""

import numpy as np
import pytest

from faiss_metal_spark import IVFPQIndex, PQIndex, VectorTable, index_factory
from faiss_metal_spark.operators.pq import (
    pq_assign_np,
    pq_decode_np,
    train_books_np,
)

from conftest import make_fixture


def _table(spark, V) -> VectorTable:
    return VectorTable(spark, V.shape[1]).add_numpy(V)


def test_pq4_search_equals_numpy_adc_oracle(spark):
    V, Q = make_fixture(300, 4, 16, seed=301)
    vt = _table(spark, V)
    idx = index_factory(vt, "PQ4x4", sample_size=300)
    assert isinstance(idx, PQIndex)
    assert idx.nbits == 4 and idx.codebooks.shape == (4, 16, 4)
    codes = pq_assign_np(V.astype(np.float64), idx.codebooks)
    assert codes.max() < 16

    D, L = idx.search_numpy(Q, 5)
    # numpy ADC twin: decode every stored code, exact L2² per subspace
    rec = pq_decode_np(codes, idx.codebooks)
    dist = ((Q.astype(np.float64)[:, None, :] - rec[None, :, :]) ** 2).sum(-1)
    order = np.argsort(dist, axis=1, kind="stable")[:, :5]
    assert np.array_equal(L, order)
    assert np.allclose(D, np.take_along_axis(dist, order, 1), rtol=1e-9)


def test_reconstruction_error_monotone_in_nbits(spark):
    V, _ = make_fixture(400, 1, 16, seed=302)
    X = V.astype(np.float64)
    errs = {}
    for nbits in (2, 4, 8):
        books = train_books_np(X, 4, ksub=1 << nbits)
        rec = pq_decode_np(pq_assign_np(X, books), books)
        errs[nbits] = ((X - rec) ** 2).sum(1).mean()
    assert errs[8] < errs[4] < errs[2]


def test_ivfpq_nbits_and_io_roundtrip(spark, tmp_path):
    from faiss_metal_spark.sources.index_io import read_index, write_index

    V, Q = make_fixture(400, 4, 16, seed=303)
    vt = _table(spark, V)
    idx = index_factory(vt, "IVF4,PQ4x4", sample_size=400)
    assert isinstance(idx, IVFPQIndex) and idx.nbits == 4
    assert idx.codebooks.shape == (4, 16, 4)
    D, L = idx.search_numpy(Q, 5, nprobe=4)
    assert (L >= 0).all()

    path = str(tmp_path / "ivfpq4")
    write_index(idx, path)
    idx2 = read_index(spark, path)
    assert idx2.nbits == 4
    D2, L2 = idx2.search_numpy(Q, 5, nprobe=4)
    assert np.array_equal(L, L2) and np.allclose(D, D2)

    # plain specs keep the 8-bit default; the IVFPQR '+' spec still parses
    assert index_factory(vt, "PQ4", sample_size=400).nbits == 8


def test_bad_nbits_refuses(spark):
    V, _ = make_fixture(300, 1, 16, seed=304)
    vt = _table(spark, V)
    with pytest.raises(ValueError):
        PQIndex.from_table(vt, m=4, nbits=0)
    with pytest.raises(ValueError):
        PQIndex.from_table(vt, m=4, nbits=9)   # >1 byte per sub-code
    with pytest.raises(ValueError):
        # 2^6 = 64 codewords need ≥ 64 training rows
        train_books_np(np.zeros((10, 16)), 4, ksub=64)


def test_opq_nbits(spark):
    from faiss_metal_spark import OPQIndex, index_factory

    V, Q = make_fixture(300, 3, 16, seed=305)
    vt = _table(spark, V)
    idx = index_factory(vt, "OPQ4,PQ4x4", sample_size=300, iters=2)
    assert isinstance(idx, OPQIndex)
    assert idx.codebooks.shape == (4, 16, 4)
    D, L = idx.search_numpy(Q, 3)
    assert (L >= 0).all() and (D >= 0).all()
    with pytest.raises(ValueError):
        index_factory(vt, "OPQ4,PQ8x4")
