"""write_index / read_index round-trips — faiss persistence parity.

Contract: a reloaded index is the same type, carries the same metadata,
and searches value-identically (faiss::write_index/read_index, which the
reference inherits via its faiss::Index base —
/root/reference/include/faiss-metal/MetalIndexFlat.h:47). Cell-keyed
kinds must come back with the inverted-list parquet layout so probes
still prune partitions.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faiss_metal_spark import (
    BinaryIndex,
    IVFIndex,
    IVFPQIndex,
    OPQIndex,
    SQ8Index,
    VectorTable,
    read_index,
    write_index,
)

from conftest import make_fixture, queries_df


def _table(spark, V, **kw) -> VectorTable:
    vt = VectorTable(spark, V.shape[1], **kw)
    return vt.add_numpy(V)


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"storage": "fp16"},
        {"storage": "bf16", "compact": True},
    ],
    ids=["fp32", "fp16", "bf16_compact"],
)
def test_vector_table_roundtrip(spark, tmp_path, kw):
    V, Q = make_fixture(200, 5, 16)
    vt = _table(spark, V, **kw)
    D0, L0 = vt.search_numpy(Q, 10)

    write_index(vt, str(tmp_path / "idx"))
    vt2 = read_index(spark, str(tmp_path / "idx"))

    assert isinstance(vt2, VectorTable)
    assert (vt2.d, vt2.metric, vt2.storage, vt2.compact) == (
        vt.d,
        vt.metric,
        vt.storage,
        vt.compact,
    )
    D1, L1 = vt2.search_numpy(Q, 10)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_array_equal(D0, D1)


def test_vector_table_roundtrip_continues_ids(spark, tmp_path):
    """next_id survives the round-trip: adds after reload keep
    appending, never reuse ids (the faiss add contract)."""
    V, _ = make_fixture(50, 1, 8)
    vt = _table(spark, V)
    write_index(vt, str(tmp_path / "idx"))
    vt2 = read_index(spark, str(tmp_path / "idx"))
    vt2.add_numpy(V[:7])
    ids = sorted(r["id"] for r in vt2.df.select("id").collect())
    assert ids == list(range(57))


def test_sq8_roundtrip(spark, tmp_path):
    V, Q = make_fixture(300, 4, 12, seed=3)
    idx = SQ8Index.from_table(_table(spark, V))
    D0, L0 = idx.search_numpy(Q, 8)
    write_index(idx, str(tmp_path / "sq8"))
    idx2 = read_index(spark, str(tmp_path / "sq8"))
    assert isinstance(idx2, SQ8Index) and idx2.ntotal == 300
    np.testing.assert_array_equal(idx.vmin, idx2.vmin)
    np.testing.assert_array_equal(idx.vmax, idx2.vmax)
    D1, L1 = idx2.search_numpy(Q, 8)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_array_equal(D0, D1)


def test_binary_roundtrip_with_refine(spark, tmp_path):
    V, Q = make_fixture(300, 4, 32, seed=5)
    idx = BinaryIndex.from_table(_table(spark, V))
    D0, L0 = idx.search_numpy(Q, 8)
    R0 = idx.refine_search_numpy(Q, 5)
    write_index(idx, str(tmp_path / "bin"))
    idx2 = read_index(spark, str(tmp_path / "bin"))
    assert isinstance(idx2, BinaryIndex) and idx2.ntotal == 300
    D1, L1 = idx2.search_numpy(Q, 8)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_array_equal(D0, D1)
    # the persisted source table keeps the refine tier alive
    R1 = idx2.refine_search_numpy(Q, 5)
    np.testing.assert_array_equal(R0[1], R1[1])
    np.testing.assert_array_equal(R0[0], R1[0])


def test_ivf_roundtrip_prunes_partitions(spark, tmp_path):
    V, Q = make_fixture(600, 6, 16, seed=7)
    idx = IVFIndex.from_table(_table(spark, V), n_cells=8, sample_size=600)
    D0, L0 = idx.search_numpy(Q, 8, nprobe=3)
    write_index(idx, str(tmp_path / "ivf"))
    idx2 = read_index(spark, str(tmp_path / "ivf"))
    assert isinstance(idx2, IVFIndex)
    assert (idx2.nlist, idx2.metric, idx2.ntotal) == (8, idx.metric, 600)
    np.testing.assert_allclose(idx.centroids, idx2.centroids)
    D1, L1 = idx2.search_numpy(Q, 8, nprobe=3)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_array_equal(D0, D1)
    # the reloaded inverted file keeps the partitioned layout: the probe
    # filter must reach the scan as a PartitionFilters entry on cell
    plan = idx2.search(queries_df(spark, Q), 8, nprobe=3)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters")[1][:160]


def test_ivfpq_roundtrip(spark, tmp_path):
    V, Q = make_fixture(600, 6, 16, seed=9)
    idx = IVFPQIndex.from_table(_table(spark, V), n_cells=4, m=4, sample_size=600)
    D0, L0 = idx.search_numpy(Q, 8, nprobe=2)
    write_index(idx, str(tmp_path / "ivfpq"))
    idx2 = read_index(spark, str(tmp_path / "ivfpq"))
    assert isinstance(idx2, IVFPQIndex) and idx2.ntotal == 600
    np.testing.assert_allclose(idx.codebooks, idx2.codebooks)
    D1, L1 = idx2.search_numpy(Q, 8, nprobe=2)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_array_equal(D0, D1)


def test_ivfsq_roundtrip_prunes_partitions(spark, tmp_path):
    from faiss_metal_spark import IVFSQIndex

    V, Q = make_fixture(600, 6, 16, seed=13)
    idx = IVFSQIndex.from_table(_table(spark, V), n_cells=8, sample_size=600)
    D0, L0 = idx.search_numpy(Q, 8, nprobe=3)
    write_index(idx, str(tmp_path / "ivfsq"))
    idx2 = read_index(spark, str(tmp_path / "ivfsq"))
    assert isinstance(idx2, IVFSQIndex)
    assert (idx2.nlist, idx2.metric, idx2.ntotal, idx2.bits) == (
        8,
        idx.metric,
        600,
        8,
    )
    np.testing.assert_array_equal(idx.vmin, idx2.vmin)
    np.testing.assert_array_equal(idx.vmax, idx2.vmax)
    D1, L1 = idx2.search_numpy(Q, 8, nprobe=3)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_array_equal(D0, D1)
    # reloaded inverted file keeps the cell-partitioned layout
    plan = (
        idx2.search(queries_df(spark, Q), 8, nprobe=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters")[1][:160]


def test_opq_roundtrip(spark, tmp_path):
    V, Q = make_fixture(400, 4, 16, seed=11)
    idx = OPQIndex.from_table(_table(spark, V), m=4, iters=2, sample_size=400)
    D0, L0 = idx.search_numpy(Q, 6)
    write_index(idx, str(tmp_path / "opq"))
    idx2 = read_index(spark, str(tmp_path / "opq"))
    assert isinstance(idx2, OPQIndex) and idx2.ntotal == 400
    np.testing.assert_allclose(idx.rotation, idx2.rotation)
    D1, L1 = idx2.search_numpy(Q, 6)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_array_equal(D0, D1)


def test_write_index_rejects_unknown(spark, tmp_path):
    with pytest.raises(TypeError):
        write_index(object(), str(tmp_path / "nope"))


def test_pq_roundtrip(spark, tmp_path):
    from faiss_metal_spark import PQIndex

    V, Q = make_fixture(400, 4, 16, seed=15)
    idx = PQIndex.from_table(_table(spark, V), m=4, iters=3, sample_size=400)
    D0, L0 = idx.search_numpy(Q, 6)
    write_index(idx, str(tmp_path / "pq"))
    idx2 = read_index(spark, str(tmp_path / "pq"))
    assert isinstance(idx2, PQIndex) and idx2.ntotal == 400
    D1, L1 = idx2.search_numpy(Q, 6)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_array_equal(D0, D1)


def test_index_factory_specs(spark):
    """index_factory maps the FAISS spec vocabulary onto the derived
    tiers; every tier self-queries sanely (top-1 = self for the exact
    tiers) and unknown specs raise like FAISS."""
    from faiss_metal_spark import (
        IVFIndex,
        IVFPQIndex,
        OPQIndex,
        PQIndex,
        index_factory,
    )

    V, _ = make_fixture(300, 1, 16, seed=17)
    vt = _table(spark, V)
    kw = {"sample_size": 300}
    assert index_factory(vt, "Flat") is vt
    assert isinstance(index_factory(vt, "SQ8"), SQ8Index)
    assert isinstance(index_factory(vt, "BFlat"), BinaryIndex)
    assert isinstance(index_factory(vt, "PQ4", iters=2, **kw), PQIndex)
    ivf = index_factory(vt, "IVF8,Flat", **kw)
    assert isinstance(ivf, IVFIndex) and ivf.nlist == 8
    assert isinstance(index_factory(vt, "IVF4,PQ4", **kw), IVFPQIndex)
    from faiss_metal_spark import IVFSQIndex

    ivfsq = index_factory(vt, "IVF4,SQ4", **kw)
    assert isinstance(ivfsq, IVFSQIndex) and ivfsq.bits == 4
    assert isinstance(index_factory(vt, "OPQ4,PQ4", iters=2, **kw), OPQIndex)
    # exact-tier self query: top-1 is self
    D, L = ivf.search_numpy(V[:3], 1, nprobe=8)
    np.testing.assert_array_equal(L[:, 0], np.arange(3))
    np.testing.assert_allclose(D[:, 0], 0, atol=1e-9)
    with pytest.raises(ValueError):
        index_factory(vt, "LSH32,Zn")
    with pytest.raises(ValueError):
        index_factory(vt, "OPQ4,PQ8")


def test_tune_nprobe_operating_points(spark):
    """tune_nprobe sweeps doubling nprobe values against the index's
    full-probe baseline and returns the smallest meeting the target;
    recall along the sweep is achievable and the full-probe point is
    exact by construction."""
    from faiss_metal_spark import IVFIndex
    from faiss_metal_spark.functions.evaluate import tune_nprobe

    V, Q = make_fixture(800, 10, 16, seed=21)
    idx = IVFIndex.from_table(_table(spark, V), n_cells=16, sample_size=800)
    out = tune_nprobe(idx, queries_df(spark, Q), k=5, target_recall=0.9)
    assert 1 <= out["nprobe"] <= idx.nlist
    assert out["points"][-1]["recall"] >= 0.9
    # a loose target is met by a small probe count; an impossible-to-
    # beat-early target falls back to the exact full probe
    strict = tune_nprobe(idx, queries_df(spark, Q), k=5, target_recall=1.01)
    assert strict["nprobe"] == idx.nlist
    assert strict["points"][-1] == {"nprobe": idx.nlist, "recall": 1.0}
    idx.release()


def test_tune_nprobe_ivfpq(spark):
    """tune_nprobe over IVFPQIndex: the full-probe baseline is the ADC
    ceiling (recall 1.0 vs itself by construction), so the sweep
    isolates coarse-quantizer loss — the knob nprobe actually controls
    — not PQ quantization error."""
    from faiss_metal_spark import IVFPQIndex
    from faiss_metal_spark.functions.evaluate import tune_nprobe

    V, Q = make_fixture(600, 8, 16, seed=33)
    idx = IVFPQIndex.from_table(
        _table(spark, V), n_cells=8, m=4, sample_size=600, iters=3
    )
    out = tune_nprobe(idx, queries_df(spark, Q), k=5, target_recall=0.8)
    assert 1 <= out["nprobe"] <= idx.nlist
    # sweep is monotone-ascending in nprobe and ends meeting the target
    probes = [pt["nprobe"] for pt in out["points"]]
    assert probes == sorted(probes)
    assert out["points"][-1]["recall"] >= 0.8
    # impossible target → full probe, which is exact vs the ADC ceiling
    strict = tune_nprobe(idx, queries_df(spark, Q), k=5, target_recall=1.01)
    assert strict["nprobe"] == idx.nlist
    assert strict["points"][-1] == {"nprobe": idx.nlist, "recall": 1.0}


def test_compact_store_bounds_files_and_preserves_pruning(spark, tmp_path):
    """compact_store rewrites a many-small-files partitioned store into
    ceil(rows/target) files per partition with identical contents and
    intact partition pruning."""
    import glob

    from faiss_metal_spark.sources.layout import compact_store

    src = str(tmp_path / "src")
    # simulate 6 tiny ingest batches over 3 cells -> many small files
    for i in range(6):
        spark.createDataFrame(
            [(i * 10 + j, i % 3, float(j)) for j in range(10)],
            "id long, cell int, val double",
        ).coalesce(2).write.mode("append").partitionBy("cell").parquet(src)
    n_src_files = len(glob.glob(f"{src}/cell=*/*.parquet"))
    assert n_src_files >= 12

    dst = str(tmp_path / "dst")
    compact_store(spark, src, dst, target_rows_per_file=1_000_000)
    n_dst_files = len(glob.glob(f"{dst}/cell=*/*.parquet"))
    assert n_dst_files == 3  # one file per cell at this size

    import pandas as pd

    a = spark.read.parquet(src).orderBy("id").toPandas()
    b = spark.read.parquet(dst).orderBy("id").toPandas()
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True)[sorted(a.columns)],
        b.reset_index(drop=True)[sorted(b.columns)],
    )
    probed = spark.read.parquet(dst).where(F.col("cell") == 1)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters")[1][:120]


def test_compact_store_skewed_partitions(spark, tmp_path):
    """Under partition skew the sub-key modulus must be PER cell, not
    the global max: a hot cell needing many files must not drag every
    small cell into that many tiny files (that would recreate the
    small-files problem compaction exists to fix)."""
    import glob

    from faiss_metal_spark.sources.layout import compact_store

    src = str(tmp_path / "skew_src")
    rows = [(i, 0, float(i)) for i in range(500)]  # hot cell: 500 rows
    rows += [(1000 + i, 1, float(i)) for i in range(10)]  # cold: 10
    rows += [(2000 + i, 2, float(i)) for i in range(10)]  # cold: 10
    spark.createDataFrame(
        rows, "id long, cell int, val double"
    ).repartition(8).write.partitionBy("cell").parquet(src)

    dst = str(tmp_path / "skew_dst")
    compact_store(spark, src, dst, target_rows_per_file=100)
    per_cell = {
        c: len(glob.glob(f"{dst}/cell={c}/*.parquet")) for c in (0, 1, 2)
    }
    # hot cell: ceil(500/100) = 5 files; cold cells: exactly 1 each —
    # the pre-fix behavior gave the cold cells up to 5 tiny files too
    assert per_cell[1] == 1 and per_cell[2] == 1
    assert 1 <= per_cell[0] <= 5
    # contents identical
    assert spark.read.parquet(dst).count() == 520
    a = spark.read.parquet(src).orderBy("id").toPandas()
    b = spark.read.parquet(dst).orderBy("id").toPandas()
    assert (a["id"].to_numpy() == b["id"].to_numpy()).all()


def test_versioned_store_pointer(spark, tmp_path):
    """Versioned stores: writers target next_store_version_path, readers
    resolve current_store_path; a version without its success marker is
    invisible (a crashed rewrite changes nothing)."""
    import os

    from faiss_metal_spark.sources.layout import (
        compact_store,
        current_store_path,
        next_store_version_path,
        store_versions,
    )

    base = str(tmp_path / "store")
    assert store_versions(spark, base) == []
    with pytest.raises(FileNotFoundError):
        current_store_path(spark, base)

    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)], "id long, cell int, val double"
    )
    v1 = next_store_version_path(spark, base)
    assert v1.endswith("_v1")
    df.write.partitionBy("cell").parquet(v1)
    assert store_versions(spark, base) == [1]
    assert current_store_path(spark, base) == v1

    # compact current -> next; the pointer flips only after commit
    v2 = next_store_version_path(spark, base)
    assert v2.endswith("_v2")
    compact_store(spark, current_store_path(spark, base), v2)
    assert current_store_path(spark, base) == v2
    assert spark.read.parquet(v2).count() == 30

    # an uncommitted version directory (no _SUCCESS) is ignored
    os.makedirs(f"{base}/_v3/cell=0", exist_ok=True)
    with open(f"{base}/_v3/cell=0/part-junk.parquet", "wb") as f:
        f.write(b"")
    assert store_versions(spark, base) == [1, 2]
    assert current_store_path(spark, base) == v2


def test_write_index_prunes_old_versions(spark, tmp_path):
    """Repeated rewrites keep only the newest ``keep_versions``
    committed versions (default 2: current + one for concurrent
    readers) — storage stays bounded where faiss overwrites in place."""
    from faiss_metal_spark.sources.index_io import _index_versions

    V, Q = make_fixture(60, 3, 8, seed=91)
    vt = _table(spark, V)
    p = str(tmp_path / "idx")
    for _ in range(4):
        write_index(vt, p)
    assert _index_versions(spark, p) == [3, 4]
    reload = read_index(spark, p)
    D0, L0 = vt.search_numpy(Q, 4)
    D1, L1 = reload.search_numpy(Q, 4)
    np.testing.assert_array_equal(L0, L1)
    np.testing.assert_array_equal(D0, D1)
    # keep_versions=1 prunes everything but the newest
    write_index(vt, p, keep_versions=1)
    assert _index_versions(spark, p) == [5]


def test_write_index_empty_table_roundtrip(spark, tmp_path):
    """A fresh empty VectorTable round-trips: ntotal 0, searches emit
    all-sentinel rows (MetalIndexFlat.mm:328-334 semantics preserved
    across persistence)."""
    vt = VectorTable(spark, d=8)
    p = str(tmp_path / "empty_idx")
    write_index(vt, p)
    reload = read_index(spark, p)
    assert reload.ntotal == 0
    D, L = reload.search_numpy(np.zeros((2, 8), np.float32), 3)
    assert (L == -1).all()
    assert np.isinf(D).all()


def test_compact_store_null_partition_cell(spark, tmp_path):
    """A NULL-keyed partition cell is a legitimate cell: it must split
    into ceil(rows/target) files like any other, not collapse into one
    file because the per-cell file-count join missed it (null != null
    under a plain equi-join; the join is eqNullSafe)."""
    import glob

    from faiss_metal_spark.sources.layout import compact_store

    src = str(tmp_path / "null_src")
    rows = [(i, None, float(i)) for i in range(300)]  # null cell: 300
    rows += [(1000 + i, 1, float(i)) for i in range(10)]
    spark.createDataFrame(
        rows, "id long, cell int, val double"
    ).repartition(4).write.partitionBy("cell").parquet(src)

    dst = str(tmp_path / "null_dst")
    compact_store(spark, src, dst, target_rows_per_file=100)
    null_files = glob.glob(f"{dst}/cell=__HIVE_DEFAULT_PARTITION__/*.parquet")
    assert 2 <= len(null_files) <= 3  # ceil(300/100), not 1
    assert len(glob.glob(f"{dst}/cell=1/*.parquet")) == 1
    a = spark.read.parquet(src).orderBy("id").toPandas()
    b = spark.read.parquet(dst).orderBy("id").toPandas()
    assert (a["id"].to_numpy() == b["id"].to_numpy()).all()
    assert b["cell"].isna().sum() == 300


def test_graph_index_build_search_roundtrip(spark, tmp_path):
    """GraphIndex (faiss IndexHNSWFlat workflow): factory spec HNSW<M>
    builds the NN-Descent graph tier; beam search finds self as top-1
    for this fixture/config (approximate search — not a universal
    guarantee, but deterministic for a fixed seed, so a change here is
    a routing regression); write_index round-trips the graph + vectors
    with value-identical search."""
    from faiss_metal_spark import GraphIndex, index_factory

    V, Q = make_fixture(300, 4, 16, seed=19)
    vt = _table(spark, V)
    idx = index_factory(vt, "HNSW8", iters=2, ef_search=32)
    assert isinstance(idx, GraphIndex) and idx.M == 8 and idx.ntotal == 300

    D0, L0 = idx.search_numpy(V[:4], 5)
    np.testing.assert_array_equal(L0[:, 0], np.arange(4))
    np.testing.assert_allclose(D0[:, 0], 0.0, atol=1e-9)

    write_index(idx, str(tmp_path / "graph"))
    idx2 = read_index(spark, str(tmp_path / "graph"))
    assert isinstance(idx2, GraphIndex)
    assert (idx2.M, idx2.ef_search, idx2.ntotal) == (8, 32, 300)
    Dq, Lq = idx.search_numpy(Q, 5)
    D1, L1 = idx2.search_numpy(Q, 5)
    np.testing.assert_array_equal(Lq, L1)
    np.testing.assert_array_equal(Dq, D1)
    idx.release()
