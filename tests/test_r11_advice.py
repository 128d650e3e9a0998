"""Round-11 ADVICE pinning tests (one per r10 ADVICE item):

1. streaming_kmeans restart reads ONLY the latest snapshot partition
   and the runner compacts old snapshots — driver restart cost is
   bounded for the stream's whole lifetime, not growing per batch.
2. GraphIndex.search_numpy forwards entry/iters, so the legacy
   entry="hash" path is reachable from the numpy surface.
3. max_codes threads through the whole IVF family (IVFSQ/IVFPQ/IMI,
   not just IVFIndex) — faiss SearchParametersIVF::max_codes scope.
4. decontaminate_bloom's cleanup hook releases the persisted eval set
   and destroys the Bloom-bit broadcast.

(Item 5 — bench.py per-timed-run load1m — is pinned in
tests/test_bench_contract.py.)
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import make_fixture


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        schema="doc_id long, text string",
    )


def _qdf(spark, Q):
    return spark.createDataFrame(
        pd.DataFrame(
            {"qid": np.arange(len(Q), dtype=np.int64), "vec": [v.tolist() for v in Q]}
        ),
        "qid long, vec array<float>",
    )


def test_streaming_kmeans_snapshot_compaction(spark, tmp_path):
    """ADVICE r10 #1: a long-lived stream accumulates one k-row center
    snapshot per micro-batch; restart must NOT collect that whole
    history. Pinned: after N batches only the latest snapshot and its
    predecessor remain on disk (recovery needs exactly those two), a
    restart restores from the latest, and compact_snapshots=False
    preserves the full trajectory for consumers who want it."""
    from faiss_metal_spark.streaming.index_ingest import read_vector_stream
    from faiss_metal_spark.streaming.streaming_kmeans import (
        _load_snapshot,
        run_streaming_kmeans,
    )
    from tests.conftest import vectors_df

    V, _ = make_fixture(nv=240, nq=1, d=4, seed=33)
    init = V[:3].astype(np.float64)

    def stage(src, lo, hi, off):
        vectors_df(spark, V[lo:hi]).withColumn(
            "id", F.col("id") + F.lit(off)
        ).coalesce(1).write.mode("append").parquet(str(src))

    def batch_dirs(out):
        import os

        root = f"{out}/centers"
        return sorted(
            int(n.split("=", 1)[1])
            for n in os.listdir(root)
            if n.startswith("batch_id=")
        )

    src, out, cp = tmp_path / "v", str(tmp_path / "o"), str(tmp_path / "c")
    for i in range(3):
        stage(src, i * 80, (i + 1) * 80, i * 80)
    state = run_streaming_kmeans(
        read_vector_stream(spark, str(src), max_files_per_trigger=1),
        init, out, checkpoint=cp, decay=0.5,
    )
    # 3 micro-batches committed; only snapshots {1, 2} survive
    assert state.last_batch_id == 2
    assert batch_dirs(out) == [1, 2]
    got = _load_snapshot(spark, out)
    assert got is not None and got[0] == 2
    np.testing.assert_allclose(got[1], state.centers, atol=1e-12)

    # restart with a 4th staged file: restores from snapshot 2,
    # continues to batch 3, compacts down to {2, 3}
    stage(src, 0, 60, 240)
    state2 = run_streaming_kmeans(
        read_vector_stream(spark, str(src), max_files_per_trigger=1),
        init, out, checkpoint=cp, decay=0.5,
    )
    assert state2.last_batch_id == 3
    assert batch_dirs(out) == [2, 3]

    # opt-out keeps the full trajectory
    src2, out2, cp2 = tmp_path / "v2", str(tmp_path / "o2"), str(tmp_path / "c2")
    for i in range(3):
        stage(src2, i * 80, (i + 1) * 80, i * 80)
    run_streaming_kmeans(
        read_vector_stream(spark, str(src2), max_files_per_trigger=1),
        init, out2, checkpoint=cp2, decay=0.5, compact_snapshots=False,
    )
    assert batch_dirs(out2) == [0, 1, 2]


def test_graph_search_numpy_forwards_entry_and_iters(spark):
    """ADVICE r10 #2: the numpy surface must reach the legacy
    entry="hash" path (and a caller-chosen iteration budget), matching
    the DataFrame surface exactly."""
    from faiss_metal_spark import GraphIndex, VectorTable
    from faiss_metal_spark.compact_index import _host_result, _query_df

    V, Q = make_fixture(200, 4, 8, seed=44)
    vt = VectorTable(spark, 8).add_numpy(V)
    idx = GraphIndex.from_table(vt, M=8, iters=3, seed=5, ef_search=32)

    for entry, iters in (("hash", 4), ("landmarks", 2)):
        Dn, Ln = idx.search_numpy(Q, 3, entry=entry, iters=iters)
        Dd, Ld = _host_result(
            idx.search(_query_df(spark, Q), 3, entry=entry, iters=iters),
            len(Q), 3,
        )
        np.testing.assert_array_equal(Ln, Ld)
        np.testing.assert_allclose(Dn, Dd, atol=1e-12)
    with pytest.raises(ValueError):
        idx.search_numpy(Q, 3, entry="bogus")
    idx.release()


def test_max_codes_whole_ivf_family(spark):
    """ADVICE r10 #3: faiss SearchParametersIVF::max_codes applies to
    every IndexIVF subclass. Pinned per tier (IVFSQ/IVFPQ/IMI): a
    bound >= ntotal reproduces the unrestricted search exactly and
    max_codes=1 reproduces nprobe=1 (whole-list granularity — only the
    first-ranked list ever scans)."""
    from faiss_metal_spark import IMIIndex, IVFPQIndex, IVFSQIndex, VectorTable

    V, Q = make_fixture(300, 4, 16, seed=61)
    vt = VectorTable(spark, 16).add_numpy(V)
    tiers = (
        IVFSQIndex.from_table(vt, n_cells=6, sample_size=300),
        IVFPQIndex.from_table(vt, n_cells=6, m=4, nbits=4, sample_size=300),
        IMIIndex.from_table(vt, b=2, sample_size=300),
    )
    for idx in tiers:
        name = type(idx).__name__
        D0, L0 = idx.search_numpy(Q, 5, nprobe=4)
        D1, L1 = idx.search_numpy(Q, 5, nprobe=4, max_codes=10_000)
        np.testing.assert_array_equal(L0, L1, err_msg=name)
        np.testing.assert_allclose(D0, D1, atol=1e-12, err_msg=name)

        Dp, Lp = idx.search_numpy(Q, 5, nprobe=1)
        Dm, Lm = idx.search_numpy(Q, 5, nprobe=4, max_codes=1)
        np.testing.assert_array_equal(Lp, Lm, err_msg=name)
        np.testing.assert_allclose(Dp, Dm, atol=1e-12, err_msg=name)

        with pytest.raises(ValueError, match="max_codes"):
            idx.search_numpy(Q, 5, nprobe=4, max_codes=0)
        idx.release()


def test_decontaminate_bloom_cleanup_hook(spark):
    """ADVICE r10 #4: repeated decontaminate_bloom calls must not
    accrete executor/driver memory — the cleanup hook unpersists the
    eval shingle set and destroys the Bloom-bit broadcast. Pinned:
    the hook is appended, the result (materialized first) equals the
    exact path, release() runs, and the destroyed broadcast makes
    re-execution fail (proof the release was real, not a no-op)."""
    from faiss_metal_spark.pipeline import decontaminate, decontaminate_bloom

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(200)]
    mk = lambda n: " ".join(rng.choice(vocab, size=n))  # noqa: E731
    ev_texts = [mk(15) for _ in range(10)]
    train_texts = [mk(20) for _ in range(30)]
    train_texts[4] += " " + " ".join(ev_texts[2].split()[:6])
    ev, train = _docs(spark, ev_texts), _docs(spark, train_texts)

    want = {r["id"]: r["n_shared"] for r in decontaminate(train, ev).collect()}
    cleanup: list = []
    out = decontaminate_bloom(train, ev, fpp=0.01, cleanup=cleanup)
    got = {r["id"]: r["n_shared"] for r in out.collect()}
    assert got == want and want
    assert len(cleanup) == 1 and callable(cleanup[0])
    cleanup[0]()
    with pytest.raises(Exception):  # noqa: B017 — destroyed broadcast
        out.collect()
