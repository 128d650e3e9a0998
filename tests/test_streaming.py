"""Streaming correctness: every streaming aggregation must equal its
batch counterpart after draining the source with availableNow — the
incremental plan and the batch plan are the same logical query."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from faiss_metal_spark.streaming import (
    hourly_counts,
    read_events_stream,
    run_to_memory,
    sessionize,
    user_running_totals,
)

SF_DIR = "/root/testdata/sf0.001"
EVENTS = f"{SF_DIR}/events.parquet"


@pytest.fixture(scope="module")
def batch_events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(EVENTS)
    if dict(df.dtypes)["ts"] in ("bigint", "long"):
        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df


@pytest.fixture(scope="module")
def events_dir(spark, batch_events, tmp_path_factory):
    # The file-stream source wants a directory of standard-layout
    # parquet; stage the table the way a production feed would land it
    # (this also normalizes the source's nanosecond timestamps).
    d = str(tmp_path_factory.mktemp("events_stream"))
    batch_events.write.mode("overwrite").parquet(d)
    return d


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf[sorted(pdf.columns)].sort_values(sorted(pdf.columns), ignore_index=True)


def _stream(spark, events_dir):
    return read_events_stream(spark, events_dir)


def test_stream_hourly_equals_batch(spark, batch_events, events_dir, tmp_path):
    run_to_memory(hourly_counts(_stream(spark, events_dir)), "hourly_t", str(tmp_path / "cp1"))
    got = _normalize(spark.table("hourly_t").toPandas())
    want = _normalize(hourly_counts(batch_events).toPandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0


def test_stream_sessionize_equals_batch(spark, batch_events, events_dir, tmp_path):
    run_to_memory(sessionize(_stream(spark, events_dir)), "sess_t", str(tmp_path / "cp2"))
    got = _normalize(spark.table("sess_t").toPandas())
    want = _normalize(sessionize(batch_events).toPandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0


def test_stateful_running_totals(spark, batch_events, events_dir, tmp_path):
    """applyInPandasWithState totals after draining == batch groupBy."""
    run_to_memory(
        user_running_totals(_stream(spark, events_dir)),
        "totals_t",
        str(tmp_path / "cp3"),
        output_mode="update",
    )
    got = spark.table("totals_t").toPandas()
    # keep the LAST emitted row per user (cumulative — later batches win)
    got = got.groupby("user_id").last().reset_index()
    want = (
        batch_events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .toPandas()
    )
    g = _normalize(got)
    w = _normalize(want)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_watermark_bounds_state(spark, events_dir):
    """The watermarked plan must carry an eventTime watermark node."""
    s = hourly_counts(_stream(spark, events_dir))
    assert "EventTimeWatermark" in s._jdf.queryExecution().analyzed().toString()


def test_knn_stream_equals_batch(spark, tmp_path):
    """Streamed query micro-batches produce exactly the batch results
    (≙ the reference's async ≡ sync assertion, generalized to a feed)."""
    import numpy as np

    from faiss_metal_spark.operators.knn import knn_search
    from faiss_metal_spark.streaming.knn_stream import (
        read_query_stream,
        run_knn_stream,
    )
    from tests.conftest import make_fixture, queries_df, vectors_df

    V, Q = make_fixture(nv=250, nq=12, d=16)
    vdf = vectors_df(spark, V).persist()
    vdf.count()

    # stage the query feed as three files → three micro-batches
    qdir = tmp_path / "queries"
    for i in range(3):
        queries_df(spark, Q[i * 4 : (i + 1) * 4]).withColumn(
            "qid", F.col("qid") + F.lit(i * 4)
        ).coalesce(1).write.mode("append").parquet(str(qdir))

    out = str(tmp_path / "results")
    run_knn_stream(
        vdf,
        read_query_stream(spark, str(qdir), max_files_per_trigger=1),
        k=5,
        checkpoint=str(tmp_path / "cp_knn"),
        results_path=out,
    )
    got = spark.read.parquet(out).orderBy("qid", "rank").toPandas()
    want = (
        knn_search(vdf, queries_df(spark, Q), 5).orderBy("qid", "rank").toPandas()
    )
    assert len(got) == 12 * 5
    np.testing.assert_array_equal(got["label"].to_numpy(), want["label"].to_numpy())
    np.testing.assert_allclose(
        got["distance"].to_numpy(), want["distance"].to_numpy(), rtol=1e-12
    )
    vdf.unpersist()


def test_stream_stream_join_equals_batch(spark, batch_events, events_dir, tmp_path):
    """Watermarked stream-stream join over two feeds of the same source
    equals the batch join with the identical time-bound condition."""
    from faiss_metal_spark.streaming import join_within

    def split(df):
        clicks = df.where(F.col("event_type") == "click").select("user_id", "ts", "event_id")
        purch = df.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
        return clicks, purch

    sc, sp = split(_stream(spark, events_dir))
    run_to_memory(
        join_within(sc, sp, key="user_id", within="30 minutes"),
        "ssj_t",
        str(tmp_path / "cp_ssj"),
        output_mode="append",
    )
    got = spark.table("ssj_t").toPandas()
    bc, bp = split(batch_events)
    want = join_within(bc, bp, key="user_id", within="30 minutes").toPandas()
    assert len(got) == len(want) and len(want) > 0
    g = _normalize(got[["l_event_id", "r_value"]])
    w = _normalize(want[["l_event_id", "r_value"]])
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_stream_sliding_equals_batch(spark, batch_events, events_dir, tmp_path):
    from faiss_metal_spark.streaming import sliding_counts

    run_to_memory(
        sliding_counts(_stream(spark, events_dir)), "slide_t", str(tmp_path / "cp_sl")
    )
    got = _normalize(spark.table("slide_t").toPandas())
    want = _normalize(sliding_counts(batch_events).toPandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # overlapping windows: every event lands in length/slide = 2 windows
    assert int(got["n"].sum()) == 2 * batch_events.count()


def test_dedup_stream_equals_batch(spark, tmp_path):
    """Streaming digest-dedup drains to one row per distinct content;
    the surviving digest set equals the batch form's."""
    from faiss_metal_spark.streaming import dedup_stream

    d = str(tmp_path / "docs_feed")
    pdf_a = pd.DataFrame({"doc_id": [0, 1], "text": ["alpha beta", "gamma delta"]})
    pdf_b = pd.DataFrame({"doc_id": [2, 3], "text": ["alpha beta", "epsilon zeta"]})
    spark.createDataFrame(pdf_a).write.mode("overwrite").parquet(d)
    spark.createDataFrame(pdf_b).write.mode("append").parquet(d)

    batch = spark.read.parquet(d)
    deduped = dedup_stream(batch)
    # output schema == input schema: no internal digest column leaks
    assert deduped.columns == batch.columns
    expect = {r["text"] for r in deduped.collect()}
    assert len(expect) == 3  # the cross-file dup collapsed

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    run_to_memory(
        dedup_stream(stream), "dedup_t", str(tmp_path / "cp_dedup"), output_mode="append"
    )
    got = {r["text"] for r in spark.sql("SELECT text FROM dedup_t").collect()}
    assert got == expect


def test_continuous_topk_equals_batch(spark, tmp_path):
    """Standing queries over a growing vector stream: after the last
    micro-batch, every query's state (rows with n_seen == nv) must
    equal batch knn_search over the full table — the incremental
    add-then-search loop with no re-scan."""
    import numpy as np

    from faiss_metal_spark.operators.knn import knn_search
    from faiss_metal_spark.streaming.continuous_topk import continuous_topk
    from faiss_metal_spark.streaming.ops import run_to_memory
    from tests.conftest import make_fixture, queries_df, vectors_df

    V, Q = make_fixture(nv=300, nq=6, d=16)
    qdf = queries_df(spark, Q)

    vdir = tmp_path / "vecs"
    for i in range(3):
        sl = slice(i * 100, (i + 1) * 100)
        vectors_df(spark, V[sl]).withColumn(
            "id", F.col("id") + F.lit(i * 100)
        ).coalesce(1).write.mode("append").parquet(str(vdir))

    stream = (
        spark.readStream.schema("id long, vec array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(vdir))
    )
    out = continuous_topk(stream, qdf, k=5, metric="l2")
    run_to_memory(
        out, "ctopk", str(tmp_path / "cp_ctopk"), output_mode="update"
    )
    got = spark.sql("select * from ctopk").toPandas()
    # intermediate snapshots exist (the stream emitted before the end)
    assert (got["n_seen"] < 300).any()
    final = (
        got[got["n_seen"] == 300]
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    # continuous_topk accumulates in float64 — compare against the
    # batch path's f64 exactness mode (library default is f32)
    want = (
        knn_search(
            vectors_df(spark, V), qdf, 5, metric="l2", method="gemm",
            compute="f64",
        )
        .orderBy("qid", "rank")
        .toPandas()
    )
    assert len(final) == 6 * 5
    np.testing.assert_array_equal(
        final["label"].to_numpy(), want["label"].to_numpy()
    )
    np.testing.assert_allclose(
        final["distance"].to_numpy(), want["distance"].to_numpy(), rtol=1e-12
    )

    # determinism: a second identical run (fresh checkpoint) emits the
    # SAME rows — chunk ids are content-derived, not per-run randomness
    stream2 = (
        spark.readStream.schema("id long, vec array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(vdir))
    )
    run_to_memory(
        continuous_topk(stream2, qdf, k=5, metric="l2"),
        "ctopk_rerun", str(tmp_path / "cp_ctopk2"), output_mode="update",
    )
    got2 = spark.sql("select * from ctopk_rerun").toPandas()
    cols = ["qid", "rank", "label", "distance", "n_seen"]
    a = got.sort_values(cols).reset_index(drop=True)[cols]
    b = got2.sort_values(cols).reset_index(drop=True)[cols]
    pd_testing_assert = __import__("pandas").testing.assert_frame_equal
    pd_testing_assert(a, b)


def test_continuous_topk_dedups_replayed_vectors(spark, tmp_path):
    """An at-least-once source replaying a whole micro-batch must not
    let any vector occupy two top-k slots: labels stay unique per qid
    and the final top-k equals batch kNN over the DISTINCT vectors.
    With content-derived chunk ids + the recent-chunk state window the
    replayed chunk is also not re-counted: n_seen stays exact (120),
    not the 180 an at-least-once counter would report."""
    import numpy as np

    from faiss_metal_spark.operators.knn import knn_search
    from faiss_metal_spark.streaming.continuous_topk import continuous_topk
    from faiss_metal_spark.streaming.ops import run_to_memory
    from tests.conftest import make_fixture, queries_df, vectors_df

    V, Q = make_fixture(nv=120, nq=4, d=8)
    qdf = queries_df(spark, Q)
    vdir = tmp_path / "vecs"
    # batch 0: first 60; batch 1: REPLAY of first 60; batch 2: rest
    for sl in (slice(0, 60), slice(0, 60), slice(60, 120)):
        off = sl.start
        vectors_df(spark, V[sl]).withColumn(
            "id", F.col("id") + F.lit(off)
        ).coalesce(1).write.mode("append").parquet(str(vdir))

    stream = (
        spark.readStream.schema("id long, vec array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(vdir))
    )
    run_to_memory(
        continuous_topk(stream, qdf, k=5, metric="l2"),
        "ctopk_replay", str(tmp_path / "cp"), output_mode="update",
    )
    got = spark.sql("select * from ctopk_replay").toPandas()
    assert got["n_seen"].max() == 120  # replayed chunk not re-counted
    final = got[got["n_seen"] == 120].sort_values(["qid", "rank"])
    assert len(final) == 4 * 5
    for qid, g in final.groupby("qid"):
        assert g["label"].is_unique
    want = (
        knn_search(vectors_df(spark, V), qdf, 5, metric="l2", method="gemm")
        .orderBy("qid", "rank").toPandas()
    )
    np.testing.assert_array_equal(
        final["label"].to_numpy(), want["label"].to_numpy()
    )


def test_curate_stream_equals_batch(spark, tmp_path):
    """Streaming curation = dedup + quality gate + PII redaction in one
    continuous plan; the surviving (doc_id, text) set matches the batch
    form, low-quality rows are dropped, and emails never reach the sink
    while quality is still scored on the ORIGINAL text."""
    from faiss_metal_spark.streaming import curate_stream

    d = str(tmp_path / "curate_feed")
    good = (
        "the quick brown fox jumps over the lazy dog near the quiet river "
        "bank while seven wise owls watch from tall green trees above"
    )
    pdf_a = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [good, "spam spam spam spam spam spam spam spam"],
        }
    )
    pdf_b = pd.DataFrame(
        {
            "doc_id": [2, 3],
            "text": [good, good + " contact me at alice@example.com today"],
        }
    )
    spark.createDataFrame(pdf_a).write.mode("overwrite").parquet(d)
    spark.createDataFrame(pdf_b).write.mode("append").parquet(d)

    batch = curate_stream(spark.read.parquet(d), min_quality=0.5).collect()
    by_id = {r["doc_id"]: r for r in batch}
    # exact dup group {0, 2} collapses to ONE survivor (dropDuplicates
    # keeps an arbitrary member — don't pin which)
    assert len({0, 2} & set(by_id)) == 1
    assert 1 not in by_id  # repetitive spam fails the quality gate
    assert 3 in by_id
    assert "alice@example.com" not in by_id[3]["text"]  # redacted
    assert "<email>" in by_id[3]["text"] or "@" not in by_id[3]["text"]

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    run_to_memory(
        curate_stream(stream, min_quality=0.5),
        "curate_t",
        str(tmp_path / "cp_curate"),
        output_mode="append",
    )
    # surviving TEXT set must match (the dup group's surviving doc_id
    # is arbitrary on each side, so compare content, not ids)
    got = {r["text"] for r in spark.sql("SELECT text FROM curate_t").collect()}
    assert got == {r["text"] for r in batch}
    n = spark.sql("SELECT COUNT(*) FROM curate_t").collect()[0][0]
    assert n == len(batch)


def test_ivf_ingest_stream_equals_batch(spark, tmp_path):
    """Streaming IVF ingest (fixed centroids, append-only cell
    partitions) produces the same inverted file — and therefore the
    same search results — as batch ivf_assign over the full corpus."""
    import numpy as np

    from faiss_metal_spark.operators.similarity import (
        ivf_assign,
        ivf_search,
        ivf_train_centroids,
    )
    from faiss_metal_spark.streaming.index_ingest import (
        ivf_store_search,
        read_vector_stream,
        run_ivf_ingest,
    )
    from tests.conftest import make_fixture, queries_df, vectors_df

    V, Q = make_fixture(nv=600, nq=6, d=16, seed=13)
    vdf = vectors_df(spark, V)
    C = ivf_train_centroids(vdf, 8, sample_size=600)

    # stage the corpus as three parquet files -> three micro-batches
    src = tmp_path / "vecs"
    for i in range(3):
        vectors_df(spark, V[i * 200 : (i + 1) * 200]).withColumn(
            "id", F.col("id") + F.lit(i * 200)
        ).coalesce(1).write.mode("append").parquet(str(src))

    store = str(tmp_path / "ivf_store")
    run_ivf_ingest(
        read_vector_stream(spark, str(src), max_files_per_trigger=1),
        C,
        store,
        checkpoint=str(tmp_path / "cp_ivf"),
    )

    # the grown store IS the batch inverted file
    got = spark.read.parquet(store).select("id", "cell").orderBy("id").toPandas()
    want = ivf_assign(vdf, C).select("id", "cell").orderBy("id").toPandas()
    np.testing.assert_array_equal(got["id"].to_numpy(), want["id"].to_numpy())
    np.testing.assert_array_equal(got["cell"].to_numpy(), want["cell"].to_numpy())

    # and searches against it equal batch IVF search
    qdf = queries_df(spark, Q)
    got_s = (
        ivf_store_search(spark, store, C, qdf, 5, nprobe=3)
        .orderBy("qid", "rank")
        .toPandas()
    )
    want_s = (
        ivf_search(ivf_assign(vdf, C), C, qdf, 5, nprobe=3)
        .orderBy("qid", "rank")
        .toPandas()
    )
    np.testing.assert_array_equal(
        got_s["label"].to_numpy(), want_s["label"].to_numpy()
    )
    np.testing.assert_allclose(
        got_s["distance"].to_numpy(), want_s["distance"].to_numpy(), rtol=1e-12
    )


def test_ivfpq_ingest_stream_equals_batch(spark, tmp_path):
    """Streaming IVFPQ ingest (frozen coarse centroids + codebooks,
    append-only cell partitions of m-byte codes) produces the same
    code store — and therefore the same ADC search results — as batch
    ivfpq_encode over the full corpus."""
    import numpy as np

    from faiss_metal_spark.operators.pq import ivfpq_build, ivfpq_search
    from faiss_metal_spark.streaming.index_ingest import (
        ivfpq_store_search,
        read_vector_stream,
        run_ivfpq_ingest,
    )
    from tests.conftest import make_fixture, queries_df, vectors_df

    V, Q = make_fixture(nv=600, nq=5, d=16, seed=29)
    vdf = vectors_df(spark, V)
    C, books, batch_codes = ivfpq_build(vdf, n_cells=4, m=4, sample_size=600)

    src = tmp_path / "vecs_pq"
    for i in range(3):
        vectors_df(spark, V[i * 200 : (i + 1) * 200]).withColumn(
            "id", F.col("id") + F.lit(i * 200)
        ).coalesce(1).write.mode("append").parquet(str(src))

    store = str(tmp_path / "ivfpq_store")
    run_ivfpq_ingest(
        read_vector_stream(spark, str(src), max_files_per_trigger=1),
        C,
        books,
        store,
        checkpoint=str(tmp_path / "cp_ivfpq"),
    )

    got = spark.read.parquet(store).orderBy("id").toPandas()
    want = batch_codes.orderBy("id").toPandas()
    np.testing.assert_array_equal(got["id"].to_numpy(), want["id"].to_numpy())
    np.testing.assert_array_equal(got["cell"].to_numpy(), want["cell"].to_numpy())
    assert [bytes(c) for c in got["code"]] == [bytes(c) for c in want["code"]]

    qdf = queries_df(spark, Q)
    got_s = (
        ivfpq_store_search(spark, store, C, books, qdf, 5, nprobe=4)
        .orderBy("qid", "rank")
        .toPandas()
    )
    want_s = (
        ivfpq_search(batch_codes, C, books, qdf, 5, nprobe=4)
        .orderBy("qid", "rank")
        .toPandas()
    )
    np.testing.assert_array_equal(
        got_s["label"].to_numpy(), want_s["label"].to_numpy()
    )
    np.testing.assert_allclose(
        got_s["distance"].to_numpy(), want_s["distance"].to_numpy(), atol=1e-9
    )


def test_streaming_kmeans_matches_offline_replay(spark, tmp_path):
    """MLlib StreamingKMeans analog (r10): the forgetful mini-batch
    update over a file stream. The sink records per-batch assignment
    lineage, so an OFFLINE numpy replay (re-deriving each batch's
    membership from the recorded batch_id, recomputing assignment and
    the decayed update from raw vectors) must reproduce the final
    centers and masses exactly — and the recorded per-batch
    assignments must equal the replay's own nearest-center choices."""
    import numpy as np

    from faiss_metal_spark.streaming.index_ingest import read_vector_stream
    from faiss_metal_spark.streaming.streaming_kmeans import (
        StreamingKMeansState,
        run_streaming_kmeans,
    )
    from tests.conftest import make_fixture, vectors_df

    V, _ = make_fixture(nv=360, nq=1, d=8, seed=21)
    src = tmp_path / "skm_vecs"
    for i in range(3):
        vectors_df(spark, V[i * 120 : (i + 1) * 120]).withColumn(
            "id", F.col("id") + F.lit(i * 120)
        ).coalesce(1).write.mode("append").parquet(str(src))

    init = V[:4].astype(np.float64)
    out = str(tmp_path / "skm_out")
    state = run_streaming_kmeans(
        read_vector_stream(spark, str(src), max_files_per_trigger=1),
        init,
        out,
        checkpoint=str(tmp_path / "skm_cp"),
        decay=0.5,
    )

    # recorded lineage: every vector exactly once, batches recorded
    lin = spark.read.parquet(f"{out}/assignments").toPandas()
    assert sorted(lin["id"].tolist()) == list(range(360))
    batch_ids = sorted(lin["batch_id"].unique().tolist())
    assert len(batch_ids) == 3  # one micro-batch per staged file

    # offline replay from raw vectors + recorded batch membership
    replay = StreamingKMeansState(init, decay=0.5)
    Vd = V.astype(np.float64)
    for b in batch_ids:
        ids = np.sort(lin.loc[lin.batch_id == b, "id"].to_numpy())
        X = Vd[ids]
        d2 = ((X[:, None, :] - replay.centers[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(1)
        # recorded assignment == replay's nearest-center choice
        rec = lin.set_index("id").loc[ids, "cell"].to_numpy()
        np.testing.assert_array_equal(rec, a)
        counts = np.bincount(a, minlength=4)
        sums = np.zeros((4, 8))
        for c in range(4):
            if counts[c]:
                sums[c] = X[a == c].sum(0)
        replay.update(counts, sums)
    np.testing.assert_allclose(state.centers, replay.centers, atol=1e-9)
    np.testing.assert_allclose(state.masses, replay.masses, atol=1e-9)

    # the committed center trajectory matches the final state
    snap = spark.read.parquet(f"{out}/centers").toPandas()
    last = snap[snap.batch_id == snap.batch_id.max()].sort_values("cell")
    np.testing.assert_allclose(
        np.stack(last["cv"].to_numpy()), state.centers, atol=1e-9
    )

    # decay semantics: masses decayed twice then grown (not raw counts)
    assert state.masses.sum() < 360  # decay < 1 forgets history

    # RESTART: stage a 4th file and resume with the SAME checkpoint —
    # the state must restore from the latest committed snapshot and
    # continue (not silently restart from init), equaling a sequential
    # 4-batch replay
    vectors_df(spark, V[:90]).withColumn(
        "id", F.col("id") + F.lit(360)
    ).coalesce(1).write.mode("append").parquet(str(src))
    V4 = np.vstack([V, V[:90]])
    state2 = run_streaming_kmeans(
        read_vector_stream(spark, str(src), max_files_per_trigger=1),
        init,
        out,
        checkpoint=str(tmp_path / "skm_cp"),
        decay=0.5,
    )
    lin2 = spark.read.parquet(f"{out}/assignments").toPandas()
    assert sorted(lin2["id"].tolist()) == sorted(
        list(range(360)) + list(range(360, 450))
    )
    replay2 = StreamingKMeansState(init, decay=0.5)
    V4d = V4.astype(np.float64)
    for b in sorted(lin2["batch_id"].unique().tolist()):
        grp = lin2[lin2.batch_id == b]
        ids = np.sort(grp["id"].to_numpy())
        X = V4d[ids]
        d2 = ((X[:, None, :] - replay2.centers[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(1)
        counts = np.bincount(a, minlength=4)
        sums = np.zeros((4, 8))
        for c in range(4):
            if counts[c]:
                sums[c] = X[a == c].sum(0)
        replay2.update(counts, sums)
    np.testing.assert_allclose(state2.centers, replay2.centers, atol=1e-9)
    np.testing.assert_allclose(state2.masses, replay2.masses, atol=1e-9)
    assert state2.query is not None  # handle exposed (review finding)


def test_dedup_segments_stream_equals_batch(spark, tmp_path):
    """r11 streaming sub-document dedup: segments survive exactly once
    across the feed; the surviving segment set equals the batch form's
    and boundaries match batch segment_dedup (shared segment_col)."""
    from faiss_metal_spark.streaming import dedup_segments_stream

    d = str(tmp_path / "seg_feed")
    boiler = "copyright acme corp reserved"
    pdf_a = pd.DataFrame(
        {"doc_id": [0, 1], "text": [boiler + " unique one", boiler + " unique two"]}
    )
    pdf_b = pd.DataFrame({"doc_id": [2], "text": [boiler + " unique three"]})
    spark.createDataFrame(pdf_a).write.mode("overwrite").parquet(d)
    spark.createDataFrame(pdf_b).write.mode("append").parquet(d)

    batch = spark.read.parquet(d)
    batch_rows = {
        r["segment"]: (r["id"], r["pidx"])
        for r in dedup_segments_stream(batch, window=4).collect()
    }
    want = set(batch_rows)
    assert boiler in want and len(want) == 4  # 1 shared + 3 unique tails
    # batch keeper is DETERMINISTIC: the min-(id, pidx) member survives
    assert batch_rows[boiler] == (0, 0)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    run_to_memory(
        dedup_segments_stream(stream, window=4),
        "seg_dedup_t",
        str(tmp_path / "cp_segdedup"),
        output_mode="append",
    )
    got = {r["segment"] for r in spark.sql("SELECT segment FROM seg_dedup_t").collect()}
    assert got == want


def test_ivfrq_ingest_stream_equals_batch(spark, tmp_path):
    """r12: streaming IVF-additive ingest (frozen coarse centroids +
    RQ stage books, append-only cell partitions of (code, recn) rows)
    produces the same code store — and therefore the same additive-LUT
    search results — as batch ivfrq_encode over the full corpus."""
    import numpy as np

    from faiss_metal_spark.operators.rq import ivfrq_build, ivfrq_search
    from faiss_metal_spark.streaming.index_ingest import (
        ivfrq_store_search,
        read_vector_stream,
        run_ivfrq_ingest,
    )
    from tests.conftest import make_fixture, queries_df, vectors_df

    V, Q = make_fixture(nv=600, nq=5, d=16, seed=31)
    vdf = vectors_df(spark, V)
    C, books, batch_codes = ivfrq_build(vdf, n_cells=4, m=3, sample_size=600)

    src = tmp_path / "vecs_rq"
    for i in range(3):
        vectors_df(spark, V[i * 200 : (i + 1) * 200]).withColumn(
            "id", F.col("id") + F.lit(i * 200)
        ).coalesce(1).write.mode("append").parquet(str(src))

    store = str(tmp_path / "ivfrq_store")
    run_ivfrq_ingest(
        read_vector_stream(spark, str(src), max_files_per_trigger=1),
        C,
        books,
        store,
        checkpoint=str(tmp_path / "cp_ivfrq"),
    )

    got = spark.read.parquet(store).orderBy("id").toPandas()
    want = batch_codes.orderBy("id").toPandas()
    np.testing.assert_array_equal(got["id"].to_numpy(), want["id"].to_numpy())
    np.testing.assert_array_equal(got["cell"].to_numpy(), want["cell"].to_numpy())
    assert [bytes(c) for c in got["code"]] == [bytes(c) for c in want["code"]]
    np.testing.assert_allclose(
        got["recn"].to_numpy(), want["recn"].to_numpy(), atol=0
    )

    qdf = queries_df(spark, Q)
    got_s = (
        ivfrq_store_search(spark, store, C, books, qdf, 5, nprobe=4)
        .orderBy("qid", "rank")
        .toPandas()
    )
    want_s = (
        ivfrq_search(batch_codes, C, books, qdf, 5, nprobe=4)
        .orderBy("qid", "rank")
        .toPandas()
    )
    np.testing.assert_array_equal(
        got_s["label"].to_numpy(), want_s["label"].to_numpy()
    )
    np.testing.assert_allclose(
        got_s["distance"].to_numpy(), want_s["distance"].to_numpy(), atol=1e-9
    )
