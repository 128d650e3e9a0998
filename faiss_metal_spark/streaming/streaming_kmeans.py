"""Streaming k-means — MLlib's ``StreamingKMeans`` re-expressed on
Structured Streaming.

MLlib's classic streaming clusterer (spark.mllib.clustering
.StreamingKMeans — DStream-era, never ported to Structured Streaming
in pyspark) maintains cluster centers over a vector stream with the
published "forgetful" mini-batch update (MLlib docs, "Streaming
k-means"):

    n_t+1 = a·n_t + m_t                       (decayed mass + batch count)
    c_t+1 = (a·n_t·c_t + s_t) / n_t+1         (s_t = batch per-cell sum)

where ``a`` = decay factor (1.0 = all history weighted equally — the
running exact mean; 0.0 = only the latest batch). A cell that receives
no batch rows keeps its center and decays its mass (MLlib behavior —
an entirely EMPTY micro-batch still decays every cell's mass).

Spark shape, per micro-batch (``foreachBatch``): assignment is the
engine's shared ``similarity.ivf_assign`` against the CURRENT
driver-held centers (one ``mapInArrow`` projection — no shuffle,
persisted for the batch so the lineage write and the stats aggregate
share one evaluation), the per-cell (count, per-dim sum) is one narrow
posexplode aggregate (the same identical-plan-shape trick
``lloyd_kmeans`` uses, so codegen compiles once), and only k·(d+1)
doubles hit the driver per batch. The sink records BOTH artifacts a
consumer needs:

- ``<out>/assignments/`` — (id, cell, batch_id) rows partitioned by
  batch_id and written with DYNAMIC partition overwrite: a replayed
  micro-batch overwrites ITS OWN partition instead of appending
  duplicates (foreachBatch is at-least-once; this makes the lineage
  idempotent per batch_id);
- ``<out>/centers/`` — one (cell, n, cv) snapshot per committed
  micro-batch (same dynamic-overwrite idempotence): the full center
  trajectory, and the RECOVERY record below.

RESTART SEMANTICS: on start the state restores from the latest
committed center snapshot (so a resumed query — Structured Streaming
replays only uncommitted offsets — continues from where it left off
instead of silently restarting from ``init``); if a batch_id at or
below the restored snapshot replays (failure between sink write and
checkpoint commit), the state first REWINDS to the snapshot preceding
it, so the re-applied update is idempotent, not doubled.

At 100 TB of stream: per-batch cost scales with the delta only; driver
state is k·d doubles, constant in corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class StreamingKMeansState:
    """Driver-held (centers, masses) + the update rule, exposed so
    tests and offline replays share the exact arithmetic. After
    :func:`run_streaming_kmeans` the ``query`` attribute carries the
    StreamingQuery handle (already drained in availableNow mode; the
    caller's to await/stop in continuous mode)."""

    def __init__(self, init: np.ndarray, decay: float = 1.0):
        self.centers = np.asarray(init, dtype=np.float64).copy()
        self.masses = np.zeros(len(self.centers), dtype=np.float64)
        if not (0.0 <= float(decay) <= 1.0):
            raise ValueError(f"decay must be in [0, 1], got {decay}")
        self.decay = float(decay)
        self.last_batch_id: int = -1
        self.query = None  # StreamingQuery handle, set by the runner

    def update(self, counts: np.ndarray, sums: np.ndarray) -> None:
        """Apply one mini-batch's (per-cell count m, per-cell per-dim
        sum s) — the MLlib forgetful rule; empty cells keep their
        center and decay their mass (an all-zero ``counts`` is the
        empty-batch decay step)."""
        a = self.decay
        for c in range(len(self.centers)):
            n_new = a * self.masses[c] + float(counts[c])
            if counts[c] > 0:
                self.centers[c] = (
                    a * self.masses[c] * self.centers[c] + sums[c]
                ) / n_new
            self.masses[c] = n_new


def _load_snapshot(spark, out_path: str, upto: int | None = None):
    """Latest committed (batch_id, centers, masses) from
    ``<out>/centers`` — optionally only snapshots with batch_id ≤
    ``upto``. Returns None when no eligible snapshot exists.

    Only the LATEST eligible snapshot is ever read: ``batch_id`` is a
    partition column, so the max() is answered from partition metadata
    and the collect is partition-pruned to one k-row directory — the
    driver cost is k·(d+1) doubles regardless of how many micro-batches
    the stream has committed (a long-lived stream accumulates one
    snapshot partition per batch; see :func:`_prune_snapshots`)."""
    try:
        snap = spark.read.parquet(f"{out_path}/centers")
    except Exception:  # noqa: BLE001 — no snapshots yet
        return None
    if upto is not None:
        snap = snap.where(F.col("batch_id") <= int(upto))
    head = snap.agg(F.max("batch_id").alias("b")).collect()
    if not head or head[0]["b"] is None:
        return None
    last = int(head[0]["b"])
    sel = sorted(
        snap.where(F.col("batch_id") == last).collect(),
        key=lambda r: int(r["cell"]),
    )
    C = np.stack([np.asarray(r["cv"], np.float64) for r in sel])
    n = np.asarray([float(r["n"]) for r in sel])
    return last, C, n


def _prune_snapshots(spark, out_path: str, keep_from: int) -> None:
    """Drop center-snapshot partitions with batch_id < ``keep_from``.

    Recovery needs only the latest snapshot and its predecessor (the
    rewind target for an at-least-once replay of the latest batch), so
    the runner compacts everything older after each commit — bounding
    ``<out>/centers`` at two k-row partitions for the stream's whole
    lifetime instead of one per micro-batch. Uses the JVM Hadoop
    FileSystem so it works on any supported scheme (local, HDFS, s3a)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(f"{out_path}/centers")
    fs = root.getFileSystem(conf)
    if not fs.exists(root):
        return
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not name.startswith("batch_id="):
            continue
        try:
            bid = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if bid < keep_from:
            fs.delete(st.getPath(), True)


def _batch_cell_stats(assigned: DataFrame, k: int, d: int):
    """(per-cell counts (k,), per-cell per-dim sums (k, d)) from an
    assigned (id, vec, cell) frame — one narrow aggregate."""
    rows = (
        assigned.select("cell", F.posexplode("vec").alias("pos", "x"))
        .groupBy("cell", "pos")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.sum(F.col("x").cast("double")).alias("s"),
        )
        .collect()
    )
    counts = np.zeros(k, dtype=np.int64)
    sums = np.zeros((k, d), dtype=np.float64)
    for r in rows:
        c, p = int(r["cell"]), int(r["pos"])
        sums[c, p] = float(r["s"])
        if p == 0:
            counts[c] = int(r["m"])
    return counts, sums


def run_streaming_kmeans(
    vector_stream: DataFrame,
    init: np.ndarray,
    out_path: str,
    checkpoint: str,
    decay: float = 1.0,
    available_now: bool = True,
    compact_snapshots: bool = True,
) -> StreamingKMeansState:
    """Run the streaming clusterer over ``vector_stream`` ((id, vec)
    rows — see ``index_ingest.read_vector_stream``); returns the
    :class:`StreamingKMeansState` (centers + decayed masses +
    ``.query`` handle). With ``available_now`` the call drains the
    source and returns the final state; in continuous mode it returns
    immediately and the caller owns ``state.query`` (await/stop it
    before reading ``state.centers`` — the state mutates per batch)."""
    from ..operators.similarity import ivf_assign

    state = StreamingKMeansState(init, decay)
    spark = vector_stream.sparkSession
    k, d = state.centers.shape

    restored = _load_snapshot(spark, out_path)
    if restored is not None:
        state.last_batch_id, state.centers, state.masses = restored

    def _one_batch(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        if bid <= state.last_batch_id:
            # at-least-once replay of an already-applied batch: rewind
            # to the snapshot BEFORE it so the re-update is idempotent
            prev = _load_snapshot(spark, out_path, upto=bid - 1)
            if prev is not None:
                _, state.centers, state.masses = prev
            else:
                state.centers = np.asarray(init, np.float64).copy()
                state.masses = np.zeros(k, dtype=np.float64)
        assigned = ivf_assign(
            batch_df.select(
                F.col("id").cast("long").alias("id"), F.col("vec").alias("vec")
            ),
            state.centers,
        ).persist()
        # lineage first (assignment is vs the PRE-update centers);
        # dynamic partition overwrite makes a replayed batch rewrite
        # its own partition instead of appending duplicates
        assigned.select("id", "cell").withColumn(
            "batch_id", F.lit(bid)
        ).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(f"{out_path}/assignments")
        counts, sums = _batch_cell_stats(assigned, k, d)
        assigned.unpersist()
        # an EMPTY batch still decays (MLlib's forgetful rule applies
        # per batch, not per row)
        state.update(counts, sums)
        state.last_batch_id = bid
        snap = pd.DataFrame(
            {
                "batch_id": np.full(k, bid),
                "cell": np.arange(k, dtype=np.int32),
                "n": state.masses.copy(),
                "cv": list(state.centers.copy()),
            }
        )
        spark.createDataFrame(
            snap, "batch_id long, cell int, n double, cv array<double>"
        ).coalesce(1).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(f"{out_path}/centers")
        if compact_snapshots:
            # recovery needs only this snapshot and its predecessor
            # (the rewind target if THIS batch replays) — drop the rest
            _prune_snapshots(spark, out_path, keep_from=bid - 1)

    writer = vector_stream.writeStream.foreachBatch(_one_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        state.query = q
        q.awaitTermination()
    else:
        state.query = writer.start()
    return state
