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
no batch rows keeps its center and decays its mass (MLlib behavior).

Spark shape, per micro-batch (``foreachBatch``): assignment is the
engine's shared ``similarity.ivf_assign`` against the CURRENT
driver-held centers (one ``mapInArrow`` projection — no shuffle), the
per-cell (count, per-dim sum) is one narrow posexplode aggregate (the
same identical-plan-shape trick ``lloyd_kmeans`` uses, so codegen
compiles once), and only k·(d+1) doubles hit the driver per batch.
The sink records BOTH artifacts a consumer needs:

- ``<out>/assignments/``  — append-only (id, cell, batch_id) rows:
  which center each vector was nearest WHEN IT ARRIVED (the ingest
  lineage; also what makes the run replayable/verifiable offline);
- ``<out>/centers/``      — one (batch_id, cell, n, cv) snapshot per
  committed micro-batch: the full center trajectory.

At 100 TB of stream: per-batch cost scales with the delta only; driver
state is k·d doubles, constant in corpus size. Exactly-once for the
assignment rows comes from the parquet sink discipline of the caller's
checkpoint; center snapshots are idempotent per batch_id (a replayed
batch overwrites its own snapshot, not history).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class StreamingKMeansState:
    """Driver-held (centers, masses) + the update rule, exposed so
    tests and offline replays share the exact arithmetic."""

    def __init__(self, init: np.ndarray, decay: float = 1.0):
        self.centers = np.asarray(init, dtype=np.float64).copy()
        self.masses = np.zeros(len(self.centers), dtype=np.float64)
        if not (0.0 <= float(decay) <= 1.0):
            raise ValueError(f"decay must be in [0, 1], got {decay}")
        self.decay = float(decay)

    def update(self, counts: np.ndarray, sums: np.ndarray) -> None:
        """Apply one mini-batch's (per-cell count m, per-cell per-dim
        sum s) — the MLlib forgetful rule; empty cells keep their
        center and decay their mass."""
        a = self.decay
        for c in range(len(self.centers)):
            n_new = a * self.masses[c] + float(counts[c])
            if counts[c] > 0:
                self.centers[c] = (
                    a * self.masses[c] * self.centers[c] + sums[c]
                ) / n_new
            self.masses[c] = n_new


def _batch_cell_stats(batch_df: DataFrame, centers: np.ndarray):
    """(assigned rows collectable as (id, cell), per-cell counts (k,),
    per-cell per-dim sums (k, d)) for one micro-batch against the
    given centers — one scan, one narrow aggregate."""
    from ..operators.similarity import ivf_assign

    k, d = centers.shape
    assigned = ivf_assign(
        batch_df.select(
            F.col("id").cast("long").alias("id"), F.col("vec").alias("vec")
        ),
        centers,
    )
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
    return assigned, counts, sums


def run_streaming_kmeans(
    vector_stream: DataFrame,
    init: np.ndarray,
    out_path: str,
    checkpoint: str,
    decay: float = 1.0,
    available_now: bool = True,
) -> StreamingKMeansState:
    """Run the streaming clusterer over ``vector_stream`` ((id, vec)
    rows — see ``index_ingest.read_vector_stream``); returns the final
    :class:`StreamingKMeansState` (centers + decayed masses). With
    ``available_now`` the call drains the source and returns; a
    continuous caller keeps the returned query running instead."""
    state = StreamingKMeansState(init, decay)
    spark = vector_stream.sparkSession

    def _one_batch(batch_df: DataFrame, batch_id: int) -> None:
        assigned, counts, sums = _batch_cell_stats(batch_df, state.centers)
        if int(counts.sum()) == 0:
            return
        # lineage first (assignment is vs the PRE-update centers)
        assigned.select("id", "cell").withColumn(
            "batch_id", F.lit(int(batch_id))
        ).write.mode("append").parquet(f"{out_path}/assignments")
        state.update(counts, sums)
        snap = pd.DataFrame(
            {
                "batch_id": np.full(len(state.centers), int(batch_id)),
                "cell": np.arange(len(state.centers), dtype=np.int32),
                "n": state.masses.copy(),
                "cv": list(state.centers.copy()),
            }
        )
        spark.createDataFrame(
            snap, "batch_id long, cell int, n double, cv array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{out_path}/centers/batch_id={int(batch_id)}"
        )

    writer = vector_stream.writeStream.foreachBatch(_one_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:  # pragma: no cover - continuous mode is the caller's loop
        writer.start()
    return state
