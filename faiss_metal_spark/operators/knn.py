"""Brute-force kNN search — the engine's core operator.

Logical semantics (what the reference computes): a theta cross product
``queries × vectors`` under an L2²/IP/cosine distance expression,
followed by per-query top-k, with FAISS result conventions
(/root/reference/src/MetalIndexFlat.mm:313-401):

- ``k`` clamped to ``ntotal``; ranks beyond ``min(k, ntotal)`` padded
  with sentinel distance (+inf for L2, −inf for IP/cosine-sim ordering)
  and label −1.
- Empty index or empty query batch → all-sentinel rows, no error.
- Output sorted best-first per query, rank 0..k−1.

Physical strategies (the §4 planner, chosen by ``method='auto'``):

``gemm``  — the scale path, analog of the reference's simdgroup-GEMM +
  two-phase top-k select (/root/reference/shaders/simdgroup_gemm.metal,
  block_select.metal). Queries are small by contract (like the build
  side of a broadcast join): collected to a numpy (nq×d) matrix and
  broadcast to every executor. A single ``mapInArrow`` pass over the
  vector partitions computes per-Arrow-batch distance blocks with BLAS
  (``Q @ V.T``) and folds them into a *running* per-partition top-k —
  the full (nq×nv) distance matrix is never materialized, which is
  exactly the reference's fused_l2_topk strategy
  (/root/reference/shaders/fused_l2_topk.metal:19-124) generalized to
  every input size. Each partition emits ≤ nq·k candidate rows, so the
  only shuffle moves O(num_partitions · nq · k) rows into the final
  merge — Spark's partial+final aggregation shape, identical in
  structure to block_select's phase-1 local top-k + phase-2 merge.

``sql``   — fully declarative crossJoin + higher-order-function distance
  + window rank. Slow (O(nq·nv) shuffled rows) but trivially correct and
  Catalyst-visible end-to-end; it is the in-engine oracle, analog of the
  reference's direct Σ(q−v)² small-input kernel
  (/root/reference/shaders/l2_norm_f16.metal:74-123).

At 100 TB scale the ``gemm`` path is the only sane choice: it does one
scan of the vector table (no shuffle of vector data at all), Python
workers see Arrow batches zero-copy, and distance math is C-speed BLAS.
The broadcast ceiling on queries (default 100k × d) matches Spark's own
broadcast-join discipline; larger query sets should use
``knn_join`` (block-partitioned both sides — see similarity.py).
"""

from __future__ import annotations

import math
from typing import Literal

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..functions.vector import cosine_sim, dot, l1dist, l2sq, sqnorm

Metric = Literal["l2", "ip", "cosine", "l1"]

# Result schema of every kNN search (FIXTURES.md "Expected-output schema").
RESULT_SCHEMA = T.StructType(
    [
        T.StructField("qid", T.LongType(), False),
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("label", T.LongType(), False),
        T.StructField("distance", T.DoubleType(), False),
    ]
)

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("qid", T.LongType(), False),
        T.StructField("label", T.LongType(), False),
        T.StructField("distance", T.DoubleType(), False),
    ]
)

# Broadcast-side ceiling for the gemm path, in floats (≈ 64 MB of FP64).
_MAX_BROADCAST_ELEMS = 8_000_000

# Final-merge bound: above parts·k candidate structs per query, insert a
# salted partial merge so no single task collects an unbounded array.
_PREMERGE_PARTS_K = 65_536
_PREMERGE_SALT = 64

# Broadcast the packed merge side only below this nq·k (≈ 16-byte
# structs → well under Spark's 8 GB broadcast ceiling with margin).
_BROADCAST_MERGE_ELEMS = 8_000_000


def _sentinel(metric: Metric) -> float:
    # L2/L1: smaller is better → pad +inf. IP/cosine: larger → pad −inf.
    return math.inf if metric in ("l2", "l1") else -math.inf


def _better_is_min(metric: Metric) -> bool:
    return metric in ("l2", "l1")


# Below this row count the declarative path beats paying the Python
# worker round-trip — the analog of the reference's direct-kernel gate
# for nv ≤ 256 (/root/reference/src/MetalDistance.mm:237-253), scaled
# to where Spark's crossJoin+window actually crosses over.
_SMALL_NV = 1024


def knn_search(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    metric: Metric = "l2",
    method: Literal["auto", "gemm", "sql"] = "auto",
    id_col: str = "id",
    vec_col: str = "vec",
    qid_col: str = "qid",
    qvec_col: str = "vec",
    nv_hint: int | None = None,
    vec_format: str = "array",
    norm_col: str | None = None,
    compute: Literal["auto", "f32", "f64"] = "auto",
    queries_host: tuple | None = None,
) -> DataFrame:
    """Top-k nearest neighbors of each query row among the vector rows.

    Returns a DataFrame (qid, rank, label, distance) — rank 0..k−1
    best-first, sentinel-padded per FAISS semantics. Distances: squared
    L2 (no sqrt — FAISS convention), raw inner product, or cosine
    *similarity* depending on ``metric``.

    ``method='auto'`` picks the physical strategy (SURVEY §4): the gemm
    path by default; the declarative sql path when ``nv_hint`` says the
    vector side is tiny (counting would cost a job, so the caller
    supplies the hint — a real deployment knows its table sizes).

    ``queries_host=(qids, Q)`` (r14): host-array queries for callers
    that already hold them in numpy (``search_numpy``). Skips both the
    query-DataFrame build and the ``_collect_queries`` round-trip —
    the collect is a whole Spark job whose ~0.4 s scheduling floor
    dominated every sub-second grid config (BENCH_GRID method notes),
    and it only re-materializes arrays the caller had. gemm path only
    (``queries`` may be None); values identical to the DataFrame path
    by construction — same (qids, Q) reach the same kernel.
    """
    if k <= 0:
        raise ValueError("k must be positive")  # ≙ MetalIndexFlat.mm:321
    if metric not in ("l2", "ip", "cosine", "l1"):
        raise ValueError(f"unknown metric {metric!r}")

    # Precomputed-norm numerics (MetalIndexFlat.mm:258-268): a quantized
    # table's L2 decomposition uses norms from the UNQUANTIZED fp32
    # input, threaded in via ``norm_col``; without it the gemm path
    # recomputes norms from the stored vectors (identical for fp32).
    vcols = [F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec")]
    use_norms = norm_col is not None and metric in ("l2", "cosine")
    if use_norms:
        vcols.append(F.col(norm_col).cast("double").alias("norm_sq"))
    v = vectors.select(*vcols)
    if queries_host is not None:
        if method == "sql":
            raise ValueError("queries_host requires the gemm path")
        method = "gemm"
        q = None
    else:
        q = queries.select(
            F.col(qid_col).cast("long").alias("qid"), F.col(qvec_col).alias("qvec")
        )
        if method == "auto":
            method = "sql" if (nv_hint is not None and nv_hint <= _SMALL_NV) else "gemm"
    if vec_format != "array" and method != "gemm":
        raise ValueError("compact binary vector storage requires the gemm path")

    if method == "gemm":
        # Accumulator precision: ``auto`` = float32, the reference's
        # accumulator width (simdgroup_gemm.metal:13-14) — sgemm runs at
        # 2× dgemm FLOPS with half the memory traffic, which at 100 TB
        # is the difference between the right plan and a 2-4× slower
        # one (measured 1.8-3.6× on the 768d grid keys). ``f64`` is the
        # opt-in exactness mode for oracle-grade hash comparisons
        # (DuckDB computes in double); callers that diff against a
        # float64 oracle pin ``compute="f64"`` explicitly.
        if compute == "auto":
            compute = "f32"
        if compute not in ("f32", "f64"):
            raise ValueError(f"unknown compute {compute!r} (auto/f32/f64)")
        dtype = np.float64 if compute == "f64" else np.float32
        if queries_host is not None:
            qids = np.asarray(queries_host[0], dtype=np.int64)
            Q = np.asarray(queries_host[1], dtype=np.float64)
            if Q.ndim != 2 or len(qids) != len(Q):
                raise ValueError("queries_host must be (qids, (nq, d) matrix)")
            if Q.size > _MAX_BROADCAST_ELEMS:
                raise ValueError(
                    f"query batch too large to broadcast ({Q.size} elems); "
                    "use knn_join for large-nq workloads"
                )
        else:
            qids, Q = _collect_queries(q)
        candidates = _gemm_candidates(
            v, qids, Q, k, metric, vec_format, use_norms, dtype
        )
    else:
        qids = None
        candidates = _sql_candidates(v.select("id", "vec"), q, k, metric)

    # Two-level merge gate: the final per-qid group sees parts·k structs;
    # past ~64k that single collect_list becomes the straggler (50k
    # partitions × k=100 = 5M structs in one task at cluster scale), so
    # a salted partial merge caps it at _PREMERGE_SALT·k first — the
    # same partial/final shape block_select applies within a partition
    # (/root/reference/shaders/block_select.metal phase 1/2), applied
    # once more ACROSS partitions.
    salt = None
    if method == "gemm":
        try:
            parts = vectors.rdd.getNumPartitions()
        except Exception:  # pragma: no cover — exotic plans; skip the gate
            parts = None
        if parts is not None and parts * k > _PREMERGE_PARTS_K:
            salt = _PREMERGE_SALT
    return _finalize(q, candidates, k, metric, premerge_salt=salt, qids=qids)


# ---------------------------------------------------------------------------
# sql path — declarative crossJoin + HOF distance + window rank
# ---------------------------------------------------------------------------


def _distance_expr(metric: Metric, qvec: str, vvec: str):
    if metric == "l2":
        return l2sq(qvec, vvec)
    if metric == "ip":
        return dot(qvec, vvec)
    if metric == "l1":
        return l1dist(qvec, vvec)
    return cosine_sim(qvec, vvec)


def _sql_candidates(v: DataFrame, q: DataFrame, k: int, metric: Metric) -> DataFrame:
    asc = _better_is_min(metric)
    dist = _distance_expr(metric, "qvec", "vec").alias("distance")
    joined = F.broadcast(q).crossJoin(v).select("qid", F.col("id").alias("label"), dist)
    order = [F.col("distance").asc(), F.col("label").asc()] if asc else [
        F.col("distance").desc(),
        F.col("label").asc(),
    ]
    w = Window.partitionBy("qid").orderBy(*order)
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "label", "distance")
    )


# ---------------------------------------------------------------------------
# gemm path — broadcast queries, single scan, per-partition running top-k
# ---------------------------------------------------------------------------


def _collect_queries(q: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Queries are the broadcast side: small by contract, like a dim table.

    Collect cost scales with the query table's partition count, not its
    rows: a 100-row batch created from a Python list is a pickled RDD
    over defaultParallelism partitions (~350 ms of task scheduling on
    local[32]). Callers that build query batches in Python should go
    through ``spark.createDataFrame(pandas_df)`` — Arrow packs it into
    one JVM-side batch and this collect is a single cheap task."""
    pdf = q.toPandas()
    qids = pdf["qid"].to_numpy(np.int64)
    if len(pdf) == 0:
        return qids, np.zeros((0, 0), np.float64)
    Q = np.stack(pdf["qvec"].to_numpy()).astype(np.float64)
    if Q.size > _MAX_BROADCAST_ELEMS:
        raise ValueError(
            f"query batch too large to broadcast ({Q.size} elems); "
            "use knn_join for large-nq workloads"
        )
    return qids, Q


def _arrow_matrix(arr, vec_format: str, dtype=np.float64) -> np.ndarray:
    """View one Arrow vector column as an (n, d) ``dtype`` matrix.

    Decode happens HERE, inside the same Python stage as the GEMM —
    compact rows cross the JVM boundary at 2 bytes per element (the
    bandwidth the reference's FP16 storage buys,
    /root/reference/README.md Features) and never exist as float arrays
    outside this function. Zero-copy by construction: both the
    ``list<float>`` child values buffer and the BINARY data buffer are
    single contiguous runs (fixed d per table), so the matrix is a
    numpy view of the Arrow buffer — no per-row Python objects, no
    byte-join copy. The only copy left is the dtype widening the math
    itself requires (fp16/bf16 → float32 sgemm operands, matching the
    reference's float32 accumulators,
    /root/reference/shaders/simdgroup_gemm.metal:13-14).
    """
    n = len(arr)
    if vec_format == "array":
        offs = arr.offsets.to_numpy()
        flat = arr.values.to_numpy(zero_copy_only=True)
        return flat[offs[0] : offs[-1]].reshape(n, -1).astype(dtype, copy=False)
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], np.int32, count=n + 1, offset=arr.offset * 4)
    data = np.frombuffer(bufs[2], np.uint8)[offs[0] : offs[-1]]
    if vec_format == "fp16_binary":
        return data.view(np.float16).reshape(n, -1).astype(dtype, copy=False)
    if vec_format == "bf16_binary":
        u = data.view(np.uint16).reshape(n, -1).astype(np.uint32) << 16
        return u.view(np.float32).astype(dtype, copy=False)
    raise ValueError(f"unknown vec_format {vec_format!r}")


def _arrow_i64(arr) -> np.ndarray:
    """int64 Arrow column → numpy view (non-null by table contract)."""
    return arr.to_numpy(zero_copy_only=True)


def _gemm_candidates(
    v: DataFrame, qids: np.ndarray, Q: np.ndarray, k: int, metric: Metric,
    vec_format: str = "array", use_norms: bool = False, dtype=np.float64,
) -> DataFrame:
    nq = len(qids)
    if nq == 0:
        return v.sparkSession.createDataFrame([], _PARTIAL_SCHEMA)

    spark = v.sparkSession
    # Cast ONCE on the driver: the f32 default halves the broadcast
    # bytes and saves every task a fresh astype copy of the query
    # matrix. Norms are computed in f64 first, THEN cast — identical
    # values to a per-task cast of the f64 broadcast. ONE broadcast
    # for the whole query state (ids + matrix + norms): each
    # sparkContext.broadcast is a driver round-trip on every search
    # call, and a second one buys nothing.
    want_min = _better_is_min(metric)
    qnorm = (
        (Q * Q).sum(axis=1).astype(dtype, copy=False)
        if metric in ("l2", "cosine")
        else None
    )
    bc = spark.sparkContext.broadcast(
        (qids, Q.astype(dtype, copy=False), qnorm)
    )

    def partial_topk(batches):
        # Running per-partition top-k: the reference's fused streaming
        # select — never materializes more than one (nq × batch) block.
        # Arrow batches in, Arrow batch out: the vector matrix is a
        # buffer view (_arrow_matrix), not a pandas object column.
        import pyarrow as pa

        qids_, Q_, qn = bc.value
        # cosine's query norms are a query-batch constant: hoisted out
        # of the per-Arrow-batch loop (computed once per task)
        qrt = np.sqrt(qn) if (qn is not None and metric == "cosine") else None
        nq_ = Q_.shape[0]
        best_d = np.full((nq_, 0), 0.0, dtype=dtype)  # grows to ≤ (nq, k)
        best_l = np.full((nq_, 0), -1, dtype=np.int64)
        sign = dtype(1.0) if want_min else dtype(-1.0)  # minimize sign*distance

        for batch in batches:
            if batch.num_rows == 0:
                continue
            V = _arrow_matrix(batch.column("vec"), vec_format, dtype)
            labels = _arrow_i64(batch.column("id"))
            if metric == "l1":
                # no GEMM decomposition exists for L1 — direct |q−v|
                # broadcast, O(nq·batch·d) bounded by the Arrow batch
                D = np.abs(Q_[:, None, :] - V[None, :, :]).sum(axis=-1)
            else:
                G = Q_ @ V.T  # BLAS — the reference's GEMM kernel family
                if metric == "l2":
                    # stored fp32 norms when supplied (reference's
                    # precomputed-norm policy); recompute otherwise
                    vn = (
                        batch.column("norm_sq")
                        .to_numpy(zero_copy_only=True)
                        .astype(dtype, copy=False)
                        if use_norms
                        else (V * V).sum(axis=1)
                    )
                    D = qn[:, None] + vn[None, :] - dtype(2.0) * G  # fused epilogue
                    np.maximum(D, 0.0, out=D)
                elif metric == "cosine":
                    # stored fp32 norms when supplied (same
                    # precomputed-norm policy as l2); recompute otherwise
                    vnorm = np.sqrt(
                        batch.column("norm_sq")
                        .to_numpy(zero_copy_only=True)
                        .astype(dtype, copy=False)
                        if use_norms
                        else (V * V).sum(axis=1)
                    )
                    denom = qrt[:, None] * vnorm[None, :]
                    with np.errstate(divide="ignore", invalid="ignore"):
                        D = np.where(denom > 0, G / denom, 0.0)
                else:
                    D = G

            cat_d = np.concatenate([best_d, sign * D], axis=1)
            cat_l = np.concatenate(
                [best_l, np.broadcast_to(labels, (nq_, len(labels)))], axis=1
            )
            if cat_d.shape[1] > k:
                idx = np.argpartition(cat_d, k - 1, axis=1)[:, :k]
            else:
                idx = np.argsort(cat_d, axis=1)
            best_d = np.take_along_axis(cat_d, idx, axis=1)
            best_l = np.take_along_axis(cat_l, idx, axis=1)

        n_have = best_d.shape[1]
        if n_have:
            yield pa.record_batch(
                [
                    pa.array(np.repeat(qids_, n_have)),
                    pa.array(best_l.ravel()),
                    pa.array((sign * best_d).ravel().astype(np.float64)),
                ],
                names=["qid", "label", "distance"],
            )

    return v.mapInArrow(partial_topk, _PARTIAL_SCHEMA)


# ---------------------------------------------------------------------------
# final merge + sentinel padding
# ---------------------------------------------------------------------------


def _finalize(
    q: DataFrame, candidates: DataFrame, k: int, metric: Metric,
    premerge_salt: int | None = None, qids: np.ndarray | None = None,
    pad: bool = True, distance_cast: str | None = None,
) -> DataFrame:
    """Merge partial candidates, rank, and pad to exactly k rows per qid.

    One shuffle total: candidates groupBy(qid) → collect (≤ parts·k
    structs per group) → array_sort → sentinel-pad → posexplode. The
    query table left-joins in (broadcast — it is the small side by the
    gemm path's contract) so empty-index and k>ntotal cases still emit
    all-sentinel rows — semantics of
    /root/reference/src/MetalIndexFlat.mm:328-334,387-399. Replaces the
    previous rank-scaffold construction, which cost two extra shuffles
    (window rank + scaffold equi-join) for the same result.

    With ``premerge_salt`` set, a salted partial merge first reduces
    each (qid, producing-partition mod salt) slice to its own top-k, so
    the final per-qid collect sees ≤ salt·k structs no matter how many
    scan partitions exist — the price is one extra (bounded) shuffle,
    paid only above the parts·k gate in ``knn_search``.

    ``pad=False`` is the binary-tier contract (IndexBinaryFlat /
    IndexBinaryIVF / IndexBinaryHash): emit min(k, candidates) rows per
    qid with NO sentinel padding — the scaffold join and pad concat are
    skipped entirely (``q`` may be None). ``distance_cast`` optionally
    casts the output distance column (Hamming distances are ``long``).
    The sort/merge machinery — one shuffle, (distance, label) tie-break,
    salted premerge — is identical, so every tier shares one contract.
    """
    asc = _better_is_min(metric)
    sent = float(_sentinel(metric))
    # sort key: minimize skey; struct comparison is field-lexicographic,
    # so (skey, label) gives distance-then-label ordering
    skey = F.col("distance") if asc else -F.col("distance")
    if premerge_salt:
        sgn = 1.0 if asc else -1.0
        partial = (
            candidates.withColumn(
                "_salt", F.pmod(F.spark_partition_id(), F.lit(premerge_salt))
            )
            .groupBy("qid", "_salt")
            .agg(
                F.slice(
                    F.array_sort(
                        F.collect_list(
                            F.struct(skey.alias("s"), F.col("label").alias("l"))
                        )
                    ),
                    1,
                    k,
                ).alias("_top")
            )
        )
        candidates = partial.select(
            "qid", F.explode("_top").alias("_e")
        ).select(
            "qid",
            F.col("_e.l").alias("label"),
            (F.col("_e.s") * F.lit(sgn)).alias("distance"),
        )
    packed = candidates.groupBy("qid").agg(
        F.array_sort(
            F.collect_list(F.struct(skey.alias("s"), F.col("label").alias("l")))
        ).alias("_cand")
    )
    sign = 1.0 if asc else -1.0
    if not pad:
        # binary-tier contract: min(k, candidates) rows per qid, no
        # sentinels, no scaffold — one groupBy shuffle total (plus the
        # bounded salted premerge when gated on).
        dcol = F.col("_c.s") * F.lit(sign)
        if distance_cast:
            dcol = dcol.cast(distance_cast)
        return (
            packed.select(
                "qid", F.posexplode(F.slice(F.col("_cand"), 1, k)).alias("_r", "_c")
            ).select(
                "qid",
                F.col("_r").cast("int").alias("rank"),
                F.col("_c.l").alias("label"),
                dcol.alias("distance"),
            )
        )

    padarr = F.array_repeat(
        F.struct(F.lit(None).cast("double").alias("s"), F.lit(-1).cast("long").alias("l")),
        k,
    )
    topk = F.slice(F.concat(F.col("_cand"), padarr), 1, k)
    # packed is nq-scale after the groupBy (one row per qid) —
    # broadcast it explicitly so the scaffold join is a
    # BroadcastHashJoin, never a SortMergeJoin (an SMJ here adds two
    # sorts + an exchange for a join whose build side fits in memory).
    # Gated on nq·k: an extreme batch (1M low-d queries × k=1000 is
    # ~16 GB of structs) must fall back to the planner's choice instead
    # of a hard broadcast failure. When the caller already collected
    # the qids (gemm path), the scaffold is a LocalRelation — no tasks
    # re-scan the query table just to enumerate its keys.
    if qids is not None:
        # q is None on the queries_host fast path — any session works
        # for a LocalRelation scaffold
        scaffold = (q if q is not None else candidates).sparkSession.createDataFrame(
            pd.DataFrame({"qid": np.asarray(qids, dtype=np.int64)}),
            schema="qid long",
        )
        small = len(qids) * k <= _BROADCAST_MERGE_ELEMS
    else:
        # sql path: q itself was broadcast upstream, so nq is modest —
        # gate on k alone
        scaffold = q.select("qid")
        small = k <= 10_000
    out = (
        scaffold
        .join(F.broadcast(packed) if small else packed, "qid", "left")
        .select("qid", F.posexplode(F.coalesce(topk, padarr)).alias("_r", "_c"))
        .select(
            "qid",
            F.col("_r").cast("int").alias("rank"),
            F.col("_c.l").alias("label"),
            F.coalesce(F.col("_c.s") * F.lit(sign), F.lit(sent)).alias("distance"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# multi-metric search — all metrics from ONE scan / one GEMM per batch
# ---------------------------------------------------------------------------

_MULTI_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType(), False),
        T.StructField("qid", T.LongType(), False),
        T.StructField("label", T.LongType(), False),
        T.StructField("distance", T.DoubleType(), False),
    ]
)


def knn_search_multi(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    metrics: tuple[Metric, ...] = ("l2", "ip", "cosine", "l1"),
    id_col: str = "id",
    vec_col: str = "vec",
    qid_col: str = "qid",
    qvec_col: str = "vec",
    compute: Literal["auto", "f32", "f64"] = "auto",
) -> DataFrame:
    """Top-k under SEVERAL metrics from one scan of the vector table.

    (metric, qid, rank, label, distance) — per-metric semantics equal
    to ``knn_search``. One GEMM per Arrow batch yields G = Q·Vᵀ, from
    which l2 (qn + vn − 2G), ip (G) and cosine (G normalized) all
    derive; only l1 needs its own |q − v| kernel. Four independent
    searches would scan the table four times for the same G — this is
    the fused form (the reference computes each metric as a distinct
    kernel dispatch over the same resident buffer,
    /root/reference/src/MetalDistance.mm; one scan is Spark's analog of
    buffer residency).
    """
    for m in metrics:
        if m not in ("l2", "ip", "cosine", "l1"):
            raise ValueError(f"unknown metric {m!r}")
    if k <= 0:
        raise ValueError("k must be positive")
    v = vectors.select(F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec"))
    q = queries.select(
        F.col(qid_col).cast("long").alias("qid"), F.col(qvec_col).alias("qvec")
    )
    qids, Q = _collect_queries(q)
    nq = len(qids)
    spark = v.sparkSession
    metrics = tuple(metrics)

    if nq == 0:
        out = spark.createDataFrame([], RESULT_SCHEMA)
        return out.withColumn("metric", F.lit("")).select(
            "metric", "qid", "rank", "label", "distance"
        )

    if compute == "auto":
        compute = "f32"  # reference accumulator width — see knn_search
    if compute not in ("f32", "f64"):
        raise ValueError(f"unknown compute {compute!r} (auto/f32/f64)")
    dtype = np.float64 if compute == "f64" else np.float32
    # driver-side cast: halves broadcast bytes under the f32 default
    bc = spark.sparkContext.broadcast(
        (qids, Q.astype(dtype, copy=False),
         (Q * Q).sum(axis=1).astype(dtype, copy=False))
    )
    need_gemm = any(m != "l1" for m in metrics)

    def partial_topk(batches):
        import pyarrow as pa

        qids_, Q_, qn = bc.value
        nq_ = Q_.shape[0]
        qrt = np.sqrt(qn)
        signs = {m: (dtype(1.0) if _better_is_min(m) else dtype(-1.0)) for m in metrics}
        state = {
            m: (np.full((nq_, 0), 0.0, dtype=dtype), np.full((nq_, 0), -1, dtype=np.int64))
            for m in metrics
        }
        for batch in batches:
            if batch.num_rows == 0:
                continue
            V = _arrow_matrix(batch.column("vec"), "array", dtype)
            labels = _arrow_i64(batch.column("id"))
            G = (Q_ @ V.T) if need_gemm else None
            vn = (V * V).sum(axis=1) if ("l2" in metrics or "cosine" in metrics) else None
            for m in metrics:
                if m == "l2":
                    D = qn[:, None] + vn[None, :] - dtype(2.0) * G
                    np.maximum(D, 0.0, out=D)
                elif m == "ip":
                    D = G
                elif m == "cosine":
                    denom = qrt[:, None] * np.sqrt(vn)[None, :]
                    with np.errstate(divide="ignore", invalid="ignore"):
                        D = np.where(denom > 0, G / denom, 0.0)
                else:  # l1 — no GEMM decomposition exists
                    D = np.abs(Q_[:, None, :] - V[None, :, :]).sum(axis=-1)
                best_d, best_l = state[m]
                cat_d = np.concatenate([best_d, signs[m] * D], axis=1)
                cat_l = np.concatenate(
                    [best_l, np.broadcast_to(labels, (nq_, len(labels)))], axis=1
                )
                if cat_d.shape[1] > k:
                    idx = np.argpartition(cat_d, k - 1, axis=1)[:, :k]
                else:
                    idx = np.argsort(cat_d, axis=1)
                state[m] = (
                    np.take_along_axis(cat_d, idx, axis=1),
                    np.take_along_axis(cat_l, idx, axis=1),
                )
        mcol, qcol, lcol, dcol = [], [], [], []
        for m in metrics:
            best_d, best_l = state[m]
            n_have = best_d.shape[1]
            if n_have:
                mcol.extend([m] * (nq_ * n_have))
                qcol.append(np.repeat(qids_, n_have))
                lcol.append(best_l.ravel())
                dcol.append((signs[m] * best_d).ravel())
        if mcol:
            yield pa.record_batch(
                [
                    pa.array(mcol),
                    pa.array(np.concatenate(qcol)),
                    pa.array(np.concatenate(lcol)),
                    pa.array(np.concatenate(dcol).astype(np.float64)),
                ],
                names=["metric", "qid", "label", "distance"],
            )

    candidates = v.mapInArrow(partial_topk, _MULTI_PARTIAL_SCHEMA)

    # per-row finalize expressions (asc-ness is a COLUMN here, not a
    # python constant — the only difference from _finalize)
    asc = F.col("metric").isin("l2", "l1")
    skey = F.when(asc, F.col("distance")).otherwise(-F.col("distance"))
    packed = candidates.groupBy("metric", "qid").agg(
        F.array_sort(
            F.collect_list(F.struct(skey.alias("s"), F.col("label").alias("l")))
        ).alias("_cand")
    )
    pad = F.array_repeat(
        F.struct(F.lit(None).cast("double").alias("s"), F.lit(-1).cast("long").alias("l")),
        k,
    )
    topk = F.slice(F.concat(F.col("_cand"), pad), 1, k)
    # qids are already collected — a LocalRelation scaffold avoids
    # re-scanning the query table just to enumerate (metric, qid) keys
    scaffold = spark.createDataFrame(
        pd.DataFrame({"qid": np.asarray(qids, dtype=np.int64)}), schema="qid long"
    ).withColumn("metric", F.explode(F.array(*[F.lit(m) for m in metrics])))
    sent = F.when(asc, F.lit(math.inf)).otherwise(F.lit(-math.inf))
    sign = F.when(asc, F.lit(1.0)).otherwise(F.lit(-1.0))
    return (
        scaffold.join(
            F.broadcast(packed)
            if nq * k * len(metrics) <= _BROADCAST_MERGE_ELEMS
            else packed,
            ["metric", "qid"],
            "left",
        )
        .select("metric", "qid", F.posexplode(F.coalesce(topk, pad)).alias("_r", "_c"))
        .select(
            "metric",
            "qid",
            F.col("_r").cast("int").alias("rank"),
            F.col("_c.l").alias("label"),
            F.coalesce(F.col("_c.s") * sign, sent).alias("distance"),
        )
    )


RANGE_SCHEMA = T.StructType(
    [
        T.StructField("qid", T.LongType(), False),
        T.StructField("label", T.LongType(), False),
        T.StructField("distance", T.DoubleType(), False),
    ]
)


def range_search(
    vectors: DataFrame,
    queries: DataFrame,
    radius: float,
    metric: Metric = "l2",
    method: Literal["auto", "gemm", "sql"] = "auto",
    id_col: str = "id",
    vec_col: str = "vec",
    qid_col: str = "qid",
    qvec_col: str = "vec",
    nv_hint: int | None = None,
    vec_format: str = "array",
    compute: Literal["auto", "f32", "f64"] = "auto",
) -> DataFrame:
    """All neighbors within ``radius`` of each query — FAISS
    ``Index::range_search`` semantics, which the reference inherits but
    never implements (no override in
    /root/reference/include/faiss-metal/MetalIndexFlat.h — the faiss
    base class throws); this engine supports it as part of the strict
    superset. Keep rule matches CPU FAISS: L2 keeps ``distance <
    radius`` (strict), IP keeps ``distance > radius``; the l1/cosine
    extensions follow their metric's better-direction. Returns
    (qid, label, distance), unordered — no rank, no sentinel rows.

    Physical shape: unlike top-k there is NO merge stage — the gemm
    path is one scan of the vector table with a broadcast query batch,
    each Arrow batch emitting its passing pairs; zero shuffles, output
    volume bounded by the radius, not by nq·nv. The sql path is the
    declarative twin (crossJoin + HOF distance + filter) that Catalyst
    plans as BroadcastNestedLoopJoin.
    """
    if metric not in ("l2", "ip", "cosine", "l1"):
        raise ValueError(f"unknown metric {metric!r}")
    want_min = _better_is_min(metric)

    v = vectors.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec")
    )
    q = queries.select(
        F.col(qid_col).cast("long").alias("qid"), F.col(qvec_col).alias("qvec")
    )
    if method == "auto":
        method = "sql" if (nv_hint is not None and nv_hint <= _SMALL_NV) else "gemm"
    if vec_format != "array" and method != "gemm":
        raise ValueError("compact binary vector storage requires the gemm path")

    if method == "sql":
        dist = _distance_expr(metric, "qvec", "vec").alias("distance")
        pairs = (
            F.broadcast(q)
            .crossJoin(v)
            .select("qid", F.col("id").alias("label"), dist)
        )
        pred = F.col("distance") < radius if want_min else F.col("distance") > radius
        return pairs.where(pred)

    if compute == "auto":
        compute = "f32"  # reference accumulator width — see knn_search
    if compute not in ("f32", "f64"):
        raise ValueError(f"unknown compute {compute!r} (auto/f32/f64)")
    dtype = np.float64 if compute == "f64" else np.float32
    qids, Q = _collect_queries(q)
    spark = v.sparkSession
    if len(qids) == 0:
        return spark.createDataFrame([], RANGE_SCHEMA)
    # driver-side cast: halves broadcast bytes under the f32 default
    bc = spark.sparkContext.broadcast(
        (qids, Q.astype(dtype, copy=False),
         (Q * Q).sum(axis=1).astype(dtype, copy=False))
    )

    def emit(batches):
        import pyarrow as pa

        qids_, Q_, qn = bc.value
        qrt = np.sqrt(qn) if metric == "cosine" else None
        for batch in batches:
            if batch.num_rows == 0:
                continue
            V = _arrow_matrix(batch.column("vec"), vec_format, dtype)
            labels = _arrow_i64(batch.column("id"))
            if metric == "l1":
                D = np.abs(Q_[:, None, :] - V[None, :, :]).sum(axis=-1)
            else:
                G = Q_ @ V.T
                if metric == "l2":
                    vn = (V * V).sum(axis=1)
                    D = qn[:, None] + vn[None, :] - dtype(2.0) * G
                    np.maximum(D, 0.0, out=D)
                elif metric == "cosine":
                    denom = qrt[:, None] * np.sqrt((V * V).sum(axis=1))[None, :]
                    with np.errstate(divide="ignore", invalid="ignore"):
                        D = np.where(denom > 0, G / denom, 0.0)
                else:
                    D = G
            mask = D < radius if want_min else D > radius
            qi, vi = np.nonzero(mask)
            if len(qi):
                yield pa.record_batch(
                    [
                        pa.array(qids_[qi]),
                        pa.array(labels[vi]),
                        pa.array(D[qi, vi].astype(np.float64)),
                    ],
                    names=["qid", "label", "distance"],
                )

    return v.mapInArrow(emit, RANGE_SCHEMA)
