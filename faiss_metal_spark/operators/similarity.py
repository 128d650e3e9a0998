"""Similarity-search operators beyond broadcastable brute force.

The reference engine is a single-node flat index (SURVEY §0); these are
the horizontal-scale paths a 100 TB corpus needs:

- ``ann_lsh_search``   — random-hyperplane LSH: bucket both sides on
  sign-bit signatures, equi-join buckets, exact rerank inside buckets.
  Sub-linear candidate generation; the bucket join is an ordinary
  shuffle-hash join on a small int key. Bucketing is *integer-exact*
  (vectors quantized to floor(x·1000), integer plane entries) so the
  DuckDB oracle reproduces bucket membership bit-for-bit — determinism
  is part of the operator contract, not a test convenience.
- ``knn_join_blocked`` — exact kNN join when BOTH sides are too large
  to broadcast: block-nested-loop over (query-block × vector-block)
  grid cells, local GEMM top-k per cell, global merge. Shuffle volume
  is nv·BQ + nq·BV rows (each side replicated by the other's block
  count), not nq·nv.
- ``ivf_build/ivf_search`` — inverted-file ANN: k-means cells, probe
  the nprobe nearest cells per query. Written ``partitionBy("cell")``
  the probe filter becomes parquet partition pruning — the scan never
  touches non-probed cells, which is the IVF promise expressed in
  Spark's own storage layout.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..functions.vector import cosine_sim
from .knn import RESULT_SCHEMA, _finalize

# ---------------------------------------------------------------------------
# Random-hyperplane LSH (cosine)
# ---------------------------------------------------------------------------

# Quantization scale for integer-exact bucket signatures.
_LSH_SCALE = 1000


def lsh_planes(d: int, num_planes: int, num_tables: int, seed: int = 7) -> np.ndarray:
    """Deterministic integer hyperplanes, shape (tables, planes, d).

    Integer entries (−3..3) keep the signed projection exact in 64-bit
    arithmetic, so any engine computes identical bucket ids.
    """
    rng = np.random.default_rng(seed)
    return rng.integers(-3, 4, size=(num_tables, num_planes, d)).astype(np.int64)


def _quantized(vec_col: Column) -> Column:
    """floor(x·1000) per element as BIGINT — exact, engine-agnostic."""
    return F.transform(vec_col, lambda x: F.floor(x.cast("double") * F.lit(1000.0)))


def _bucket_expr(qcol: Column, plane: np.ndarray) -> Column:
    """Packed sign bits of integer projections onto one table's planes."""
    acc = None
    for p, row in enumerate(plane):
        lits = F.array(*[F.lit(int(w)) for w in row])
        proj = F.aggregate(
            F.zip_with(qcol, lits, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda s, x: s + x,
        )
        term = F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0))
        acc = term if acc is None else acc + term
    return acc.cast("long")


def lsh_buckets(
    df: DataFrame,
    planes: np.ndarray,
    id_col: str = "id",
    vec_col: str = "vec",
    n_flip: int = 0,
) -> DataFrame:
    """(id, table, bucket) — one row per (row, table). IDS ONLY: the
    vector payload deliberately does not ride through the bucket
    explode/join — at corpus scale that would shuffle the whole
    embedding table once per hash table. Callers join candidates back
    to the vector table for the exact rerank.

    Bucket ids for ALL tables are computed in one Arrow-batched integer
    matmul: quantize the batch to int64, multiply by the (d × T·P)
    stacked plane matrix, pack sign bits. Integer arithmetic is exact,
    so bucket ids are bit-identical to the per-row Catalyst expression
    (``_bucket_expr``, kept as the oracle-shaped reference form) and to
    the SQL oracle — at T·P·d ≈ 768 multiplies per row the BLAS batch
    beats per-row HOF evaluation by an order of magnitude.

    ``n_flip`` > 0 adds MULTIPROBE rows (Lv et al., VLDB 2007): per
    (row, table), also the ``n_flip`` buckets obtained by flipping the
    sign bit whose projection has the smallest margin |proj| (ties by
    plane index — deterministic, and the integer projections make the
    margin order engine-exact too). Query-side multiprobe buys the
    recall of more hash tables without re-bucketing the corpus — the
    standard memory/recall trade at index scale.
    """
    import pandas as pd
    from pyspark.sql import types as T_

    n_tables, n_planes, d = planes.shape
    # (d, T·P) int64 — broadcast once per executor
    P = planes.reshape(n_tables * n_planes, d).T.copy()
    bc = df.sparkSession.sparkContext.broadcast(P)
    pows = (2 ** np.arange(n_planes, dtype=np.int64))

    out_schema = T_.StructType(
        [
            T_.StructField("id", T_.LongType()),
            T_.StructField("tbl", T_.IntegerType()),
            T_.StructField("bucket", T_.LongType()),
        ]
    )

    def bucketize(batches):
        import pyarrow as pa

        from .knn import _arrow_i64, _arrow_matrix

        Pl = bc.value
        for batch in batches:
            if batch.num_rows == 0:
                continue
            V = _arrow_matrix(batch.column("_v"), "array", np.float64)
            Vq = np.floor(V * 1000.0).astype(np.int64)
            proj = Vq @ Pl  # (n, T·P) exact int64
            proj3 = proj.reshape(len(V), n_tables, n_planes)
            bits = proj3 > 0
            buckets = (bits * pows).sum(axis=2)  # (n, T)
            ids = _arrow_i64(batch.column("_id"))
            out_ids = [np.repeat(ids, n_tables)]
            out_tbl = [np.tile(np.arange(n_tables, dtype=np.int32), len(V))]
            out_bkt = [buckets.ravel()]
            if n_flip > 0:
                # planes ranked by margin |proj| ascending, ties by
                # plane index (stable sort) — flip the j-th least
                # confident bit for probe j
                order = np.argsort(np.abs(proj3), axis=2, kind="stable")
                for j in range(min(n_flip, n_planes)):
                    flip = pows[order[:, :, j]]  # (n, T)
                    out_ids.append(np.repeat(ids, n_tables))
                    out_tbl.append(
                        np.tile(np.arange(n_tables, dtype=np.int32), len(V))
                    )
                    out_bkt.append((buckets ^ flip).ravel())
            yield pa.record_batch(
                [
                    pa.array(np.concatenate(out_ids)),
                    pa.array(np.concatenate(out_tbl)),
                    pa.array(np.concatenate(out_bkt)),
                ],
                names=["id", "tbl", "bucket"],
            )

    src = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    return src.mapInArrow(bucketize, out_schema)


def ann_lsh_search(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    planes: np.ndarray,
    id_col: str = "id",
    vec_col: str = "vec",
    qid_col: str = "qid",
    qvec_col: str = "vec",
    n_probes: int = 1,
) -> DataFrame:
    """Approximate cosine top-k via bucket join + exact rerank.

    Returns (qid, rank, label, distance=cosine sim) for candidates only
    — queries whose buckets are empty yield fewer than k rows (no
    sentinel padding; this is the approximate path, ``knn_search`` is
    the exact one). Candidates found in multiple tables are deduped
    before the rerank so each pair is scored once. ``n_probes`` > 1
    enables query-side multiprobe (the n_probes−1 least-confident sign
    bits flip per table — see :func:`lsh_buckets`): more candidates,
    higher recall, corpus bucketing untouched.

    Shuffle discipline: the bucket join moves (id, tbl, bucket) triples
    only — never vectors. The deduped candidate pair set (≪ corpus) then
    equi-joins back to the vector table for the exact rerank, and the
    query vectors (small by contract) broadcast in.
    """
    vb = lsh_buckets(vectors, planes, id_col, vec_col)
    qb = lsh_buckets(
        queries, planes, qid_col, qvec_col, n_flip=max(0, n_probes - 1)
    ).withColumnRenamed("id", "qid")

    cand_ids = (
        qb.join(vb, ["tbl", "bucket"])
        .select(F.col("qid"), F.col("id").alias("label"))
        .dropDuplicates(["qid", "label"])
    )
    cand = cand_ids.join(
        vectors.select(
            F.col(id_col).cast("long").alias("label"), F.col(vec_col).alias("vvec")
        ),
        "label",
    ).join(
        F.broadcast(
            queries.select(
                F.col(qid_col).cast("long").alias("qid"), F.col(qvec_col).alias("qvec")
            )
        ),
        "qid",
    )
    scored = cand.select(
        "qid", "label", cosine_sim("qvec", "vvec").alias("distance")
    )
    w = Window.partitionBy("qid").orderBy(F.col("distance").desc(), F.col("label").asc())
    return (
        scored.withColumn("rank", (F.row_number().over(w) - 1).cast("int"))
        .where(F.col("rank") < k)
        .select("qid", "rank", "label", "distance")
    )


# ---------------------------------------------------------------------------
# Blocked exact kNN join (both sides large)
# ---------------------------------------------------------------------------


def knn_join_blocked(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    metric: str = "l2",
    num_qblocks: int = 4,
    num_vblocks: int = 4,
    id_col: str = "id",
    vec_col: str = "vec",
    qid_col: str = "qid",
    qvec_col: str = "vec",
    compute: str = "auto",
) -> DataFrame:
    """Exact kNN join without broadcasting either side.

    Each (qb, vb) grid cell receives its query block and vector block
    (rows carry a ``role`` tag through one shuffle), computes a local
    BLAS top-k, and the per-cell winners merge in a final window — the
    same partial+final shape as ``knn_search``'s gemm path, with the
    broadcast replaced by bounded replication: vectors are sent to BQ
    cells and queries to BV cells, so memory per task is
    (nq/BQ + nv/BV)·d and total shuffle is nq·BV + nv·BQ rows.

    ``compute='auto'`` = float32 (like ``knn_search``) — and here the
    width matters TWICE: the replicated vectors ride the grid shuffle
    as ``array<float>`` instead of ``array<double>``, halving the
    operator's dominant cost (nq·BV + nv·BQ vector copies on the wire)
    on top of the sgemm win. ``compute='f64'`` restores double for
    oracle-grade exactness.
    """
    if metric not in ("l2", "ip", "cosine"):
        raise ValueError(f"unknown metric {metric!r}")
    if compute == "auto":
        compute = "f32"
    if compute not in ("f32", "f64"):
        raise ValueError(f"unknown compute {compute!r} (auto/f32/f64)")
    wire = "array<float>" if compute == "f32" else "array<double>"
    dt = np.float32 if compute == "f32" else np.float64
    spark = vectors.sparkSession
    want_min = metric == "l2"

    qblocks = spark.range(num_qblocks).select(F.col("id").cast("int").alias("qb"))
    vblocks = spark.range(num_vblocks).select(F.col("id").cast("int").alias("vb"))

    v = vectors.select(
        F.lit("v").alias("role"),
        F.col(id_col).cast("long").alias("rid"),
        F.col(vec_col).cast(wire).alias("rvec"),
        F.pmod(F.col(id_col), F.lit(num_vblocks)).cast("int").alias("vb"),
    ).crossJoin(qblocks)
    q = queries.select(
        F.lit("q").alias("role"),
        F.col(qid_col).cast("long").alias("rid"),
        F.col(qvec_col).cast(wire).alias("rvec"),
        F.pmod(F.col(qid_col), F.lit(num_qblocks)).cast("int").alias("qb"),
    ).crossJoin(vblocks)

    both = v.select("qb", "vb", "role", "rid", "rvec").unionByName(
        q.select("qb", "vb", "role", "rid", "rvec")
    )

    sign = 1.0 if want_min else -1.0

    def cell_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        qm = pdf[pdf["role"] == "q"]
        vm = pdf[pdf["role"] == "v"]
        if len(qm) == 0 or len(vm) == 0:
            return pd.DataFrame({"qid": [], "label": [], "distance": []}).astype(
                {"qid": np.int64, "label": np.int64, "distance": np.float64}
            )
        Q = np.stack(qm["rvec"].to_numpy()).astype(dt, copy=False)
        V = np.stack(vm["rvec"].to_numpy()).astype(dt, copy=False)
        G = Q @ V.T
        if metric == "l2":
            D = (Q * Q).sum(1)[:, None] + (V * V).sum(1)[None, :] - dt(2.0) * G
            np.maximum(D, 0.0, out=D)
        elif metric == "cosine":
            denom = np.linalg.norm(Q, axis=1)[:, None] * np.linalg.norm(V, axis=1)[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                D = np.where(denom > 0, G / denom, 0.0)
        else:
            D = G
        kk = min(k, D.shape[1])
        Ds = sign * D
        idx = np.argpartition(Ds, kk - 1, axis=1)[:, :kk] if kk < D.shape[1] else (
            np.argsort(Ds, axis=1)
        )
        qids = np.repeat(qm["rid"].to_numpy(np.int64), idx.shape[1])
        labels = vm["rid"].to_numpy(np.int64)[idx.ravel()]
        dists = np.take_along_axis(D, idx, axis=1).ravel()
        return pd.DataFrame({"qid": qids, "label": labels, "distance": dists})

    cand_schema = T.StructType(
        [
            T.StructField("qid", T.LongType()),
            T.StructField("label", T.LongType()),
            T.StructField("distance", T.DoubleType()),
        ]
    )
    candidates = both.groupBy("qb", "vb").applyInPandas(
        lambda key, pdf: cell_topk(pdf), cand_schema
    )
    qid_df = queries.select(F.col(qid_col).cast("long").alias("qid"))
    return _finalize(qid_df, candidates, k, metric)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------


def train_sample(
    df: DataFrame,
    sample_size: int,
    id_col: str = "id",
    extra_cols: tuple[str, ...] = (),
) -> pd.DataFrame:
    """Deterministic bounded trainer sample without a parts·n driver merge.

    ``orderBy(id).limit(n)`` compiles to TakeOrdered — one pass, but the
    driver merge still sees parts·n rows (50k partitions × 16k sample =
    800M rows of driver traffic at cluster scale). Instead: one count,
    then a hash-threshold filter that admits ~2n rows (md5 of the id —
    content-independent, stable across runs/partitionings/engines, the
    ``hash_split`` discipline), then an exact top-n by (hash, id) over
    only the admitted rows — TakeOrdered's driver merge is now O(n).
    The admitted count concentrates hard around 2n (Chernoff: admitting
    < n at 2n expected is ~e^{-n/4}), so the sample is always full.
    """
    n_total = df.count()
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    base = df.select(
        F.col(id_col).alias(id_col), *extra_cols, h.alias("_h")
    )
    if n_total > 2 * sample_size:
        bound = int((2.0 * sample_size / n_total) * float(1 << 32))
        base = base.where(F.col("_h") < F.lit(bound))
    return base.orderBy("_h", id_col).limit(sample_size).drop("_h").toPandas()


def ivf_train_centroids(
    vectors: DataFrame,
    n_cells: int,
    vec_col: str = "vec",
    id_col: str = "id",
    sample_size: int = 16384,
    iters: int = 10,
    spherical: bool = False,
    return_obj: bool = False,
):
    """Deterministic k-means centroids from a hash-thresholded sample.

    The sample comes from ``train_sample`` (md5-threshold filter, O(n)
    driver merge — stable across runs, partitionings and engines); init
    is the first n_cells sample rows; Lloyd iterations run on the driver
    (the sample is small by construction — training is O(sample),
    assignment is the distributed part).

    ``spherical`` renormalizes centroids to unit L2 after every update
    (faiss ``Kmeans(spherical=True)``; with unit centroids the
    ``‖c‖²−2x·c`` assignment is exactly max-inner-product order).
    ``return_obj`` returns ``(C, obj)`` where ``obj[i]`` is the total
    squared error Σ‖x−c(x)‖² over the training sample at iteration i
    (faiss ``Kmeans.obj``, measured on its train set — here the
    bounded sample, which is the O(sample) 100 TB-safe contract).
    """
    pdf = train_sample(
        vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
        sample_size,
        extra_cols=("vec",),
    )
    X = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
    if len(X) < n_cells:
        raise ValueError(f"need ≥ {n_cells} vectors to train, got {len(X)}")
    C = X[:n_cells].copy()
    if spherical:
        nrm = np.linalg.norm(C, axis=1)
        C = C / np.where(nrm == 0.0, 1.0, nrm)[:, None]
    xn = (X * X).sum(1) if return_obj else None
    obj = []
    for _ in range(iters):
        # ‖c‖² − 2x·c decomposition (‖x‖² constant per row): one
        # (sample × cells) matrix instead of the (sample × cells × d)
        # broadcast — the same form ivf_assign uses, so trainer and
        # assigner tie-break identically. 16384×256×1536 fits in <2 GB.
        cn = (C * C).sum(1)
        Dm = cn[None, :] - 2.0 * (X @ C.T)
        assign = Dm.argmin(1)
        if return_obj:
            err = Dm[np.arange(len(X)), assign] + xn
            obj.append(float(np.maximum(err, 0.0).sum()))
        for c in range(n_cells):
            m = assign == c
            if m.any():
                C[c] = X[m].mean(0)
        if spherical:
            nrm = np.linalg.norm(C, axis=1)
            C = C / np.where(nrm == 0.0, 1.0, nrm)[:, None]
    return (C, obj) if return_obj else C


def ivf_assign(
    vectors: DataFrame,
    centroids: np.ndarray,
    id_col: str = "id",
    vec_col: str = "vec",
    assigner=None,
) -> DataFrame:
    """Add a ``cell`` column = nearest centroid id (one scan, no
    shuffle). ``assigner`` (r12): an optional picklable object with
    ``assign_np((n, d)) -> (n,) cells`` replacing the exact argmin —
    the graph coarse quantizer hook (faiss IndexHNSWFlat-as-quantizer;
    operators/coarse.py), which makes per-vector assign cost
    independent of nlist. The distributed plan is identical either
    way."""
    spark = vectors.sparkSession
    bc = spark.sparkContext.broadcast((centroids, assigner))
    fields = vectors.schema.fields

    out_schema = T.StructType(list(fields) + [T.StructField("cell", T.IntegerType())])

    def assign(batches):
        import pyarrow as pa

        from .knn import _arrow_matrix

        C, asg = bc.value
        cn = (C * C).sum(1)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            V = _arrow_matrix(batch.column(vec_col), "array", np.float64)
            if asg is not None:
                cell = np.asarray(asg.assign_np(V), np.int32)
            else:
                # argmin ‖v−c‖² = argmin ‖c‖²−2v·c (‖v‖² constant/row)
                cell = (cn[None, :] - 2.0 * (V @ C.T)).argmin(1).astype(np.int32)
            yield pa.record_batch(
                list(batch.columns) + [pa.array(cell)],
                names=list(batch.schema.names) + ["cell"],
            )

    return vectors.mapInArrow(assign, out_schema)


def ivf_write(assigned: DataFrame, path: str) -> None:
    """Persist the inverted file: parquet partitioned by cell, so probe
    filters prune partitions at scan time (the IVF 'inverted list')."""
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)



def cell_size_map(frame, max_codes):
    """Per-cell inverted-list sizes for the faiss max_codes pre-list
    check — ONE implementation shared by the IVF-family search paths
    (similarity.ivf_search and pq.ivfpq_search). Returns {} when the
    bound is off; validates the bound once here."""
    if max_codes is None:
        return {}
    if int(max_codes) <= 0:
        raise ValueError("max_codes must be positive when set")
    return {
        int(r["cell"]): int(r["n"])
        for r in frame.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def build_probe_map(probe, max_codes=None, cell_sizes=None):
    """cell → local indices of the queries that probe it, with the
    faiss ``SearchParametersIVF::max_codes`` pre-list cut (``if
    (max_codes && nscan >= max_codes) break`` — the crossing list still
    scans in full, the first list always does). Negative cells are the
    faiss -1 skip-slot sentinel. ONE statement of the loop, shared by
    ``_collect_probe`` and ``pq.ivfpq_search`` so a future fix cannot
    miss one copy."""
    cell_to_qidx: dict[int, list[int]] = {}
    sizes = cell_sizes or {}
    for i, cells_i in enumerate(probe):
        nscan = 0
        for c in cells_i:
            if c < 0:
                continue
            if max_codes is not None and nscan >= int(max_codes):
                break
            nscan += sizes.get(int(c), 0)
            cell_to_qidx.setdefault(int(c), []).append(i)
    return cell_to_qidx

def _collect_probe(
    queries: DataFrame,
    centroids: np.ndarray,
    nprobe: int,
    qid_col: str,
    qvec_col: str,
    probe_cells=None,
    max_codes: int | None = None,
    cell_sizes: dict[int, int] | None = None,
):
    """Collect the query batch and build the cell→query probe map
    (nearest-centroid order, L2 over the coarse quantizer — faiss
    probes L2-nearest cells for every metric). Returns (qids, Q,
    {cell: query-local-indices}) or None for an empty batch.

    ``probe_cells``: optional callable ``(Q) -> (nq, nprobe) int cell
    matrix`` replacing the flat-centroid ranking — the hook a product
    coarse quantizer (IMI) plugs its two-table cell scoring into.

    ``max_codes`` (+ ``cell_sizes``): faiss
    ``SearchParametersIVF::max_codes`` — each query keeps probe cells
    in ranking order only while the codes scanned SO FAR stay under
    the bound, exactly faiss's pre-list check (``if (max_codes &&
    nscan >= max_codes) break``): the list that crosses the bound is
    still scanned in full, and at least the first list always is.
    Cell granularity IS the faiss granularity here — the engine scans
    whole inverted lists."""
    qpdf = queries.select(
        F.col(qid_col).cast("long").alias("qid"), F.col(qvec_col).alias("qvec")
    ).toPandas()
    if len(qpdf) == 0:
        return None
    qids = qpdf["qid"].to_numpy(np.int64)
    Q = np.stack(qpdf["qvec"].to_numpy()).astype(np.float64)
    if probe_cells is not None:
        # a hook marked ``by_qid`` is called with the collected qids so
        # it can align caller-supplied per-query assignments exactly
        # (search_preassigned); plain hooks rank from Q alone (IMI)
        if getattr(probe_cells, "by_qid", False):
            probe = np.asarray(probe_cells(Q, qids))[:, :nprobe]
        else:
            probe = np.asarray(probe_cells(Q))[:, :nprobe]
    else:
        cn = (centroids * centroids).sum(1)
        order = (cn[None, :] - 2.0 * (Q @ centroids.T)).argsort(1, kind="stable")
        probe = order[:, :nprobe]

    # cell → local indices of the queries that probe it. A negative
    # cell is the faiss -1 "skip this probe slot" sentinel (coarse
    # quantizers emit it for unfillable slots; search_preassigned
    # callers pass it through) — it matches nothing, drop it here.
    cell_to_qidx = build_probe_map(probe, max_codes=max_codes, cell_sizes=cell_sizes)
    return qids, Q, cell_to_qidx


def ivf_search(
    assigned: DataFrame,
    centroids: np.ndarray,
    queries: DataFrame,
    k: int,
    nprobe: int,
    metric: str = "l2",
    id_col: str = "id",
    vec_col: str = "vec",
    qid_col: str = "qid",
    qvec_col: str = "vec",
    decode=None,
    probe_cells=None,
    max_codes: int | None = None,
) -> DataFrame:
    """Probe the nprobe nearest cells per query, exact search within.

    ``probe_cells``: optional ``(Q) -> (nq, ≥nprobe) int`` cell-ranking
    override (see :func:`_collect_probe`) — the IMI hook.

    ``max_codes``: faiss ``SearchParametersIVF::max_codes`` — bound the
    stored entries scanned per query: probe cells are kept in ranking
    order only while the running scan count stays under the bound (the
    crossing list still scans in full; at least one list always does —
    the exact faiss pre-list check at this engine's whole-list
    granularity). Costs one bounded nlist-row cell-count job per call
    when set.

    ``decode``: optional callable ``pdf -> (n, d) float64`` that turns a
    cell group's stored rows into the float matrix to score (used by
    the SQ-coded inverted file, :class:`~..compact_index.IVFSQIndex` —
    faiss ``IndexIVFScalarQuantizer`` scores codes in-list the same
    way). Default reads ``vec_col`` as a float array column.

    The cell filter is a plain ``isin`` — on a cell-partitioned table it
    becomes partition pruning; in memory it's still a single scan that
    skips non-candidate rows before any distance math.

    Search runs PER CELL (``groupBy("cell").applyInPandas``): each cell
    group scores exactly the queries that probed it (per-query probe map
    broadcast to the executors), takes a local top-k, and the per-cell
    winners merge in the same partial/final shape as ``knn_search``.
    A query's candidates therefore come only from its own probed cells —
    a dense foreign cell can never crowd out a sparse probed one — and
    each query gets exactly min(k, |probed rows|) results.
    nprobe = n_cells degrades gracefully to exact search.
    """
    from .knn import _PARTIAL_SCHEMA, _finalize

    if metric not in ("l2", "ip", "cosine", "l1"):
        raise ValueError(f"unknown metric {metric!r}")
    cell_sizes = cell_size_map(assigned, max_codes) if max_codes is not None else None
    collected = _collect_probe(
        queries, centroids, nprobe, qid_col, qvec_col, probe_cells,
        max_codes=max_codes, cell_sizes=cell_sizes,
    )
    if collected is None:
        return queries.sparkSession.createDataFrame([], RESULT_SCHEMA)
    qids, Q, cell_to_qidx = collected
    spark = queries.sparkSession
    bc = spark.sparkContext.broadcast(
        (qids, Q, {c: np.asarray(ix, dtype=np.int64) for c, ix in cell_to_qidx.items()})
    )
    want_min = metric in ("l2", "l1")
    sign = 1.0 if want_min else -1.0

    def cell_topk(key, pdf: pd.DataFrame) -> pd.DataFrame:
        qids_, Q_, c2q = bc.value
        qidx = c2q.get(int(key[0]))
        if qidx is None or len(pdf) == 0:
            return pd.DataFrame({"qid": [], "label": [], "distance": []}).astype(
                {"qid": np.int64, "label": np.int64, "distance": np.float64}
            )
        Qs = Q_[qidx]
        V = (
            decode(pdf)
            if decode is not None
            else np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        )
        labels = pdf[id_col].to_numpy(np.int64)
        if metric == "l1":
            D = np.abs(Qs[:, None, :] - V[None, :, :]).sum(-1)
        else:
            G = Qs @ V.T
            if metric == "l2":
                D = (Qs * Qs).sum(1)[:, None] + (V * V).sum(1)[None, :] - 2.0 * G
                np.maximum(D, 0.0, out=D)
            elif metric == "cosine":
                denom = (
                    np.sqrt((Qs * Qs).sum(1))[:, None]
                    * np.sqrt((V * V).sum(1))[None, :]
                )
                with np.errstate(divide="ignore", invalid="ignore"):
                    D = np.where(denom > 0, G / denom, 0.0)
            else:
                D = G
        kk = min(k, D.shape[1])
        Ds = sign * D
        idx = (
            np.argpartition(Ds, kk - 1, axis=1)[:, :kk]
            if kk < D.shape[1]
            else np.argsort(Ds, axis=1)
        )
        return pd.DataFrame(
            {
                "qid": np.repeat(qids_[qidx], idx.shape[1]),
                "label": labels[idx.ravel()],
                "distance": np.take_along_axis(D, idx, axis=1).ravel(),
            }
        )

    subset = assigned.where(
        F.col("cell").isin([int(c) for c in sorted(cell_to_qidx)])
    )
    candidates = subset.groupBy("cell").applyInPandas(cell_topk, _PARTIAL_SCHEMA)
    qdf = queries.select(F.col(qid_col).cast("long").alias("qid"))
    # merge per-cell winners; drop the sentinel padding — the contract
    # here (approximate path) is min(k, probed rows) real results
    return _finalize(qdf, candidates, k, metric).where(F.col("label") >= 0)


def ivf_range_search(
    assigned: DataFrame,
    centroids: np.ndarray,
    queries: DataFrame,
    radius: float,
    nprobe: int,
    metric: str = "l2",
    id_col: str = "id",
    vec_col: str = "vec",
    qid_col: str = "qid",
    qvec_col: str = "vec",
    decode=None,
    probe_cells=None,
) -> DataFrame:
    """All probed neighbors within ``radius`` — faiss
    ``IndexIVF::range_search``: the same nprobe coarse probe as
    :func:`ivf_search`, then a radius FILTER instead of a top-k, so
    results are exact over the probed cells (faiss's contract: range
    recall is bounded by cell coverage, nprobe = n_cells degrades to
    the exact flat answer). Keep rule matches CPU faiss and the flat
    ``range_search``: L2/L1 keep ``distance < radius`` strict, IP and
    cosine keep ``distance > radius``.

    Returns (qid, label, distance) UNORDERED, no rank / sentinels —
    the flat range_search contract. Physical shape: one pruned scan
    (cell ``isin`` → partition pruning on an ``ivf_write`` store), the
    per-cell Arrow stage emits passing pairs directly; with each vector
    living in exactly ONE cell there is nothing to merge, so unlike
    ``ivf_search`` there is no finalize shuffle at all — output volume
    is bounded by the radius, not nq·nv.
    """
    if metric not in ("l2", "ip", "cosine", "l1"):
        raise ValueError(f"unknown metric {metric!r}")
    want_min = metric in ("l2", "l1")
    schema_df = queries.sparkSession
    collected = _collect_probe(
        queries, centroids, nprobe, qid_col, qvec_col, probe_cells
    )
    out_schema = "qid long, label long, distance double"
    if collected is None:
        return schema_df.createDataFrame([], out_schema)
    qids, Q, cell_to_qidx = collected
    bc = schema_df.sparkContext.broadcast(
        (qids, Q, {c: np.asarray(ix, dtype=np.int64) for c, ix in cell_to_qidx.items()})
    )

    def cell_range(key, pdf: pd.DataFrame) -> pd.DataFrame:
        qids_, Q_, c2q = bc.value
        qidx = c2q.get(int(key[0]))
        empty = pd.DataFrame({"qid": [], "label": [], "distance": []}).astype(
            {"qid": np.int64, "label": np.int64, "distance": np.float64}
        )
        if qidx is None or len(pdf) == 0:
            return empty
        Qs = Q_[qidx]
        V = (
            decode(pdf)
            if decode is not None
            else np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        )
        labels = pdf[id_col].to_numpy(np.int64)
        if metric == "l1":
            D = np.abs(Qs[:, None, :] - V[None, :, :]).sum(-1)
        else:
            G = Qs @ V.T
            if metric == "l2":
                D = (Qs * Qs).sum(1)[:, None] + (V * V).sum(1)[None, :] - 2.0 * G
                np.maximum(D, 0.0, out=D)
            elif metric == "cosine":
                denom = (
                    np.sqrt((Qs * Qs).sum(1))[:, None]
                    * np.sqrt((V * V).sum(1))[None, :]
                )
                with np.errstate(divide="ignore", invalid="ignore"):
                    D = np.where(denom > 0, G / denom, 0.0)
            else:
                D = G
        mask = D < radius if want_min else D > radius
        qi, vi = np.nonzero(mask)
        if len(qi) == 0:
            return empty
        return pd.DataFrame(
            {"qid": qids_[qidx][qi], "label": labels[vi], "distance": D[qi, vi]}
        )

    subset = assigned.where(
        F.col("cell").isin([int(c) for c in sorted(cell_to_qidx)])
    )
    return subset.groupBy("cell").applyInPandas(cell_range, out_schema)


# ---------------------------------------------------------------------------
# IMI — faiss MultiIndexQuantizer coarse quantizer (index_factory
# "IMI2x<b>"): the cell id is the PRODUCT of two independent b-bit
# sub-quantizers over the two dim-halves, giving 2^(2b) cells from two
# 2^b k-means trainings (the trick that makes 65k+ cells trainable
# from the same O(sample) budget as 256). Probe ranking sums the two
# per-half distance tables — nq·2^(2b) adds over two nq·2^b GEMMs,
# never a full-width distance per cell.
# ---------------------------------------------------------------------------


def imi_train(
    vectors: DataFrame,
    b: int,
    d: int,
    id_col: str = "id",
    vec_col: str = "vec",
    sample_size: int = 16384,
    iters: int = 10,
):
    """Train the two half-space sub-quantizers → (C0, C1), each
    (2^b, d//2). Two O(sample) trainings, one sampled scan each."""
    if d % 2 != 0:
        raise ValueError(f"IMI needs even d, got {d}")
    if b > 8:
        raise ValueError(f"IMI2x{b} ranks 4^{b} cells per query — keep b ≤ 8")
    dh = d // 2
    h0 = vectors.select(
        F.col(id_col).alias("id"), F.slice(F.col(vec_col), 1, dh).alias("vec")
    )
    h1 = vectors.select(
        F.col(id_col).alias("id"),
        F.slice(F.col(vec_col), dh + 1, dh).alias("vec"),
    )
    C0 = ivf_train_centroids(h0, 2**b, sample_size=sample_size, iters=iters)
    C1 = ivf_train_centroids(h1, 2**b, sample_size=sample_size, iters=iters)
    return C0, C1


def imi_assign(
    vectors: DataFrame,
    C0: np.ndarray,
    C1: np.ndarray,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """(id, vec, cell) with cell = a0·|C1| + a1 (the faiss
    MultiIndexQuantizer composite id) — one Arrow scan, no shuffle."""
    spark = vectors.sparkSession
    bc = spark.sparkContext.broadcast((C0, C1))
    dh = C0.shape[1]

    def assign(batches):
        import pyarrow as pa

        from .knn import _arrow_i64, _arrow_matrix

        C0_, C1_ = bc.value
        n1 = len(C1_)
        cn0 = (C0_ * C0_).sum(1)
        cn1 = (C1_ * C1_).sum(1)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            V = _arrow_matrix(batch.column(vec_col), "array", np.float64)
            a0 = (cn0[None, :] - 2.0 * (V[:, :dh] @ C0_.T)).argmin(1)
            a1 = (cn1[None, :] - 2.0 * (V[:, dh:] @ C1_.T)).argmin(1)
            cell = (a0 * n1 + a1).astype(np.int32)
            yield pa.record_batch(
                [
                    pa.array(_arrow_i64(batch.column(id_col))),
                    batch.column(vec_col),
                    pa.array(cell),
                ],
                names=["id", "vec", "cell"],
            )

    return vectors.select(
        F.col(id_col).cast("long").alias(id_col), F.col(vec_col)
    ).mapInArrow(assign, f"id long, vec array<float>, cell int")


def imi_probe_cells(C0: np.ndarray, C1: np.ndarray):
    """``probe_cells`` hook for :func:`ivf_search`: rank ALL composite
    cells by d0(q, C0[i]) + d1(q, C1[j]) — the sum decomposition the
    product quantizer admits (two small GEMMs + a broadcast add), ties
    by ascending cell id (stable argsort over the flattened table)."""
    dh = C0.shape[1]
    cn0 = (C0 * C0).sum(1)
    cn1 = (C1 * C1).sum(1)

    def probe(Q: np.ndarray) -> np.ndarray:
        d0 = cn0[None, :] - 2.0 * (Q[:, :dh] @ C0.T)
        d1 = cn1[None, :] - 2.0 * (Q[:, dh:] @ C1.T)
        S = (d0[:, :, None] + d1[:, None, :]).reshape(len(Q), -1)
        return S.argsort(1, kind="stable")

    return probe
