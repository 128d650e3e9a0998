"""``write_index`` / ``read_index`` — FAISS-parity index persistence.

FAISS serializes complete index state with ``faiss::write_index`` /
``read_index`` so a reloaded index searches identically; the reference
inherits that surface by subclassing ``faiss::Index``
(/root/reference/include/faiss-metal/MetalIndexFlat.h:47) and its users
round-trip indexes through ``index_cpu_to_metal`` after a CPU-side
``read_index``. This module is the engine's equivalent, Spark-first:
nothing is written from the driver's local filesystem — every artifact
is a dataset under ``path`` on whatever Hadoop-compatible FS Spark is
pointed at, so the same call works on a laptop and a 1000-executor
cluster writing to object storage.

Layout under ``path``::

    _meta/      single-row JSON header: kind, dims, params, array shapes
    arrays/     trained artifacts (centroids, codebooks, rotations,
                scalar ranges) as (name, i, data ARRAY<DOUBLE>) rows —
                small by construction (O(cells·d) / O(256·d) doubles)
    <frame>/    each large table (vectors / codes / words) as parquet;
                cell-keyed frames are ``partitionBy("cell")`` so a
                reloaded index keeps partition-pruned probes (the
                inverted-list layout of ``ivf_write`` / ``ivfpq_write``)

Supported kinds: ``VectorTable`` / ``IDMapVectorTable`` (flat, incl.
fp16/bf16 compact), ``SQ8Index`` (any bit width), ``BinaryIndex``,
``BinaryIVFIndex``, ``IVFIndex``, ``IVFSQIndex``, ``IVFPQIndex``,
``IVFPQRIndex``, ``PQIndex``, ``OPQIndex``, ``RQIndex``, ``GraphIndex``,
``LSHIndex``,
and the composites ``PreTransformIndex`` (recursive inner payload),
``RefineIndex`` (recursive base payload + full-precision source), and
``ShardedIndex`` (recursive member payloads). ``read_index`` returns
the same type that was written and search results are value-identical
pre/post round-trip (``tests/test_index_io.py``).
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_META_VERSION = 1


# ---------------------------------------------------------------------------
# artifact store
# ---------------------------------------------------------------------------


def _write_meta(spark: SparkSession, path: str, meta: dict) -> None:
    meta = dict(meta, version=_META_VERSION)
    spark.createDataFrame(
        [(json.dumps(meta, sort_keys=True),)], "j string"
    ).coalesce(1).write.mode("overwrite").text(f"{path}/_meta")


def _read_meta(spark: SparkSession, path: str) -> dict:
    rows = spark.read.text(f"{path}/_meta").collect()
    if len(rows) != 1:
        raise ValueError(f"corrupt index meta at {path}: {len(rows)} rows")
    return json.loads(rows[0][0])


def _write_arrays(spark: SparkSession, path: str, arrays: dict[str, np.ndarray]) -> dict:
    """Persist small trained arrays; returns {name: shape} for the meta."""
    shapes = {}
    rows = []
    for name, a in arrays.items():
        a = np.asarray(a, np.float64)
        shapes[name] = list(a.shape)
        flat = a.reshape(a.shape[0] if a.ndim > 1 else 1, -1)
        rows.extend((name, int(i), flat[i].tolist()) for i in range(len(flat)))
    spark.createDataFrame(
        rows, "name string, i int, data array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/arrays")
    return shapes


def _read_arrays(spark: SparkSession, path: str, shapes: dict) -> dict[str, np.ndarray]:
    if not shapes:
        return {}
    pdf = spark.read.parquet(f"{path}/arrays").toPandas()
    out = {}
    for name, shape in shapes.items():
        sub = pdf[pdf["name"] == name].sort_values("i")
        out[name] = np.stack(
            [np.asarray(r, np.float64) for r in sub["data"]]
        ).reshape(shape)
    return out


def _write_frame(df: DataFrame, path: str, partition_by: str | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by is not None:
        w = w.partitionBy(partition_by)
    w.parquet(path)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def _index_versions(spark: SparkSession, path: str) -> list[int]:
    """Committed version numbers under an index path (ascending).

    A version ``_v<N>`` counts as committed only once ``_meta/_SUCCESS``
    exists; every :func:`write_index` branch writes ``_meta`` LAST, so
    a crashed or in-flight write is invisible to readers by
    construction (same append-only pointer discipline as
    ``layout.store_versions``).
    """
    import re

    from .layout import _hadoop_fs

    fs = _hadoop_fs(spark, path)
    jvm = spark._jvm
    base = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(base):
        return []
    out = []
    for st in fs.listStatus(base):
        m = re.fullmatch(r"_v(\d+)", st.getPath().getName())
        if not m or not st.isDirectory():
            continue
        if fs.exists(
            jvm.org.apache.hadoop.fs.Path(st.getPath(), "_meta/_SUCCESS")
        ):
            out.append(int(m.group(1)))
    return sorted(out)


def write_index(index, path: str, keep_versions: int = 2) -> None:
    """Serialize any engine index under ``path`` (faiss write_index).

    Atomic under rewrite and crash: each call writes a fresh
    ``_v<N>`` directory (never touching previous versions) and commits
    it by writing ``_meta`` last — a reader concurrent with a rewrite
    keeps resolving the old version, and a write that dies mid-flight
    leaves no committed version behind. FAISS gets this for free from
    single-file POSIX rename; on an object store the append-only
    version pointer is the equivalent.

    Single-writer assumption: like faiss's write_index (and any
    rename-committed layout), concurrent WRITERS to the same path are
    not coordinated — two simultaneous writers can pick the same
    ``_v<N>``. Readers concurrent with one writer are always safe.

    ``keep_versions`` bounds storage growth under repeated rewrites:
    after a successful commit, committed versions older than the newest
    ``keep_versions`` are pruned (the default keeps N−1 for readers
    still resolving the previous version mid-scan). Caveat: an index
    HANDLE from ``read_index`` is lazy — it keeps reading its resolved
    ``_v<N>`` on every action, so a handle held across ``keep_versions``
    or more subsequent rewrites of the same path sees its files pruned
    (faiss's overwrite-in-place breaks such handles on the FIRST
    rewrite; raise ``keep_versions`` or re-``read_index`` to pin).
    """
    if not _is_engine_index(index):
        raise TypeError(
            f"write_index: unsupported index type {type(index).__name__}"
        )
    spark = index.spark
    vs = _index_versions(spark, path)
    new_v = (vs[-1] + 1) if vs else 1
    _write_payload(index, f"{path}/_v{new_v}")
    # prune: only versions strictly older than the keep window, and only
    # after the new version committed (write above is synchronous)
    stale = [v for v in vs if v <= new_v - keep_versions]
    if stale:
        from .layout import _hadoop_fs

        fs = _hadoop_fs(spark, path)
        jvm = spark._jvm
        for v in stale:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/_v{v}"), True)


def _is_engine_index(index) -> bool:
    from ..compact_index import (
        BinaryHashIndex,
        BinaryHNSWIndex,
        BinaryIndex,
        BinaryIVFIndex,
        Flat1DIndex,
        GraphIndex,
        GraphPQIndex,
        GraphSQIndex,
        IMIIndex,
        IVFFlatDedupIndex,
        IVFIndex,
        IVFPQFastScanIndex,
        IVFPQIndex,
        IVFPQRIndex,
        IVFRQFastScanIndex,
        IVFRQIndex,
        IVFSQIndex,
        LSHIndex,
        NSGIndex,
        OPQIndex,
        PQFastScanIndex,
        PQIndex,
        PRQFastScanIndex,
        PRQIndex,
        RefineIndex,
        RQFastScanIndex,
        RQIndex,
        SQ8Index,
    )
    from ..operators.pca import NormTransformIndex, PreTransformIndex
    from ..sharded import ShardedIndex
    from ..vector_table import VectorTable

    return isinstance(
        index,
        (
            NormTransformIndex,
            PreTransformIndex,
            VectorTable,
            SQ8Index,
            BinaryHashIndex,
            BinaryHNSWIndex,
            BinaryIndex,
            BinaryIVFIndex,
            Flat1DIndex,
            GraphIndex,
            GraphPQIndex,
            GraphSQIndex,
            IMIIndex,
            IVFFlatDedupIndex,
            IVFIndex,
            IVFPQFastScanIndex,
            IVFPQIndex,
            IVFPQRIndex,
            IVFRQFastScanIndex,
            IVFRQIndex,
            IVFSQIndex,
            LSHIndex,
            NSGIndex,
            PQFastScanIndex,
            PQIndex,
            OPQIndex,
            PRQFastScanIndex,
            PRQIndex,
            RefineIndex,
            RQFastScanIndex,
            RQIndex,
            ShardedIndex,
        ),
    )


def _write_payload(index, path: str) -> None:
    from ..compact_index import (
        BinaryHashIndex,
        BinaryHNSWIndex,
        BinaryIndex,
        BinaryIVFIndex,
        Flat1DIndex,
        GraphIndex,
        GraphPQIndex,
        GraphSQIndex,
        IMIIndex,
        IVFFlatDedupIndex,
        IVFIndex,
        IVFPQFastScanIndex,
        IVFPQIndex,
        IVFPQRIndex,
        IVFRQFastScanIndex,
        IVFRQIndex,
        IVFSQIndex,
        LSHIndex,
        NSGIndex,
        OPQIndex,
        PQFastScanIndex,
        PQIndex,
        PRQFastScanIndex,
        PRQIndex,
        RefineIndex,
        RQFastScanIndex,
        RQIndex,
        SQ8Index,
    )
    from ..vector_table import VectorTable

    if isinstance(index, VectorTable):
        from ..vector_table import IDMap2VectorTable, IDMapVectorTable

        if isinstance(index, IDMap2VectorTable):
            vt_kind = "idmap2_vector_table"
        elif isinstance(index, IDMapVectorTable):
            vt_kind = "idmap_vector_table"
        else:
            vt_kind = "vector_table"
        _write_frame(index.df, f"{path}/vectors")
        _write_meta(
            index.spark,
            path,
            {
                "kind": vt_kind,
                "d": index.d,
                "metric": index.metric,
                "storage": index.storage,
                "compact": index.compact,
                "next_id": index._next_id,
            },
        )
    elif isinstance(index, SQ8Index):
        _write_frame(index.codes, f"{path}/codes")
        shapes = _write_arrays(
            index.spark, path, {"vmin": index.vmin, "vmax": index.vmax}
        )
        _write_meta(
            index.spark,
            path,
            {
                "kind": "sq8",
                "d": index.d,
                "ntotal": index.ntotal,
                "bits": index.bits,
                "direct": index.direct,
                "shapes": shapes,
            },
        )
    elif isinstance(index, BinaryIndex):
        _write_frame(index.words, f"{path}/words")
        has_source = index._source is not None
        if has_source:
            # the refine tier needs the full-precision vectors; persist
            # them so refine_search works after reload
            _write_frame(index._source, f"{path}/source")
        _write_meta(
            index.spark,
            path,
            {
                "kind": "binary",
                "d": index.d,
                "ntotal": index.ntotal,
                "has_source": has_source,
            },
        )
    elif isinstance(index, IVFIndex):
        _write_frame(index.assigned, f"{path}/assigned", partition_by="cell")
        arrays = {"centroids": index.centroids}
        meta = {
            "kind": "ivf",
            "d": index.d,
            "metric": index.metric,
            "ntotal": index.ntotal,
        }
        if index.quantizer is not None:
            arrays["coarse_edges"] = index.quantizer.edges
            arrays["coarse_landmarks"] = index.quantizer.landmarks
            meta["coarse"] = {
                "beam": index.quantizer.beam,
                "rounds": index.quantizer.rounds,
                "expand": index.quantizer.expand,
                "dtype": index.quantizer.dtype,
            }
        meta["shapes"] = _write_arrays(index.spark, path, arrays)
        _write_meta(index.spark, path, meta)
    elif isinstance(index, IVFFlatDedupIndex):
        _write_frame(index.assigned, f"{path}/assigned", partition_by="cell")
        _write_frame(index.instances, f"{path}/instances")
        shapes = _write_arrays(index.spark, path, {"centroids": index.centroids})
        _write_meta(
            index.spark,
            path,
            {
                "kind": "ivf_dedup",
                "d": index.d,
                "metric": index.metric,
                "ntotal": index.ntotal,
                "n_instances": index.n_instances,
                "shapes": shapes,
            },
        )
    elif isinstance(index, IVFPQFastScanIndex):
        _write_frame(index.codes, f"{path}/codes", partition_by="cell")
        shapes = _write_arrays(
            index.spark,
            path,
            {"centroids": index.centroids, "codebooks": index.codebooks},
        )
        _write_meta(
            index.spark,
            path,
            {
                "kind": "ivfpq_fs",
                "d": index.d,
                "ntotal": index.ntotal,
                "shapes": shapes,
            },
        )
    elif isinstance(index, IVFPQIndex):
        _write_frame(index.codes, f"{path}/codes", partition_by="cell")
        arrays = {"centroids": index.centroids, "codebooks": index.codebooks}
        meta = {"kind": "ivfpq", "d": index.d, "ntotal": index.ntotal}
        if index.quantizer is not None:
            arrays["coarse_edges"] = index.quantizer.edges
            arrays["coarse_landmarks"] = index.quantizer.landmarks
            meta["coarse"] = {
                "beam": index.quantizer.beam,
                "rounds": index.quantizer.rounds,
                "expand": index.quantizer.expand,
                "dtype": index.quantizer.dtype,
            }
        meta["shapes"] = _write_arrays(index.spark, path, arrays)
        _write_meta(index.spark, path, meta)
    elif isinstance(index, IVFPQRIndex):
        _write_frame(index.codes, f"{path}/codes", partition_by="cell")
        shapes = _write_arrays(
            index.spark,
            path,
            {
                "centroids": index.centroids,
                "codebooks": index.codebooks,
                "refine_books": index.refine_books,
            },
        )
        _write_meta(
            index.spark,
            path,
            {"kind": "ivfpqr", "d": index.d, "ntotal": index.ntotal, "shapes": shapes},
        )
    elif isinstance(index, IVFRQIndex):
        _write_frame(index.codes, f"{path}/codes", partition_by="cell")
        arrays = {"centroids": index.centroids, "codebooks": index.codebooks}
        coarse = None
        if index.quantizer is not None:
            arrays["coarse_edges"] = index.quantizer.edges
            arrays["coarse_landmarks"] = index.quantizer.landmarks
            coarse = {
                "beam": index.quantizer.beam,
                "rounds": index.quantizer.rounds,
                "expand": index.quantizer.expand,
            }
        shapes = _write_arrays(index.spark, path, arrays)
        _write_meta(
            index.spark,
            path,
            {
                "kind": "ivfrq",
                "d": index.d,
                "ntotal": index.ntotal,
                "beam": index.beam,
                "icm_sweeps": index.icm_sweeps,
                "by_residual": index.by_residual,
                "coarse": coarse,
                "shapes": shapes,
            },
        )
    elif isinstance(index, IVFRQFastScanIndex):
        _write_frame(index.codes, f"{path}/codes", partition_by="cell")
        shapes = _write_arrays(
            index.spark,
            path,
            {"centroids": index.centroids, "codebooks": index.codebooks},
        )
        _write_meta(
            index.spark,
            path,
            {
                "kind": "ivfrq_fs",
                "d": index.d,
                "ntotal": index.ntotal,
                "beam": index.beam,
                "icm_sweeps": index.icm_sweeps,
                "by_residual": index.by_residual,
                "shapes": shapes,
            },
        )
    elif isinstance(index, PRQFastScanIndex):
        _write_frame(index.codes, f"{path}/codes")
        shapes = _write_arrays(index.spark, path, {"codebooks": index.codebooks})
        _write_meta(
            index.spark,
            path,
            {
                "kind": "prq_fs",
                "d": index.d,
                "ntotal": index.ntotal,
                "beam": index.beam,
                "icm_sweeps": index.icm_sweeps,
                "shapes": shapes,
            },
        )
    elif isinstance(index, RQFastScanIndex):
        _write_frame(index.codes, f"{path}/codes")
        shapes = _write_arrays(index.spark, path, {"codebooks": index.codebooks})
        _write_meta(
            index.spark,
            path,
            {
                "kind": "rq_fs",
                "d": index.d,
                "ntotal": index.ntotal,
                "beam": index.beam,
                "icm_sweeps": index.icm_sweeps,
                "shapes": shapes,
            },
        )
    elif isinstance(index, BinaryIVFIndex):
        _write_frame(index.words, f"{path}/words", partition_by="cell")
        # packed words are < 2^32 — exact in the float64 array store
        shapes = _write_arrays(
            index.spark, path, {"centroid_words": index.centroid_words}
        )
        _write_meta(
            index.spark,
            path,
            {
                "kind": "bivf",
                "d": index.d,
                "ntotal": index.ntotal,
                "shapes": shapes,
            },
        )
    elif isinstance(index, BinaryHNSWIndex):
        _write_frame(index.words, f"{path}/words")
        _write_frame(index.graph, f"{path}/graph")
        # binary kind: no arrays/ dataset (the BinaryIndex discipline)
        _write_meta(
            index.spark,
            path,
            {
                "kind": "bhnsw",
                "d": index.d,
                "ntotal": index.ntotal,
                "M": index.M,
                "ef_search": index.ef_search,
            },
        )
    elif isinstance(index, GraphSQIndex):
        _write_frame(index.codes, f"{path}/codes")
        _write_frame(index.graph, f"{path}/graph")
        shapes = _write_arrays(
            index.spark, path, {"vmin": index.vmin, "vmax": index.vmax}
        )
        _write_meta(
            index.spark,
            path,
            {
                "kind": "graph_sq",
                "d": index.d,
                "ntotal": index.ntotal,
                "M": index.M,
                "ef_search": index.ef_search,
                "bits": index.bits,
                "shapes": shapes,
            },
        )
    elif isinstance(index, GraphPQIndex):
        _write_frame(index.codes, f"{path}/codes")
        _write_frame(index.graph, f"{path}/graph")
        shapes = _write_arrays(
            index.spark, path, {"codebooks": index.codebooks}
        )
        _write_meta(
            index.spark,
            path,
            {
                "kind": "graph_pq",
                "d": index.d,
                "ntotal": index.ntotal,
                "M": index.M,
                "ef_search": index.ef_search,
                "shapes": shapes,
            },
        )
    elif isinstance(index, GraphIndex):
        _write_frame(index.vectors, f"{path}/vectors")
        _write_frame(index.graph, f"{path}/graph")
        meta = {
            # NSGIndex subclasses GraphIndex: same payload plus the
            # navigating node (kind "nsg" restores the subclass)
            "kind": "nsg" if isinstance(index, NSGIndex) else "graph",
            "d": index.d,
            "ntotal": index.ntotal,
            "M": index.M,
            "ef_search": index.ef_search,
        }
        if isinstance(index, NSGIndex):
            meta["nav_id"] = int(index.nav_id)
        _write_meta(index.spark, path, meta)
    elif isinstance(index, IVFSQIndex):
        _write_frame(index.codes, f"{path}/codes", partition_by="cell")
        arrays = {
            "centroids": index.centroids,
            "vmin": index.vmin,
            "vmax": index.vmax,
        }
        coarse = None
        if index.quantizer is not None:
            arrays["coarse_edges"] = index.quantizer.edges
            arrays["coarse_landmarks"] = index.quantizer.landmarks
            coarse = {
                "beam": index.quantizer.beam,
                "rounds": index.quantizer.rounds,
                "expand": index.quantizer.expand,
            }
        shapes = _write_arrays(index.spark, path, arrays)
        _write_meta(
            index.spark,
            path,
            {
                "kind": "ivfsq",
                "d": index.d,
                "metric": index.metric,
                "ntotal": index.ntotal,
                "bits": index.bits,
                "coarse": coarse,
                "shapes": shapes,
            },
        )
    elif isinstance(index, PQFastScanIndex):
        _write_frame(index.codes, f"{path}/codes")
        shapes = _write_arrays(index.spark, path, {"codebooks": index.codebooks})
        _write_meta(
            index.spark,
            path,
            {"kind": "pq_fs", "d": index.d, "ntotal": index.ntotal, "shapes": shapes},
        )
    elif isinstance(index, PQIndex):
        _write_frame(index.codes, f"{path}/codes")
        shapes = _write_arrays(index.spark, path, {"codebooks": index.codebooks})
        _write_meta(
            index.spark,
            path,
            {"kind": "pq", "d": index.d, "ntotal": index.ntotal, "shapes": shapes},
        )
    elif isinstance(index, Flat1DIndex):
        _write_frame(index.ranked, f"{path}/ranked")
        _write_meta(
            index.spark,
            path,
            {"kind": "flat1d", "d": 1, "ntotal": index.ntotal},
        )
    elif isinstance(index, PRQIndex):
        _write_frame(index.codes, f"{path}/codes")
        shapes = _write_arrays(index.spark, path, {"codebooks": index.codebooks})
        _write_meta(
            index.spark,
            path,
            {
                "kind": "prq",
                "d": index.d,
                "ntotal": index.ntotal,
                "beam": index.beam,
                "icm_sweeps": index.icm_sweeps,
                "shapes": shapes,
            },
        )
    elif isinstance(index, RQIndex):
        _write_frame(index.codes, f"{path}/codes")
        shapes = _write_arrays(index.spark, path, {"codebooks": index.codebooks})
        _write_meta(
            index.spark,
            path,
            {
                "kind": "rq",
                "d": index.d,
                "ntotal": index.ntotal,
                "beam": index.beam,
                "icm_sweeps": index.icm_sweeps,
                "shapes": shapes,
            },
        )
    elif isinstance(index, RefineIndex):
        # faiss persists IndexRefineFlat as base + refine storage; here
        # the wrapper is base payload (recursive, any kind) + the
        # full-precision source frame + k_factor
        _write_payload(index.base, f"{path}/base")
        _write_frame(index.source, f"{path}/source")
        _write_meta(
            index.spark,
            path,
            {
                "kind": "refine",
                "d": index.d,
                "ntotal": index.ntotal,
                "k_factor": index.k_factor,
            },
        )
    elif isinstance(index, OPQIndex):
        _write_frame(index.codes, f"{path}/codes")
        shapes = _write_arrays(
            index.spark, path, {"rotation": index.rotation, "codebooks": index.codebooks}
        )
        _write_meta(
            index.spark,
            path,
            {"kind": "opq", "d": index.d, "ntotal": index.ntotal, "shapes": shapes},
        )
    elif _is_normtransform(index):
        # composite: inner payload first, _meta LAST (shards discipline);
        # the transform itself is stateless (unit normalization), so the
        # payload is just the inner index + d_in
        _write_payload(index.inner, f"{path}/inner")
        _write_meta(
            index.spark,
            path,
            {"kind": "normtransform", "d": index.d_in},
        )
    elif _is_pretransform(index):
        # composite: inner payload first, _meta LAST (shards discipline)
        _write_payload(index.inner, f"{path}/inner")
        shapes = _write_arrays(
            index.spark, path,
            {"mean": index.mean, "components": index.components},
        )
        _write_meta(
            index.spark,
            path,
            {"kind": "pretransform", "d": index.d_in, "shapes": shapes},
        )
    elif isinstance(index, IMIIndex):
        _write_frame(index.assigned, f"{path}/assigned", partition_by="cell")
        shapes = _write_arrays(
            index.spark, path, {"C0": index.C0, "C1": index.C1}
        )
        _write_meta(
            index.spark,
            path,
            {
                "kind": "imi",
                "d": index.d,
                "b": index.b,
                "ntotal": index.ntotal,
                "shapes": shapes,
            },
        )
    elif isinstance(index, BinaryHashIndex):
        _write_frame(index.hashed, f"{path}/hashed", partition_by="h0")
        _write_meta(
            index.spark,
            path,
            {
                "kind": "bhash",
                "d": index.d,
                "b": index.b,
                "n_slices": index.n_slices,
                "ntotal": index.ntotal,
            },
        )
    elif isinstance(index, LSHIndex):
        _write_frame(index.words, f"{path}/words")
        has_source = index._source is not None
        if has_source:
            _write_frame(index._source, f"{path}/source")
        shapes = _write_arrays(
            index.spark, path,
            {"rotation": index.rotation, "mean": index._mu},
        )
        _write_meta(
            index.spark,
            path,
            {
                "kind": "lsh",
                "d": index.d,
                "nbits": index.nbits,
                "ntotal": index.ntotal,
                "has_source": has_source,
                "shapes": shapes,
            },
        )
    else:
        from ..sharded import ShardedIndex

        if not isinstance(index, ShardedIndex):
            raise TypeError(
                f"write_index: unsupported index type {type(index).__name__}"
            )
        # composite: member payloads first (each a self-describing
        # dataset with its own _meta), composite _meta LAST so a
        # crashed member write leaves no committed composite behind —
        # the same commit discipline as the _v<N> pointer one level up.
        for i, member in enumerate(index.shards):
            _write_payload(member, f"{path}/shard_{i}")
        _write_meta(
            index.spark,
            path,
            {
                "kind": "shards",
                "d": index.d,
                "metric": index.metric,
                "n_shards": len(index.shards),
                "successive_ids": index.successive_ids,
            },
        )


def _is_pretransform(index) -> bool:
    from ..operators.pca import PreTransformIndex

    return isinstance(index, PreTransformIndex)


def _is_normtransform(index) -> bool:
    from ..operators.pca import NormTransformIndex

    return isinstance(index, NormTransformIndex)


def clone_index(index):
    """Independent handle with identical state — faiss ``clone_index``.

    The clone and the original share immutable artifacts (Spark
    DataFrames are immutable plans; trained numpy arrays are copied),
    so cloning is O(metadata): mutating either side (``add``, ``reset``,
    ``remove_ids``, ``merge_from``) reassigns that side's frames and
    never touches the other — the observable faiss deep-copy contract
    without duplicating the corpus. Caveat (performance, not
    correctness): a derived tier's persisted code frame is shared, so
    ``release()`` on one handle drops the shared cache for both.
    """
    import dataclasses

    from ..sharded import ShardedIndex
    from ..vector_table import VectorTable

    if isinstance(index, ShardedIndex):
        return ShardedIndex.from_indexes(
            *[clone_index(m) for m in index.shards],
            successive_ids=index.successive_ids,
        )
    if isinstance(index, VectorTable):
        return type(index)(
            index.spark,
            index.d,
            metric=index.metric,
            storage=index.storage,
            compact=index.compact,
            df=index.df,
            _next_id=index._next_id,
        )
    if _is_normtransform(index):
        from ..operators.pca import NormTransformIndex

        return NormTransformIndex(clone_index(index.inner), d_in=index.d_in)
    if _is_pretransform(index):
        from ..operators.pca import PreTransformIndex

        return PreTransformIndex(
            index.mean.copy(), index.components.copy(), clone_index(index.inner)
        )
    from ..compact_index import RefineIndex

    if isinstance(index, RefineIndex):
        # not a dataclass: recurse into the base, share the immutable
        # source frame (same discipline as the other composites); the
        # refine tier handle (if any) rides along un-cloned — it only
        # feeds the shared source plan
        return RefineIndex(
            clone_index(index.base), index.source, index.k_factor,
            refine=index.refine,
        )
    if not _is_engine_index(index):
        raise TypeError(
            f"clone_index: unsupported index type {type(index).__name__}"
        )
    kw = {}
    for f in dataclasses.fields(index):
        v = getattr(index, f.name)
        kw[f.name] = v.copy() if isinstance(v, np.ndarray) else v
    return type(index)(**kw)


def _read_coarse(meta: dict, arrays: dict):
    """Rebuild the graph coarse quantizer from an ivf/ivfpq payload
    (r12; ids persisted as exact float64 < 2^53, re-cast on read)."""
    c = meta.get("coarse")
    if not c:
        return None
    from ..operators.coarse import HNSWCoarseQuantizer

    return HNSWCoarseQuantizer(
        arrays["centroids"],
        arrays["coarse_edges"].astype(np.int64),
        arrays["coarse_landmarks"].astype(np.int64).ravel(),
        beam=int(c["beam"]),
        rounds=int(c["rounds"]),
        expand=int(c["expand"]),
        dtype=str(c.get("dtype", "f32")),  # pre-r13 stores: f32
    )


def read_index(spark: SparkSession, path: str):
    """Reload an index written by :func:`write_index` (faiss read_index).

    Returns the same type that was written; searches on the reloaded
    index are value-identical. Cell-keyed kinds (ivf / ivfpq) come back
    partition-pruned: the probe ``isin`` filter lands on the parquet
    partition key exactly as with ``ivf_write``.
    """
    vs = _index_versions(spark, path)
    if vs:
        path = f"{path}/_v{vs[-1]}"
    # else: flat pre-versioned layout (round-6 stores) — read in place
    return _read_payload(spark, path)


def _read_payload(spark: SparkSession, path: str):
    from ..compact_index import (
        BinaryHashIndex,
        BinaryHNSWIndex,
        BinaryIndex,
        BinaryIVFIndex,
        Flat1DIndex,
        GraphIndex,
        GraphPQIndex,
        GraphSQIndex,
        IMIIndex,
        IVFFlatDedupIndex,
        IVFIndex,
        IVFPQFastScanIndex,
        IVFPQIndex,
        IVFPQRIndex,
        IVFRQFastScanIndex,
        IVFRQIndex,
        IVFSQIndex,
        LSHIndex,
        NSGIndex,
        OPQIndex,
        PQFastScanIndex,
        PQIndex,
        PRQFastScanIndex,
        PRQIndex,
        RefineIndex,
        RQFastScanIndex,
        RQIndex,
        SQ8Index,
    )
    from ..vector_table import VectorTable

    meta = _read_meta(spark, path)
    kind = meta["kind"]
    if kind == "shards":
        from ..sharded import ShardedIndex

        members = [
            _read_payload(spark, f"{path}/shard_{i}")
            for i in range(meta["n_shards"])
        ]
        return ShardedIndex.from_indexes(
            *members, successive_ids=meta["successive_ids"]
        )
    if kind == "refine":
        return RefineIndex(
            _read_payload(spark, f"{path}/base"),
            spark.read.parquet(f"{path}/source"),
            int(meta["k_factor"]),
        )
    if kind in ("vector_table", "idmap_vector_table", "idmap2_vector_table"):
        from ..vector_table import IDMap2VectorTable, IDMapVectorTable

        cls = {
            "idmap_vector_table": IDMapVectorTable,
            "idmap2_vector_table": IDMap2VectorTable,
        }.get(kind, VectorTable)
        return cls(
            spark,
            meta["d"],
            metric=meta["metric"],
            storage=meta["storage"],
            compact=meta["compact"],
            df=spark.read.parquet(f"{path}/vectors"),
            _next_id=meta["next_id"],
        )
    arrays = _read_arrays(spark, path, meta.get("shapes", {}))
    if kind == "sq8":
        return SQ8Index(
            spark,
            meta["d"],
            arrays["vmin"],
            arrays["vmax"],
            spark.read.parquet(f"{path}/codes"),
            meta["ntotal"],
            meta.get("bits", 8),  # round-7 stores predate b-bit tiers
            meta.get("direct", False),  # False/True/"signed"; pre-r13: minmax
        )
    if kind == "binary":
        source = (
            spark.read.parquet(f"{path}/source") if meta["has_source"] else None
        )
        return BinaryIndex(
            spark,
            meta["d"],
            spark.read.parquet(f"{path}/words"),
            source,
            meta["ntotal"],
        )
    if kind == "ivf":
        return IVFIndex(
            spark,
            meta["d"],
            meta["metric"],
            arrays["centroids"],
            spark.read.parquet(f"{path}/assigned"),
            meta["ntotal"],
            quantizer=_read_coarse(meta, arrays),
        )
    if kind == "ivf_dedup":
        return IVFFlatDedupIndex(
            spark,
            meta["d"],
            meta["metric"],
            arrays["centroids"],
            spark.read.parquet(f"{path}/assigned"),
            spark.read.parquet(f"{path}/instances"),
            meta["ntotal"],
            meta["n_instances"],
        )
    if kind == "bivf":
        return BinaryIVFIndex(
            spark,
            meta["d"],
            arrays["centroid_words"].astype(np.int64),
            spark.read.parquet(f"{path}/words"),
            meta["ntotal"],
        )
    if kind == "bhnsw":
        return BinaryHNSWIndex(
            spark,
            meta["d"],
            spark.read.parquet(f"{path}/words"),
            spark.read.parquet(f"{path}/graph"),
            meta["M"],
            meta["ef_search"],
            meta["ntotal"],
        )
    if kind == "graph_sq":
        return GraphSQIndex(
            spark,
            meta["d"],
            arrays["vmin"],
            arrays["vmax"],
            spark.read.parquet(f"{path}/codes"),
            spark.read.parquet(f"{path}/graph"),
            meta["M"],
            meta["ef_search"],
            meta["ntotal"],
            meta["bits"],
        )
    if kind == "graph_pq":
        return GraphPQIndex(
            spark,
            meta["d"],
            arrays["codebooks"],
            spark.read.parquet(f"{path}/codes"),
            spark.read.parquet(f"{path}/graph"),
            meta["M"],
            meta["ef_search"],
            meta["ntotal"],
        )
    if kind == "graph":
        return GraphIndex(
            spark,
            meta["d"],
            spark.read.parquet(f"{path}/vectors"),
            spark.read.parquet(f"{path}/graph"),
            meta["M"],
            meta["ef_search"],
            meta["ntotal"],
        )
    if kind == "nsg":
        return NSGIndex(
            spark,
            meta["d"],
            spark.read.parquet(f"{path}/vectors"),
            spark.read.parquet(f"{path}/graph"),
            meta["M"],
            meta["ef_search"],
            meta["ntotal"],
            nav_id=int(meta["nav_id"]),
        )
    if kind == "ivfsq":
        return IVFSQIndex(
            spark,
            meta["d"],
            meta["metric"],
            arrays["centroids"],
            arrays["vmin"],
            arrays["vmax"],
            spark.read.parquet(f"{path}/codes"),
            meta["ntotal"],
            meta["bits"],
            quantizer=_read_coarse(meta, arrays),
        )
    if kind == "ivfpq_fs":
        return IVFPQFastScanIndex(
            spark,
            meta["d"],
            arrays["centroids"],
            arrays["codebooks"],
            spark.read.parquet(f"{path}/codes"),
            meta["ntotal"],
        )
    if kind == "ivfpq":
        return IVFPQIndex(
            spark,
            meta["d"],
            arrays["centroids"],
            arrays["codebooks"],
            spark.read.parquet(f"{path}/codes"),
            meta["ntotal"],
            quantizer=_read_coarse(meta, arrays),
        )
    if kind == "ivfrq_fs":
        return IVFRQFastScanIndex(
            spark,
            meta["d"],
            arrays["centroids"],
            arrays["codebooks"],
            spark.read.parquet(f"{path}/codes"),
            meta["ntotal"],
            beam=int(meta.get("beam", 1)),
            icm_sweeps=int(meta.get("icm_sweeps", 0)),
            by_residual=bool(meta.get("by_residual", True)),
        )
    if kind == "prq_fs":
        return PRQFastScanIndex(
            spark,
            meta["d"],
            arrays["codebooks"],
            spark.read.parquet(f"{path}/codes"),
            meta["ntotal"],
            beam=int(meta.get("beam", 1)),
            icm_sweeps=int(meta.get("icm_sweeps", 0)),
        )
    if kind == "rq_fs":
        return RQFastScanIndex(
            spark,
            meta["d"],
            arrays["codebooks"],
            spark.read.parquet(f"{path}/codes"),
            meta["ntotal"],
            beam=int(meta.get("beam", 1)),
            icm_sweeps=int(meta.get("icm_sweeps", 0)),
        )
    if kind == "ivfrq":
        return IVFRQIndex(
            spark,
            meta["d"],
            arrays["centroids"],
            arrays["codebooks"],
            spark.read.parquet(f"{path}/codes"),
            meta["ntotal"],
            beam=int(meta.get("beam", 1)),
            icm_sweeps=int(meta.get("icm_sweeps", 0)),
            by_residual=bool(meta.get("by_residual", True)),
            quantizer=_read_coarse(meta, arrays),
        )
    if kind == "ivfpqr":
        return IVFPQRIndex(
            spark,
            meta["d"],
            arrays["centroids"],
            arrays["codebooks"],
            arrays["refine_books"],
            spark.read.parquet(f"{path}/codes"),
            meta["ntotal"],
        )
    if kind == "pq_fs":
        return PQFastScanIndex(
            spark,
            meta["d"],
            arrays["codebooks"],
            spark.read.parquet(f"{path}/codes"),
            meta["ntotal"],
        )
    if kind == "pq":
        return PQIndex(
            spark,
            meta["d"],
            arrays["codebooks"],
            spark.read.parquet(f"{path}/codes"),
            meta["ntotal"],
        )
    if kind == "flat1d":
        return Flat1DIndex(
            spark, spark.read.parquet(f"{path}/ranked"), meta["ntotal"]
        )
    if kind == "prq":
        return PRQIndex(
            spark,
            meta["d"],
            arrays["codebooks"],
            spark.read.parquet(f"{path}/codes"),
            meta["ntotal"],
            beam=int(meta.get("beam", 1)),
            icm_sweeps=int(meta.get("icm_sweeps", 0)),
        )
    if kind == "rq":
        return RQIndex(
            spark,
            meta["d"],
            arrays["codebooks"],
            spark.read.parquet(f"{path}/codes"),
            meta["ntotal"],
            beam=int(meta.get("beam", 1)),  # pre-beam stores default greedy
            icm_sweeps=int(meta.get("icm_sweeps", 0)),
        )
    if kind == "opq":
        return OPQIndex(
            spark,
            meta["d"],
            arrays["rotation"],
            arrays["codebooks"],
            spark.read.parquet(f"{path}/codes"),
            meta["ntotal"],
        )
    if kind == "normtransform":
        from ..operators.pca import NormTransformIndex

        return NormTransformIndex(
            _read_payload(spark, f"{path}/inner"), d_in=meta["d"]
        )
    if kind == "pretransform":
        from ..operators.pca import PreTransformIndex

        return PreTransformIndex(
            arrays["mean"],
            arrays["components"],
            _read_payload(spark, f"{path}/inner"),
        )
    if kind == "imi":
        return IMIIndex(
            spark,
            meta["d"],
            meta["b"],
            arrays["C0"],
            arrays["C1"],
            spark.read.parquet(f"{path}/assigned"),
            meta["ntotal"],
        )
    if kind == "bhash":
        return BinaryHashIndex(
            spark,
            meta["d"],
            meta["b"],
            meta["n_slices"],
            spark.read.parquet(f"{path}/hashed"),
            meta["ntotal"],
        )
    if kind == "lsh":
        return LSHIndex(
            spark,
            meta["d"],
            meta["nbits"],
            arrays["rotation"],
            spark.read.parquet(f"{path}/words"),
            spark.read.parquet(f"{path}/source") if meta["has_source"] else None,
            meta["ntotal"],
            arrays.get("mean"),  # absent in early round-8 stores → zeros
        )
    raise ValueError(f"read_index: unknown index kind {kind!r} at {path}")
