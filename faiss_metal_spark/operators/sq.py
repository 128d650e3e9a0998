"""Scalar-quantized (SQ8) vector storage + asymmetric-distance search.

FAISS-family superset surface (``faiss::IndexScalarQuantizer`` /
``ScalarQuantizer::QT_8bit`` semantics re-expressed on Spark): the
reference's flat index stores FP32/FP16/BF16 only
(/root/reference/include/faiss-metal/MetalIndexFlat.h:47), so uint8
codes extend its storage family to 1 byte/dim (4× smaller than FP32,
2× smaller than the FP16/BF16 compact stores in ``quantize.py``).

Semantics (ours, documented where they diverge from FAISS):

- train: per-dimension ``vmin_i`` / ``vmax_i`` over the corpus (FAISS
  ``RangeStat::RS_minmax``). One distributed pass: posexplode →
  groupBy(dim) min/max — nv·d rows combine map-side into d groups, so
  the shuffle carries O(partitions · d) partial rows, not the corpus.
- encode: ``code_i = clamp(floor((x_i − vmin_i)/(vmax_i − vmin_i)·255
  + 0.5), 0, 255)``, double arithmetic; a constant dimension
  (vmax = vmin) encodes 0.
- reconstruct: ``r_i = vmin_i + code_i·(vmax_i − vmin_i)/255`` — exact
  at both range endpoints (FAISS QT_8bit reconstructs bin midpoints,
  ``(code+0.5)/256``; endpoints-exact is the variant its docs call
  QT_8bit_direct-style and is easier to reason about for parity).
- search: asymmetric distance — FP32/64 query against reconstructed
  vectors, L2², ascending, ties by ascending label.

Both the encode and the search are pure Catalyst expressions (double
math, whole-stage codegen), so the whole path is ANSI-SQL-expressible
and oracle-checked. Trained params travel as plan literals (arrays of
d doubles) — broadcast by construction, no join against a params
table. ``sq8_encode_binary`` / ``sq8_decode_binary`` additionally give
the honest 1-byte/dim BINARY layout for storage (Arrow-vectorized,
one numpy op per batch), pinned by a roundtrip test against the
Catalyst codes.

Scale shape: identical to ``knn_search``'s declarative path —
broadcast query batch, one scan of the code table (d bytes/row),
per-partition partial top-k under the window; no vector shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def sq8_train(
    df: DataFrame, vec_col: str = "vec"
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (vmin, vmax) over the corpus — one pass, map-side
    combined. Returns float64 arrays of length d."""
    mm = (
        df.select(F.posexplode(vec_col).alias("j", "x"))
        .groupBy("j")
        .agg(
            F.min(F.col("x").cast("double")).alias("vmin"),
            F.max(F.col("x").cast("double")).alias("vmax"),
        )
        .orderBy("j")
        .toPandas()
    )
    return mm["vmin"].to_numpy(np.float64), mm["vmax"].to_numpy(np.float64)


def _lit_arr(vals: np.ndarray) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def sq8_code_col(
    vec: Column | str, vmin: np.ndarray, vmax: np.ndarray
) -> Column:
    """Catalyst SQ8 encode: array<int> codes (see module docstring for
    the exact arithmetic — kept bit-identical to the SQL oracle)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    vmin_l, vmax_l = _lit_arr(vmin), _lit_arr(vmax)
    return F.transform(
        v,
        lambda x, i: F.when(
            F.element_at(vmax_l, i + 1) == F.element_at(vmin_l, i + 1), F.lit(0)
        )
        .otherwise(
            F.least(
                F.lit(255.0),
                F.greatest(
                    F.lit(0.0),
                    F.floor(
                        (x.cast("double") - F.element_at(vmin_l, i + 1))
                        / (
                            F.element_at(vmax_l, i + 1)
                            - F.element_at(vmin_l, i + 1)
                        )
                        * F.lit(255.0)
                        + F.lit(0.5)
                    ),
                ),
            )
        )
        .cast("int"),
    )


def sq8_reconstruct_col(
    codes: Column | str, vmin: np.ndarray, vmax: np.ndarray
) -> Column:
    """Decode codes back to array<double>: r_i = vmin_i + code_i·Δ_i/255."""
    c = F.col(codes) if isinstance(codes, str) else codes
    vmin_l, vmax_l = _lit_arr(vmin), _lit_arr(vmax)
    return F.transform(
        c,
        lambda x, i: F.element_at(vmin_l, i + 1)
        + x.cast("double")
        * (
            (F.element_at(vmax_l, i + 1) - F.element_at(vmin_l, i + 1))
            / F.lit(255.0)
        ),
    )


def sq8_encode(
    df: DataFrame,
    vmin: np.ndarray,
    vmax: np.ndarray,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """(id, vec) → (id, code: array<int>) — the stored index form."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        sq8_code_col(vec_col, vmin, vmax).alias("code"),
    )


def sq8_search(
    codes: DataFrame,
    vmin: np.ndarray,
    vmax: np.ndarray,
    queries: DataFrame,
    k: int,
    id_col: str = "id",
    code_col: str = "code",
    qid_col: str = "qid",
    qvec_col: str = "vec",
) -> DataFrame:
    """Asymmetric SQ8 top-k: exact query vs reconstructed codes, L2²
    ascending, ties by label. Returns (qid, rank, label, distance).

    The reconstruct is a projection on the scan side — decoded once per
    stored row, then reused across the broadcast query batch inside the
    same codegen stage. Distance accumulates in float64 (the engine's
    accumulate-wide discipline, /root/reference/src/MetalIndexFlat.mm
    norm/accumulate notes)."""
    from ..functions.vector import l2sq

    v = codes.select(
        F.col(id_col).cast("long").alias("label"),
        sq8_reconstruct_col(code_col, vmin, vmax).alias("_rvec"),
    )
    q = queries.select(
        F.col(qid_col).cast("long").alias("qid"),
        F.col(qvec_col).cast("array<double>").alias("_qvec"),
    )
    joined = (
        F.broadcast(q)
        .crossJoin(v)
        .select("qid", "label", l2sq(F.col("_qvec"), F.col("_rvec")).alias("distance"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("distance").asc(), F.col("label").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w) - 1)
        .where(F.col("rank") < k)
        .select("qid", "rank", "label", "distance")
    )


# -- compact BINARY layout: the actual 1-byte-per-dim store -----------------


def sq8_encode_np(x: np.ndarray, vmin: np.ndarray, vmax: np.ndarray) -> np.ndarray:
    """(n, d) float → (n, d) uint8 codes — the ONE numpy statement of
    the SQ8 arithmetic (floor(norm·255 + 0.5), clipped, zero-range dims
    → 0), shared by the BINARY column encoder and ``SQ8Index.sa_encode``
    so the quantizer can never drift between the two."""
    x = np.atleast_2d(np.asarray(x, np.float64))
    vmin_ = np.asarray(vmin, np.float64)
    rng = np.asarray(vmax, np.float64) - vmin_
    safe = np.where(rng == 0.0, 1.0, rng)
    t = np.floor((x - vmin_) / safe * 255.0 + 0.5)
    c = np.clip(t, 0.0, 255.0)
    c[:, rng == 0.0] = 0.0
    return c.astype(np.uint8)


def sq8_decode_np(codes: np.ndarray, vmin: np.ndarray, vmax: np.ndarray) -> np.ndarray:
    """(n, d) uint8 → (n, d) float64: r = vmin + code·Δ/255."""
    vmin_ = np.asarray(vmin, np.float64)
    scale = (np.asarray(vmax, np.float64) - vmin_) / 255.0
    return vmin_ + codes.astype(np.float64) * scale


def sq8_encode_binary(
    vec: Column | str, vmin: np.ndarray, vmax: np.ndarray
) -> Column:
    """array<float> → BINARY(d): same codes as :func:`sq8_code_col`,
    packed one uint8 per dim (Arrow-vectorized; the parquet/shuffle
    footprint is d bytes/vector)."""

    @pandas_udf(T.BinaryType())
    def enc(s: pd.Series) -> pd.Series:
        return pd.Series(
            [sq8_encode_np(np.asarray(arr), vmin, vmax)[0].tobytes() for arr in s]
        )

    return enc(F.col(vec) if isinstance(vec, str) else vec)


def sq8_decode_binary(
    bin_col: Column | str, vmin: np.ndarray, vmax: np.ndarray
) -> Column:
    """BINARY(d) → array<double> reconstruction (inverse of
    :func:`sq8_encode_binary` up to quantization error)."""
    @pandas_udf(T.ArrayType(T.DoubleType()))
    def dec(s: pd.Series) -> pd.Series:
        return pd.Series(
            [
                sq8_decode_np(
                    np.frombuffer(b, np.uint8)[None, :], vmin, vmax
                )[0].tolist()
                for b in s
            ]
        )

    return dec(F.col(bin_col) if isinstance(bin_col, str) else bin_col)
