"""Scalar-quantized (SQ8 / SQ6 / SQ4) vector storage + asymmetric search.

FAISS-family superset surface (``faiss::IndexScalarQuantizer`` /
``ScalarQuantizer::QT_8bit`` / ``QT_6bit`` / ``QT_4bit`` semantics
re-expressed on Spark): the reference's flat index stores FP32/FP16/
BF16 only (/root/reference/include/faiss-metal/MetalIndexFlat.h:47),
so b-bit codes extend its storage family down to 1 byte/dim (SQ8, 4×
smaller than FP32), 0.75 bytes/dim (SQ6) and 0.5 bytes/dim (SQ4).

Semantics (ours, documented where they diverge from FAISS); writing
``L = 2^bits − 1`` (255 / 63 / 15):

- train: per-dimension ``vmin_i`` / ``vmax_i`` over the corpus (FAISS
  ``RangeStat::RS_minmax``). One distributed pass: posexplode →
  groupBy(dim) min/max — nv·d rows combine map-side into d groups, so
  the shuffle carries O(partitions · d) partial rows, not the corpus.
  Training is bit-width-independent: one pass serves every tier.
- encode: ``code_i = clamp(floor((x_i − vmin_i)/(vmax_i − vmin_i)·L
  + 0.5), 0, L)``, double arithmetic; a constant dimension
  (vmax = vmin) encodes 0.
- reconstruct: ``r_i = vmin_i + code_i·(vmax_i − vmin_i)/L`` — exact
  at both range endpoints (FAISS QT_8bit reconstructs bin midpoints,
  ``(code+0.5)/256``; endpoints-exact is the variant its docs call
  QT_8bit_direct-style and is easier to reason about for parity).
- search: asymmetric distance — FP32/64 query against reconstructed
  vectors, L2², ascending, ties by ascending label.

Both the encode and the search are pure Catalyst expressions (double
math, whole-stage codegen), so the whole path is ANSI-SQL-expressible
and oracle-checked at every bit width. Trained params travel as plan
literals (arrays of d doubles) — broadcast by construction, no join
against a params table. ``sq_encode_binary`` / ``sq_decode_binary``
additionally give the honest bit-packed BINARY layout
(ceil(d·bits/8) bytes/vector; Arrow-vectorized, a few numpy ops per
batch), pinned by a roundtrip test against the Catalyst codes.

Scale shape: identical to ``knn_search``'s declarative path —
broadcast query batch, one scan of the code table, per-partition
partial top-k under the window; no vector shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _levels(bits: int) -> int:
    if bits not in (4, 6, 8):
        raise ValueError(f"unsupported SQ bit width {bits} (4/6/8)")
    return (1 << bits) - 1


def sq_train(
    df: DataFrame, vec_col: str = "vec", uniform: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (vmin, vmax) over the corpus — one pass, map-side
    combined. Returns float64 arrays of length d. Bit-width-independent
    (FAISS trains RS_minmax once regardless of QT_*bit).

    ``uniform``: ONE shared (vmin, vmax) pair across every dimension
    (faiss ``QT_8bit_uniform`` / ``QT_4bit_uniform`` — the
    RS_minmax-over-all-components train); returned broadcast to
    length-d constant arrays so the whole per-dim codec machinery
    (encode/decode/search/IO) serves the uniform tier unchanged."""
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
    vmin = mm["vmin"].to_numpy(np.float64)
    vmax = mm["vmax"].to_numpy(np.float64)
    if uniform:
        vmin = np.full_like(vmin, vmin.min())
        vmax = np.full_like(vmax, vmax.max())
    return vmin, vmax


# FAISS name for the 8-bit path (kept: pinned by tests + SQL oracles)
sq8_train = sq_train


def _lit_arr(vals: np.ndarray) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def sq_code_col(
    vec: Column | str, vmin: np.ndarray, vmax: np.ndarray, bits: int = 8,
    direct: bool = False,
) -> Column:
    """Catalyst b-bit SQ encode: array<int> codes in [0, 2^bits−1]
    (see module docstring for the exact arithmetic — kept bit-identical
    to the SQL oracle). ``direct``: faiss ``QT_8bit_direct`` — the
    code IS ``clamp(floor(x), 0, L)`` (the upstream uint8 cast,
    floor-toward-zero on the non-negative domain it targets) and
    decode returns the code verbatim; (vmin, vmax) are ignored."""
    lv = float(_levels(bits))
    v = F.col(vec) if isinstance(vec, str) else vec
    if direct:
        # direct=True: code = clamp(floor(x), 0, L); direct="signed"
        # (faiss QT_8bit_direct_signed): code = clamp(floor(x)+128,
        # 0, 255) — the upstream (uint8)(x + 128) cast on [−128, 128)
        off = 128.0 if direct == "signed" else 0.0
        return F.transform(
            v,
            lambda x: F.least(
                F.lit(lv),
                F.greatest(
                    F.lit(0.0), F.floor(x.cast("double")) + F.lit(off)
                ),
            ).cast("int"),
        )
    vmin_l, vmax_l = _lit_arr(vmin), _lit_arr(vmax)
    return F.transform(
        v,
        lambda x, i: F.when(
            F.element_at(vmax_l, i + 1) == F.element_at(vmin_l, i + 1), F.lit(0)
        )
        .otherwise(
            F.least(
                F.lit(lv),
                F.greatest(
                    F.lit(0.0),
                    F.floor(
                        (x.cast("double") - F.element_at(vmin_l, i + 1))
                        / (
                            F.element_at(vmax_l, i + 1)
                            - F.element_at(vmin_l, i + 1)
                        )
                        * F.lit(lv)
                        + F.lit(0.5)
                    ),
                ),
            )
        )
        .cast("int"),
    )


def sq8_code_col(
    vec: Column | str, vmin: np.ndarray, vmax: np.ndarray
) -> Column:
    return sq_code_col(vec, vmin, vmax, bits=8)


def sq_reconstruct_col(
    codes: Column | str, vmin: np.ndarray, vmax: np.ndarray, bits: int = 8,
    direct: bool = False,
) -> Column:
    """Decode codes back to array<double>: r_i = vmin_i + code_i·Δ_i/L
    (``direct``: r_i = code_i — faiss QT_8bit_direct decode)."""
    lv = float(_levels(bits))
    c = F.col(codes) if isinstance(codes, str) else codes
    if direct:
        off = 128.0 if direct == "signed" else 0.0
        return F.transform(c, lambda x: x.cast("double") - F.lit(off))
    vmin_l, vmax_l = _lit_arr(vmin), _lit_arr(vmax)
    return F.transform(
        c,
        lambda x, i: F.element_at(vmin_l, i + 1)
        + x.cast("double")
        * (
            (F.element_at(vmax_l, i + 1) - F.element_at(vmin_l, i + 1))
            / F.lit(lv)
        ),
    )


def sq8_reconstruct_col(
    codes: Column | str, vmin: np.ndarray, vmax: np.ndarray
) -> Column:
    return sq_reconstruct_col(codes, vmin, vmax, bits=8)


def sq_encode(
    df: DataFrame,
    vmin: np.ndarray,
    vmax: np.ndarray,
    bits: int = 8,
    id_col: str = "id",
    vec_col: str = "vec",
    direct: bool = False,
) -> DataFrame:
    """(id, vec) → (id, code: array<int>) — the stored index form."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        sq_code_col(vec_col, vmin, vmax, bits, direct=direct).alias("code"),
    )


def sq8_encode(
    df: DataFrame,
    vmin: np.ndarray,
    vmax: np.ndarray,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    return sq_encode(df, vmin, vmax, 8, id_col, vec_col)


def sq_search(
    codes: DataFrame,
    vmin: np.ndarray,
    vmax: np.ndarray,
    queries: DataFrame,
    k: int,
    bits: int = 8,
    id_col: str = "id",
    code_col: str = "code",
    qid_col: str = "qid",
    qvec_col: str = "vec",
    direct: bool = False,
) -> DataFrame:
    """Asymmetric b-bit SQ top-k: exact query vs reconstructed codes,
    L2² ascending, ties by label. Returns (qid, rank, label, distance).

    The reconstruct is a projection on the scan side — decoded once per
    stored row, then reused across the broadcast query batch inside the
    same codegen stage. Distance accumulates in float64 (the engine's
    accumulate-wide discipline, /root/reference/src/MetalIndexFlat.mm
    norm/accumulate notes)."""
    from ..functions.vector import l2sq

    v = codes.select(
        F.col(id_col).cast("long").alias("label"),
        sq_reconstruct_col(code_col, vmin, vmax, bits, direct=direct).alias("_rvec"),
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
    return sq_search(
        codes, vmin, vmax, queries, k, 8, id_col, code_col, qid_col, qvec_col
    )


# -- compact BINARY layout: the actual bit-packed store ---------------------


def sq_encode_np(
    x: np.ndarray, vmin: np.ndarray, vmax: np.ndarray, bits: int = 8,
    direct: bool = False,
) -> np.ndarray:
    """(n, d) float → (n, d) uint8 codes — the ONE numpy statement of
    the b-bit SQ arithmetic (floor(norm·L + 0.5), clipped, zero-range
    dims → 0), shared by the BINARY column encoder and
    ``SQ8Index.sa_encode`` so the quantizer can never drift between the
    two."""
    lv = float(_levels(bits))
    x = np.atleast_2d(np.asarray(x, np.float64))
    if direct:
        off = 128.0 if direct == "signed" else 0.0
        return np.clip(np.floor(x) + off, 0.0, lv).astype(np.uint8)
    vmin_ = np.asarray(vmin, np.float64)
    rng = np.asarray(vmax, np.float64) - vmin_
    safe = np.where(rng == 0.0, 1.0, rng)
    t = np.floor((x - vmin_) / safe * lv + 0.5)
    c = np.clip(t, 0.0, lv)
    c[:, rng == 0.0] = 0.0
    return c.astype(np.uint8)


def sq_decode_np(
    codes: np.ndarray, vmin: np.ndarray, vmax: np.ndarray, bits: int = 8,
    direct: bool = False,
) -> np.ndarray:
    """(n, d) uint8 → (n, d) float64: r = vmin + code·Δ/L (``direct``:
    r = code — faiss QT_8bit_direct)."""
    if direct:
        off = 128.0 if direct == "signed" else 0.0
        return np.atleast_2d(codes).astype(np.float64) - off
    vmin_ = np.asarray(vmin, np.float64)
    scale = (np.asarray(vmax, np.float64) - vmin_) / float(_levels(bits))
    return vmin_ + codes.astype(np.float64) * scale


def sq8_encode_np(x: np.ndarray, vmin: np.ndarray, vmax: np.ndarray) -> np.ndarray:
    return sq_encode_np(x, vmin, vmax, bits=8)


def sq8_decode_np(codes: np.ndarray, vmin: np.ndarray, vmax: np.ndarray) -> np.ndarray:
    return sq_decode_np(codes, vmin, vmax, bits=8)


def sq_code_size(d: int, bits: int = 8) -> int:
    """Bytes per packed vector: ceil(d·bits/8) (faiss
    ``ScalarQuantizer::code_size`` for QT_8bit/6bit/4bit)."""
    _levels(bits)
    return (d * bits + 7) // 8


def sq_pack_np(codes: np.ndarray, bits: int = 8) -> np.ndarray:
    """(n, d) uint8 codes (< 2^bits) → (n, ceil(d·bits/8)) uint8 packed
    rows: each code contributes its ``bits`` low bits MSB-first into a
    contiguous per-row bitstream (the SQ4 layout is two codes per byte,
    high nibble first; SQ6 packs 4 codes into 3 bytes; SQ8 is the
    identity). Pure vectorized numpy — no per-element Python."""
    _levels(bits)
    codes = np.ascontiguousarray(np.atleast_2d(codes), np.uint8)
    if bits == 8:
        return codes
    n, d = codes.shape
    # per-code 8-bit planes → keep the low `bits` (MSB-first slice)
    bitplanes = np.unpackbits(codes[:, :, None], axis=2, bitorder="big")
    stream = bitplanes[:, :, 8 - bits :].reshape(n, d * bits)
    return np.packbits(stream, axis=1, bitorder="big")


def sq_unpack_np(packed: np.ndarray, d: int, bits: int = 8) -> np.ndarray:
    """Inverse of :func:`sq_pack_np`: (n, ceil(d·bits/8)) → (n, d)."""
    _levels(bits)
    packed = np.ascontiguousarray(np.atleast_2d(packed), np.uint8)
    if bits == 8:
        return packed[:, :d]
    n = packed.shape[0]
    stream = np.unpackbits(packed, axis=1, bitorder="big")[:, : d * bits]
    groups = stream.reshape(n, d, bits)
    pad = np.zeros((n, d, 8 - bits), np.uint8)
    return np.packbits(np.concatenate([pad, groups], axis=2), axis=2, bitorder="big")[
        :, :, 0
    ]


def sq_encode_binary(
    vec: Column | str, vmin: np.ndarray, vmax: np.ndarray, bits: int = 8
) -> Column:
    """array<float> → BINARY(ceil(d·bits/8)): same codes as
    :func:`sq_code_col`, bit-packed (Arrow-vectorized; the
    parquet/shuffle footprint is d·bits/8 bytes/vector)."""

    @pandas_udf(T.BinaryType())
    def enc(s: pd.Series) -> pd.Series:
        if not len(s):
            return pd.Series([], dtype=object)
        x = np.asarray([np.asarray(a, np.float64) for a in s])
        packed = sq_pack_np(sq_encode_np(x, vmin, vmax, bits), bits)
        return pd.Series([row.tobytes() for row in packed])

    return enc(F.col(vec) if isinstance(vec, str) else vec)


def sq_decode_binary(
    bin_col: Column | str, vmin: np.ndarray, vmax: np.ndarray, bits: int = 8
) -> Column:
    """BINARY → array<double> reconstruction (inverse of
    :func:`sq_encode_binary` up to quantization error)."""
    d = len(np.asarray(vmin))

    @pandas_udf(T.ArrayType(T.DoubleType()))
    def dec(s: pd.Series) -> pd.Series:
        if not len(s):
            return pd.Series([], dtype=object)
        packed = np.asarray([np.frombuffer(b, np.uint8) for b in s])
        codes = sq_unpack_np(packed, d, bits)
        return pd.Series([row.tolist() for row in sq_decode_np(codes, vmin, vmax, bits)])

    return dec(F.col(bin_col) if isinstance(bin_col, str) else bin_col)


def sq8_encode_binary(
    vec: Column | str, vmin: np.ndarray, vmax: np.ndarray
) -> Column:
    return sq_encode_binary(vec, vmin, vmax, bits=8)


def sq8_decode_binary(
    bin_col: Column | str, vmin: np.ndarray, vmax: np.ndarray
) -> Column:
    return sq_decode_binary(bin_col, vmin, vmax, bits=8)


def sq_range_search(
    codes: DataFrame,
    vmin: np.ndarray,
    vmax: np.ndarray,
    queries: DataFrame,
    radius: float,
    bits: int = 8,
    id_col: str = "id",
    code_col: str = "code",
    qid_col: str = "qid",
    qvec_col: str = "vec",
    direct: bool = False,
) -> DataFrame:
    """All neighbors with asymmetric distance < radius — faiss
    ``IndexScalarQuantizer`` inherits ``Index::range_search``; keep
    rule and output contract match the flat ``range_search``: strict
    ``<``, (qid, label, distance) UNORDERED, no rank/sentinels. Same
    plan shape as :func:`sq_search` minus the window: one scan,
    scan-side decode projection, output bounded by the radius."""
    from ..functions.vector import l2sq

    v = codes.select(
        F.col(id_col).cast("long").alias("label"),
        sq_reconstruct_col(code_col, vmin, vmax, bits, direct=direct).alias("_rvec"),
    )
    q = queries.select(
        F.col(qid_col).cast("long").alias("qid"),
        F.col(qvec_col).cast("array<double>").alias("_qvec"),
    )
    return (
        F.broadcast(q)
        .crossJoin(v)
        .select(
            "qid", "label", l2sq(F.col("_qvec"), F.col("_rvec")).alias("distance")
        )
        .where(F.col("distance") < F.lit(float(radius)))
    )
