"""Reduced-precision vector storage (FP16 / BF16) as quantize round-trips.

The reference stores vectors as FP16 or BF16 to halve memory bandwidth
(/root/reference/src/MetalIndexFlat.mm:192-256); queries, accumulators
and norms stay FP32, and norms are computed from the *unquantized* FP32
input (:258-268). Spark has no half-precision array type, so we keep the
reference's numerics — not its byte layout — by round-tripping each
element through numpy float16 / bfloat16 and storing the result as
ARRAY<FLOAT>. The value stored is bit-identically what an FP16/BF16
store-then-load would produce, so distance error and reconstruct
tolerance match the reference's published bounds (README "Numerical
precision": ~3 decimal digits/elem, reconstruct ≤2e-3/elem).

At scale this is a real optimization, not an emulation: quantized
arrays compress far better in parquet/shuffle (float16-roundtripped
mantissas are mostly zero bits), which is the honest Spark analog of
"2× memory bandwidth".

Implemented as Arrow-vectorized pandas UDFs — one numpy op per batch.
BF16 round-to-nearest-even matches the reference bit-twiddle
(/root/reference/src/MetalIndexFlat.mm:224-243).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

STORAGE_FP32 = "fp32"
STORAGE_FP16 = "fp16"
STORAGE_BF16 = "bf16"
STORAGE_TYPES = (STORAGE_FP32, STORAGE_FP16, STORAGE_BF16)


def fp16_roundtrip_np(x: np.ndarray) -> np.ndarray:
    """FP32 → FP16 → FP32, numpy's IEEE half conversion (RNE)."""
    return x.astype(np.float16).astype(np.float32)


def bf16_roundtrip_np(x: np.ndarray) -> np.ndarray:
    """FP32 → BF16 → FP32 via round-to-nearest-even truncation.

    Same arithmetic as the reference: bits + 0x7FFF + lsb(bit16) >> 16,
    then shift back up (numpy has no bfloat16 dtype).
    """
    bits = np.ascontiguousarray(x, dtype=np.float32).view(np.uint32)
    lsb = (bits >> 16) & 1
    rounded = (bits + np.uint32(0x7FFF) + lsb) & np.uint32(0xFFFF0000)
    return rounded.view(np.float32)


_ROUNDTRIPS = {STORAGE_FP16: fp16_roundtrip_np, STORAGE_BF16: bf16_roundtrip_np}


# -- compact (BINARY) layout: the actual 2-bytes-per-element store ----------
#
# The ARRAY<FLOAT> round-trip keeps the reference's *numerics*; the
# BINARY layout also keeps its *bandwidth*: half the bytes in cache,
# shuffle, and parquet — the honest Spark analog of "+22-34% on
# bandwidth-bound workloads" (/root/reference/README.md Features).


def fp16_encode_np(x: np.ndarray) -> np.ndarray:
    """(n, d) FP32 → n byte-strings of d float16s."""
    h = np.ascontiguousarray(x, dtype=np.float32).astype(np.float16)
    return np.array([row.tobytes() for row in h], dtype=object)


def fp16_decode_np(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype=np.float16).astype(np.float32)


def bf16_encode_np(x: np.ndarray) -> np.ndarray:
    """(n, d) FP32 → n byte-strings of d uint16 bfloat16s (RNE)."""
    bits = np.ascontiguousarray(x, dtype=np.float32).view(np.uint32)
    lsb = (bits >> 16) & 1
    top = ((bits + np.uint32(0x7FFF) + lsb) >> 16).astype(np.uint16)
    return np.array([row.tobytes() for row in top], dtype=object)


def bf16_decode_np(buf: bytes) -> np.ndarray:
    u = np.frombuffer(buf, dtype=np.uint16).astype(np.uint32) << 16
    return u.view(np.float32)


ENCODERS = {STORAGE_FP16: fp16_encode_np, STORAGE_BF16: bf16_encode_np}
DECODERS = {STORAGE_FP16: fp16_decode_np, STORAGE_BF16: bf16_decode_np}


def encode_col(vec: Column | str, storage: str) -> Column:
    """ARRAY<FLOAT> → BINARY compact store for the given storage type."""
    if storage not in ENCODERS:
        raise ValueError(f"no compact layout for storage {storage!r}")
    enc = ENCODERS[storage]

    @pandas_udf(T.BinaryType())
    def encode(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack(s.to_numpy()).astype(np.float32)
        return pd.Series(list(enc(mat)))

    return encode(F.col(vec) if isinstance(vec, str) else vec)


def decode_col(bin_col: Column | str, storage: str) -> Column:
    """BINARY compact store → ARRAY<FLOAT> (for sql-path / export use)."""
    if storage not in DECODERS:
        raise ValueError(f"no compact layout for storage {storage!r}")
    dec = DECODERS[storage]

    @pandas_udf(T.ArrayType(T.FloatType()))
    def decode(s: pd.Series) -> pd.Series:
        return pd.Series([dec(b) for b in s])

    return decode(F.col(bin_col) if isinstance(bin_col, str) else bin_col)


def _make_roundtrip_udf(kind: str):
    fn = _ROUNDTRIPS[kind]

    @pandas_udf(T.ArrayType(T.FloatType()))
    def roundtrip(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return s
        mat = np.stack(s.to_numpy()).astype(np.float32)
        out = fn(mat)
        return pd.Series(list(out))

    return roundtrip


_fp16_udf = None
_bf16_udf = None


def quantize_col(vec: Column | str, storage: str) -> Column:
    """Column expression quantizing an ARRAY<FLOAT> to the storage type."""
    global _fp16_udf, _bf16_udf
    c = F.col(vec) if isinstance(vec, str) else vec
    if storage == STORAGE_FP32:
        return c
    if storage == STORAGE_FP16:
        if _fp16_udf is None:
            _fp16_udf = _make_roundtrip_udf(STORAGE_FP16)
        return _fp16_udf(c)
    if storage == STORAGE_BF16:
        if _bf16_udf is None:
            _bf16_udf = _make_roundtrip_udf(STORAGE_BF16)
        return _bf16_udf(c)
    raise ValueError(f"unknown storage type {storage!r}")
