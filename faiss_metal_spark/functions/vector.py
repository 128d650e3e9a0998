"""Vector math as Catalyst column expressions (JVM-side, no Python).

These are the declarative analogs of the reference's scalar kernels:

- ``sqnorm``      ≙ l2_norm kernel (/root/reference/shaders/l2_norm.metal:7-66)
- ``dot``         ≙ the GEMM inner loop (/root/reference/shaders/simdgroup_gemm.metal)
- ``l2sq``        ≙ direct Σ(q−v)² kernel (/root/reference/shaders/l2_norm_f16.metal:74-123)
- ``l2sq_decomp`` ≙ the decomposed ‖q‖²+‖v‖²−2q·v epilogue
                    (/root/reference/shaders/broadcast_sum.metal:15-26 and the
                    _l2_fused GEMM variants)

All accumulate in DOUBLE regardless of the FLOAT element type, mirroring
the reference's FP32-accumulator-over-FP16-operands policy (SURVEY §4
"Mixed-precision accumulation") one precision level up: Spark arrays are
FP32, we accumulate FP64 so results are stable enough for oracle
comparison and rank determinism.

Being plain Column expressions, they stay inside whole-stage codegen —
no Python workers, no Arrow transfer — and Catalyst folds them into
scans/projections (predicate pushdown and column pruning still apply).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sqnorm(vec: Column | str) -> Column:
    """Σ x² over an ARRAY<FLOAT|DOUBLE> column, accumulated in DOUBLE."""
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.aggregate(
        c, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )


def dot(a: Column | str, b: Column | str) -> Column:
    """Inner product of two equal-length array columns (DOUBLE accumulate)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2sq(a: Column | str, b: Column | str) -> Column:
    """Direct squared-L2 distance Σ(aᵢ−bᵢ)² — the small-input/oracle form."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    diffs = F.zip_with(
        ca, cb, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def l1dist(a: Column | str, b: Column | str) -> Column:
    """Manhattan distance Σ|aᵢ−bᵢ| (DOUBLE accumulate) — an extension
    metric the reference's closed enum lacks (SURVEY §2.7)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    diffs = F.zip_with(ca, cb, lambda x, y: F.abs(x.cast("double") - y.cast("double")))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def l2sq_decomp(norm_a: Column, norm_b: Column, dot_ab: Column) -> Column:
    """Decomposed ‖a‖² + ‖b‖² − 2·a·b given precomputed pieces."""
    return norm_a + norm_b - F.lit(2.0) * dot_ab


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either norm is zero (no NaN leakage)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    denom = F.sqrt(sqnorm(ca)) * F.sqrt(sqnorm(cb))
    return F.when(denom > 0, dot(ca, cb) / denom).otherwise(F.lit(0.0))


def cosine_dist(a: Column | str, b: Column | str) -> Column:
    return F.lit(1.0) - cosine_sim(a, b)
