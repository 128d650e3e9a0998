"""Data / index diagnostics — faiss ``MatrixStats`` and inverted-list
imbalance, Spark-first.

faiss ships two health probes its users run before trusting an index:
``MatrixStats(x)`` (per-dimension range/mean/std, NaN and zero counts,
norm distribution — "comments" on degenerate data) and
``InvertedLists`` imbalance (the load factor that predicts worst-case
probe latency). Both matter MORE at 100 TB than on one host: a
constant dimension silently wastes SQ bits, NaNs poison every GEMM
epilogue, and a skewed inverted file turns one probe cell into a
straggler task. Both probes here are single-scan Catalyst
aggregations — no Python per row, safe to run on the full corpus.

- :func:`vector_stats`: per-dim rows (dim, vmin, vmax, mean, std,
  n_zero, n_nan, n_nonfinite) via one posexplode + groupBy (the
  ``sq_train`` shuffle shape: O(partitions · d) partial rows), plus a
  corpus-level summary row (dim = −1) carrying n_rows, n_bad_len and
  norm quantiles.
- :func:`ivf_imbalance`: cell-size distribution + the faiss imbalance
  factor ``nlist · Σ size² / ntotal²`` (1.0 = perfectly balanced;
  faiss prints the same number from ``InvertedLists::imbalance_factor``)
  — the straggler-risk metric for partition-pruned probes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["vector_stats", "ivf_imbalance"]


def vector_stats(df: DataFrame, vec_col: str = "vec", d: int | None = None) -> DataFrame:
    """Per-dimension data-health stats (faiss ``MatrixStats``).

    Returns one row per dimension — ``(dim, n, vmin, vmax, mean, std,
    n_zero, n_nonfinite)`` — and one summary row ``dim = −1`` where the
    same columns carry corpus-level values: n = row count, vmin/vmax =
    min/max L2² norm over finite rows, mean/std over the norms,
    n_zero = rows of wrong length (when ``d`` given, else 0),
    n_nonfinite = rows containing any non-finite value.

    One scan, two branches of the same exploded projection, map-side
    combined into d+1 groups; safe at full-corpus scale.
    """
    x = F.col(vec_col)
    per_dim = (
        df.select(F.posexplode(x).alias("dim", "v"))
        .withColumn("v", F.col("v").cast("double"))
        # NULL entries count as non-finite: some ingest paths (e.g. Arrow
        # from pandas) surface NaN as null, and a null poisons GEMM the
        # same way. isNotNull() first keeps the conjunction non-null.
        .withColumn(
            "_fin",
            F.col("v").isNotNull()
            & ~F.isnan("v")
            & ~F.col("v").isin(float("inf"), float("-inf")),
        )
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.when(F.col("_fin"), F.col("v"))).alias("vmin"),
            F.max(F.when(F.col("_fin"), F.col("v"))).alias("vmax"),
            F.avg(F.when(F.col("_fin"), F.col("v"))).alias("mean"),
            F.stddev_pop(F.when(F.col("_fin"), F.col("v"))).alias("std"),
            F.sum(F.when(F.col("v") == 0.0, 1).otherwise(0)).alias("n_zero"),
            F.sum(F.when(~F.col("_fin"), 1).otherwise(0)).alias("n_nonfinite"),
        )
    )
    vd = F.transform(x, lambda e: e.cast("double"))
    row_bad = F.exists(
        vd, lambda e: e.isNull() | F.isnan(e) | e.isin(float("inf"), float("-inf"))
    )
    norm = F.aggregate(vd, F.lit(0.0), lambda a, e: a + e * e)
    wrong_len = (
        F.when(F.size(x) != F.lit(int(d)), 1).otherwise(0)
        if d is not None
        else F.lit(0)
    )
    summary = (
        df.select(
            row_bad.alias("_bad"),
            norm.alias("_norm"),
            wrong_len.alias("_wrong"),
        )
        .agg(
            F.lit(-1).alias("dim"),
            F.count(F.lit(1)).alias("n"),
            F.min(F.when(~F.col("_bad"), F.col("_norm"))).alias("vmin"),
            F.max(F.when(~F.col("_bad"), F.col("_norm"))).alias("vmax"),
            F.avg(F.when(~F.col("_bad"), F.col("_norm"))).alias("mean"),
            F.stddev_pop(F.when(~F.col("_bad"), F.col("_norm"))).alias("std"),
            F.sum("_wrong").alias("n_zero"),
            F.sum(F.when(F.col("_bad"), 1).otherwise(0)).alias("n_nonfinite"),
        )
    )
    return per_dim.unionByName(summary)


def ivf_imbalance(assigned: DataFrame, nlist: int | None = None) -> dict:
    """Inverted-list balance report (faiss
    ``InvertedLists::imbalance_factor``).

    Returns ``{nlist, ntotal, nonempty, min_size, max_size,
    imbalance}`` where ``imbalance = nlist · Σ size² / ntotal²`` — 1.0
    means perfectly even lists; the value is also the expected
    slowdown factor of a random probe vs the balanced ideal, i.e. the
    straggler-task risk of a cell-partitioned store. ``nlist`` defaults
    to the number of NON-empty cells (pass the trained value to count
    empty lists like faiss does). One groupBy(cell) count — O(cells)
    result rows.
    """
    sizes = assigned.groupBy("cell").count().toPandas()["count"].to_numpy(np.float64)
    ntotal = float(sizes.sum())
    nl = int(nlist) if nlist is not None else len(sizes)
    if ntotal == 0 or nl == 0:
        return {
            "nlist": nl,
            "ntotal": 0,
            "nonempty": 0,
            "min_size": 0,
            "max_size": 0,
            "imbalance": float("nan"),
        }
    return {
        "nlist": nl,
        "ntotal": int(ntotal),
        "nonempty": int(len(sizes)),
        "min_size": int(sizes.min()) if len(sizes) == nl else 0,
        "max_size": int(sizes.max()),
        "imbalance": float(nl * (sizes**2).sum() / ntotal**2),
    }
