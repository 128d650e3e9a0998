"""Retrieval-quality evaluation: recall@k for approximate indexes.

Every ANN structure in this repo (LSH, IVF, PQ/OPQ, binary, SQ8,
NN-Descent) trades recall for cost; production pipelines monitor that
trade continuously against an exact-search sample. This is the
monitoring operator: join an approximate result set against the exact
one and report per-query and aggregate recall — one equi-join on
(qid, label) plus two aggregations, all JVM-side.

Contract: both inputs are result DataFrames in this repo's standard
shape — at least (qid, label) with rank < k rows per query (sentinel
rows with label < 0 are ignored). Recall@k for a query = |approx ∩
exact| / |exact| over each side's top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    k: int | None = None,
    qid_col: str = "qid",
    label_col: str = "label",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query recall: (qid, n_exact, n_hit, recall). Truncates both
    sides to ``rank < k`` when ``k`` is given (pass None for inputs
    already cut to the k of interest)."""

    def side(df: DataFrame) -> DataFrame:
        out = df.where(F.col(label_col) >= 0)
        if k is not None:
            out = out.where(F.col(rank_col) < k)
        return out.select(
            F.col(qid_col).alias("qid"), F.col(label_col).alias("label")
        ).distinct()

    a, e = side(approx), side(exact)
    hits = a.join(e, ["qid", "label"], "inner").groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    totals = e.groupBy("qid").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        totals.join(hits, "qid", "left")
        .select(
            "qid",
            "n_exact",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            (
                F.coalesce("n_hit", F.lit(0)).cast("double") / F.col("n_exact")
            ).alias("recall"),
        )
    )


def mean_recall(approx: DataFrame, exact: DataFrame, k: int | None = None) -> float:
    """Aggregate recall over all queries (an action)."""
    per_q = recall_at_k(approx, exact, k)
    row = per_q.agg(F.avg("recall")).collect()[0]
    return float(row[0]) if row[0] is not None else 0.0
