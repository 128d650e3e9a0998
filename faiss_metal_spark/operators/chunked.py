"""Query-batch chunking — the executable form of the broadcast-ceiling
escape hatch.

The gemm-path kNN and the PQ/OPQ ADC searches broadcast their query
batch (queries are the dim-table side); both guard the broadcast at
``_MAX_BROADCAST_ELEMS`` and raise rather than OOM an executor
(SCALE.md "Known residual risks"). The documented mitigation was
"chunk the batch" — this module makes that a one-liner instead of
caller-side surgery:

    res = chunked_queries(q, 10_000, lambda c: knn_search(vecs, c, k))

Semantics: every search in this repo is independent per query row, so
running the engine on disjoint chunks and unioning is EXACT — same
rows, same ranks, same sentinels. Cost model (why this is the right
100 TB shape): each chunk re-scans the corpus, so wall time is
``ceil(nq/chunk)`` scans — the linear-in-chunks cost the broadcast
ceiling forces; nothing is shuffled besides each chunk's normal
candidate traffic. Pick ``chunk_rows`` as large as the ceiling allows.

The chunk assignment orders by the id column (deterministic, no
assumptions about id density); the union is lazy — one action executes
all chunks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunked_queries(
    queries: DataFrame,
    chunk_rows: int,
    fn: Callable[[DataFrame], DataFrame],
    qid_col: str = "qid",
) -> DataFrame:
    """Split ``queries`` into ``chunk_rows``-sized pieces (ordered by
    ``qid_col``), apply ``fn`` to each, union the results. Exact for
    any per-query-independent search. Runs one count() to learn the
    chunk count; the per-chunk work stays lazy until the caller acts."""
    if chunk_rows <= 0:
        raise ValueError(f"chunk_rows must be positive, got {chunk_rows}")
    n = queries.count()
    if n == 0:
        return fn(queries)
    w = Window.orderBy(F.col(qid_col))
    tagged = queries.withColumn(
        "_chunk", ((F.row_number().over(w) - 1) / F.lit(chunk_rows)).cast("int")
    )
    n_chunks = (n + chunk_rows - 1) // chunk_rows
    out: DataFrame | None = None
    for c in range(n_chunks):
        part = fn(tagged.where(F.col("_chunk") == c).drop("_chunk"))
        out = part if out is None else out.unionByName(part)
    return out
