"""Distributed approximate kNN-graph construction via NN-Descent.

NN-Descent (Dong, Moses & Li, WWW 2011 — "Efficient k-nearest neighbor
graph construction for generic similarity measures") builds the all-N
kNN graph by iterating a simple local rule: *a neighbor of a neighbor
is likely a neighbor*. It is the standard corpus-scale graph builder
(pynndescent, UMAP, many ANN pipelines) and the missing piece between
this repo's pairwise operators (exact ``knn_join_blocked`` — O(N²/B)
work) and its cell-bucketed ones (IVF/LSH): the graph it emits feeds
SemDeDup-style clustering, graph-ANN serving, and manifold methods.

Spark shape, per iteration (``iters`` fixed, default 4):

1. ``general`` neighborhood = current edges ∪ reversed edges, each
   side capped at ``k`` rows per node by a deterministic hash order
   (the paper's reverse sampling ρ=1) — bounds per-node fanout at 2k.
2. Candidate pairs: self-join ``general`` on the node id — every two
   members of one node's neighborhood propose each other. Per-task
   work is ≤ (2k)² rows per node, independent of N.
3. Distances: candidates join the vector table twice (u-side, v-side)
   — the only vector shuffle; candidate volume ≤ 4k²·N rows.
4. Merge: union with current edges, per-node window top-k
   (dist asc, nbr asc). ``localCheckpoint`` truncates the growing
   lineage each round (same discipline as connected_components).

Total cost: O(iters · k² · N) distance evaluations — the paper's
empirical 10-30× win over blocked exact search at large N, and every
stage is a bounded equi-join/window, so the 100 TB story is the same
as the dedup family's: no all-pairs, no unbounded per-task state.

Iterative ⇒ no ANSI-SQL oracle; pinned by tests/test_knn_graph.py:
recall vs the exact graph (numpy) ≥ 0.9 on uniform data, determinism
across runs, and the exact-fixed-point property (feeding the exact
graph in returns it unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import l2sq


def _topk(edges: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("id").orderBy(F.col("dist").asc(), F.col("nbr").asc())
    return (
        edges.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def nn_descent(
    vectors: DataFrame,
    k: int = 10,
    iters: int = 4,
    id_col: str = "id",
    vec_col: str = "vec",
    seed: int = 42,
) -> DataFrame:
    """Approximate kNN graph (id, nbr, dist): for every vector, its ~k
    nearest neighbors by squared L2 (self excluded), deterministic for
    a fixed (data, k, iters, seed).

    ``vectors`` is scanned once into a persisted (id, vec) projection;
    the random initial graph draws k hash-derived neighbor ids per
    node (collisions/self-hits dropped — the first merge round refills
    the lists).
    """
    v = vectors.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec")
    ).persist()
    n = v.count()
    if n <= 1:
        v.unpersist()
        return v.sparkSession.createDataFrame([], "id long, nbr long, dist double")
    kk = min(k, n - 1)

    vu = v.select(F.col("id").alias("u"), F.col("vec").alias("_uv"))
    vv_ = v.select(F.col("id").alias("nbr"), F.col("vec").alias("_vv"))

    def _score(cand: DataFrame) -> DataFrame:
        """(id, nbr) → (id, nbr, dist), dropping self-pairs."""
        return (
            cand.where(F.col("id") != F.col("nbr"))
            .distinct()
            .join(vu.withColumnRenamed("u", "id"), "id")
            .join(vv_, "nbr")
            .select("id", "nbr", l2sq(F.col("_uv"), F.col("_vv")).alias("dist"))
        )

    # deterministic pseudo-random init: k candidate ids per node from
    # xxhash64(id, j, seed) mod n
    init = v.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(kk - 1)),
                lambda j: F.pmod(F.xxhash64("id", j, F.lit(seed)), F.lit(n)),
            )
        ).alias("nbr"),
    )
    graph = _topk(_score(init), kk).localCheckpoint(eager=True)

    for _ in range(iters):
        fwd = graph.select("id", "nbr")
        rev = graph.select(F.col("nbr").alias("id"), F.col("id").alias("nbr"))
        # Neighborhood LISTS, one shuffle: per node, the union of its
        # forward and reverse edges capped at 2k members in
        # deterministic hash order (reverse lists of hub nodes would
        # otherwise be unbounded). collect_set bounds per-node state at
        # the in-degree cap, and the slice keeps the paper's ρ=1
        # reverse sampling budget.
        nbhd = (
            fwd.unionByName(rev)
            .groupBy("id")
            .agg(
                F.slice(
                    F.array_sort(
                        F.collect_set(
                            F.struct(
                                F.xxhash64("id", "nbr", F.lit(seed)).alias("h"),
                                F.col("nbr").alias("n"),
                            )
                        )
                    ),
                    1,
                    2 * kk,
                ).alias("_gen")
            )
            .select("id", F.transform("_gen", lambda s: s["n"]).alias("_gen"))
        )
        # Candidate generation is ARRAY-LOCAL (the paper's local join):
        # every two members of one node's neighborhood propose each
        # other via a double explode — no self-join, no extra shuffle;
        # per-node fanout ≤ (2k)² rows exactly as before.
        prop = (
            nbhd.select(F.explode("_gen").alias("id"), "_gen")
            .select("id", F.explode("_gen").alias("nbr"))
        )
        merged = graph.select("id", "nbr", "dist").unionByName(_score(prop))
        # Fold dedup + top-k into ONE groupBy: distances are a pure
        # function of the pair, so duplicate (id, nbr) rows carry equal
        # dists and sort adjacently — the aggregate HOF drops adjacent
        # duplicates while slicing the k best.
        packed = merged.groupBy("id").agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("dist").alias("d"), F.col("nbr").alias("n")))
            ).alias("_cand")
        )
        topk = F.slice(
            F.aggregate(
                F.col("_cand"),
                F.array().cast("array<struct<d:double,n:bigint>>"),
                lambda acc, s: F.when(
                    (F.size(acc) >= kk)
                    | (F.size(acc) > 0) & (F.element_at(acc, -1)["n"] == s["n"])
                    & (F.element_at(acc, -1)["d"] == s["d"]),
                    acc,
                ).otherwise(F.concat(acc, F.array(s))),
            ),
            1,
            kk,
        )
        graph = (
            packed.select("id", F.explode(topk).alias("_s"))
            .select("id", F.col("_s.n").alias("nbr"), F.col("_s.d").alias("dist"))
            .localCheckpoint(eager=True)
        )

    v.unpersist()
    return graph
