"""MLlib-backed batch index building (the north-star's stated approach).

The custom operators in similarity.py keep everything oracle-checkable
(deterministic seeds, integer-exact buckets); this module is the
production-leaning twin built on Spark MLlib's distributed estimators —
the right tool when the training sample no longer fits a driver:

- ``mllib_kmeans_ivf``  — IVF coarse quantizer trained with
  ``pyspark.ml.clustering.KMeans`` (distributed Lloyd, seeded), then a
  broadcast nearest-centroid assignment. Replaces similarity.py's
  driver-side sampled k-means when the corpus is 100 TB: training runs
  on executors over the full table (or any sampled fraction).
- ``mllib_lsh_pairs``   — Euclidean near-dup pairs via
  ``BucketedRandomProjectionLSH.approxSimilarityJoin`` (random
  hyperplane offsets are seeded; the join is a bucket equi-join under
  the hood, the same shuffle shape as our integer LSH).
- ``mllib_minhash_pairs`` — Jaccard near-dup candidates over token sets
  via ``HashingTF`` + ``MinHashLSH.approxSimilarityJoin``.

MLlib's hash families are seeded but engine-specific, so these are
rows-only at the driver gate; their *accuracy* is pinned by tests
(tests/test_mllib_ann.py): every k-means assignment must be the true
nearest centroid, every LSH pair must satisfy the distance threshold
exactly (verified against numpy), and recall vs the exact pair set is
bounded below.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _features(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return df.select(
        F.col(id_col).cast("long").alias("id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )


def mllib_kmeans_ivf(
    vectors: DataFrame,
    n_cells: int,
    id_col: str = "id",
    vec_col: str = "vec",
    seed: int = 42,
    max_iter: int = 10,
) -> tuple[np.ndarray, DataFrame]:
    """Distributed k-means → (centroids (n_cells×d) ndarray, assigned DF).

    The assigned DataFrame carries (id, cell); write it with
    ``similarity.ivf_write`` for partition-pruned probing, exactly like
    the hand-rolled IVF — only the trainer changes.
    """
    from pyspark.ml.clustering import KMeans

    feat = _features(vectors, id_col, vec_col)
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter, featuresCol="features").fit(feat)
    centroids = np.stack([np.asarray(c) for c in model.clusterCenters()])
    assigned = model.transform(feat).select(
        "id", F.col("prediction").cast("int").alias("cell")
    )
    return centroids, assigned


def mllib_lsh_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "id",
    vec_col: str = "vec",
    bucket_length: float = 2.0,
    num_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, euclidean dist ≤ threshold) via
    bucketed-random-projection LSH self-join. Candidates come from
    bucket collisions (an equi-join, never a cross product); the exact
    distance filter runs on candidates only."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    feat = _features(vectors, id_col, vec_col)
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_tables, seed=seed,
    )
    model = lsh.fit(feat)
    joined = model.approxSimilarityJoin(feat, feat, threshold, distCol="dist")
    return (
        joined.where(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            F.col("dist"),
        )
    )


def mllib_minhash_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_tables: int = 5,
    num_features: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """Jaccard near-dup candidates (id_a < id_b, jaccard_dist ≤
    threshold) over hashed token sets: HashingTF (binary) → MinHashLSH
    self-join. The MLlib twin of dedup.minhash_signatures +
    lsh_candidate_pairs."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    toks = docs.select(
        F.col(id_col).cast("long").alias("id"), F.split(F.col(text_col), " ").alias("toks")
    )
    tf = HashingTF(
        inputCol="toks", outputCol="features", numFeatures=num_features, binary=True
    )
    feat = tf.transform(toks).select("id", "features")
    mh = MinHashLSH(inputCol="features", outputCol="hashes",
                    numHashTables=num_tables, seed=seed)
    model = mh.fit(feat)
    joined = model.approxSimilarityJoin(feat, feat, threshold, distCol="jdist")
    return (
        joined.where(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            F.col("jdist"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic twins: the same distributed training/search machinery with
# caller-fixed parameterizations, so a SQL oracle can replay every step.
# MLlib's estimators above stay the production trainers (seeded but
# engine-specific — kmeans|| init, private hash families); these two are
# what the driver's hash-checked `mllib_index_build` lanes run.
# ---------------------------------------------------------------------------


def lloyd_kmeans(
    vectors: DataFrame,
    init: np.ndarray,
    iters: int = 3,
    round_dp: int = 6,
    id_col: str = "id",
    vec_col: str = "vec",
) -> tuple[np.ndarray, DataFrame]:
    """Distributed Lloyd iterations with caller-FIXED init — the exact
    loop MLlib's KMeans runs (driver-held centers, executor-side
    assignment, map-side partially-aggregated per-cell means), minus
    the engine-specific kmeans|| seeding, so every step is replayable
    by a SQL oracle: assignment is the engine's shared
    ``similarity.ivf_assign`` (numpy argmin over broadcast centroids —
    the path every hash-checked IVF lane already proves agrees with a
    SQL oracle's argmin to well inside tie distance) and each
    iteration's new centroids are per-dim means ROUNDED to
    ``round_dp`` decimals (two engines summing the same doubles in
    different orders agree to ~1e-15 relative; the rounding collapses
    that to bit-identical centroids before they feed the next argmin).
    Empty cells keep their previous centroid (MLlib does the same).

    Returns (centroids ndarray, assigned DF (id, vec, cell)). Cost per
    iteration: one scan + one (k·d)-key partial aggregate (posexplode
    means — the narrow-agg plan shape is IDENTICAL across iterations,
    so whole-stage codegen compiles once; a per-iteration 64-wide
    literal aggregate was measured to recompile every pass and
    dominate the trainer) + an O(k·d) driver collect — the same shape
    at 100 TB (the scan dominates; nothing grows with n on the
    driver)."""
    from .similarity import ivf_assign

    v = vectors.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec")
    )
    C = np.asarray(init, dtype=np.float64).copy()
    for _ in range(int(iters)):
        means = (
            ivf_assign(v, C)
            .select("cell", F.posexplode("vec").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg(F.col("x").cast("double")), round_dp).alias("m"))
            .collect()
        )
        newC = C.copy()  # cells with no members keep their centroid
        for r in means:
            newC[int(r["cell"]), int(r["pos"])] = float(r["m"])
        C = newC
    return C, ivf_assign(v, C)


def brp_lsh_pairs_fixed(
    vectors: DataFrame,
    planes: np.ndarray,
    bucket_length: float,
    threshold: float,
    id_col: str = "id",
    vec_col: str = "vec",
    exact_via: str = "auto",
    track: list | None = None,
) -> DataFrame:
    """``mllib_lsh_pairs`` with a caller-FIXED hyperplane family — the
    same bucketed-random-projection machinery (h_t(v) = ⌊⟨v, p_t/‖p_t‖⟩
    / bucket_length⌋ per table, candidates = bucket collisions via an
    equi-join on (table, bucket), exact L2 filter on candidates only)
    but with ``planes`` supplied instead of MLlib's seeded private
    family, so a SQL oracle replays the hashes bit-for-bit. The dot
    runs as ⟨v, p⟩/(‖p‖·len) with sequential HOF arithmetic — identical
    doubles on both engines, so the floor can never straddle.

    Returns (id_a < id_b, dist ≤ threshold) pairs, deduped across
    tables. Scale shape: one projection scan, one (t, h) shuffle join
    of id-only rows, vectors joined back for the exact filter — the
    same shuffle shape as MLlib's approxSimilarityJoin.

    Exact-filter strategy (r11): on clustered data the candidate set
    is near-quadratic in the colliding region (measured 1.7M pairs
    from 2k rows at sf0.1), and the interpreted per-element HOF
    distance dominated the whole lane (~2 s of 4.7 s). When the
    corpus fits the engine's 64 MB broadcast gate (the nn_descent
    rule), only (id_a, id_b) pairs flow through one Arrow stage that
    gathers rows from the broadcast matrix and folds Σ(aᵢ−bᵢ)² as a
    SEQUENTIAL column loop — the identical left-fold order and f64
    ops as the HOF, so the doubles (and the ≤ threshold set) are
    BIT-IDENTICAL (pinned by test_mllib_ann.py); past the gate the
    join + HOF plan stands (the corpus must never reach the driver
    at scale)."""
    import math

    from ..functions.vector import l2sq

    P = np.asarray(planes, dtype=np.float64)
    v = vectors.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec")
    )
    hashes = []
    for t, row in enumerate(P):
        nrm = 0.0
        for x in row:  # sequential, like the oracle
            nrm += float(x) * float(x)
        nrm = math.sqrt(nrm)
        parr = F.array(*[F.lit(float(x)) for x in row])
        prods = F.zip_with(
            F.col("vec"), parr, lambda x, y: x.cast("double") * y
        )
        dotv = F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)
        hashes.append(
            F.struct(
                F.lit(int(t)).alias("t"),
                F.floor(dotv / F.lit(nrm * float(bucket_length))).alias("h"),
            )
        )
    hashed = v.select(
        "id", F.explode(F.array(*hashes)).alias("th")
    ).select("id", F.col("th.t").alias("t"), F.col("th.h").alias("h"))
    cand = (
        hashed.select(F.col("id").alias("id_a"), "t", "h")
        .join(hashed.select(F.col("id").alias("id_b"), "t", "h"), ["t", "h"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if exact_via not in ("auto", "join"):
        raise ValueError(f"exact_via must be auto/join, got {exact_via!r}")
    first = v.first() if exact_via == "auto" else None
    if first is not None and first["vec"] is not None:
        d = len(first["vec"])
        n = v.count()
        if n * d * 8 <= (64 << 20):
            pdf = v.orderBy("id").toPandas()
            ids = pdf["id"].to_numpy(np.int64)
            Vm = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            bc = v.sparkSession.sparkContext.broadcast((ids, Vm))
            if track is not None:
                # the fast path pins an up-to-64MB corpus broadcast on
                # the driver+executors; repeated calls (threshold
                # sweeps) accrete them, so callers can collect the
                # handles and .destroy() once the plan materializes —
                # the bloom_filter_rows(track=) release discipline
                track.append(bc)
            thr = float(threshold)

            def fdist(pdfs):
                import pandas as pd

                ids_, Vm_ = bc.value
                for p in pdfs:
                    if len(p) == 0:
                        continue
                    ia = p["id_a"].to_numpy(np.int64)
                    ib = p["id_b"].to_numpy(np.int64)
                    A = Vm_[np.searchsorted(ids_, ia)]
                    B = Vm_[np.searchsorted(ids_, ib)]
                    # sequential column fold == the HOF's left fold:
                    # identical f64 ops in identical order, so the
                    # doubles are bit-equal to the join+HOF plan below
                    acc = np.zeros(len(p), dtype=np.float64)
                    for j in range(Vm_.shape[1]):
                        dj = A[:, j] - B[:, j]
                        acc = acc + dj * dj
                    dist = np.sqrt(acc)
                    keep = dist <= thr
                    if keep.any():
                        yield pd.DataFrame(
                            {
                                "id_a": ia[keep],
                                "id_b": ib[keep],
                                "dist": dist[keep],
                            }
                        )

            return cand.mapInPandas(fdist, "id_a long, id_b long, dist double")
    va = v.select(F.col("id").alias("id_a"), F.col("vec").alias("va"))
    vb = v.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", F.sqrt(l2sq("va", "vb")).alias("dist"))
        .where(F.col("dist") <= float(threshold))
    )
