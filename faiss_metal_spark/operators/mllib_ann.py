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
