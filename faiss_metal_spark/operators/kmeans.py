"""``Kmeans`` — the faiss clustering object (``faiss::Kmeans`` /
``Clustering``), Spark-first.

faiss users cluster with ``km = faiss.Kmeans(d, k); km.train(x);
km.index.search(x, 1)`` — the trained object carries the centroids, a
per-iteration objective trace, and a flat index over the centroids for
assignment. The reference engine exposes no clustering at all
(/root/reference/include/faiss-metal/MetalIndexFlat.h:47 is a flat
search index); this object serves the same workflow over DataFrames:

- ``train(df)``: deterministic Lloyd iterations on a hash-thresholded
  bounded sample (``similarity.train_sample`` — O(sample) driver work
  regardless of corpus size; faiss itself subsamples past
  ``max_points_per_centroid`` for the same reason). Records
  ``obj`` — total squared error per iteration on the train sample
  (the faiss ``Kmeans.obj`` trace).
- ``centroids``: (k, d) float64, identical tie-breaking to
  ``ivf_assign`` so training and distributed assignment can never
  disagree on a boundary point.
- ``index``: a flat :class:`~faiss_metal_spark.vector_table.VectorTable`
  over the centroids (ids 0..k−1) — ``km.index.search_numpy(x, 1)``
  is the faiss assignment idiom.
- ``assign(df)``: DISTRIBUTED nearest-centroid assignment (one scan,
  no shuffle — ``ivf_assign``); this is the 100 TB path, where faiss's
  ``index.search(x, 1)`` would need x on one host.
- ``spherical=True``: centroids renormalized to unit L2 each update
  (faiss spherical k-means; assignment order becomes max-IP exactly).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = ["Kmeans"]


class Kmeans:
    def __init__(
        self,
        spark: SparkSession,
        d: int,
        k: int,
        niter: int = 25,
        spherical: bool = False,
        sample_size: int = 16384,
    ):
        if k <= 0 or d <= 0:
            raise ValueError(f"Kmeans: need positive d/k, got d={d} k={k}")
        self.spark = spark
        self.d = int(d)
        self.k = int(k)
        self.niter = int(niter)
        self.spherical = bool(spherical)
        self.sample_size = int(sample_size)
        self.centroids: np.ndarray | None = None
        self.obj: list[float] = []
        self._index = None

    # -- training ----------------------------------------------------------

    def train(
        self,
        data: DataFrame | np.ndarray,
        vec_col: str = "vec",
        id_col: str = "id",
    ) -> float:
        """Train on a DataFrame (or an (n, d) array, wrapped for the
        faiss calling convention); returns the final objective value.
        Retraining replaces previous state (faiss re-train contract)."""
        from .similarity import ivf_train_centroids

        df = data
        if isinstance(data, np.ndarray):
            x = np.atleast_2d(np.asarray(data, np.float64))
            if x.shape[1] != self.d:
                raise ValueError(f"expected (n, {self.d}) array, got {x.shape}")
            df = self.spark.createDataFrame(
                pd.DataFrame(
                    {
                        "id": np.arange(len(x), dtype=np.int64),
                        "vec": [v.tolist() for v in x],
                    }
                ),
                schema="id long, vec array<double>",
            )
            vec_col, id_col = "vec", "id"
        C, obj = ivf_train_centroids(
            df,
            self.k,
            vec_col=vec_col,
            id_col=id_col,
            sample_size=self.sample_size,
            iters=self.niter,
            spherical=self.spherical,
            return_obj=True,
        )
        self.centroids = C
        self.obj = obj
        self._index = None  # rebuilt lazily from the new centroids
        return obj[-1] if obj else float("nan")

    def _require_trained(self) -> np.ndarray:
        if self.centroids is None:
            raise RuntimeError("Kmeans: call train() first")
        return self.centroids

    # -- the faiss surface -------------------------------------------------

    @property
    def index(self):
        """Flat index over the centroids (faiss ``Kmeans.index``):
        ``km.index.search_numpy(x, 1)`` labels are centroid ids."""
        C = self._require_trained()
        if self._index is None:
            from ..vector_table import VectorTable

            self._index = VectorTable(self.spark, self.d).add_numpy(
                C.astype(np.float32)
            )
        return self._index

    def assign(
        self, df: DataFrame, vec_col: str = "vec", id_col: str = "id"
    ) -> DataFrame:
        """Distributed nearest-centroid assignment: input columns plus
        ``cell`` (one scan, zero shuffle — ``ivf_assign``). Exact f64
        arithmetic, tie-break identical to training."""
        from .similarity import ivf_assign

        return ivf_assign(df, self._require_trained(), id_col=id_col, vec_col=vec_col)

    def assign_numpy(self, x: np.ndarray) -> np.ndarray:
        """(n,) nearest-centroid ids for a host array — the
        ``index.search(x, 1)`` idiom without the index round-trip
        (exact same ‖c‖²−2x·c / argmin tie-break as training)."""
        C = self._require_trained()
        x = np.atleast_2d(np.asarray(x, np.float64))
        if x.shape[1] != self.d:
            raise ValueError(f"expected (n, {self.d}) array, got {x.shape}")
        cn = (C * C).sum(1)
        return (cn[None, :] - 2.0 * (x @ C.T)).argmin(1).astype(np.int64)
