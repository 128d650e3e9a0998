"""ShardedIndex — faiss::IndexShards re-expressed on Spark.

faiss users split a corpus too big for one index across members and
search them as one (``IndexShards``: fan the query batch out to every
shard, merge the per-shard top-k by distance). The reference engine
inherits that composite from the faiss tree without overriding it, so
its semantics are the faiss contract:

- ``ntotal`` = Σ member ntotal.
- search = merge of member top-k: a result survives iff it would rank
  in the global top-k of the union, ties by (distance, label).
- ``successive_ids``: members keep private 0-based ids; the composite
  reports shard i's label offset by Σ_{j<i} ntotal_j (the id layout
  ``IndexShards(d, threaded, successive_ids=true)`` produces when it
  distributes adds). With it off, labels pass through verbatim and may
  collide across shards — also faiss behavior.

Spark-first shape: each member ``search`` is already a distributed
plan ending in ≤ nq·k rows; the composite is their lazy union piped
through the same packed merge/sentinel scaffold the gemm path uses
(``operators.knn._finalize``) — one extra shuffle over ≤ nshards·nq·k
rows TOTAL, independent of corpus size, so the merge never becomes
the bottleneck at 100 TB. Sentinel rows from under-filled members are
dropped before the merge and re-padded after, so a k > ntotal query
still yields exactly k rows per qid with label −1 tails.

faiss ``IndexReplicas`` (same members, queries split among them for
throughput) is deliberately NOT mirrored: replica fan-out is a
scheduling construct, and Spark's executors already parallelize one
plan across the cluster — a replica wrapper would add latency, not
throughput.

Members can be heterogeneous (flat tables, SQ/PQ/IVF tiers) exactly
as in faiss, where any ``Index*`` pointer slots in; distances must be
comparable, so all members must share the composite's metric.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class ShardedIndex:
    """Read-only composite over already-populated member indexes.

    Build with :meth:`from_indexes`; members need a ``search(queries,
    k) -> DataFrame[(qid, rank, label, distance)]`` and ``ntotal`` —
    the contract every engine index satisfies.
    """

    spark: SparkSession
    d: int
    metric: str
    shards: list
    successive_ids: bool = False
    _offsets: list = field(default_factory=list, repr=False)

    @classmethod
    def from_indexes(cls, *shards, successive_ids: bool = False) -> "ShardedIndex":
        if not shards:
            raise ValueError("ShardedIndex needs at least one member index")
        d = shards[0].d
        metric = getattr(shards[0], "metric", "l2") or "l2"
        for s in shards:
            if s.d != d:
                raise ValueError(
                    f"shard dimension mismatch: {s.d} != {d} "
                    "(faiss IndexShards requires equal d)"
                )
            if (getattr(s, "metric", metric) or metric) != metric:
                raise ValueError(
                    "shard metric mismatch: member distances must be comparable"
                )
        offsets = []
        if successive_ids:
            acc = 0
            for s in shards:
                offsets.append(acc)
                acc += s.ntotal
        return cls(
            shards[0].spark, d, metric, list(shards), successive_ids, offsets
        )

    @property
    def ntotal(self) -> int:
        return sum(s.ntotal for s in self.shards)

    def search(
        self, queries: DataFrame, k: int, qid_col: str = "qid", qvec_col: str = "vec"
    ) -> DataFrame:
        """Fan out + merge: (qid, rank, label, distance), rank 0..k−1
        best-first, sentinel-padded like every engine search."""
        from .operators.knn import _finalize

        if k <= 0:
            raise ValueError("k must be positive")
        q = queries.select(
            F.col(qid_col).cast("long").alias("qid"),
            F.col(qvec_col).alias("vec"),
        )
        partials = []
        for i, s in enumerate(self.shards):
            r = s.search(q, k).where(F.col("label") != -1)
            if self.successive_ids and self._offsets[i]:
                r = r.withColumn(
                    "label", F.col("label") + F.lit(int(self._offsets[i]))
                )
            partials.append(r.select("qid", "label", "distance"))
        cand = partials[0]
        for r in partials[1:]:
            cand = cand.unionByName(r)
        return _finalize(q, cand, k, self.metric)

    def search_numpy(self, x: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        from .compact_index import _host_result, _query_df

        return _host_result(
            self.search(_query_df(self.spark, x), k), len(np.atleast_2d(x)), k
        )

    def add_shard(self, index) -> "ShardedIndex":
        """Append a populated member — faiss ``IndexShards::add_shard``
        (the composite grows by whole shards, never by rows; same d /
        metric validation as composition). Under ``successive_ids`` the
        new member's labels offset by the current total, exactly as if
        it had been passed to :meth:`from_indexes`."""
        if index.d != self.d:
            raise ValueError(
                f"shard dimension mismatch: {index.d} != {self.d} "
                "(faiss IndexShards requires equal d)"
            )
        if (getattr(index, "metric", self.metric) or self.metric) != self.metric:
            raise ValueError(
                "shard metric mismatch: member distances must be comparable"
            )
        if self.successive_ids:
            self._offsets.append(self.ntotal)
        self.shards.append(index)
        return self

    def add(self, *_a, **_k):
        """faiss IndexShards.add requires add_shard-time coordination the
        read-only composite deliberately lacks: populate members, then
        compose. Mirrors the refusal style of flat ``add_with_ids``."""
        raise RuntimeError(
            "ShardedIndex is a read-only composite: add to a member "
            "index and rebuild with from_indexes (successive_ids "
            "offsets are computed at composition time)"
        )
