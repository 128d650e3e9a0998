"""End-to-end training-data curation pipeline.

The reference is a single-operator engine (kNN — SURVEY §0); this module
is the north-star composition the Spark engine exists for: take a raw
document corpus and produce the deduplicated, quality-filtered training
set, as ONE declarative DataFrame plan.

Stages (each shuffle-bounded, all JVM-side — no Python in the hot path):

1. **Exact dedup** — hash the full text (md5), keep the min doc_id per
   digest. One shuffle on the 16-byte digest, never on the text itself.
2. **Near dedup** — MinHash signatures → banded LSH self-join →
   exact-Jaccard verification of the banding candidates → connected
   components → keep each cluster's min id. Shuffle volume is
   bands·|docs| bucket rows, not |docs|²; the verify step re-scores
   only the candidate pairs (banding false positives would otherwise
   delete non-duplicate documents); components converge in O(cluster
   diameter) iterations.
3. **Quality filter** — closed-form score (distinct-token ratio, length
   saturation, token-length saturation), a pure projection.

At 100 TB: stage 1 and the signature build stream over the corpus once;
the LSH join's fan-out is bounded by band-bucket sizes (salt hot buckets
if a boilerplate shingle dominates); the final anti-join broadcasts the
drop list when it is small (usually ≪ corpus) or shuffles on the id
otherwise — Spark's join planner chooses at runtime via AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.text import quality_score, token_count
from .operators.dedup import (
    connected_components,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
)


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.5,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_size: int = 3,
    verify_jaccard: float | None = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """Curated corpus: exact dups dropped (keep min id), near-dup
    clusters reduced to their min-id representative, then quality-
    filtered. Returns (id, *keep_cols, n_tokens, quality) — quality is
    the raw double; callers round for display.

    ``verify_jaccard``: banding candidates are re-scored with exact
    n-gram Jaccard and only pairs ≥ the threshold become dedup edges —
    a banding false positive (two docs agreeing on one band by chance)
    must not delete a non-duplicate document. ``None`` trusts the
    banding (the pre-verification behavior).
    """
    ids = docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("_k"))
    keymin = ids.groupBy("_k").agg(F.min(id_col).alias("_keeper"))
    exact_drop = (
        ids.join(keymin, "_k")
        .where(F.col(id_col) != F.col("_keeper"))
        .select(F.col(id_col).alias("_drop_id"))
    )

    sig = minhash_signatures(
        docs, text_col=text_col, id_col=id_col,
        num_hashes=num_hashes, shingle_size=shingle_size,
    )
    pairs = lsh_candidate_pairs(sig, id_col=id_col, num_hashes=num_hashes, bands=bands)
    if verify_jaccard is not None:
        pairs = ngram_jaccard_pairs(
            docs, pair_candidates=pairs, text_col=text_col, id_col=id_col,
            shingle_size=shingle_size, threshold=verify_jaccard, max_df=None,
        ).select("id_a", "id_b")
    cc = connected_components(pairs)
    near_drop = (
        cc.where(F.col("id") != F.col("cluster")).select(F.col("id").alias("_drop_id"))
    )

    drops = exact_drop.unionByName(near_drop).distinct()
    survivors = docs.join(
        drops, docs[id_col] == drops["_drop_id"], "left_anti"
    )
    return (
        survivors.select(
            F.col(id_col),
            *[F.col(c) for c in keep_cols],
            token_count(text_col).cast("long").alias("n_tokens"),
            quality_score(text_col).alias("quality"),
        )
        .where(F.col("quality") >= F.lit(min_quality))
    )


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
) -> DataFrame:
    """Benchmark decontamination: training docs that share ≥1 word
    n-gram with an evaluation/benchmark set, with the overlap count.
    Returns (id, n_shared) — n_shared = distinct contaminated n-grams.

    The n-gram-overlap decontamination rule used for LLM training sets
    (flag a training doc if any benchmark n-gram appears verbatim).
    Scale shape: the corpus is shingled in one scan and hashed to int64
    (8-byte join keys, never the raw n-gram strings); the eval side is
    a benchmark suite — tiny next to a 100 TB corpus — so its distinct
    shingle-hash set is broadcast and the corpus never shuffles.
    """
    from .functions.text import shingles

    def sh(df: DataFrame, *keep: str) -> DataFrame:
        return df.select(
            *keep,
            F.explode(
                F.array_distinct(shingles(text_col, shingle_size))
            ).alias("_s"),
        ).select(*keep, F.xxhash64("_s").alias("sh"))

    tr = sh(train.withColumnRenamed(id_col, "id"), "id")
    ev = sh(eval_docs).select("sh").distinct()
    return (
        tr.join(F.broadcast(ev), "sh")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def hash_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    train_frac: float = 0.9,
    val_frac: float = 0.05,
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent
    id hash: adds a ``split`` column. Stable across runs, partitionings
    and engines — md5 of the id string, bucketed on the first two hex
    chars (256 buckets compared lexicographically, so any SQL engine
    reproduces the exact assignment without hex→int conversion).

    A pure projection: no shuffle, no RNG, safe to recompute per stage
    at any scale (the property a 100 TB pipeline needs — a sampled
    split materialized once can never be joined consistently again).
    """
    b = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)

    def below(frac: float):
        # Boundary 256 would render as '100' (three chars) and compare
        # lexicographically BELOW every 2-char bucket — clamp it to an
        # always-true predicate so fractions summing to 1.0 behave.
        hi = min(int(round(frac * 256)), 256)
        return F.lit(True) if hi >= 256 else b < F.lit(format(hi, "02x"))

    return docs.withColumn(
        "split",
        F.when(below(train_frac), "train")
        .when(below(train_frac + val_frac), "val")
        .otherwise("test"),
    )


def stratified_cap(
    docs: DataFrame,
    group_col: str,
    n_per_group: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-group downsample: keep at most ``n_per_group``
    rows per group, chosen by md5(id) order — the domain-mixing cap a
    training-data pipeline applies to over-represented sources. No RNG:
    stable across runs, partitionings and engines (≡ one SQL
    ROW_NUMBER() OVER (PARTITION BY g ORDER BY md5(id), id) ≤ n).

    Two-phase selection (the partial/final shape of the kNN
    block_select): rank within (input partition × group) first and keep
    ≤ n, so the final per-group window sees at most n·partitions rows —
    a hot group never funnels its full row count through one task, only
    its bounded candidate set.
    """
    from pyspark.sql.window import Window

    h = F.md5(F.col(id_col).cast("string"))
    w1 = Window.partitionBy("_pid", group_col).orderBy("_h", id_col)
    w2 = Window.partitionBy(group_col).orderBy("_h", id_col)
    return (
        docs.withColumn("_h", h)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_rk", F.row_number().over(w1))
        .where(F.col("_rk") <= n_per_group)
        .withColumn("_rk", F.row_number().over(w2))
        .where(F.col("_rk") <= n_per_group)
        .drop("_h", "_pid", "_rk")
    )
