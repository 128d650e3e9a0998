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
if a boilerplate shingle dominates); the final anti-join is a shuffled
hash join built on the drop side (corpus-proportional under realistic
duplicate rates, so never broadcast; never sorted either).
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
    embeddings: DataFrame | None = None,
    centroids=None,
    semantic_threshold: float = 0.95,
    emb_id_col: str = "vec_id",
    emb_vec_col: str = "embedding",
) -> DataFrame:
    """Curated corpus: exact dups dropped (keep min id), near-dup
    clusters reduced to their min-id representative, optionally
    SemDeDup semantic near-dups reduced the same way, then quality-
    filtered. Returns (id, *keep_cols, n_tokens, quality) — quality is
    the raw double; callers round for display.

    ``verify_jaccard``: banding candidates are re-scored with exact
    n-gram Jaccard and only pairs ≥ the threshold become dedup edges —
    a banding false positive (two docs agreeing on one band by chance)
    must not delete a non-duplicate document. ``None`` trusts the
    banding (the pre-verification behavior).

    ``embeddings``: optional ``(emb_id_col, emb_vec_col)`` table whose
    ids live in the document id space. When given (``centroids``
    required — the SemDeDup coarse quantizer), documents that are
    non-representative members of a semantic group (cosine ≥
    ``semantic_threshold`` within a cell, group representative = min
    id) are dropped alongside the lexical dup drops — the full
    SemDeDup stage (Abbas et al. 2023) wired into the one declarative
    plan. Documents without an embedding row pass through the semantic
    stage untouched.
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
    # the edge list is near-dup-pair-sized (tiny next to the corpus)
    # but its lineage is the WHOLE shingle→minhash→band→verify
    # pipeline, and connected_components references it four times
    # (symmetrize both directions + the self-loop distinct). Persist
    # so the expensive lineage evaluates once into cache and the other
    # branch reads are cache hits (measured at sf0.1: ~8.1 s → ~6.4 s
    # full pipeline). r9's rejected persist was the DOCUMENT TEXT
    # cache (memory-store pressure on a wide column); this caches only
    # (id_a, id_b) longs.
    pairs = pairs.persist()
    cc = connected_components(pairs)
    pairs.unpersist()
    near_drop = (
        cc.where(F.col("id") != F.col("cluster")).select(F.col("id").alias("_drop_id"))
    )

    drops = exact_drop.unionByName(near_drop)
    if embeddings is not None:
        if centroids is None:
            raise ValueError("semantic dedup needs centroids (the coarse quantizer)")
        from .operators.dedup import semantic_dedup

        sem = semantic_dedup(
            embeddings,
            centroids,
            id_col=emb_id_col,
            vec_col=emb_vec_col,
            threshold=semantic_threshold,
        )
        sem_drop = sem.where(F.col("keep") == 0).select(
            F.col("id").alias("_drop_id")
        )
        drops = drops.unionByName(sem_drop)
    drops = drops.distinct()
    # SHUFFLE_HASH on the drop side: in a web-scale corpus the
    # duplicate fraction is routinely 30-50%, so the drop set is
    # corpus-proportional — too big to broadcast — and the default SMJ
    # fallback would sort BOTH sides. A shuffled hash anti-join builds
    # on the (always-smaller) drop side with no sorts. The hint fixes
    # the strategy, trading away AQE's broadcast upgrade for small drop
    # sets — the right trade for the scale this pipeline targets.
    survivors = docs.join(
        drops.hint("SHUFFLE_HASH"), docs[id_col] == drops["_drop_id"], "left_anti"
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


def decontaminate_bloom(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
    fpp: float = 0.01,
    n_items: int | None = None,
    cleanup: list | None = None,
) -> DataFrame:
    """:func:`decontaminate` for eval sets too large to broadcast as a
    hash table: the eval shingle hashes build a Bloom filter (~1.2
    bytes/item at 1% fpp — an order of magnitude under the 8-byte
    hash set) that PREFILTERS the corpus shingle stream in-scan; only
    the surviving candidates (true matches + ~fpp false positives)
    reach the exact verify join, so the RESULT is identical to
    :func:`decontaminate` — the fpp buys cost, never correctness.

    ``n_items``: the filter's capacity; defaults to an exact distinct
    count of the eval shingles (one extra bounded job — pass the
    known cardinality to skip it). Scale shape: the corpus never
    shuffles in full; what reaches the verify shuffle is bounded by
    true-contamination volume + fpp·corpus-shingles.

    ``cleanup``: optional caller-owned list; when passed, a zero-arg
    release callback is appended. Call it AFTER fully materializing
    the returned plan (write/collect) — it unpersists the eval shingle
    set and destroys the Bloom-bit broadcast (100+ MB at the 10⁸-item
    scale this path targets), so repeated pipeline invocations don't
    accrete executor/driver memory. The plan must not be re-executed
    after release."""
    from .functions.text import shingles
    from .operators.bloom import bloom_build, bloom_filter_rows

    def sh(df: DataFrame, *keep: str) -> DataFrame:
        return df.select(
            *keep,
            F.explode(
                F.array_distinct(shingles(text_col, shingle_size))
            ).alias("_s"),
        ).select(*keep, F.xxhash64("_s").alias("sh"))

    ev = sh(eval_docs).select("sh").distinct().persist()
    n = int(n_items) if n_items is not None else ev.count()
    bits, m_bits, k = bloom_build(ev, "sh", max(n, 1), fpp)
    tr = sh(train.withColumnRenamed(id_col, "id"), "id")
    track: list = []
    cand = bloom_filter_rows(tr, "sh", bits, m_bits, k, track=track)
    out = (
        cand.join(ev, "sh")  # exact verify: false positives die here
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    if cleanup is not None:

        def release() -> None:
            ev.unpersist()
            for b in track:
                b.destroy()

        cleanup.append(release)
    # without a cleanup hook, ev stays persisted and the bit-array
    # broadcast alive for the plan's lifetime (the returned plan
    # re-reads both); Spark evicts LRU — fine for one-shot use, pass
    # ``cleanup`` when invoking repeatedly in one session
    return out


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
    block_select): rank within (sub-bucket × group) first and keep
    ≤ n, so the final per-group window sees at most n·buckets rows —
    a hot group never funnels its full row count through one task, only
    its bounded candidate set.

    r15: phase 1 keys on a DETERMINISTIC sub-bucket
    ``pmod(xxhash64(id), 64)`` instead of ``spark_partition_id()`` —
    the partition id is retry-unsafe under speculative execution /
    fetch-failure recomputation (guide §2.5: a re-run task can see a
    different partition id, so two attempts could keep different
    phase-1 survivor sets). Result-identical either way (phase 1 only
    prunes rows phase 2 would drop: each sub-bucket's global top-n
    contains the group's top-n members that hash there), pinned by
    tests/test_r15_expr_equiv.py::test_stratified_cap_*.
    """
    from pyspark.sql.window import Window

    h = F.md5(F.col(id_col).cast("string"))
    w1 = Window.partitionBy("_bkt", group_col).orderBy("_h", id_col)
    w2 = Window.partitionBy(group_col).orderBy("_h", id_col)
    return (
        docs.withColumn("_h", h)
        .withColumn("_bkt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(64)))
        .withColumn("_rk", F.row_number().over(w1))
        .where(F.col("_rk") <= n_per_group)
        .withColumn("_rk", F.row_number().over(w2))
        .where(F.col("_rk") <= n_per_group)
        .drop("_h", "_bkt", "_rk")
    )


def token_budget_cap(
    docs: DataFrame,
    group_col: str,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Token-budgeted per-group corpus assembly: admit documents in
    deterministic md5(id) order until the group's CUMULATIVE token
    count exceeds ``budget_tokens`` (the crossing document is
    excluded — budgets are hard caps). Pass ``order_col`` (e.g. a
    quality score) to admit BEST-FIRST instead — descending score,
    md5(id) tie-break — the "spend the token budget on the highest
    quality data" assembly; determinism is unchanged. This is :func:`stratified_cap`'s
    sibling for how LLM training mixes are actually specified — in
    tokens per domain/language, not document counts. No RNG: stable
    across runs, partitionings and engines (≡ one SQL
    ``SUM(tok) OVER (PARTITION BY g ORDER BY md5(id), id ROWS
    UNBOUNDED PRECEDING) <= budget``).

    ``token_count_col`` reuses a precomputed count column; otherwise
    tokens are counted from ``text_col`` in the same scan.

    Scale: a running sum needs a total order per group, so (unlike the
    count cap's two-phase trick) a hot group's rows DO flow through one
    window task. For hot groups compose: ``stratified_cap(docs, g,
    n ≈ budget // min_doc_tokens)`` first — the count cap bounds the
    window's input without disturbing the budget semantics (it keeps a
    superset of every md5-prefix the budget can admit).
    """
    from pyspark.sql.window import Window

    tok = (
        F.col(token_count_col)
        if token_count_col is not None
        else token_count(text_col)
    )
    order = (
        [F.col(order_col).desc(), "_h", id_col]
        if order_col is not None
        else ["_h", id_col]
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        docs.withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .withColumn("_cum", F.sum(tok).over(w))
        .where(F.col("_cum") <= budget_tokens)
        .drop("_h", "_cum")
    )


def shard_pack(
    docs: DataFrame,
    n_shards: int = 8,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic training-shard export + concat-and-chunk packing.

    The last mile of an LLM data pipeline: place every document into a
    training shard, give it a stable position inside that shard, and
    map it onto fixed-length token sequences under GPT-style packing
    (documents are concatenated in shard order and the stream is
    chunked every ``seq_len`` tokens, so a document may span chunks).
    Output per doc: ``shard``, ``pos`` (0-based dense rank in shard),
    ``n_tok``, ``tok_off`` (tokens before it in its shard),
    ``first_seq``/``last_seq`` (the chunk range it lands in).

    Everything derives from md5(id) — content-independent and
    engine-reproducible (the ``hash_split`` discipline): shard = first
    8 hex digits mod n_shards, within-shard order = (sub-bucket, hash,
    id). No RNG, stable across runs, partitionings and engines.

    Scale shape: a naive ``ROW_NUMBER() OVER (PARTITION BY shard)``
    funnels an entire shard (100 TB / n_shards) through one task. This
    runs the partial/final split instead: per-(shard, sub-bucket)
    windows bound task state to shard/(n_shards·n_buckets), then a
    (n_shards·n_buckets)-row offset table — computed with a window over
    buckets and broadcast back — lifts local ranks/cumsums to global
    ones. One data shuffle (the partial window), one broadcast join.
    """
    from pyspark.sql.window import Window

    h = F.md5(F.col(id_col).cast("string"))
    tok = token_count(text_col)
    base = (
        docs.select(
            F.col(id_col),
            tok.cast("long").alias("n_tok"),
            h.alias("_h"),
        )
        .withColumn(
            "shard",
            F.pmod(F.conv(F.substring("_h", 1, 8), 16, 10).cast("long"),
                   F.lit(n_shards)).cast("int"),
        )
        .withColumn(
            "_bucket",
            F.pmod(F.conv(F.substring("_h", 9, 4), 16, 10).cast("long"),
                   F.lit(n_buckets)).cast("int"),
        )
    )

    w = Window.partitionBy("shard", "_bucket").orderBy("_h", id_col)
    part = base.withColumn("_rn", F.row_number().over(w) - F.lit(1)).withColumn(
        "_ctok",
        F.coalesce(
            F.sum("n_tok").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )

    # (n_shards · n_buckets)-row offset table: how many rows/tokens sit
    # in earlier buckets of the same shard
    wb = Window.partitionBy("shard").orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        base.groupBy("shard", "_bucket")
        .agg(F.count(F.lit(1)).alias("_bn"), F.sum("n_tok").alias("_bt"))
        .select(
            "shard",
            "_bucket",
            F.coalesce(F.sum("_bn").over(wb), F.lit(0)).alias("_pos_off"),
            F.coalesce(F.sum("_bt").over(wb), F.lit(0)).alias("_tok_off"),
        )
    )

    out = part.join(F.broadcast(offsets), ["shard", "_bucket"])
    tok_off = F.col("_tok_off") + F.col("_ctok")
    last = (tok_off + F.greatest(F.col("n_tok"), F.lit(1)) - F.lit(1))
    return out.select(
        F.col(id_col),
        "shard",
        (F.col("_pos_off") + F.col("_rn")).cast("long").alias("pos"),
        "n_tok",
        tok_off.cast("long").alias("tok_off"),
        F.floor(tok_off / F.lit(seq_len)).cast("long").alias("first_seq"),
        F.floor(last / F.lit(seq_len)).cast("long").alias("last_seq"),
    )


def mixture_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic data-mixture downsample: adds ``in_mix`` = 1 iff
    the row survives its group's target keep-rate — the per-domain
    reweighting step of a training-data pipeline (e.g. keep 100 % of
    books, 10 % of common-crawl).

    Same md5 hex-bucket discipline as :func:`hash_split`: a row is kept
    iff its 2-hex id bucket falls below round(rate·256). Content- and
    partitioning-independent, shuffle-free (a pure projection), and
    nested — the rate-0.3 sample is a subset of the rate-0.5 sample, so
    mixtures can be re-weighted without resampling churn. Any SQL
    engine reproduces the assignment with a string comparison.
    """
    for name, frac in {"default_rate": default_rate, **rates}.items():
        if not (0.0 <= frac <= 1.0):
            raise ValueError(f"rate {name}={frac} outside [0, 1]")
    b = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)

    def below(frac: float):
        hi = min(int(round(frac * 256)), 256)
        if hi <= 0:
            return F.lit(False)
        return F.lit(True) if hi >= 256 else b < F.lit(format(hi, "02x"))

    keep = below(default_rate)
    for grp, frac in sorted(rates.items()):
        keep = F.when(F.col(group_col) == grp, below(frac)).otherwise(keep)
    return docs.withColumn("in_mix", keep.cast("int"))
