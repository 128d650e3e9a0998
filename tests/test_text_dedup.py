"""Semantic property tests for the text/dedup operator family.

The driver's DuckDB hash-match (tools/check_oracle.py) covers exact
cross-engine value parity; these tests pin the *semantics* the oracles
can't express — locality of SimHash, order-sensitivity of the rolling
fingerprint, recall of LSH banding.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from faiss_metal_spark.functions.text import (
    bpe_token_count,
    doc_fingerprint,
    lang_id,
)
from faiss_metal_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_neardup_pairs,
    simhash_signatures,
)


def docs_df(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        schema="doc_id long, text string",
    )


BASE = "the quick brown fox jumps over the lazy dog near the old river bank today"


def test_simhash_locality(spark):
    """Near-identical docs → small Hamming distance; unrelated → large."""
    near = BASE.replace("lazy", "sleepy")
    far = "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu xi"
    sig = simhash_signatures(docs_df(spark, [BASE, near, far])).orderBy("doc_id")
    s = [r["simhash"] for r in sig.collect()]
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(s[0], s[1]) <= 8
    assert ham(s[0], s[2]) > ham(s[0], s[1])


def test_simhash_pairs_finds_neardup(spark):
    texts = [BASE, BASE.replace("lazy", "sleepy"),
             "unrelated totally different words entirely about other topics here now"]
    sig = simhash_signatures(docs_df(spark, texts))
    pairs = simhash_neardup_pairs(sig, bands=4, max_hamming=8).collect()
    assert any(r["id_a"] == 0 and r["id_b"] == 1 for r in pairs)
    assert not any(r["id_b"] == 2 for r in pairs)


def test_fingerprint_order_sensitive(spark):
    """Same bag of words, different order → different fingerprint;
    identical text → identical fingerprint (exact-sequence dup)."""
    shuffled = " ".join(reversed(BASE.split()))
    df = docs_df(spark, [BASE, BASE, shuffled]).select(
        "doc_id", doc_fingerprint("text").alias("fp")
    )
    fp = [r["fp"] for r in df.orderBy("doc_id").collect()]
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]
    assert all(0 <= x < 2_147_483_647 for x in fp)


def test_minhash_lsh_recall_on_identical(spark):
    """Identical docs must always be LSH candidates (sig equality)."""
    texts = [BASE, BASE, "completely different content with many other unique tokens present"]
    sig = minhash_signatures(docs_df(spark, texts), num_hashes=8, shingle_size=3)
    pairs = lsh_candidate_pairs(sig, num_hashes=8, bands=4).collect()
    assert any(r["id_a"] == 0 and r["id_b"] == 1 for r in pairs)


def test_ngram_jaccard_bounds(spark):
    texts = [BASE, BASE, BASE.replace("lazy", "sleepy")]
    pairs = ngram_jaccard_pairs(docs_df(spark, texts), shingle_size=3)
    rows = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert rows[(0, 1)] == pytest.approx(1.0)
    assert 0.0 < rows[(0, 2)] < 1.0


def test_ngram_jaccard_df_cutoff(spark):
    """A boilerplate shingle shared by every doc must not create n²
    join rows: with max_df below the corpus size the hot shingle leaves
    the similarity definition and pairs that share ONLY it disappear."""
    boiler = "all rights reserved"
    texts = [f"unique{i} tokens{i} here{i} {boiler}" for i in range(40)]
    # without a cutoff every pair shares the boilerplate shingle chain
    dense = ngram_jaccard_pairs(docs_df(spark, texts), shingle_size=3, max_df=None)
    assert dense.count() == 40 * 39 // 2
    # with the cutoff the hot shingles (df=40 > 10) drop out and only
    # genuinely-similar pairs (none here) remain
    sparse = ngram_jaccard_pairs(docs_df(spark, texts), shingle_size=3, max_df=10)
    assert sparse.count() == 0
    # identical docs still hit jaccard 1.0 under the cutoff
    same = ngram_jaccard_pairs(docs_df(spark, [BASE, BASE]), shingle_size=3, max_df=10)
    rows = {(r["id_a"], r["id_b"]): r["jaccard"] for r in same.collect()}
    assert rows[(0, 1)] == pytest.approx(1.0)
    # the cutoff is applied as a broadcast anti-join against the small
    # ban set, never a shuffle join against the near-vocabulary keep set
    from faiss_metal_spark.plans.report import assert_plan

    assert_plan(sparse, min_broadcasts=1)


def test_curate_verify_kills_banding_false_positive(spark):
    """Two non-duplicate docs that collide on one LSH band must NOT be
    merged once candidates are verified with exact Jaccard."""
    from faiss_metal_spark.pipeline import curate_corpus

    rich_a = " ".join(f"worda{i} tokena{i}" for i in range(30))
    rich_b = " ".join(f"wordb{i} tokenb{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(0, rich_a, "en"), (1, rich_b, "en")],
        schema="doc_id long, text string, lang string",
    )
    # fabricate the collision by feeding the SAME candidate pair the
    # banding would have produced on a false positive
    from faiss_metal_spark.operators.dedup import ngram_jaccard_pairs as njp

    cand = spark.createDataFrame([(0, 1)], schema="id_a long, id_b long")
    verified = njp(docs, pair_candidates=cand, shingle_size=3, threshold=0.5, max_df=None)
    assert verified.count() == 0  # jaccard ≈ 0 → edge rejected
    out = curate_corpus(docs, min_quality=0.0)
    assert {r["doc_id"] for r in out.collect()} == {0, 1}  # both survive


def test_exact_dedup_keeper(spark):
    df = docs_df(spark, ["aa bb", "aa bb", "cc dd"])
    out = exact_dedup(df, F.col("text"), id_col="doc_id").collect()
    assert len(out) == 1 and out[0]["keeper"] == 0 and out[0]["n_dups"] == 2


def test_lang_id_markers(spark):
    df = docs_df(
        spark,
        [
            "the cat is in the house and a dog",
            "der hund ist nicht der beste und das",
            "le chat est dans la maison et les chiens",
            "el perro y los gatos es una casa por",
        ],
    )
    out = [r["p"] for r in df.select(lang_id("text").alias("p")).orderBy(
        F.col("doc_id") if "doc_id" in df.columns else F.lit(0)).collect()]
    assert out == ["en", "de", "fr", "es"]


def test_bpe_token_count(spark):
    df = spark.createDataFrame([("hello world42 x-y",)], schema="text string")
    # [hello][world][42][x][-][y] = 6
    assert df.select(bpe_token_count("text").alias("n")).first()["n"] == 6


def test_winnow_guarantee(spark):
    """Docs sharing a run of ≥ k+w−1 tokens share ≥1 fingerprint;
    winnowing keeps far fewer hashes than the full k-gram set."""
    from faiss_metal_spark.functions.text import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens = k+w-1
    texts = [
        shared + " uno dos tres cuatro cinco seis siete ocho nueve diez",
        "otro prefijo totalmente distinto aqui " + shared,
        "nada en comun con los otros documentos de este grupo en absoluto",
    ]
    df = docs_df(spark, texts).select(
        "doc_id", winnow_fingerprints("text", k=4, w=5).alias("fps")
    )
    fps = {r["doc_id"]: set(r["fps"]) for r in df.collect()}
    assert fps[0] & fps[1], "shared 8-token run must share a fingerprint"
    assert not (fps[0] & fps[2])
    # compression: fingerprints ≪ k-grams (18 tokens → 15 grams)
    assert 0 < len(fps[0]) < 15


def test_salted_join_equals_plain(spark):
    from faiss_metal_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [(i, i % 3, f"l{i}") for i in range(60)], schema="lid long, k long, pay string"
    )
    right = spark.createDataFrame(
        [(0, "x"), (1, "y"), (2, "z")], schema="k long, rv string"
    )
    fast = salted_join(left, right, on="k", salt_col="lid", n_salts=4)
    slow = left.join(right, "k")
    f = {(r["lid"], r["rv"]) for r in fast.collect()}
    s = {(r["lid"], r["rv"]) for r in slow.collect()}
    assert f == s and len(f) == 60


def test_connected_components(spark):
    """Two chains and an isolated pair cluster to their min ids."""
    from faiss_metal_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        # component {1,2,3,4} via chain, component {10,11}
        [(1, 2), (2, 3), (3, 4), (10, 11)],
        schema="id_a long, id_b long",
    )
    out = {r["id"]: r["cluster"] for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_paths_agree(spark):
    """The collected union-find fast path and the iterative label
    propagation (forced via small_graph_rows=0) give identical
    clusterings on a random sparse graph."""
    import random

    from faiss_metal_spark.operators.dedup import connected_components

    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], schema="id_a long, id_b long"
    )
    fast = {
        r["id"]: r["cluster"] for r in connected_components(pairs).collect()
    }
    iterative = {
        r["id"]: r["cluster"]
        for r in connected_components(pairs, small_graph_rows=0).collect()
    }
    assert fast == iterative and len(fast) > 0


def test_curate_corpus_pipeline(spark):
    """Exact dup, near-dup pair, and a junk doc all drop; the rest
    survive with their quality scores."""
    from faiss_metal_spark.pipeline import curate_corpus

    rich = " ".join(f"distinctword{i} meaningful" for i in range(40))  # 80 tokens
    near_a = "alpha beta gamma delta epsilon zeta eta theta " * 8
    near_b = near_a + "extra"
    docs = spark.createDataFrame(
        [
            (0, rich, "en"),
            (1, rich, "en"),                 # exact dup of 0 → dropped
            (2, near_a.strip(), "en"),
            (3, near_b.strip(), "en"),       # near dup of 2 → dropped
            (4, "x x x x", "en"),            # repetitive junk → quality fail
        ],
        schema="doc_id long, text string, lang string",
    )
    out = curate_corpus(docs, min_quality=0.5)
    survivors = {r["doc_id"] for r in out.collect()}
    assert 0 in survivors and 1 not in survivors     # exact dedup keeps min id
    assert 2 in survivors and 3 not in survivors     # near-dedup keeps min id
    assert 4 not in survivors                        # quality filter
    row = {r["doc_id"]: r for r in out.collect()}[0]
    assert row["n_tokens"] == 80 and 0.0 <= row["quality"] <= 1.0


def test_decontaminate(spark):
    """Docs sharing a 3-gram with the eval set are flagged with the
    distinct shared-shingle count; clean docs are absent. The eval
    shingle set must broadcast (the corpus never shuffles for the probe
    join)."""
    from faiss_metal_spark.pipeline import decontaminate
    from faiss_metal_spark.plans.report import assert_plan

    ev = docs_df(spark, ["alpha beta gamma delta epsilon"])
    train = docs_df(
        spark,
        [
            "alpha beta gamma unrelated tail here",   # shares 1 eval 3-gram
            "beta gamma delta epsilon something",     # shares 2
            "totally different words only here now",  # clean
        ],
    )
    out = decontaminate(train, ev)
    got = {r["id"]: r["n_shared"] for r in out.collect()}
    assert got == {0: 1, 1: 2}
    assert_plan(out, min_broadcasts=1)


def test_hash_split_deterministic_and_shuffle_free(spark):
    """Same id → same split on repeated/partition-shuffled input; split
    fractions roughly honor 90/5/5; the plan has no Exchange at all."""
    from faiss_metal_spark.pipeline import hash_split
    from faiss_metal_spark.plans.report import assert_plan

    ids = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s1 = hash_split(ids)
    assert_plan(s1, max_shuffles=0)
    a = {r["doc_id"]: r["split"] for r in s1.collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(ids.repartition(7)).collect()
    }
    assert a == b
    from collections import Counter

    c = Counter(a.values())
    assert set(c) == {"train", "val", "test"}
    assert 0.85 < c["train"] / 2000 < 0.95
    assert c["val"] / 2000 < 0.10 and c["test"] / 2000 < 0.10


def test_hash_split_fractions_summing_to_one(spark):
    """train+val = 1.0 must leave the test split empty (the 256 boundary
    is clamped, not rendered as a 3-char hex string)."""
    from faiss_metal_spark.pipeline import hash_split

    ids = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    c = {r["split"] for r in hash_split(ids, train_frac=0.9, val_frac=0.1).collect()}
    assert c == {"train", "val"}
    c2 = {r["split"] for r in hash_split(ids, train_frac=1.0, val_frac=0.0).collect()}
    assert c2 == {"train"}


def test_repetition_ratio(spark):
    """1 − distinct/total 3-grams: fully cyclic text ≈ high, all-unique
    text = 0, docs shorter than the gram size = 0 (not null)."""
    from faiss_metal_spark.functions.text import repetition_ratio

    df = docs_df(
        spark,
        [
            "a b c a b c a b c",      # 7 grams, 3 distinct → 4/7
            "one two three four five",  # all unique → 0
            "tiny doc",               # < 3 tokens → 0
        ],
    )
    got = [
        round(r["r"], 4)
        for r in df.select(repetition_ratio("text", 3).alias("r"))
        .orderBy("doc_id")
        .collect()
    ]
    assert got == [round(4 / 7, 4), 0.0, 0.0]


def test_stratified_cap(spark):
    """≤ n rows kept per group; the keep set is exactly the single-
    window md5-order top-n (the two-phase partial/final selection must
    not change the result), stable under repartitioning."""
    from pyspark.sql.window import Window

    from faiss_metal_spark.pipeline import stratified_cap

    rows = [(i, "big" if i < 80 else "small") for i in range(90)]
    df = spark.createDataFrame(rows, schema="doc_id long, lang string")
    out = stratified_cap(df, "lang", 10).toPandas()
    assert out.groupby("lang")["doc_id"].count().max() <= 10
    assert len(out[out["lang"] == "small"]) == 10

    ref_w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ref = (
        df.withColumn("_rk", F.row_number().over(ref_w))
        .where(F.col("_rk") <= 10)
        .select("doc_id")
        .toPandas()
    )
    assert set(out["doc_id"]) == set(ref["doc_id"])
    out2 = stratified_cap(df.repartition(13), "lang", 10).toPandas()
    assert set(out2["doc_id"]) == set(out["doc_id"])


def test_embedding_neardup_skew_bounded_grid(spark):
    """A block holding ~90% of all rows is gridded into capped sub-block
    cells: results must be IDENTICAL to the ungridded path and to a
    numpy brute-force oracle, with no cell ever seeing more than
    2*max_block_rows rows."""
    import numpy as np
    import pandas as pd

    from faiss_metal_spark.operators.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(7)
    n, d = 500, 16
    V = rng.normal(size=(n, d)).astype(np.float32)
    # make some near-dup pairs inside the hot block
    for a, b in [(3, 400), (10, 250), (77, 78)]:
        V[b] = V[a] + rng.normal(scale=0.02, size=d).astype(np.float32)
    blocks = ["hot" if i < 450 else f"cold{i % 5}" for i in range(n)]
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(n), "embedding": [v.tolist() for v in V],
                      "label": blocks}),
        schema="vec_id long, embedding array<float>, label string",
    )

    def run(cap):
        got = embedding_neardup_pairs(
            df, block_col="label", threshold=0.8, max_block_rows=cap
        ).collect()
        return sorted((r["id_a"], r["id_b"], round(r["cos"], 9)) for r in got)

    ungridded = run(100_000)  # nsb = 1 everywhere
    gridded = run(64)  # hot block fans out to ceil(450/64)=8 sub-blocks
    assert gridded == ungridded
    # numpy oracle within blocks
    U = V.astype(np.float64)
    U /= np.linalg.norm(U, axis=1, keepdims=True)
    S = U @ U.T
    want = sorted(
        (a, b, round(S[a, b], 9))
        for a in range(n) for b in range(a + 1, n)
        if blocks[a] == blocks[b] and S[a, b] >= 0.8
    )
    assert [(a, b) for a, b, _ in gridded] == [(a, b) for a, b, _ in want]
    assert all(abs(x - y) < 1e-6 for (_, _, x), (_, _, y) in zip(gridded, want))


def test_shard_pack_invariants(spark):
    """shard_pack: positions are a dense 0..n-1 permutation per shard,
    tok_off is the running token total in pos order, the chunk range
    matches concat-and-chunk arithmetic, and the whole result is
    invariant to input partitioning (the md5 discipline)."""
    import pandas as pd

    from faiss_metal_spark.pipeline import shard_pack

    pdf = pd.DataFrame(
        {
            "doc_id": range(300),
            "text": [
                " ".join(f"w{j}" for j in range((i * 37) % 90 + 1))
                for i in range(300)
            ],
        }
    )
    docs = spark.createDataFrame(pdf)
    out = shard_pack(docs, n_shards=4, seq_len=64, n_buckets=8).toPandas()

    assert len(out) == 300
    for shard, g in out.groupby("shard"):
        g = g.sort_values("pos")
        # dense permutation
        assert g["pos"].tolist() == list(range(len(g)))
        # running token totals
        assert g["tok_off"].tolist() == [0] + g["n_tok"].cumsum().tolist()[:-1]
    # concat-and-chunk arithmetic
    assert (out["first_seq"] == out["tok_off"] // 64).all()
    last = (out["tok_off"] + out["n_tok"].clip(lower=1) - 1) // 64
    assert (out["last_seq"] == last).all()
    # a doc spans >1 chunk iff its token range crosses a 64 boundary
    spans = out["last_seq"] > out["first_seq"]
    assert spans.any() and not spans.all()

    # partition-invariance
    out2 = (
        shard_pack(docs.repartition(13), n_shards=4, seq_len=64, n_buckets=8)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True), out2
    )


def test_shard_pack_two_level_windows(spark):
    """The plan must NOT contain a window partitioned by shard alone —
    per-shard state is bounded by the (shard, sub-bucket) partial
    windows plus the tiny offset table (the partial/final discipline)."""
    from faiss_metal_spark.pipeline import shard_pack

    docs = spark.range(0, 500).selectExpr(
        "id as doc_id", "'a b c' as text"
    )
    plan = (
        shard_pack(docs, n_shards=2, seq_len=32)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    import re

    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        if "shard" in spec:
            assert "_bucket" in spec, f"shard-only window in plan: {spec}"


def test_semantic_dedup_matches_naive(spark):
    """semantic_dedup ≡ naive numpy SemDeDup (cell assignment →
    in-cell cosine pairs → min-id components) on clustered data, keep
    flags mark exactly one representative per group, and groups never
    span cells."""
    import numpy as np
    import pandas as pd

    from faiss_metal_spark.operators.dedup import semantic_dedup

    rng = np.random.default_rng(5)
    C = rng.normal(0, 4, (6, 16))
    base = C[rng.integers(0, 6, 120)] + rng.normal(0, 0.4, (120, 16))
    # plant near-duplicates: rows 100.. are tiny perturbations of earlier rows
    for i in range(100, 120):
        base[i] = base[i - 100] + rng.normal(0, 1e-3, 16)
    V = base.astype(np.float32)

    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(120), "embedding": [v.tolist() for v in V]}),
        schema="vec_id long, embedding array<float>",
    )
    th = 0.995
    got = semantic_dedup(emb, C, threshold=th).toPandas().sort_values("id")

    # naive reference
    Vd = V.astype(np.float64)
    cn = (C * C).sum(1)
    cell = (cn[None, :] - 2.0 * (Vd @ C.T)).argmin(1)
    U = Vd / np.linalg.norm(Vd, axis=1, keepdims=True)
    S = U @ U.T
    parent = list(range(120))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(120):
        for j in range(i + 1, 120):
            if cell[i] == cell[j] and S[i, j] >= th:
                ri, rj = find(i), find(j)
                if ri != rj:
                    lo, hi = min(ri, rj), max(ri, rj)
                    parent[hi] = lo
    want_group = [find(i) for i in range(120)]

    assert got["cell"].tolist() == cell.tolist()
    assert got["group"].tolist() == want_group
    assert got["keep"].tolist() == [int(g == i) for i, g in enumerate(want_group)]
    # planted dups actually deduplicate: some groups have >1 member
    from collections import Counter

    sizes = Counter(want_group)
    assert max(sizes.values()) >= 2
    # groups never span cells
    gdf = got.groupby("group")["cell"].nunique()
    assert (gdf == 1).all()


def test_mixture_sample(spark):
    """mixture_sample: per-group keep rates land near target, the plan
    is shuffle-free, sampling is partition-invariant, and lower-rate
    samples nest inside higher-rate ones."""
    from faiss_metal_spark.pipeline import mixture_sample
    from faiss_metal_spark.plans.report import assert_plan

    docs = spark.range(0, 4000).selectExpr(
        "id as doc_id", "concat('g', cast(id % 4 as string)) as source"
    )
    out = mixture_sample(
        docs, {"g0": 1.0, "g1": 0.5, "g2": 0.0}, default_rate=0.25
    )
    assert_plan(out, max_shuffles=0)
    pdf = out.toPandas()
    rates = pdf.groupby("source")["in_mix"].mean()
    assert rates["g0"] == 1.0
    assert abs(rates["g1"] - 0.5) < 0.06
    assert rates["g2"] == 0.0
    assert abs(rates["g3"] - 0.25) < 0.06

    # partition-invariance
    pdf2 = (
        mixture_sample(
            docs.repartition(9), {"g0": 1.0, "g1": 0.5, "g2": 0.0}, default_rate=0.25
        )
        .toPandas()
        .set_index("doc_id")["in_mix"]
        .sort_index()
    )
    assert (pdf.set_index("doc_id")["in_mix"].sort_index() == pdf2).all()

    # nesting: the 0.25 sample of g1 is a subset of its 0.5 sample
    lo = mixture_sample(docs, {"g1": 0.25}, default_rate=0.0).toPandas()
    hi = pdf
    lo_ids = set(lo[lo["in_mix"] == 1]["doc_id"])
    hi_ids = set(hi[(hi["source"] == "g1") & (hi["in_mix"] == 1)]["doc_id"])
    assert lo_ids <= hi_ids


def test_incremental_dedup(spark):
    """Delta dedup against a digest index: delta-internal groups
    collapse to min id, keys already in the index are dropped, and
    batch-then-delta composition equals one full batch dedup on the
    union (the keeper sets agree for keys whose group spans both)."""
    from faiss_metal_spark.operators.dedup import exact_dedup, incremental_dedup

    old = spark.createDataFrame(
        [(0, "a a a"), (1, "b b b"), (2, "a a a")],
        schema="doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, "a a a"), (11, "c c c"), (12, "c c c"), (13, "d d d")],
        schema="doc_id long, text string",
    )
    key = F.col("text")
    seen = old.select(key.alias("dup_key")).distinct()
    got = (
        incremental_dedup(new, seen, key)
        .orderBy("dup_key")
        .collect()
    )
    # 'a a a' already seen -> dropped; 'c c c' collapses to 11; 'd d d' new
    assert [(r["dup_key"], r["n_dups"], r["keeper"]) for r in got] == [
        ("c c c", 2, 11),
        ("d d d", 1, 13),
    ]
    # survivors ∪ old keys == keys of full-batch dedup on the union
    full_keys = {
        r["dup_key"]
        for r in exact_dedup(old.unionByName(new), key)
        .select("dup_key")
        .collect()
    } | {"d d d"}  # singleton groups aren't emitted by exact_dedup
    incr_keys = {r["dup_key"] for r in got} | {r["dup_key"] for r in seen.collect()}
    assert incr_keys >= full_keys


def test_new_ops_edge_cases(spark):
    """Empty/degenerate inputs for the round-5 operators: empty corpus
    through shard_pack, pair-free semantic_dedup (every row keeps),
    empty delta through incremental_dedup, and mixture_sample rate
    validation."""
    import numpy as np

    from faiss_metal_spark.operators.dedup import incremental_dedup, semantic_dedup
    from faiss_metal_spark.pipeline import mixture_sample, shard_pack

    empty = spark.createDataFrame([], schema="doc_id long, text string")
    assert shard_pack(empty, n_shards=4, seq_len=64).count() == 0
    assert (
        incremental_dedup(
            empty, empty.select(F.col("text").alias("dup_key")), F.col("text")
        ).count()
        == 0
    )

    with pytest.raises(ValueError, match="outside"):
        mixture_sample(empty, {"g": 1.5})
    with pytest.raises(ValueError, match="outside"):
        mixture_sample(empty, {}, default_rate=-0.1)

    # orthogonal-ish vectors, high threshold -> zero pairs, all keep
    rng = np.random.default_rng(7)
    V = rng.normal(size=(40, 16)).astype("float32")
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(40), "embedding": [v.tolist() for v in V]}),
        schema="vec_id long, embedding array<float>",
    )
    C = rng.normal(size=(4, 16))
    out = semantic_dedup(emb, C, threshold=0.9999).toPandas()
    assert len(out) == 40
    assert (out["keep"] == 1).all()
    assert (out["group"] == out["id"]).all()


def test_hashed_embedding_matches_numpy_and_is_local(spark):
    """hashed_embedding ≡ a numpy reference of the same hashing trick
    (md5 lane + sign-bit fold), unit-norm when normalized, near-dup
    texts land close in cosine while unrelated texts don't, and the
    plan is a pure projection (zero shuffles)."""
    import hashlib

    import numpy as np

    from faiss_metal_spark.functions.text import hashed_embedding
    from faiss_metal_spark.plans.report import assert_plan

    texts = [
        BASE,
        BASE.replace("lazy", "sleepy"),
        "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu",
    ]
    d = 32
    df = docs_df(spark, texts).select(
        "doc_id", hashed_embedding("text", d=d).alias("emb")
    )
    assert_plan(df, max_shuffles=0)
    got = {r["doc_id"]: np.asarray(r["emb"]) for r in df.collect()}

    def ref(text):
        v = np.zeros(d)
        for tok in text.split(" "):
            h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
            v[h % d] += 1.0 if (h >> 16) & 1 else -1.0
        n = np.linalg.norm(v)
        return v / n if n > 0 else v

    for i, text in enumerate(texts):
        np.testing.assert_allclose(got[i], ref(text), atol=1e-12)
        assert abs(np.linalg.norm(got[i]) - 1.0) < 1e-9

    cos = lambda a, b: float(a @ b)  # noqa: E731  (unit vectors)
    assert cos(got[0], got[1]) > 0.8          # near-duplicate texts
    assert cos(got[0], got[2]) < cos(got[0], got[1]) - 0.2  # unrelated


def test_hashed_embedding_feeds_knn(spark):
    """The text→vector bridge composes with the search stack: kNN over
    hashed embeddings ranks the near-duplicate of a query text first."""
    from faiss_metal_spark.functions.text import hashed_embedding
    from faiss_metal_spark.operators.knn import knn_search

    texts = [
        BASE,
        BASE.replace("lazy", "sleepy"),
        "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu",
        "uno dos tres cuatro cinco seis siete ocho nueve diez once doce",
    ]
    emb = docs_df(spark, texts).select(
        F.col("doc_id").alias("id"),
        hashed_embedding("text", d=64).cast("array<float>").alias("vec"),
    )
    q = emb.where("id = 0").selectExpr("id as qid", "vec")
    res = knn_search(emb, q, 2, metric="cosine", method="gemm").toPandas()
    assert res[res["rank"] == 0]["label"].iloc[0] == 0  # self first
    assert res[res["rank"] == 1]["label"].iloc[0] == 1  # near-dup second


def test_bm25_semantics(spark):
    """BM25: non-matching docs are absent; rare terms outscore common
    ones; more occurrences raise the score; longer docs are penalized
    at equal tf; scores match a closed-form reference."""
    import math

    from faiss_metal_spark.operators.text_search import bm25_scores

    texts = [
        "rare word here",                 # 0: has 'rare'
        "common stuff common filler",     # 1: has 'common'
        "common things again",            # 2: has 'common'
        "common common common yes",       # 3: 'common' x3
        "totally unrelated text block",   # 4: matches nothing
        "rare and common mixed content words padding padding padding",  # 5: both, longer
    ]
    out = {
        r["doc_id"]: (r["n_hit"], r["score"])
        for r in bm25_scores(docs_df(spark, texts), ["rare", "common"]).collect()
    }
    assert 4 not in out
    assert out[5][0] == 2 and all(out[i][0] == 1 for i in (0, 1, 2, 3))

    # closed-form reference
    N, dls = 6, [3.0, 4.0, 3.0, 4.0, 4.0, 9.0]
    avgdl = sum(len(t.split()) for t in texts) / N

    def bm(tf, df, dl, k1=1.2, b=0.75):
        idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert abs(out[0][1] - bm(1, 2, 3.0)) < 1e-9            # rare: df=2
    assert abs(out[3][1] - bm(3, 4, 4.0)) < 1e-9            # common x3: df=4
    assert abs(out[5][1] - (bm(1, 2, 9.0) + bm(1, 4, 9.0))) < 1e-9
    # rare (df=2) beats common (df=4) at identical tf and length
    assert out[0][1] > out[2][1]
    # higher tf beats lower tf for the same term
    assert out[3][1] > out[1][1]
    with pytest.raises(ValueError):
        bm25_scores(docs_df(spark, texts), [])


def test_bm25_single_scan_with_precomputed_stats(spark, tmp_path):
    """With stats=(N, avgdl) the scoring plan scans the corpus exactly
    once (the production shape); the lazy in-plan default adds a second
    tokenize-only pass and both give identical scores. No eager work
    happens at operator construction either way."""
    from faiss_metal_spark.operators.text_search import bm25_scores, corpus_stats

    texts = [
        "rare word here",
        "common stuff common filler",
        "common things again",
        "rare and common mixed content",
    ]
    path = str(tmp_path / "docs.parquet")
    docs_df(spark, texts).write.parquet(path)
    docs = spark.read.parquet(path)

    stats = corpus_stats(docs)
    one_scan = bm25_scores(docs, ["rare", "common"], stats=stats)
    plan1 = one_scan._jdf.queryExecution().executedPlan().toString()
    assert plan1.count("Scan parquet") == 1
    default = bm25_scores(docs, ["rare", "common"])
    plan2 = default._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("Scan parquet") == 2  # documented lazy fallback

    a = {r["doc_id"]: (r["n_hit"], r["score"]) for r in one_scan.collect()}
    b = {r["doc_id"]: (r["n_hit"], r["score"]) for r in default.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k][0] == b[k][0]
        assert abs(a[k][1] - b[k][1]) < 1e-12


def test_rrf_fuse_hybrid(spark):
    """RRF fusion: a label ranked well by BOTH lists beats labels each
    list ranks alone; scores match the closed form; sentinels drop."""
    from faiss_metal_spark.operators.text_search import rrf_fuse

    a = spark.createDataFrame(
        [(0, 0, 10), (0, 1, 11), (0, 2, 12), (0, 3, -1)],
        schema="qid long, rank int, label long",
    )
    b = spark.createDataFrame(
        [(0, 0, 20), (0, 1, 11), (0, 2, 21)],
        schema="qid long, rank int, label long",
    )
    got = {
        r["label"]: (r["rank"], r["rrf"])
        for r in rrf_fuse(a, b, k=10).collect()
    }
    assert -1 not in got
    # 11 appears in both lists (ranks 1 and 1) -> top fused result
    assert got[11][0] == 0
    assert abs(got[11][1] - 2 / 62) < 1e-12
    assert abs(got[10][1] - 1 / 61) < 1e-12
    # single-list entries ordered by their rank, ties by label
    assert got[10][0] == 1 and got[20][0] == 2


def test_hybrid_retrieval_end_to_end(spark):
    """Full hybrid pipeline: BM25 (sparse) + kNN over hashed embeddings
    (dense) fused with RRF. A doc that matches the query lexically AND
    semantically outranks docs strong on only one axis."""
    from faiss_metal_spark.functions.text import hashed_embedding
    from faiss_metal_spark.operators.knn import knn_search
    from faiss_metal_spark.operators.text_search import bm25_scores, rrf_fuse
    from pyspark.sql.window import Window

    texts = [
        "spark query engine with fast join and shuffle",   # 0: both axes
        "query engine internals",                          # 1: lexical only-ish
        "spark shuffle service deep dive tuning guide",    # 2: semantic-ish
        "cooking pasta with tomatoes and basil at home",   # 3: neither
    ]
    docs = docs_df(spark, texts)
    qtext = "spark query engine join"

    sparse = (
        bm25_scores(docs, qtext.split())
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            ) - 1,
        )
        .select(F.lit(0).cast("long").alias("qid"), "rank", F.col("doc_id").alias("label"))
    )
    emb = docs.select(
        F.col("doc_id").alias("id"),
        hashed_embedding("text", d=64).cast("array<float>").alias("vec"),
    )
    qdf = spark.createDataFrame([(qtext,)], "text string").select(
        F.lit(0).cast("long").alias("qid"),
        hashed_embedding("text", d=64).cast("array<float>").alias("vec"),
    )
    dense = knn_search(emb, qdf, 4, metric="cosine", method="gemm")

    fused = rrf_fuse(sparse, dense, k=4).orderBy("rank").toPandas()
    assert fused["label"].iloc[0] == 0          # strong on both axes
    assert fused["label"].iloc[-1] == 3         # strong on neither


def test_chunk_spans_boundaries(spark):
    """Chunking invariants: stride = chunk − overlap, every token
    covered, consecutive chunks overlap by exactly `overlap` (except a
    short tail), short docs yield one chunk, and bad params raise."""
    from faiss_metal_spark.functions.text import chunk_spans

    txt = " ".join(f"t{i}" for i in range(50))
    df = docs_df(spark, [txt, "short doc"]).select(
        "doc_id", F.explode(chunk_spans("text", chunk=16, overlap=4)).alias("c")
    ).select("doc_id", "c.chunk_id", "c.n_tok", "c.chunk")
    rows = df.collect()
    long = sorted(
        ((r["chunk_id"], r["n_tok"], r["chunk"].split(" "))
         for r in rows if r["doc_id"] == 0)
    )
    # n_chunks = ceil((50-4)/12) = 4
    assert [c[0] for c in long] == [0, 1, 2, 3]
    assert [c[1] for c in long] == [16, 16, 16, 14]
    for cid, n, toks in long:
        assert toks == [f"t{i}" for i in range(cid * 12, min(cid * 12 + 16, 50))]
        assert len(toks) == n
    # consecutive overlap = 4 tokens
    assert long[0][2][-4:] == long[1][2][:4]
    # short doc -> one chunk covering everything
    short = [r for r in rows if r["doc_id"] == 1]
    assert len(short) == 1 and short[0]["chunk"] == "short doc"

    with pytest.raises(ValueError):
        chunk_spans("text", chunk=8, overlap=8)


def test_pii_redaction(spark):
    """Planted PII of every class is counted and redacted; clean text
    passes through untouched; redaction is idempotent."""
    from faiss_metal_spark.functions.text import pii_counts, redact_pii

    dirty = (
        "contact john.doe+spam@example.co.uk or call +1 (555) 123-4567 "
        "from 192.168.1.100 ssn 123-45-6789 done"
    )
    clean = "no personal information in this sentence at all"
    df = docs_df(spark, [dirty, clean]).select(
        "doc_id",
        pii_counts("text").alias("n"),
        redact_pii("text").alias("red"),
    )
    rows = {r["doc_id"]: r for r in df.collect()}
    n = rows[0]["n"]
    assert (n["email"], n["phone"], n["ipv4"], n["ssn"]) == (1, 1, 1, 1)
    red = rows[0]["red"]
    for tok in ("<email>", "<phone>", "<ipv4>", "<ssn>"):
        assert tok in red
    assert "example.co.uk" not in red and "555" not in red
    assert "192.168" not in red and "123-45-6789" not in red
    assert rows[1]["red"] == clean
    assert all(v == 0 for v in rows[1]["n"].asDict().values())

    # idempotent: redacting redacted text changes nothing
    again = (
        df.select("doc_id", redact_pii("red").alias("r2"), "red")
        .where(F.col("r2") != F.col("red"))
        .count()
    )
    assert again == 0


def test_gopher_flags(spark):
    """Each Gopher rule trips on its designed failure mode and the
    conjunction keeps only the clean document."""
    from faiss_metal_spark.functions.text import gopher_flags

    good = " ".join(
        ["the quick brown fox jumps over a lazy dog in the field"] * 5
    )
    too_short = "tiny doc"
    long_words = " ".join(["pneumonoultramicroscopic"] * 60)
    symbol_heavy = " ".join(["the and for"] * 20 + ["###", "$$$", "!!!", "%%%", "&&&", "***", "@@@", "^^^"])
    no_stopwords = " ".join(f"w{i}xyz" for i in range(60))

    df = docs_df(
        spark, [good, too_short, long_words, symbol_heavy, no_stopwords]
    ).select("doc_id", gopher_flags("text").alias("g"))
    g = {r["doc_id"]: r["g"].asDict() for r in df.collect()}
    assert g[0]["keep"]
    assert not g[1]["n_tokens_ok"] and not g[1]["keep"]
    assert not g[2]["avg_len_ok"] and not g[2]["keep"]
    assert not g[3]["symbol_ok"] and not g[3]["keep"]
    assert not g[4]["stopword_ok"] and not g[4]["keep"]


def test_incremental_lsh_dedup_equals_batch(spark):
    """Delta-vs-index near-dedup equals batch lsh_candidate_pairs over
    corpus ∪ delta restricted to pairs touching the delta, and the
    appended index equals the batch band index of corpus ∪ delta."""
    from faiss_metal_spark.operators.dedup import (
        incremental_lsh_dedup,
        lsh_band_buckets,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    base = [
        "the quick brown fox jumps over the lazy dog tonight",
        "pack my box with five dozen liquor jugs right now",
        "sphinx of black quartz judge my vow said the king",
        "how vexingly quick daft zebras jump over fences",
    ]
    corpus_rows = [(i, base[i % 4] + f" tail{i // 4}") for i in range(24)]
    # delta: near-dups of corpus docs + an internal dup pair + a novel doc
    delta_rows = [
        (100, base[0] + " tail0"),            # exact dup of doc 0
        (101, base[1] + " tail1 extra word"), # near-dup of doc 5
        (102, "completely novel text about distributed quantized search engines"),
        (103, "completely novel text about distributed quantized search engines"),
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    delta = spark.createDataFrame(delta_rows, "doc_id long, text string")

    H, B = 8, 4
    index = lsh_band_buckets(
        minhash_signatures(corpus, num_hashes=H), num_hashes=H, bands=B
    )
    pairs, delta_bands = incremental_lsh_dedup(
        delta, index, num_hashes=H, bands=B
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}

    both = corpus.unionByName(delta)
    batch = lsh_candidate_pairs(
        minhash_signatures(both, num_hashes=H), num_hashes=H, bands=B
    )
    delta_ids = {r[0] for r in delta_rows}
    want = {
        (r["id_a"], r["id_b"])
        for r in batch.collect()
        if r["id_a"] in delta_ids or r["id_b"] in delta_ids
    }
    assert got == want and (100, 103) not in got and (102, 103) in got

    # index ∪ delta_bands == batch band index of corpus ∪ delta
    merged = index.unionByName(delta_bands)
    full = lsh_band_buckets(
        minhash_signatures(both, num_hashes=H), num_hashes=H, bands=B
    )
    a = {tuple(r) for r in merged.collect()}
    b = {tuple(r) for r in full.collect()}
    assert a == b


def test_incremental_simhash_dedup_equals_batch(spark):
    """Delta-vs-index SimHash near-dedup equals batch
    simhash_neardup_pairs over corpus ∪ delta restricted to pairs
    touching the delta; appended index equals the batch band index."""
    from faiss_metal_spark.operators.dedup import (
        incremental_simhash_dedup,
        simhash_band_buckets,
        simhash_neardup_pairs,
        simhash_signatures,
    )

    base = [
        "the quick brown fox jumps over the lazy dog tonight again",
        "pack my box with five dozen liquor jugs right now please",
        "sphinx of black quartz judge my vow said the old king",
    ]
    corpus_rows = [(i, base[i % 3] + f" tail{i // 3}") for i in range(18)]
    delta_rows = [
        (100, base[0] + " tail0"),                 # exact dup of doc 0
        (101, base[1] + " tail1 extra"),           # near-dup of doc 4
        (102, "utterly different content entirely novel material here"),
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    delta = spark.createDataFrame(delta_rows, "doc_id long, text string")

    index = simhash_band_buckets(simhash_signatures(corpus))
    pairs, delta_bands = incremental_simhash_dedup(delta, index, max_hamming=3)
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in pairs.collect()}

    both = corpus.unionByName(delta)
    batch = simhash_neardup_pairs(simhash_signatures(both), max_hamming=3)
    delta_ids = {r[0] for r in delta_rows}
    want = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in batch.collect()
        if r["id_a"] in delta_ids or r["id_b"] in delta_ids
    }
    assert got == want and any(a == 0 and b == 100 for a, b, _ in got)

    merged = {tuple(r) for r in index.unionByName(delta_bands).collect()}
    full = {
        tuple(r)
        for r in simhash_band_buckets(simhash_signatures(both)).collect()
    }
    assert merged == full


def test_token_budget_cap(spark):
    """Token-budgeted per-group assembly: cumulative tokens of the
    admitted set never exceed the budget, admission is by md5(id)
    order (deterministic), the crossing document is excluded, and
    composing with stratified_cap preserves the budget's answer when
    the count cap is not binding."""
    import pandas as pd
    from pyspark.sql import functions as F

    from faiss_metal_spark.functions.text import token_count
    from faiss_metal_spark.pipeline import stratified_cap, token_budget_cap

    rows = pd.DataFrame({
        "doc_id": range(40),
        "lang": ["a"] * 20 + ["b"] * 20,
        "text": [" ".join(["w"] * (5 + i % 7)) for i in range(40)],
    })
    docs = spark.createDataFrame(rows)
    out = token_budget_cap(docs, "lang", 40).toPandas()

    toks = {int(r.doc_id): 5 + int(r.doc_id) % 7 for r in rows.itertuples()}
    import hashlib
    for g, ids in (("a", range(20)), ("b", range(20, 40))):
        order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        cum, want = 0, []
        for i in order:
            cum += toks[i]
            if cum > 40:
                break
            want.append(i)
        got = sorted(out[out["lang"] == g]["doc_id"].tolist())
        assert got == sorted(want), (g, got, want)
        assert sum(toks[i] for i in got) <= 40

    # precomputed-count column path agrees with the text path
    pre = docs.withColumn("ntok", token_count("text"))
    out2 = token_budget_cap(pre, "lang", 40, token_count_col="ntok").toPandas()
    assert sorted(out2["doc_id"].tolist()) == sorted(out["doc_id"].tolist())

    # composition: a non-binding count cap first does not change the answer
    comp = token_budget_cap(stratified_cap(docs, "lang", 20), "lang", 40).toPandas()
    assert sorted(comp["doc_id"].tolist()) == sorted(out["doc_id"].tolist())


def test_token_budget_cap_quality_ordered(spark):
    """order_col admits best-first: the admitted set is the maximal
    prefix of the score-descending order within budget — low-score docs
    are the ones squeezed out."""
    import pandas as pd

    from faiss_metal_spark.pipeline import token_budget_cap

    rows = pd.DataFrame({
        "doc_id": range(10),
        "lang": ["a"] * 10,
        "text": [" ".join(["w"] * 10)] * 10,   # 10 tokens each
        "score": [float(i) for i in range(10)],  # 9 is best
    })
    docs = spark.createDataFrame(rows)
    out = token_budget_cap(docs, "lang", 35, order_col="score").toPandas()
    assert sorted(out["doc_id"].tolist()) == [7, 8, 9]  # top-3 fit 30 ≤ 35


def test_decontaminate_bloom_equals_exact(spark):
    """Bloom-prefiltered decontamination (r10, the
    eval-set-too-big-to-broadcast path): the Bloom filter has no false
    negatives and the exact verify join kills false positives, so the
    result must equal decontaminate() EXACTLY — fpp buys cost, never
    correctness. Also pinned: the filter genuinely filters (clean
    shingles mostly die before the join at the configured fpp), and
    the build/probe primitives agree (no false negatives by
    construction, measured fpp within 5x of nominal)."""
    import numpy as np

    from faiss_metal_spark.operators.bloom import (
        bloom_build,
        bloom_filter_rows,
        bloom_params,
    )
    from faiss_metal_spark.pipeline import decontaminate, decontaminate_bloom

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(300)]
    mk = lambda n: " ".join(rng.choice(vocab, size=n))  # noqa: E731
    ev_texts = [mk(20) for _ in range(20)]
    train_texts = [mk(25) for _ in range(60)]
    # plant contamination: splice eval fragments into some train docs
    train_texts[3] += " " + " ".join(ev_texts[0].split()[:5])
    train_texts[7] += " " + " ".join(ev_texts[5].split()[2:9])
    ev = docs_df(spark, ev_texts)
    train = docs_df(spark, train_texts)

    want = {r["id"]: r["n_shared"] for r in decontaminate(train, ev).collect()}
    got = {
        r["id"]: r["n_shared"]
        for r in decontaminate_bloom(train, ev, fpp=0.01).collect()
    }
    assert got == want and want  # identical, and contamination found

    # primitive-level: no false negatives; measured fpp sane
    members = spark.range(0, 5000).select(F.xxhash64("id").alias("sh"))
    bits, m, k = bloom_build(members, "sh", 5000, fpp=0.01)
    assert bloom_params(5000, 0.01)[0] == m
    kept = bloom_filter_rows(members, "sh", bits, m, k).count()
    assert kept == 5000  # every member passes
    probes = spark.range(100_000, 200_000).select(F.xxhash64("id").alias("sh"))
    fp = bloom_filter_rows(probes, "sh", bits, m, k).count()
    assert fp < 100_000 * 0.05, fp  # ~1% nominal, generous bound


def test_segment_dedup(spark):
    """Sub-document dedup: a boilerplate 4-token segment shared by two
    docs is caught even though the full documents are distinct; the
    trailing (<window)-token remainder participates too."""
    from faiss_metal_spark.operators.dedup import segment_dedup

    boiler = "copyright acme corp reserved"
    df = docs_df(
        spark,
        [
            boiler + " unique tail one extra",      # doc 0
            boiler + " other words entirely here",  # doc 1
            "totally unrelated document body text", # doc 2
            "short tail short tail",                # doc 3 (remainder dup below)
            "prefix words here pad short tail short tail",  # doc 4
        ],
    )
    out = {r["dup_key"]: r for r in segment_dedup(df, window=4).collect()}
    assert boiler in out
    assert out[boiler]["n_dups"] == 2 and out[boiler]["keeper"] == 0
    # doc 3's first window and doc 4's trailing remainder are the same
    # 4-token segment — remainders are kept, not dropped
    assert "short tail short tail" in out
    assert out["short tail short tail"]["keeper"] == 3
    # distinct docs produce no whole-doc false positives
    assert not any(k.startswith("totally") for k in out)


def test_c4_clean_lines(spark):
    """C4 line rules (Raffel et al. 2020 §2.2): terminal punctuation,
    min words, boilerplate markers — one codegen projection."""
    from faiss_metal_spark.functions.text import c4_clean_lines

    doc = "\n".join(
        [
            "This is a good sentence that survives.",   # keeps
            "short line",                                # no punct, short
            "Accept our cookie policy now.",             # marker
            "Another fine line stays here!",             # keeps
            'He said "stop".',                           # keeps (quote ok? ends .)
            "Enable JavaScript to continue.",            # marker
            "no terminal punctuation here",              # dropped
        ]
    )
    df = docs_df(spark, [doc])
    out = df.select(c4_clean_lines("text").alias("t")).collect()[0]["t"]
    lines = out.split("\n")
    assert lines == [
        "This is a good sentence that survives.",
        "Another fine line stays here!",
        'He said "stop".',
    ]
    # empty result when nothing survives; marker list is a parameter
    none = docs_df(spark, ["all lowercase no punct"]).select(
        c4_clean_lines("text").alias("t")
    ).collect()[0]["t"]
    assert none == ""
    keep_all = df.select(
        c4_clean_lines("text", min_words=1, bad_markers=[],
                       require_terminal_punct=False).alias("t")
    ).collect()[0]["t"]
    assert keep_all == doc  # trimmed lines identical here

    # C4 drops cookie-POLICY phrases, not the bare word: a cookie
    # recipe survives, and markers match on word boundaries so
    # "javascript" never fires inside a longer token.
    benign = "\n".join(
        [
            "Try this chocolate cookie recipe at home tonight.",  # keeps
            "This site uses cookies to track you.",               # marker
            "The library avascriptjavascriptify is unrelated ok.",  # keeps
            "Please enable javascript in your browser.",           # marker
        ]
    )
    out2 = docs_df(spark, [benign]).select(
        c4_clean_lines("text").alias("t")
    ).collect()[0]["t"]
    assert out2.split("\n") == [
        "Try this chocolate cookie recipe at home tonight.",
        "The library avascriptjavascriptify is unrelated ok.",
    ]


def test_ngram_candidated_equals_exact_on_candidates(spark):
    """The r13 'lsh' lane contract: candidate-restricted exact-Jaccard
    verification produces the SAME values the uncandidated all-pairs
    form produces for those pairs (sizes come from intact per-doc
    shingle sets; the df-cutoff ban stays corpus-defined), and the
    materialize_shingles knob never changes values."""
    rng = __import__("random").Random(7)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choices(vocab, k=30)) for _ in range(40)]
    df = docs_df(spark, texts)
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, shingle_size=3).collect()
    }
    assert exact  # random short-vocab docs share shingles
    cand_pairs = list(exact)[:10]
    cand = spark.createDataFrame(cand_pairs, schema="id_a long, id_b long")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, pair_candidates=cand, shingle_size=3
        ).collect()
    }
    assert got == {p: exact[p] for p in cand_pairs}
    mat = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, shingle_size=3, materialize_shingles=True
        ).collect()
    }
    assert mat == exact
