"""r15 F.expr rewrites: the SQL-string builders must be value-identical
to the r14 Column-API builders they replaced (the rewrite removes
driver-side py4j construction cost — doc_profile measured 1.09 s of
pure plan building — and MUST NOT change any computed value; the
oracle hash gate depends on it).

Two layers:
- functions with an isinstance dispatch (hashed_embedding,
  quality_score, doc_fingerprint, repetition_ratio,
  quality_model_score): str input (new F.expr path) vs Column input
  (the old path, kept as fallback) on the same rows.
- operators rewritten in place (repetition_profile, dsir_weights,
  bigram_lm_scores): compared against verbatim copies of the r14
  Column-API implementations below.
"""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame, functions as F

from faiss_metal_spark.functions.text import (
    doc_fingerprint,
    hashed_embedding,
    quality_score,
    repetition_ratio,
    token_hash32,
)
from faiss_metal_spark.operators.corpus_quality import (
    _tok_col,
    bigram_lm_scores,
    dsir_weights,
    repetition_profile,
)
from faiss_metal_spark.operators.quality_model import quality_model_score

ROWS = [
    (0, "the quick brown fox jumps over the lazy dog the quick brown fox", "en"),
    (1, "", "en"),
    (2, "solo", "de"),
    (3, "a a a a a a a a a a a a", "en"),
    (4, "uno dos tres cuatro cinco seis siete ocho nueve diez once doce", "es"),
    (5, "x y", "fr"),
    (6, "p q r s t p q r s t p q r s t p q r s t", "en"),
    (7, "one two three four five", "en"),
]

_QM_W = [((-1) ** i) * (1.0 + i / 16.0) for i in range(16)] + [0.1]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string, lang string")


# ---------------------------------------------------------------------------
# dispatch functions: str (F.expr) path ≡ Column (r14) path
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "fn",
    [
        lambda c: hashed_embedding(c, d=16, normalize=False),
        lambda c: hashed_embedding(c, d=16, normalize=True),
        lambda c: hashed_embedding(c, d=64),
        quality_score,
        doc_fingerprint,
        lambda c: repetition_ratio(c, 3),
        lambda c: repetition_ratio(c, 2),
        lambda c: quality_model_score(_QM_W, c),
    ],
    ids=[
        "hashed_embedding_raw16",
        "hashed_embedding_norm16",
        "hashed_embedding_norm64",
        "quality_score",
        "doc_fingerprint",
        "repetition_ratio3",
        "repetition_ratio2",
        "quality_model_score",
    ],
)
def test_expr_path_equals_column_path(docs, fn):
    new = docs.select("doc_id", fn("text").alias("v")).orderBy("doc_id").collect()
    old = (
        docs.select("doc_id", fn(F.col("text")).alias("v"))
        .orderBy("doc_id")
        .collect()
    )
    assert new == old


# ---------------------------------------------------------------------------
# r14 reference implementations (verbatim Column-API copies)
# ---------------------------------------------------------------------------


def _gram_structs_r14(tt, n: int):
    return F.when(
        F.size(tt) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tt) - n),
            lambda i: F.struct(
                i.alias("pos"),
                F.concat_ws(" ", F.slice(tt, i + 1, n)).alias("g"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,g:string>>"))


def repetition_profile_r14(
    docs: DataFrame, text_col="text", id_col="doc_id", top_ns=(2, 3, 4), dup_n=5
) -> DataFrame:
    base = docs.select(
        F.col(id_col).alias("doc_id"), _tok_col(text_col).alias("tt")
    ).select("doc_id", "tt", F.size("tt").alias("n_tokens"))

    def _tag(n: int):
        return lambda s: F.struct(
            F.lit(n).alias("n"), s["pos"].alias("pos"), s["g"].alias("g")
        )

    tagged = F.flatten(
        F.array(
            *[
                F.transform(_gram_structs_r14(F.col("tt"), n), _tag(n))
                for n in (*top_ns, dup_n)
            ]
        )
    )
    grams = base.select(
        "doc_id", "n_tokens", F.explode(tagged).alias("s")
    ).select("doc_id", "n_tokens", "s.n", "s.pos", "s.g")
    counts = grams.groupBy("doc_id", "n", "g").agg(
        F.count(F.lit(1)).alias("cnt"), F.first("n_tokens").alias("n_tokens")
    )
    top = (
        counts.where(F.col("n").isin(list(top_ns)))
        .groupBy("doc_id", "n")
        .agg(F.max("cnt").alias("maxc"), F.first("n_tokens").alias("n_tokens"))
        .groupBy("doc_id")
        .agg(
            F.first("n_tokens").alias("n_tokens"),
            *[
                F.max(
                    F.when(
                        F.col("n") == n,
                        (F.col("maxc") * n).cast("double") / F.col("n_tokens"),
                    )
                ).alias(f"top{n}_frac")
                for n in top_ns
            ],
        )
    )
    dup_grams = counts.where((F.col("n") == dup_n) & (F.col("cnt") >= 2)).select(
        "doc_id", "g"
    )
    covered = (
        grams.where(F.col("n") == dup_n)
        .join(dup_grams, ["doc_id", "g"], "left_semi")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + dup_n - 1)).alias("p"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("cov"))
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(top.drop("n_tokens"), "doc_id", "left")
        .join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            *[
                F.coalesce(F.col(f"top{n}_frac"), F.lit(0.0)).alias(f"top{n}_frac")
                for n in top_ns
            ],
            (
                F.coalesce(F.col("cov"), F.lit(0)).cast("double") / F.col("n_tokens")
            ).alias(f"dup{dup_n}_frac"),
        )
    )


def dsir_weights_r14(
    docs: DataFrame, target, buckets=256, text_col="text", id_col="doc_id"
) -> DataFrame:
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        target.alias("_is_target"),
        F.explode(_tok_col(text_col)).alias("t"),
    ).select(
        "doc_id",
        "_is_target",
        F.pmod(token_hash32(F.col("t")), F.lit(buckets)).alias("b"),
    )
    stats = tok.groupBy("b").agg(
        F.sum(F.when(F.col("_is_target"), 1).otherwise(0)).alias("tc"),
        F.count(F.lit(1)).alias("rc"),
    )
    totals = tok.agg(
        F.sum(F.when(F.col("_is_target"), 1).otherwise(0)).alias("tt"),
        F.count(F.lit(1)).alias("rt"),
    )
    scored = (
        tok.join(F.broadcast(stats), "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            (
                F.log((F.coalesce(F.col("tc"), F.lit(0)) + F.lit(1)).cast("double"))
                - F.log((F.col("tt") + F.lit(buckets)).cast("double"))
                - F.log((F.coalesce(F.col("rc"), F.lit(0)) + F.lit(1)).cast("double"))
                + F.log((F.col("rt") + F.lit(buckets)).cast("double"))
            ).alias("lr"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tok"), F.sum("lr").alias("weight")
    )


def bigram_lm_scores_r14(
    docs: DataFrame, train=None, alpha=1.0, text_col="text", id_col="doc_id"
) -> DataFrame:
    if train is None:
        train = docs

    def _bigrams(df: DataFrame, keep_id: bool) -> DataFrame:
        tt = _tok_col(text_col)
        pairs = F.when(
            F.size(tt) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(tt) - 2),
                lambda i: F.struct(
                    F.element_at(tt, i + 1).alias("a"),
                    F.element_at(tt, i + 2).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        cols = [F.col(id_col).alias("doc_id")] if keep_id else []
        return df.select(*cols, F.explode(pairs).alias("p")).select(
            *(["doc_id"] if keep_id else []),
            F.col("p.a").alias("a"),
            F.col("p.b").alias("b"),
        )

    c2 = _bigrams(train, keep_id=False).groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("c2")
    )
    c1 = c2.groupBy("a").agg(F.sum("c2").alias("c1"))
    vocab = train.select(
        F.explode(_tok_col(text_col)).alias("t")
    ).agg(F.countDistinct("t").alias("v"))
    scored = (
        _bigrams(docs, keep_id=True)
        .join(c2, ["a", "b"], "left")
        .join(c1, "a", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            (
                F.log((F.coalesce(F.col("c2"), F.lit(0)) + F.lit(float(alpha))))
                - F.log(
                    F.coalesce(F.col("c1"), F.lit(0))
                    + F.lit(float(alpha)) * F.col("v")
                )
            ).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (-F.avg("lp")).alias("cross_entropy"),
    )


def _sorted_rows(df: DataFrame):
    return sorted(df.collect(), key=lambda r: tuple(str(v) for v in r))


def test_repetition_profile_equiv(docs):
    new, old = repetition_profile(docs), repetition_profile_r14(docs)
    assert new.schema == old.schema
    assert _sorted_rows(new) == _sorted_rows(old)


def test_dsir_weights_equiv(docs):
    tgt = F.col("lang") == "en"
    new = dsir_weights(docs, tgt, buckets=64)
    old = dsir_weights_r14(docs, tgt, buckets=64)
    assert new.schema == old.schema
    assert _sorted_rows(new) == _sorted_rows(old)


def test_bigram_lm_scores_equiv(docs):
    """Per-bigram lp values are bit-identical old vs new (verified by
    joining both scored stages during development), but the final
    avg() sums them in a plan-dependent partition order, so
    cross_entropy can differ in the last ulp — compare n_bigrams
    exactly and cross_entropy to 1e-12 relative (the declared
    doc_profile key rounds it to 4dp, which absorbs this entirely)."""
    import math

    new, old = bigram_lm_scores(docs), bigram_lm_scores_r14(docs)
    assert new.schema == old.schema
    n = {r.doc_id: r for r in new.collect()}
    o = {r.doc_id: r for r in old.collect()}
    assert n.keys() == o.keys()
    for k in n:
        assert n[k].n_bigrams == o[k].n_bigrams
        assert math.isclose(
            n[k].cross_entropy, o[k].cross_entropy, rel_tol=1e-12
        ), (k, n[k], o[k])


# ---------------------------------------------------------------------------
# stratified_cap: deterministic sub-bucket phase 1 (r15 retry-safety fix)
# ---------------------------------------------------------------------------


def _cap_reference(spark, rows, group_col, n):
    """Global definition: top-n per group by (md5(id), id)."""
    from pyspark.sql.window import Window

    df = spark.createDataFrame(rows, "doc_id long, g string")
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n)
        .drop("_rk")
    )


def test_stratified_cap_matches_global_definition(spark):
    from faiss_metal_spark.pipeline import stratified_cap

    rows = [(i, f"g{i % 3}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, g string")
    got = _sorted_rows(stratified_cap(df, "g", 17))
    want = _sorted_rows(_cap_reference(spark, rows, "g", 17))
    assert got == want


def test_stratified_cap_partitioning_invariant(spark):
    """The kept set must not depend on physical partitioning (the
    spark_partition_id() phase-1 key this fix replaces was stable only
    per-layout; the xxhash64 sub-bucket is stable, period)."""
    from faiss_metal_spark.pipeline import stratified_cap

    rows = [(i * 7 % 1000, f"g{i % 5}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, g string")
    a = _sorted_rows(stratified_cap(df.repartition(1), "g", 9))
    b = _sorted_rows(stratified_cap(df.repartition(13, "doc_id"), "g", 9))
    c = _sorted_rows(stratified_cap(df.repartition(32), "g", 9))
    assert a == b == c
