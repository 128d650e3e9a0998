"""corpus_quality operators pinned against pandas reimplementations.

The driver-gate oracles live in __spark_entry__ (doc_profile columns,
winnow_fingerprints 'dupspan' rows); these tests pin semantics on
random data with planted structure: repeated n-grams, cross-doc
duplicated runs, skewed language mix, plus the short-doc edge cases
(docs below the gram length must produce 0 fractions / no spans).
"""

import hashlib
import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from faiss_metal_spark.operators.corpus_quality import (
    bigram_lm_scores,
    dsir_weights,
    duplicate_spans,
    repetition_profile,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(5)
    vocab = ["a", "b", "c", "d", "e"]
    docs = []
    for i in range(40):
        toks = list(rng.choice(vocab, size=int(rng.integers(3, 30))))
        if i % 7 == 0:  # plant a cross-doc duplicated 8-token run
            toks = toks[:5] + ["x", "y", "z", "w", "q", "r", "s", "t"] + toks[5:]
        docs.append((i, " ".join(toks), "en" if i % 3 else "de"))
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    return docs, df


def test_repetition_profile_matches_pandas(spark, corpus):
    docs, df = corpus
    rp = repetition_profile(df).toPandas().set_index("doc_id")
    for did, text, _ in docs:
        tt = text.split(" ")
        nt = len(tt)
        row = rp.loc[did]
        assert row.n_tokens == nt
        for n in (2, 3, 4):
            grams = [" ".join(tt[j : j + n]) for j in range(nt - n + 1)] if nt >= n else []
            exp = (max(Counter(grams).values()) * n / nt) if grams else 0.0
            assert abs(row[f"top{n}_frac"] - exp) < 1e-12
        n = 5
        grams = [" ".join(tt[j : j + n]) for j in range(nt - n + 1)] if nt >= n else []
        c = Counter(grams)
        cov = set()
        for j, g in enumerate(grams):
            if c[g] >= 2:
                cov.update(range(j, j + n))
        assert abs(row["dup5_frac"] - len(cov) / nt) < 1e-12


def test_duplicate_spans_matches_pandas(spark, corpus):
    docs, df = corpus
    n = 8
    gmap = Counter()
    docgrams = {}
    for did, text, _ in docs:
        tt = text.split(" ")
        gs = [(j, " ".join(tt[j : j + n])) for j in range(len(tt) - n + 1)]
        docgrams[did] = gs
        gmap.update(g for _, g in gs)
    exp_spans = []
    for did, *_ in docs:
        cov = sorted(
            {p for j, g in docgrams[did] if gmap[g] >= 2 for p in range(j, j + n)}
        )
        if not cov:
            continue
        start = prev = cov[0]
        for p in cov[1:]:
            if p != prev + 1:
                exp_spans.append((did, start, prev, prev - start + 1))
                start = p
            prev = p
        exp_spans.append((did, start, prev, prev - start + 1))
    got = (
        duplicate_spans(df, n=n)
        .toPandas()
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        sorted(exp_spans), columns=["doc_id", "span_start", "span_end", "span_tokens"]
    )
    assert len(got) > 0  # the planted run must be found
    assert got.shape == exp.shape and (got.values == exp.values).all()


def test_duplicate_spans_materialize_grams_identical(spark, corpus):
    """materialize_grams=True (r14: one explode+hash pass instead of one
    per plan branch) is a physical-plan change only — spans identical."""
    _, df = corpus
    cols = ["doc_id", "span_start", "span_end", "span_tokens"]
    base = (
        duplicate_spans(df, n=8)
        .toPandas()[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    ck = (
        duplicate_spans(df, n=8, materialize_grams=True)
        .toPandas()[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    assert base.shape == ck.shape and (base.values == ck.values).all()


def test_dsir_weights_match_pandas(spark, corpus):
    docs, df = corpus
    B = 64

    def h(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % B

    tc, rc = Counter(), Counter()
    for _, text, lang in docs:
        for t in text.split(" "):
            b = h(t)
            rc[b] += 1
            if lang == "en":
                tc[b] += 1
    tt, rt = sum(tc.values()), sum(rc.values())
    got = dsir_weights(df, F.col("lang") == "en", buckets=B).toPandas().set_index(
        "doc_id"
    )
    for did, text, _ in docs:
        exp = sum(
            math.log((tc[h(t)] + 1) / (tt + B)) - math.log((rc[h(t)] + 1) / (rt + B))
            for t in text.split(" ")
        )
        assert abs(got.loc[did].weight - exp) < 1e-9
        assert got.loc[did].n_tok == len(text.split(" "))


def test_bigram_lm_matches_pandas(spark, corpus):
    docs, df = corpus
    c2, c1 = Counter(), Counter()
    vocab = set()
    for _, text, _ in docs:
        tt = text.split(" ")
        vocab.update(tt)
        for a, b in zip(tt, tt[1:]):
            c2[(a, b)] += 1
            c1[a] += 1
    V = len(vocab)
    got = bigram_lm_scores(df).toPandas().set_index("doc_id")
    for did, text, _ in docs:
        tt = text.split(" ")
        if len(tt) < 2:
            assert did not in got.index
            continue
        lps = [
            math.log(c2[(a, b)] + 1.0) - math.log(c1[a] + 1.0 * V)
            for a, b in zip(tt, tt[1:])
        ]
        assert got.loc[did].n_bigrams == len(lps)
        assert abs(got.loc[did].cross_entropy - (-sum(lps) / len(lps))) < 1e-9


def test_bigram_lm_flags_off_distribution_docs(spark):
    """A doc whose bigrams never occur in the train corpus must score a
    strictly higher cross-entropy than in-distribution docs (the CCNet
    filtering property), and a 1-token doc is absent from the result."""
    rows = [(i, "the quick brown fox jumps over the lazy dog", "en") for i in range(10)]
    rows.append((97, "zzz qqq www rrr zzz qqq www rrr", "en"))
    rows.append((98, "solo", "en"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    train = df.where(F.col("doc_id") < 10)
    got = bigram_lm_scores(df, train=train).toPandas().set_index("doc_id")
    assert 98 not in got.index
    assert got.loc[97].cross_entropy > got.loc[0].cross_entropy


def test_corpus_quality_plans_stay_jvm_side(spark, corpus):
    """Plan discipline: every corpus_quality operator is pure Catalyst
    (no Python stage); dsir broadcasts its bucket stats + totals."""
    from faiss_metal_spark.plans.report import assert_plan, explain_report

    _, df = corpus
    assert not explain_report(repetition_profile(df)).has_python_stage
    assert not explain_report(duplicate_spans(df, n=8)).has_python_stage
    assert not explain_report(bigram_lm_scores(df)).has_python_stage
    r = assert_plan(dsir_weights(df, F.col("lang") == "en"), min_broadcasts=2)
    assert not r.has_python_stage


def test_dsir_target_docs_score_higher(spark):
    """Directional sanity: docs drawn from the target domain's
    vocabulary must score a higher per-token weight than off-domain
    docs (the resampling property the operator exists for). Vocab is
    lang-correlated here so the gap is structural, not noise."""
    rng = np.random.default_rng(11)
    en_v = ["alpha", "beta", "gamma"]
    de_v = ["eins", "zwei", "drei"]
    rows = []
    for i in range(30):
        en = i % 2 == 0
        vocab = (en_v if en else de_v) + ["shared"]
        toks = list(rng.choice(vocab, size=20))
        rows.append((i, " ".join(toks), "en" if en else "de"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    w = dsir_weights(df, F.col("lang") == "en", buckets=64).toPandas()
    w["is_en"] = w.doc_id % 2 == 0
    per_tok = w.weight / w.n_tok
    assert per_tok[w.is_en].min() > per_tok[~w.is_en].max()
