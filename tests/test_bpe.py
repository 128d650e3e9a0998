"""Distributed BPE training/encoding vs a pure-Python reference.

No SQL-oracle row (iterative global-argmax training); these tests are
the correctness pin (COVERAGE.md): merge-for-merge equality with a
reference trainer on random corpora, encode round-trip, and the
vocab-sized-encode contract."""

from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from faiss_metal_spark.operators.bpe import bpe_encode, bpe_train


def _ref_train(texts, num_merges):
    """Reference BPE trainer: word-freq table, best pair by (count desc,
    pair lexicographic asc), greedy left-to-right application."""
    words = Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {w: list(w) for w in words}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for w, syms in vocab.items():
            f = words[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _ = best
        merges.append((a, b))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def _ref_encode(word, merges):
    ranks = {p: i for i, p in enumerate(merges)}
    syms = list(word)
    while len(syms) >= 2:
        cand = [
            (ranks[(x, y)], i)
            for i, (x, y) in enumerate(zip(syms, syms[1:]))
            if (x, y) in ranks
        ]
        if not cand:
            break
        _, i = min(cand)
        a, b = syms[i], syms[i + 1]
        out, j = [], 0
        while j < len(syms):
            if j < len(syms) - 1 and syms[j] == a and syms[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


@pytest.fixture(scope="module")
def texts():
    rng = np.random.default_rng(17)
    vocab = ["low", "lower", "lowest", "new", "newer", "wide", "wider", "widest"]
    return [" ".join(rng.choice(vocab, size=12)) for _ in range(50)]


def test_bpe_train_matches_reference(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = bpe_train(df, num_merges=15)
    exp = _ref_train(texts, 15)
    assert got == exp, f"\ngot {got}\nexp {exp}"


def test_bpe_encode_matches_reference_and_roundtrips(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    merges = bpe_train(df, num_merges=10)
    enc = bpe_encode(df, merges).toPandas().set_index("doc_id")
    for i, t in enumerate(texts):
        exp = [tok for w in t.split(" ") for tok in _ref_encode(w, merges)]
        got = list(enc.loc[i].tokens)
        assert got == exp
        # lossless: concatenating tokens rebuilds the text sans spaces
        assert "".join(got) == t.replace(" ", "")
        assert enc.loc[i].n_tokens == len(exp)


def test_bpe_learns_frequent_subwords(spark, texts):
    """'low'/'wide'-family corpora must learn 'lo'→'low'-style merges:
    after enough merges, whole frequent words become single tokens."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    merges = bpe_train(df, num_merges=25)
    vocab_tokens = {a + b for a, b in merges}
    assert "low" in vocab_tokens or "wide" in vocab_tokens
    enc = bpe_encode(df, merges)
    avg = enc.agg(F.avg("n_tokens")).collect()[0][0]
    n_words = 12
    assert avg < 2.5 * n_words  # way below character count (~50)


def test_bpe_encode_plan_is_vocab_bounded(spark, texts):
    """The Python encode UDF must sit on the DISTINCT-words side of a
    broadcast join, never on the corpus side."""
    from faiss_metal_spark.plans.report import explain_report

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    merges = bpe_train(df, num_merges=5)
    r = explain_report(bpe_encode(df, merges))
    assert "BroadcastExchange" in r.plan or r.n_broadcasts >= 1
