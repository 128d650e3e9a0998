"""Property-based fuzz of the text-pipeline operators: chunking must
cover and reconstruct any token stream for any (chunk, overlap); hashed
embeddings must be exactly bag-of-words additive; shard_pack's sequence
arithmetic must account for every token. Invariants for ANY input, not
just curated examples."""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from faiss_metal_spark.session import get_spark

        _spark = get_spark("faiss-metal-spark-tests")
    return _spark


_SET = settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)


@_SET
@given(
    n_tok=st.integers(1, 120),
    chunk=st.integers(2, 40),
    overlap_frac=st.floats(0.0, 0.9),
    seed=st.integers(0, 2**16),
)
def test_chunk_spans_property(n_tok, chunk, overlap_frac, seed):
    """For any (tokens, chunk, overlap): chunk 0 starts at token 0,
    consecutive chunks advance by stride, every token appears in ≥1
    chunk, de-overlapped concatenation reconstructs the document, and
    every chunk except possibly the last is full-size."""
    from faiss_metal_spark.functions.text import chunk_spans

    spark = _get_spark()
    overlap = min(int(overlap_frac * chunk), chunk - 1)
    stride = chunk - overlap
    toks = [f"w{seed}x{i}" for i in range(n_tok)]
    df = spark.createDataFrame(
        [(0, " ".join(toks))], schema="doc_id long, text string"
    ).select(F.explode(chunk_spans("text", chunk=chunk, overlap=overlap)).alias("c"))
    rows = sorted(
        (r["c"]["chunk_id"], r["c"]["n_tok"], r["c"]["chunk"].split(" "))
        for r in df.collect()
    )
    n_chunks = max(1, -(-max(n_tok - overlap, 1) // stride))
    assert [r[0] for r in rows] == list(range(n_chunks))
    for cid, n, ctoks in rows:
        start = cid * stride
        assert ctoks == toks[start : start + chunk]
        assert n == len(ctoks)
        if cid < n_chunks - 1:
            assert n == chunk
    # de-overlapped reconstruction
    rebuilt = list(rows[0][2])
    for cid, n, ctoks in rows[1:]:
        rebuilt.extend(ctoks[overlap:])
    assert rebuilt == toks


@_SET
@given(
    n_a=st.integers(1, 40),
    n_b=st.integers(1, 40),
    d=st.sampled_from([8, 32, 64]),
    seed=st.integers(0, 2**16),
)
def test_hashed_embedding_additive_property(n_a, n_b, d, seed):
    """Unnormalized hashed embeddings are exactly additive over token
    concatenation and invariant to token order (bag-of-words)."""
    from faiss_metal_spark.functions.text import hashed_embedding

    spark = _get_spark()
    rng = np.random.default_rng(seed)
    vocab = [f"tok{i}" for i in range(20)]
    a = [vocab[i] for i in rng.integers(0, 20, n_a)]
    b = [vocab[i] for i in rng.integers(0, 20, n_b)]
    both = a + b
    shuffled = list(both)
    rng.shuffle(shuffled)
    df = spark.createDataFrame(
        [
            (0, " ".join(a)),
            (1, " ".join(b)),
            (2, " ".join(both)),
            (3, " ".join(shuffled)),
        ],
        schema="doc_id long, text string",
    ).select("doc_id", hashed_embedding("text", d=d, normalize=False).alias("e"))
    e = {r["doc_id"]: np.asarray(r["e"]) for r in df.collect()}
    np.testing.assert_allclose(e[0] + e[1], e[2], atol=1e-12)
    np.testing.assert_allclose(e[2], e[3], atol=1e-12)


@_SET
@given(
    n_docs=st.integers(1, 120),
    n_shards=st.sampled_from([1, 2, 4, 8]),
    seq_len=st.sampled_from([16, 64, 256]),
    seed=st.integers(0, 2**16),
)
def test_shard_pack_property(n_docs, n_shards, seq_len, seed):
    """For any corpus: per-shard positions are a dense permutation, the
    final doc's span ends exactly at the shard's token total, and the
    number of sequences per shard is ceil(total_tokens / seq_len)."""
    from faiss_metal_spark.pipeline import shard_pack

    spark = _get_spark()
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "doc_id": rng.choice(10 * n_docs, size=n_docs, replace=False),
            "text": [
                " ".join(f"w{j}" for j in range(rng.integers(1, 50)))
                for _ in range(n_docs)
            ],
        }
    )
    out = shard_pack(
        spark.createDataFrame(pdf), n_shards=n_shards, seq_len=seq_len
    ).toPandas()
    assert len(out) == n_docs
    for shard, g in out.groupby("shard"):
        g = g.sort_values("pos")
        assert g["pos"].tolist() == list(range(len(g)))
        total = int(g["n_tok"].sum())
        last = g.iloc[-1]
        assert int(last["tok_off"] + last["n_tok"]) == total
        n_seq = -(-total // seq_len) if total else 1
        assert int(g["last_seq"].max()) == n_seq - 1


def test_normalize_for_dedup(spark):
    """Dedup preprocessing canon: case/accents/controls/whitespace all
    fold so near-identical strings hash identically; idempotent;
    Catalyst-only (no Python stage in the plan)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from faiss_metal_spark.functions.text import normalize_for_dedup

    rows = pd.DataFrame({
        "id": [0, 1, 2, 3],
        "text": [
            "  H\u00e9llo\t\tW\u00f6rld  ",
            "hello world",
            "HELLO   WORLD",
            "distinct content",
        ],
    })
    df = spark.createDataFrame(rows)
    out = df.select("id", normalize_for_dedup("text").alias("t")).orderBy("id").toPandas()
    assert out["t"][0] == "hello world" == out["t"][1] == out["t"][2]
    assert out["t"][3] == "distinct content"

    # idempotent
    twice = df.select(
        normalize_for_dedup(normalize_for_dedup("text")).alias("t2"),
        normalize_for_dedup("text").alias("t1"),
    ).toPandas()
    assert (twice["t1"] == twice["t2"]).all()

    plan = (
        df.select(normalize_for_dedup("text"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    # accent folding is optional
    keep = df.select(normalize_for_dedup("text", fold_accents=False).alias("t")).toPandas()
    assert keep["t"][0] == "h\u00e9llo w\u00f6rld"
