"""Distributed BPE tokenizer training (Sennrich et al. 2016).

The training-data pipeline's missing bookend: the repo counts tokens
(``bpe_token_count`` approximates GPT-2 segmentation with a regex) but
could not LEARN a vocabulary. This module trains byte-pair-encoding
merges over a corpus and encodes text with them, with the scale
discipline a 100 TB corpus demands:

- **Training state is the word vocabulary, not the corpus.** The one
  corpus-scale pass is the word-frequency aggregation (map-side
  combined groupBy). Every merge iteration after that operates on the
  (word, freq, symbols) vocabulary table — the same reduction every
  serious BPE trainer (subword-nmt, HF tokenizers) applies, here as a
  small DataFrame so it still distributes when the vocabulary itself
  is huge (web-scale multilingual corpora).
- **Each iteration is one bounded job**: explode adjacent symbol
  pairs weighted by word freq → groupBy sum → global argmax with a
  deterministic tie-break (max count, then lexicographic pair) → a
  1-row collect; the merge applies to the symbol arrays as a pure
  Catalyst ``aggregate`` fold (greedy left-to-right, the standard BPE
  application order). The vocab is localCheckpoint-ed per iteration so
  plan depth stays constant across merges.
- **Encoding re-uses the vocabulary trick**: distinct words encode
  once (Arrow-batched UDF over vocab-sized input — the only Python in
  this module, deliberately bounded by |vocab|, never |corpus|), then
  a broadcast join maps corpus words to their token arrays.

Semantics (ours, fixed and deterministic): pre-tokenize on single
spaces (corpus convention throughout this repo); words split to
single characters; no end-of-word marker (documents here have no
cross-word ambiguity — a marker would be a one-line change in
``_chars``); ties on pair count break lexicographically.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_ACC = "struct<out:array<string>,carry:string>"


def _merge_fold(symbols: Column, a: str, b: str) -> Column:
    """Apply one merge rule (a,b)→a+b greedily left-to-right as a
    Catalyst aggregate fold. ``carry`` holds the last unmerged symbol;
    a match flushes the merged token with an empty carry."""
    al, bl, abl = F.lit(a), F.lit(b), F.lit(a + b)
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("carry"),
    )
    step = lambda acc, s: F.when(  # noqa: E731
        (acc["carry"] == al) & (s == bl),
        F.struct(
            F.concat(acc["out"], F.array(abl)).alias("out"),
            F.lit(None).cast("string").alias("carry"),
        ),
    ).otherwise(
        F.struct(
            F.when(
                acc["carry"].isNotNull(), F.concat(acc["out"], F.array(acc["carry"]))
            )
            .otherwise(acc["out"])
            .alias("out"),
            s.alias("carry"),
        )
    )
    finish = lambda acc: F.when(  # noqa: E731
        acc["carry"].isNotNull(), F.concat(acc["out"], F.array(acc["carry"]))
    ).otherwise(acc["out"])
    return F.aggregate(symbols, init.cast(_ACC), step, finish)


def bpe_train(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merge rules over the corpus. Returns the
    ordered merge list [(a, b), ...] (rank = list position, the encode
    priority). Deterministic for a fixed corpus."""
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    vocab = words.select(
        "freq", F.split(F.col("w"), "").alias("syms")
    ).localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = vocab.select(
            "freq",
            F.explode(
                F.when(
                    F.size("syms") >= 2,
                    F.transform(
                        F.sequence(F.lit(0), F.size("syms") - 2),
                        lambda i: F.struct(
                            F.element_at("syms", i + 1).alias("a"),
                            F.element_at("syms", i + 2).alias("b"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            ).alias("p"),
        ).select("freq", "p.a", "p.b")
        top = (
            pairs.groupBy("a", "b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break  # nothing left worth merging
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        nxt = vocab.select("freq", _merge_fold(F.col("syms"), a, b).alias("syms"))
        nxt = nxt.localCheckpoint(eager=True)  # constant plan depth
        vocab.unpersist()
        vocab = nxt
    vocab.unpersist()
    return merges


def _encode_word(w: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(w)
    while len(syms) >= 2:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        # apply the best-ranked rule greedily left-to-right (training
        # order), matching _merge_fold's application semantics
        a, b = syms[best], syms[best + 1]
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, text) → (id, tokens: array<string>, n_tokens): BPE-encode
    with the learned merges. Distinct words encode once (the UDF input
    is vocabulary-sized), then a broadcast join maps every corpus word
    to its token array and a flatten restores document order."""
    ranks = {p: i for i, p in enumerate(merges)}

    @pandas_udf(T.ArrayType(T.StringType()))
    def enc(s: pd.Series) -> pd.Series:
        return pd.Series([_encode_word(w, ranks) for w in s])

    base = docs.select(
        F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("ws")
    )
    distinct_words = (
        base.select(F.explode("ws").alias("w"))
        .where(F.length("w") > 0)
        .distinct()
        .select("w", enc("w").alias("toks"))
    )
    exploded = base.select(
        "doc_id", F.posexplode("ws").alias("pos", "w")
    ).where(F.length("w") > 0)
    return (
        exploded.join(F.broadcast(distinct_words), "w")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "toks"))
                    ),
                    lambda s: s["toks"],
                )
            ).alias("tokens")
        )
        .select("doc_id", "tokens", F.size("tokens").alias("n_tokens"))
    )
