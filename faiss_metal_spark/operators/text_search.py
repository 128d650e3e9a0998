"""Full-text relevance scoring (BM25) over the documents table.

The lexical complement to the vector search stack: where kNN ranks by
embedding distance, BM25 ranks by term statistics — the classic
retrieval baseline (Robertson & Zaragoza 2009, "The Probabilistic
Relevance Framework: BM25 and Beyond") and the "sparse" half of hybrid
sparse+dense retrieval pipelines.

Scale shape (the inverted-index discipline without materializing one):

- the query's term set is tiny → broadcast; the corpus explodes to
  (doc, term) rows but the broadcast semi-join on terms prunes the
  explosion to matching terms only, inside the same stage;
- term frequencies are one groupBy (map-side combine applies);
- document frequencies and the corpus length stats are computed on the
  pruned/aggregated sides (df over the tf table, avgdl as a 1-row agg)
  and broadcast back;
- the idf·tf fold is a projection; final top-k is TakeOrdered (O(k)
  per partition + O(k·P) driver merge — k is a result page, not data).

Everything is md5-free integer/string equality — deterministic and
reproducible by the DuckDB oracle with the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document matching ≥1 query term.

    Returns ``(doc_id, n_hit, score)`` — n_hit = how many distinct
    query terms the doc contains, score = Σ_terms idf(t) · tf·(k1+1) /
    (tf + k1·(1−b+b·dl/avgdl)) with the standard BM25+ idf
    ``ln(1 + (N−df+0.5)/(df+0.5))``.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = (
        docs.sparkSession.createDataFrame(
            [(t,) for t in sorted(set(query_terms))], schema="term string"
        )
    )

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(text_col).alias("_toks"),
    ).select(
        "doc_id",
        F.size("_toks").cast("double").alias("dl"),
        F.explode("_toks").alias("term"),
    )
    tf = (
        base.join(F.broadcast(terms), "term")
        .groupBy("doc_id", "term", "dl")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )

    stats = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(tokens(text_col))).alias("avgdl"),
    ).collect()[0]
    n_total = int(stats["n"])
    avgdl = float(stats["avgdl"] or 1.0)

    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_total)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )

    scored = (
        tf.join(F.broadcast(df_t.select("term", idf.alias("idf"))), "term")
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hit"),
            F.sum("contrib").alias("score"),
        )
    )
    return scored


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    k: int,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of two
    ranked result sets — the standard glue of hybrid sparse+dense
    retrieval (BM25 list + ANN list → one list).

    Inputs carry ``(qid, rank, label)`` (rank 0-based best-first, extra
    columns ignored; sentinel labels < 0 dropped). Score = Σ_lists
    1/(c + rank + 1); output is ``(qid, rank, label, rrf)`` re-ranked
    best-first with deterministic (score desc, label asc) tie-breaks.

    Scale shape: both inputs are result sets (nq·k rows, not corpora) —
    one union, one groupBy, one window over nq·2k rows.
    """
    from pyspark.sql.window import Window

    def prep(df: DataFrame) -> DataFrame:
        return df.select("qid", "rank", "label").where(F.col("label") >= 0)

    both = prep(a).unionByName(prep(b))
    scored = both.groupBy("qid", "label").agg(
        F.sum(1.0 / (F.lit(float(c)) + F.col("rank") + 1.0)).alias("rrf")
    )
    w = Window.partitionBy("qid").orderBy(F.col("rrf").desc(), F.col("label").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w) - 1)
        .where(F.col("rank") < k)
        .select("qid", "rank", "label", "rrf")
    )
