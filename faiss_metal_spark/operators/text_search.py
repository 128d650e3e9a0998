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
- document frequency is a count window over the tf table (one shuffle
  on term, no join-back — the tf lineage has a single consumer so the
  corpus scans once); the corpus stats (N, avgdl) are precomputed
  artifacts passed via ``stats=`` or a broadcast 1-row aggregate;
- the idf·tf fold is a projection; final top-k is TakeOrdered (O(k)
  per partition + O(k·P) driver merge — k is a result page, not data).

Everything is md5-free integer/string equality — deterministic and
reproducible by the DuckDB oracle with the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def corpus_stats(
    docs: DataFrame, text_col: str = "text"
) -> tuple[int, float]:
    """(N, avgdl) for a corpus — the two global scalars BM25 needs.

    At scale these are precomputed artifacts maintained alongside the
    corpus (exactly like the reference maintains precomputed L2 norms,
    /root/reference/src/MetalIndexFlat.mm:258-268) — compute once, pass
    to every ``bm25_scores`` call via ``stats=`` so each query plan
    scans the corpus exactly once."""
    row = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(tokens(text_col))).alias("avgdl"),
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"] or 1.0)


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    stats: tuple[int, float] | None = None,
) -> DataFrame:
    """Score every document matching ≥1 query term.

    Returns ``(doc_id, n_hit, score)`` — n_hit = how many distinct
    query terms the doc contains, score = Σ_terms idf(t) · tf·(k1+1) /
    (tf + k1·(1−b+b·dl/avgdl)) with the standard BM25+ idf
    ``ln(1 + (N−df+0.5)/(df+0.5))``.

    The operator is fully lazy. With ``stats=(N, avgdl)`` (see
    :func:`corpus_stats`) the plan scans the corpus exactly once — the
    production shape. Without it, the global scalars are derived
    in-plan by broadcast-cross-joining a 1-row aggregate, which adds a
    second (tokenize-only) pass over the corpus at action time; there
    is no eager work either way.
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

    if stats is not None:
        n_col = F.lit(float(int(stats[0])))
        avgdl_col = F.lit(float(stats[1]) or 1.0)
    else:
        sdf = docs.select(
            F.count(F.lit(1)).cast("double").alias("_n"),
            F.coalesce(
                F.avg(F.size(tokens(text_col))), F.lit(1.0)
            ).alias("_avgdl"),
        )
        tf = tf.crossJoin(F.broadcast(sdf))
        n_col = F.col("_n")
        avgdl_col = F.col("_avgdl")

    # document frequency as a COUNT WINDOW over the tf table rather
    # than a groupBy re-joined back: the tf table then has exactly one
    # consumer, so the corpus is scanned once (a groupBy+join-back
    # plans the tf lineage twice). One shuffle on term; the window is
    # count-only (no ordering), a single streaming pass per partition.
    from pyspark.sql.window import Window

    df_col = F.count(F.lit(1)).over(Window.partitionBy("term")).cast("double")
    idf = F.log(F.lit(1.0) + (n_col - df_col + 0.5) / (df_col + 0.5))

    scored = (
        tf.withColumn(
            "contrib",
            idf
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / avgdl_col)
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
