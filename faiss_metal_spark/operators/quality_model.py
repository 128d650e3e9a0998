"""Model-based quality filtering — the classifier stage of LLM corpus
pipelines.

The CCNet / GPT-3 / LLaMA data recipes all train a linear classifier
over hashed bag-of-words features to score how "reference-like" a
document is (fastText, Joulin et al. 2016, is the canonical tool), then
keep/downsample by score. The heuristic scorers in this repo
(``quality_score``, Gopher flags, DSIR, bigram-LM) cover the rule-based
stages; this is the learned one.

Spark-first split of the two phases:

- **Train** runs distributed: MLlib ``LogisticRegression`` (LBFGS) over
  :func:`~faiss_metal_spark.functions.text.hashed_embedding` features —
  the trainer scales with the labeled set and ships nothing to the
  driver but the (d+1) weight vector.
- **Score** is a pure Catalyst projection: the weights become a literal
  array, the score is one ``zip_with`` dot product + sigmoid over the
  same hashed embedding — so the 100 TB scoring pass is a UDF-free
  single scan, exactly like every other text operator here.

The hashed features make train and score engine-independent (md5-based,
SQL-oracle-able) and vocabulary-free — no fitted dictionary to
broadcast, the hash IS the vocabulary, which is why fastText-style
pipelines use the trick at corpus scale.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import hashed_embedding


def quality_classifier_train(
    docs: DataFrame,
    label: Column,
    text_col: str = "text",
    d: int = 64,
    max_iter: int = 50,
    reg_param: float = 0.0,
) -> np.ndarray:
    """Train the linear quality model; returns ``(d+1,)`` float64
    weights — ``w[:d]`` over the hashed-embedding lanes, ``w[d]`` the
    intercept. ``label`` is any boolean/0-1 column expression (e.g.
    "is this from the reference corpus")."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    feat = docs.select(
        label.cast("double").alias("label"),
        array_to_vector(
            hashed_embedding(text_col, d).cast("array<double>")
        ).alias("features"),
    )
    model = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=False
    ).fit(feat)
    return np.append(np.asarray(model.coefficients.toArray(), np.float64),
                     float(model.intercept))


def quality_model_score(weights: np.ndarray, text: Column | str) -> Column:
    """P(label=1 | text) as a Catalyst column: sigmoid(w·emb + b) over
    the hashed embedding the model was trained on (d inferred from the
    weight vector). No Python stage — usable inside any filter or
    projection on the full corpus scan."""
    w = np.asarray(weights, np.float64)
    d, b = len(w) - 1, float(w[-1])
    from ..functions.text import _plain_name

    if _plain_name(text):
        # r15: one F.expr string instead of ~d py4j literal calls —
        # value-identical (repr() round-trips doubles exactly; the D
        # suffix keeps SQL literals DOUBLE, not DECIMAL); pinned by
        # tests/test_r15_expr_equiv.py
        from ..functions.text import _hashed_embedding_sql

        emb = _hashed_embedding_sql(f"`{text}`", d, normalize=True)
        wlits = ", ".join(f"{float(x)!r}D" for x in w[:d])
        z = (
            f"aggregate(zip_with({emb}, array({wlits}), (a, c) -> a * c), "
            f"{b!r}D, (acc, v) -> acc + v)"
        )
        return F.expr(f"1.0D / (1.0D + exp(-({z})))")
    wcol = F.array(*[F.lit(float(x)) for x in w[:d]])
    z = F.aggregate(
        F.zip_with(hashed_embedding(text, d), wcol, lambda a, c: a * c),
        F.lit(b),
        lambda acc, v: acc + v,
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def quality_model_filter(
    docs: DataFrame,
    weights: np.ndarray,
    threshold: float = 0.5,
    text_col: str = "text",
    score_col: str = "quality_prob",
) -> DataFrame:
    """Corpus scan + learned keep/drop gate: append the model score and
    keep rows above ``threshold`` — one UDF-free pass."""
    return docs.withColumn(
        score_col, quality_model_score(weights, text_col)
    ).where(F.col(score_col) >= threshold)
