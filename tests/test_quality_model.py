"""Learned quality classifier: distributed MLlib train, Catalyst score.

Pins: (1) the model separates a separable corpus on held-out docs,
(2) the Catalyst scorer reproduces MLlib's own predicted probability
(same weights, same features — the scorer is a re-expression, not a
re-derivation), (3) scoring is a pure projection (no Python stage),
(4) the filter keeps exactly the rows the scorer puts >= threshold.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faiss_metal_spark.operators.quality_model import (
    quality_classifier_train,
    quality_model_filter,
    quality_model_score,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(5)
    good = ["science", "theory", "journal", "study", "analysis", "method"]
    bad = ["click", "free", "winner", "prize", "offer", "buy"]
    rows = []
    for i in range(400):
        vocab = good if i % 2 == 0 else bad
        words = [vocab[j] for j in rng.integers(0, 6, size=12)]
        rows.append((i, " ".join(words), i % 2 == 0))
    return spark.createDataFrame(rows, "doc_id long, text string, is_good boolean")


def test_quality_model_separates_holdout(spark, corpus):
    train = corpus.where("doc_id % 5 != 0")
    test = corpus.where("doc_id % 5 = 0")
    w = quality_classifier_train(train, F.col("is_good"), d=64)
    assert w.shape == (65,)
    pdf = test.select(
        "is_good", quality_model_score(w, "text").alias("p")
    ).toPandas()
    acc = ((pdf["p"] >= 0.5) == pdf["is_good"]).mean()
    assert acc >= 0.95
    kept = quality_model_filter(test, w, 0.5)
    assert kept.count() == int((pdf["p"] >= 0.5).sum())


def test_quality_model_score_matches_mllib(spark, corpus):
    """The Catalyst sigmoid(w·emb+b) reproduces MLlib's probability
    column for the same model — scorer ≡ trainer's own transform."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector, vector_to_array

    from faiss_metal_spark.functions.text import hashed_embedding

    d = 64
    feat = corpus.select(
        "doc_id",
        F.col("is_good").cast("double").alias("label"),
        array_to_vector(
            hashed_embedding("text", d).cast("array<double>")
        ).alias("features"),
    )
    model = LogisticRegression(
        maxIter=50, regParam=0.0, standardization=False
    ).fit(feat)
    w = np.append(np.asarray(model.coefficients.toArray()), model.intercept)

    mllib = model.transform(feat).select(
        "doc_id", vector_to_array("probability")[1].alias("p_mllib")
    )
    ours = corpus.select(
        "doc_id", quality_model_score(w, "text").alias("p_ours")
    )
    pdf = mllib.join(ours, "doc_id").toPandas()
    np.testing.assert_allclose(
        pdf["p_ours"].to_numpy(), pdf["p_mllib"].to_numpy(), atol=1e-9
    )


def test_quality_model_score_is_pure_projection(spark, corpus):
    from faiss_metal_spark.plans.report import explain_report

    w = np.zeros(65)
    rep = explain_report(
        corpus.select(quality_model_score(w, "text").alias("p"))
    )
    assert not rep.has_python_stage
    assert rep.n_exchanges == 0
