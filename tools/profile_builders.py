#!/usr/bin/env python
"""Measure driver-side plan-CONSTRUCTION cost of the doc_profile /
curate_corpus expression builders (py4j round trips, no execution).

    python tools/profile_builders.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from faiss_metal_spark.functions.text import hashed_embedding
    from faiss_metal_spark.operators.corpus_quality import (
        bigram_lm_scores,
        dsir_weights,
        repetition_profile,
    )
    from faiss_metal_spark.operators.quality_model import quality_model_score
    from faiss_metal_spark.session import get_spark

    spark = get_spark("profile-builders")
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.createDataFrame(
        [(0, "alpha beta gamma delta", "en")], schema="doc_id long, text string, lang string"
    )

    def t(label, fn, reps=5):
        # warm one (imports / first-touch), then best of reps
        fn()
        best = min(
            (lambda t0=time.perf_counter(): (fn(), time.perf_counter() - t0)[1])()
            for _ in range(reps)
        )
        print(f"{label}: {best*1000:.1f} ms", flush=True)

    t("hashed_embedding d=16", lambda: hashed_embedding("text", d=16, normalize=False))
    t("quality_model_score", lambda: quality_model_score(entry._QM_WEIGHTS, "text"))
    t("repetition_profile", lambda: repetition_profile(d))
    t("dsir_weights", lambda: dsir_weights(d, F.col("lang") == "en", buckets=64))
    t("bigram_lm_scores", lambda: bigram_lm_scores(d))
    t("q_doc_profile FULL build", lambda: entry.q_doc_profile(spark, "/root/testdata/sf0.001"))


if __name__ == "__main__":
    main()
