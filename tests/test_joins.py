"""as_of_join / range_bucket_join semantics on hand-computable data."""

import pandas as pd
from pyspark.sql import functions as F

from faiss_metal_spark.operators.joins import as_of_join, range_bucket_join


def test_as_of_join_basic(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 1, 2], "ts": [5, 10, 20, 7], "lid": [0, 1, 2, 3]}),
        schema="k long, ts long, lid long",
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2], "ts": [4, 10, 9], "val": [40.0, 100.0, 90.0]}),
        schema="k long, ts long, val double",
    )
    out = {
        r["lid"]: r["val"]
        for r in as_of_join(left, right, key="k", value_cols=["val"]).collect()
    }
    # lid0@5 → right@4 (40); lid1@10 → right@10 inclusive (100);
    # lid2@20 → right@10 (100); lid3@7 → no purchase ≤ 7 for k=2 → null
    assert out == {0: 40.0, 1: 100.0, 2: 100.0, 3: None}


def test_as_of_join_exclusive(spark):
    left = spark.createDataFrame([(1, 10, 0)], schema="k long, ts long, lid long")
    right = spark.createDataFrame([(1, 10, 7.0)], schema="k long, ts long, val double")
    out = as_of_join(left, right, key="k", value_cols=["val"], inclusive=False).collect()
    assert out[0]["val"] is None  # strict <: the ts-equal right row is invisible


def test_as_of_join_preserves_left_rows(spark):
    left = spark.createDataFrame(
        [(i, i * 3, i) for i in range(50)], schema="k long, ts long, lid long"
    )
    right = spark.createDataFrame([(0, 0, 1.0)], schema="k long, ts long, val double")
    assert as_of_join(left, right, key="k", value_cols=["val"]).count() == 50


def test_range_bucket_join_matches_theta(spark):
    import numpy as np

    rng = np.random.default_rng(9)
    pts = spark.createDataFrame(
        pd.DataFrame({"pid": range(200), "x": rng.uniform(0, 100, 200)}),
        schema="pid long, x double",
    )
    lo = rng.uniform(0, 95, 30)
    ranges = spark.createDataFrame(
        pd.DataFrame({"rid": range(30), "lo": lo, "hi": lo + rng.uniform(1, 10, 30)}),
        schema="rid long, lo double, hi double",
    )
    fast = range_bucket_join(pts, ranges, "x", "lo", "hi", granule=5.0)
    slow = pts.crossJoin(ranges).where((F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi")))
    f = {(r["pid"], r["rid"]) for r in fast.collect()}
    s = {(r["pid"], r["rid"]) for r in slow.collect()}
    assert f == s and len(f) > 0


def test_approx_distinct_close(spark):
    """HLL++ estimate stays within the declared rsd of exact DISTINCT
    (backs the rows-only approx_distinct_users driver query)."""
    import numpy as np

    rng = np.random.default_rng(11)
    df = spark.createDataFrame(
        pd.DataFrame({"g": rng.integers(0, 3, 5000), "u": rng.integers(0, 800, 5000)}),
        schema="g long, u long",
    )
    rows = df.groupBy("g").agg(
        F.approx_count_distinct("u", 0.01).alias("est"),
        F.countDistinct("u").alias("exact"),
    ).collect()
    assert len(rows) == 3
    for r in rows:
        assert abs(r["est"] - r["exact"]) <= max(0.05 * r["exact"], 5)


def test_approx_percentile_close(spark):
    """percentile_approx stays within tight relative error of the exact
    percentile at accuracy=10000 (backs the rows-only approx_percentiles
    driver query)."""
    import numpy as np

    rng = np.random.default_rng(13)
    df = spark.createDataFrame(
        pd.DataFrame({"g": rng.integers(0, 3, 6000), "v": rng.uniform(0, 1000, 6000)}),
        schema="g long, v double",
    )
    rows = df.groupBy("g").agg(
        F.percentile_approx("v", 0.5, 10000).alias("approx"),
        F.percentile("v", F.lit(0.5)).alias("exact"),
    ).collect()
    assert len(rows) == 3
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= 0.01 * max(abs(r["exact"]), 1.0)
