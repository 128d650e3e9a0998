"""Vector-table sources & sinks.

The reference ingests raw host pointers and exports CPU indexes
(SURVEY §2.1 #5-6, /root/reference/src/MetalIndexFlat.mm:552-587); a
Spark engine's equivalents are format connectors. All readers normalize
to the canonical ``(id BIGINT, vec ARRAY<FLOAT>)`` shape VectorTable
expects; all are plain DataFrame reads so Catalyst keeps pushdown and
pruning.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_vectors(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Read a vector table from parquet / orc / json-lines / csv.

    parquet, orc & json carry the array natively; csv stores the vector as a
    ';'-joined string column (the only portable csv encoding) and is
    parsed back with a split+cast projection — still whole-stage
    codegen, no Python.
    """
    if fmt == "parquet":
        raw = spark.read.parquet(path)
    elif fmt == "orc":
        raw = spark.read.orc(path)
    elif fmt == "json":
        raw = spark.read.json(path)
    elif fmt == "csv":
        raw = spark.read.option("header", "true").csv(path)
        return raw.select(
            F.col(id_col).cast("long").alias("id"),
            F.transform(F.split(F.col(vec_col), ";"), lambda x: x.cast("float")).alias("vec"),
        )
    else:
        raise ValueError(f"unsupported format {fmt!r}")
    return raw.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<float>").alias("vec"),
    )


def write_vectors(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite") -> None:
    """Write (id, vec[, ...]) out; csv flattens the vector to ';'-joined."""
    if fmt == "parquet":
        df.write.mode(mode).parquet(path)
    elif fmt == "orc":
        df.write.mode(mode).orc(path)
    elif fmt == "json":
        df.write.mode(mode).json(path)
    elif fmt == "csv":
        flat = df.withColumn(
            "vec", F.array_join(F.transform("vec", lambda x: x.cast("string")), ";")
        )
        flat.write.mode(mode).option("header", "true").csv(path)
    else:
        raise ValueError(f"unsupported format {fmt!r}")


def synthetic_vectors(
    spark: SparkSession, nv: int, d: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Deterministic uniform[−1,1] vectors generated *distributed*.

    Each partition seeds its RNG from (seed + first id), so the table is
    reproducible for any partition count without materializing anything
    on the driver — the pattern for synthetic data at any scale.
    """
    if partitions is None:
        partitions = max(1, min(int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
                                nv // 1000 or 1))
    base = spark.range(0, nv, 1, partitions)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("vec", T.ArrayType(T.FloatType())),
        ]
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            if len(ids) == 0:
                continue
            rng = np.random.default_rng(seed + int(ids[0]))
            mat = rng.uniform(-1, 1, size=(len(ids), d)).astype(np.float32)
            yield pd.DataFrame({"id": ids, "vec": list(mat)})

    return base.mapInPandas(gen, schema)
