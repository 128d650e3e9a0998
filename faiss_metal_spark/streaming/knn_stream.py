"""Continuous kNN query feeds over a static vector table.

The reference's ``searchAsync`` pipelines query batches against one
index (/root/reference/src/MetalIndexFlat.mm:403-490, multiple tokens
in flight); the Structured-Streaming generalization is a *stream* of
query batches: each micro-batch runs the exact same ``knn_search``
plan against the (persisted) vector table and appends its results to
the sink. Determinism per batch is inherited from the batch operator,
so stream results equal batch results on identical input — the
streaming analog of the reference's async≡sync bit-equality test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators.knn import knn_search

QUERY_SCHEMA = T.StructType(
    [
        T.StructField("qid", T.LongType()),
        T.StructField("vec", T.ArrayType(T.FloatType())),
    ]
)


def read_query_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(QUERY_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def run_knn_stream(
    vectors: DataFrame,
    query_stream: DataFrame,
    k: int,
    checkpoint: str,
    results_path: str,
    metric: str = "l2",
    available_now: bool = True,
):
    """Serve the query stream against ``vectors``, appending each
    micro-batch's results to ``results_path`` (parquet). foreachBatch is
    sink-agnostic — swap the writer for kafka/delta in production.

    The vector table should be persisted by the caller: it is scanned
    once per micro-batch, which is exactly the reference's scratch-reuse
    pattern (same index buffers, new query buffers per token).
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        res = knn_search(vectors, batch_df, k, metric=metric)
        res.write.mode("append").parquet(results_path)

    q = query_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    q = (
        q.trigger(availableNow=True)
        if available_now
        else q.trigger(processingTime="1 second")
    )
    handle = q.start()
    if available_now:
        handle.awaitTermination()
    return handle
