"""Structured Streaming operators over the events table.

The reference engine has no streaming surface (SURVEY §2.9 —
``searchAsync`` is async execution, not streaming); these are
north-star extensions built directly on Spark's incremental engine:

- ``read_events_stream``  — file-stream source over the events parquet;
  ``maxFilesPerTrigger`` bounds micro-batch size.
- ``hourly_counts``       — watermarked tumbling-window aggregation;
  late events beyond the watermark are dropped, state is bounded.
- ``sessionize``          — gap-based session windows (works identically
  in batch mode, which is how the DuckDB oracle checks it).
- ``user_running_totals`` — custom stateful operator via
  ``applyInPandasWithState``: per-user cumulative counters that survive
  across micro-batches (the analog of a keyed state store).

Every transformation here is identical for batch and streaming input
DataFrames except ``user_running_totals`` (state requires a stream), so
correctness is pinned by batch-vs-stream equivalence tests
(tests/test_streaming.py) plus the SQL oracle on the batch form.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an events parquet path (file or glob)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def hourly_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour windows of event counts / value sums per type.

    With a streaming input the watermark bounds state: windows older
    than (max event time − watermark) are finalized and evicted. The
    same expression runs in batch for the oracle comparison.
    """
    e = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    length: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding (overlapping) event-time windows per type: each event
    contributes to length/slide windows. Streaming semantics identical
    to :func:`hourly_counts` — watermark finalizes + evicts old windows.
    """
    e = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        e.groupBy(F.window("ts", length, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user gap sessions: (user_id, session_start_us, n_events,
    sum_value). An event extends its user's session iff it arrives
    strictly within ``gap`` of the previous event (half-open windows).
    """
    e = events.withWatermark("ts", gap) if events.isStreaming else events
    return (
        e.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            # cast: the parquet ts may read as TIMESTAMP_NTZ
            # (isAdjustedToUTC=0); with the UTC session timezone the cast
            # is numerically identity, and unix_micros needs TIMESTAMP
            F.unix_micros(F.col("sw.start").cast("timestamp")).alias(
                "session_start_us"
            ),
            "n_events",
            "sum_value",
        )
    )


def join_within(
    left: DataFrame,
    right: DataFrame,
    key: str,
    within: str = "1 hour",
    watermark: str = "1 hour",
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Stream-stream (or batch) inner join: pair each left row with
    right rows of the same key whose timestamp falls in
    ``[left.ts − within, left.ts]``.

    With streaming inputs both sides carry watermarks and the time
    bound makes state evictable — Spark drops buffered rows once the
    watermark passes their join window, so state is bounded by
    (rate × within) instead of growing forever. The identical
    expression runs on batch inputs, which is how the equivalence test
    checks it. Left columns come out prefixed ``l_``, right ``r_``.
    """
    l = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    l = l.select([F.col(c).alias(f"l_{c}") for c in left.columns])
    r = r.select([F.col(c).alias(f"r_{c}") for c in right.columns])
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col(f"r_{right_ts}") >= F.expr(f"l_{left_ts} - INTERVAL {within}"))
        & (F.col(f"r_{right_ts}") <= F.col(f"l_{left_ts}"))
    )
    return l.join(r, cond)


_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def user_running_totals(events: DataFrame) -> DataFrame:
    """Keyed stateful operator: per-user cumulative (count, Σvalue).

    State persists across micro-batches in the state store; each batch
    emits the updated totals for users seen in that batch. This is the
    ``applyInPandasWithState`` pattern any custom streaming accumulator
    (dedup windows, rate limiters, CUSUM detectors) builds on.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first-seen row per content digest
    (md5 of ``text_col``), the incremental form of exact_dedup for a
    continuously-ingested corpus.

    With ``ts_col`` the state store only retains digests inside the
    watermark horizon (``dropDuplicatesWithinWatermark``) — bounded
    state, the only sane configuration for an unbounded 100 TB feed
    where true global dedup belongs in the batch compaction pass.
    Without it, state grows with the distinct-digest count (fine for
    bounded backfills, documented so nobody ships it against a firehose).
    The same transformation runs in batch (digest-distinct), which is
    how equivalence is tested.
    """
    cols = docs.columns  # output schema == input schema (same as batch)
    d = docs.withColumn("__fm_digest", F.md5(F.col(text_col)))
    if ts_col is not None and d.isStreaming:
        d = d.withWatermark(ts_col, watermark)
        d = d.dropDuplicatesWithinWatermark(["__fm_digest"])
    else:
        d = d.dropDuplicates(["__fm_digest"])
    return d.select(*cols)


def run_to_memory(
    stream_df: DataFrame, name: str, checkpoint: str, output_mode: str = "complete"
) -> None:
    """Drain a stream into an in-memory table with availableNow (test &
    backfill harness: process everything currently in the source, then
    stop)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def curate_stream(
    docs: DataFrame,
    min_quality: float = 0.5,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
    redact: bool = True,
) -> DataFrame:
    """Streaming corpus curation: the per-document stages of
    ``pipeline.curate_corpus`` on a live feed, one continuous plan —
    exact dedup inside the watermark horizon (:func:`dedup_stream`),
    quality scoring + filter (score computed on the ORIGINAL text,
    before any redaction touches it), and PII redaction of the emitted
    text. Cross-document stages that need corpus-wide state (LSH
    near-dedup, SemDeDup) deliberately stay in the batch/incremental
    compaction pass (``incremental_dedup``): their streaming state
    would grow with the corpus, not the watermark.

    Output: input columns (text redacted in place when ``redact``)
    plus (n_tokens, quality). The same transformation runs on a batch
    frame, which is how stream ≡ batch is pinned.
    """
    from ..functions.text import quality_score, redact_pii, token_count

    d = dedup_stream(docs, text_col=text_col, ts_col=ts_col, watermark=watermark)
    scored = d.select(
        "*",
        token_count(text_col).cast("long").alias("n_tokens"),
        quality_score(text_col).alias("quality"),
    ).where(F.col("quality") >= F.lit(min_quality))
    if redact:
        scored = scored.withColumn(text_col, redact_pii(F.col(text_col)))
    return scored


def dedup_segments_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sub-document dedup: explode each arriving doc into
    fixed ``window``-token segments (the batch ``segment_dedup``
    boundaries, via the shared ``segment_col``) and keep the FIRST-SEEN
    row per segment digest — continuous boilerplate removal for an
    ingest feed, where the same license block arriving in doc after doc
    should survive exactly once.

    Returns (id, pidx, segment) survivor rows. State and watermark
    semantics are ``dedup_stream``'s: with ``ts_col`` the digest state
    is watermark-bounded (``dropDuplicatesWithinWatermark``); without
    it, state grows with distinct segments (bounded backfills only).
    The identical transformation runs in batch, which is how stream ≡
    batch is pinned.

    Survivor-row determinism: the BATCH form keeps the smallest
    ``(id, pidx)`` member of each digest group (a ``min_by``
    aggregate — ``segment_dedup``'s ``keep="min"`` discipline). On a
    STREAM, first-arrival order is the semantic ("first seen"), so
    across micro-batches the earliest batch wins; within one
    micro-batch ``dropDuplicatesWithinWatermark`` keeps an arbitrary
    member (Spark exposes no ordered reduction there) — callers needing
    row-level determinism inside a batch should compare segment SETS or
    run the batch form over the drained feed.
    """
    from ..operators.dedup import segment_col

    d = docs.select(
        F.col(id_col).alias("id"),
        *( [F.col(ts_col)] if ts_col is not None else [] ),
        F.posexplode(segment_col(text_col, window)).alias("pidx", "segment"),
    ).withColumn("__fm_digest", F.md5(F.col("segment")))
    if d.isStreaming:
        if ts_col is not None:
            d = d.withWatermark(ts_col, watermark)
            d = d.dropDuplicatesWithinWatermark(["__fm_digest"])
        else:
            d = d.dropDuplicates(["__fm_digest"])
        return d.select("id", "pidx", "segment")
    # batch: deterministic min-(id, pidx) keeper per digest group
    keeper = d.groupBy("__fm_digest").agg(
        F.min_by(F.struct("id", "pidx", "segment"), F.struct("id", "pidx")).alias("r")
    )
    return keeper.select("r.id", "r.pidx", "r.segment")
