"""Multimodal (binary-payload) column plumbing for data pipelines.

Treats image/audio/video as opaque BINARY columns plus typed metadata,
with decode / feature-extract / frame-sample as Arrow-batched Python
stages over ``mapInPandas`` — the Spark-side shape a 100 TB multimodal
corpus needs: payloads never leave the executor, Python sees zero-copy
Arrow buffers, and every stage is a narrow transformation (no shuffle).

The actual codec step is STUBBED: image/audio libraries are not in this
environment, so ``decode_image`` raises ``NotImplementedError`` unless
``fake=True`` selects a deterministic byte-level fake decoder. The
schema, partitioning, UDF signatures, and batch shapes are real and
tested; swapping the fake for PIL/ffmpeg is a one-function change.

Since the corpus here is text, ``attach_payload`` manufactures the
BINARY column by UTF-8-encoding the text — bytes are bytes; all the
plumbing downstream is payload-agnostic.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Fixed tap count for the fake thumbnail decoder (≙ resize target).
THUMB_TAPS = 16


def attach_payload(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", fmt: str = "txt"
) -> DataFrame:
    """(id, payload BINARY, meta STRUCT<format, n_bytes>) from a corpus.

    In a real multimodal table the payload arrives from parquet as-is;
    this builds the identical shape from the text corpus so every
    downstream stage runs against genuine BINARY data.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(fmt).alias("format"), F.length(payload).cast("long").alias("n_bytes")
        ).alias("meta"),
    )


_BYTE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("max_byte", T.IntegerType()),
    ]
)


def byte_stats(mm: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Feature extraction over raw payload bytes (Arrow → numpy, no copy
    of the JVM-side data beyond the Arrow batch itself)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for rid, raw in zip(pdf[id_col], pdf[payload_col]):
                b = np.frombuffer(raw, dtype=np.uint8)
                rows.append(
                    (
                        int(rid),
                        len(b),
                        float(b.mean()) if len(b) else 0.0,
                        int(b.max()) if len(b) else 0,
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "n_bytes", "mean_byte", "max_byte"])

    return mm.mapInPandas(extract, _BYTE_STATS_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_byte", T.IntegerType()),
    ]
)


def sample_frames(
    mm: DataFrame, stride: int, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Frame sampling: every stride-th byte (≙ every Nth video frame).

    Emits (id, frame_idx, frame_byte); fan-out is len/stride rows per
    payload, produced inside the executor — the payload itself is never
    shuffled or replicated.
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, idxs, vals = [], [], []
            for rid, raw in zip(pdf[id_col], pdf[payload_col]):
                b = np.frombuffer(raw, dtype=np.uint8)[::stride]
                ids.extend([int(rid)] * len(b))
                idxs.extend(range(len(b)))
                vals.extend(int(x) for x in b)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_byte": vals})

    return mm.mapInPandas(frames, _FRAME_SCHEMA)


_THUMB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("px_idx", T.IntegerType()),
        T.StructField("px", T.IntegerType()),
    ]
)


def decode_image(
    mm: DataFrame,
    fake: bool = False,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Decode + resize payloads to THUMB_TAPS 'pixels' per row.

    Real decoding requires an image library that is not available in
    this environment; ``fake=True`` selects the deterministic stand-in
    (tap byte at position i·n/TAPS — a strided 'resize'), which keeps
    the full Spark plumbing testable and SQL-oracle-checkable.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding needs PIL/libvips which are not installed; "
            "pass fake=True for the deterministic byte-tap stand-in"
        )

    taps = THUMB_TAPS

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, idxs, vals = [], [], []
            for rid, raw in zip(pdf[id_col], pdf[payload_col]):
                b = np.frombuffer(raw, dtype=np.uint8)
                n = len(b)
                if n == 0:
                    continue
                pos = (np.arange(taps) * n) // taps
                px = b[pos]
                ids.extend([int(rid)] * taps)
                idxs.extend(range(taps))
                vals.extend(int(x) for x in px)
            yield pd.DataFrame({"doc_id": ids, "px_idx": idxs, "px": vals})

    return mm.mapInPandas(decode, _THUMB_SCHEMA)
