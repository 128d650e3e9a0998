"""Bloom-filter prefilter — the large-eval-set decontamination path.

``pipeline.decontaminate`` broadcasts the benchmark set's DISTINCT
shingle hashes as a join table: at 8 bytes/hash that is the right
plan for benchmark suites, but decontaminating against a LARGE
held-out corpus (10⁸+ n-grams ≈ GBs of hashes) outgrows a broadcast.
The classic answer is a Bloom filter: ~1.2 bytes/item at 1% fpp —
an order of magnitude smaller than the hash set — used as a
broadcast PREFILTER, with the (tiny) surviving candidate set exactly
verified by a join afterwards, so false positives cannot leak into
the result: the composition is EXACT, only its cost is probabilistic.

(Spark's own runtime bloom-join infrastructure exists but its
``bloom_filter_agg``/``might_contain`` expressions are not registered
as user-facing SQL functions in this build, so the filter is built
here: a numpy bit array assembled with one distributed per-partition
OR-aggregate — each partition contributes one m/8-byte array, the
driver ORs them — and probed with the same vectorized double-hashing
inside ``mapInArrow``. Both sides share ``_bloom_positions``, so
build and probe can never drift.)

Standard Bloom parameters: m = ⌈−n·ln(fpp)/ln²2⌉ bits,
k = max(1, round(m/n·ln2)) probes; double hashing g_i(x) = h1 + i·h2
(Kirsch-Mitzenmacher) over the caller's already-hashed int64 keys.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 increment, odd


def bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k_probes) for the target capacity/false-positive rate."""
    if n_items <= 0:
        raise ValueError("n_items must be positive")
    if not (0.0 < fpp < 1.0):
        raise ValueError("fpp must be in (0, 1)")
    m = int(math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    m = max(m, 64)
    k = max(1, int(round(m / n_items * math.log(2))))
    return m, k


def _bloom_positions(h: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(len(h), k) bit positions via double hashing over int64 keys —
    the single definition both build and probe use."""
    h1 = h.astype(np.uint64)
    # splitmix64-style second hash: decorrelates from h1 cheaply
    h2 = h1 * _MIX
    h2 ^= h2 >> np.uint64(31)
    h2 |= np.uint64(1)  # odd, so the probe sequence never degenerates
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(
        np.uint64
    )


def bloom_build(
    hashes: DataFrame, col: str, n_items: int, fpp: float = 0.01
) -> tuple[np.ndarray, int, int]:
    """Build the filter over an int64 hash column DISTRIBUTED: each
    partition sets bits into its own m/64-word array (vectorized —
    one np.bitwise_or.at per Arrow batch), the driver ORs the
    per-partition arrays. Returns (bits uint64 (m/64+1,), m_bits, k).

    Driver cost: n_partitions × m/8 bytes pass through the reduce —
    at 1% fpp and 10⁸ items that is ~15 MB per partition; cap the
    partition count of ``hashes`` accordingly for huge filters."""
    m_bits, k = bloom_params(n_items, fpp)
    words = m_bits // 64 + 1

    def per_partition(batches):
        import pyarrow as pa

        bits = np.zeros(words, dtype=np.uint64)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            h = batch.column(col).to_numpy(zero_copy_only=False)
            pos = _bloom_positions(np.asarray(h, np.int64), k, m_bits).ravel()
            np.bitwise_or.at(
                bits, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
        yield pa.record_batch([pa.array([bits.tobytes()])], names=["bits"])

    parts = hashes.select(F.col(col).alias(col)).mapInArrow(
        per_partition, "bits binary"
    ).collect()
    out = np.zeros(words, dtype=np.uint64)
    for r in parts:
        out |= np.frombuffer(r["bits"], dtype=np.uint64)
    return out, m_bits, k


def bloom_filter_rows(
    df: DataFrame, col: str, bits: np.ndarray, m_bits: int, k: int,
    track: list | None = None,
) -> DataFrame:
    """Rows of ``df`` whose int64 ``col`` MIGHT be in the filter
    (no false negatives; ~fpp false positives — follow with an exact
    verify join). The bit array rides a broadcast variable; the test
    is one vectorized gather per Arrow batch inside ``mapInArrow``,
    schema preserved.

    ``track``: optional caller-owned list the Broadcast handle is
    appended to, so the caller can ``unpersist()``/``destroy()`` it
    once the returned plan is materialized — at the 10⁸-item scale
    this path targets the bit array is 100+ MB, and repeated
    invocations otherwise accrete executor memory until LRU eviction."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bits)
    if track is not None:
        track.append(bc)
    schema = df.schema
    names = [f.name for f in schema.fields]
    ci = names.index(col)

    def probe(batches):
        import pyarrow as pa

        bits_ = bc.value
        for batch in batches:
            if batch.num_rows == 0:
                continue
            h = np.asarray(
                batch.column(ci).to_numpy(zero_copy_only=False), np.int64
            )
            pos = _bloom_positions(h, k, m_bits)
            word = bits_[(pos >> np.uint64(6)).astype(np.int64)]
            hit = (
                (word >> (pos & np.uint64(63))) & np.uint64(1)
            ).all(axis=1)
            if hit.any():
                yield batch.filter(pa.array(hit))

    return df.mapInArrow(probe, schema)
