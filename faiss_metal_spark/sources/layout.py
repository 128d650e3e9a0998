"""Physical data layout: partitioned and bucketed storage.

The reference stores one dense in-memory matrix (SURVEY §1.1,
/root/reference/src/MetalIndexFlat.mm:89); at 100 TB the analogous
design decisions are *disk* layout:

- **Hive-style partitioning** (`partitionBy` on write): a filter on the
  partition column becomes directory pruning — the scan never opens
  non-matching files. This is the coarse-grained analog of the
  reference's "only touch the buffers you need".
- **Bucketing** (`bucketBy` on write): pre-shuffles rows into a fixed
  number of hash buckets on the join/agg key. Two tables bucketed the
  same way join with **zero exchange** — the shuffle is paid once at
  write time instead of per query, which is the difference between a
  nightly 100 TB join that moves 100 TB and one that moves nothing.

Both are thin wrappers over the DataFrame writer so Catalyst/AQE keep
all their behavior; the value is the *contract* (layout registered in
the catalog) plus the tests pinning that the exchange-free plan
actually materializes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write hive-style partitioned data: one directory per partition
    value; readers prune directories on partition-column filters."""
    df.write.mode(mode).partitionBy(*partition_cols).format(fmt).save(path)


def read_partitioned(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return spark.read.format(fmt).load(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (and optionally sorted) catalog table.

    Joins/aggregations on ``bucket_col`` between tables bucketed with
    the same ``n_buckets`` skip the shuffle entirely (pinned by
    tests/test_sources_plans.py::test_bucketed_join_no_exchange).
    ``sort_col`` additionally pre-sorts within buckets, enabling
    sort-merge joins with no sort step.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Z-order (Morton) key: interleave the low ``bits`` bits of each
    column round-robin (col 0 contributes the most-significant bit of
    each group). Callers pass RANK-NORMALIZED or otherwise uniformly
    scaled non-negative ints — the curve preserves locality only in
    that space. Pure Catalyst fold: for bit b from high to low, append
    one bit from every column. len(cols)·bits must stay ≤ 62 so the
    key fits a non-negative BIGINT.

    This is the multi-dimensional clustering trick behind Delta/Iceberg
    OPTIMIZE ZORDER: sort-by-key + range-partitioned write gives every
    file a bounded bounding box in ALL keyed dimensions, so a filter on
    ANY subset of them prunes most files — single-column sorts only
    prune their own column.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    if len(cs) * bits > 62:
        raise ValueError(f"{len(cs)} cols x {bits} bits exceeds a BIGINT")
    key = F.lit(0).cast("long")
    for b in range(bits - 1, -1, -1):
        for c in cs:
            key = key * F.lit(2) + F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 8,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` clustered along the Z-curve of ``cols``:
    repartitionByRange on the Morton key (range boundaries from Spark's
    reservoir sampling — at scale this is the same shuffle a global
    sort costs, once, at write time) then sort within partitions, so
    each output file covers a compact curve segment = a bounded
    hyper-box in every clustered dimension. Readers filtering on any
    clustered column touch the few files whose box intersects —
    demonstrated by tests/test_sources_plans.py::test_zorder_file_pruning
    counting distinct input files per box query."""
    key = zorder_key([F.col(c) for c in cols], bits)
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )


def compact_store(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    partition_col: str = "cell",
    target_rows_per_file: int = 1_000_000,
) -> None:
    """Compact a partitioned store's small files (Delta/Iceberg
    ``OPTIMIZE`` analog, minus the transactional swap).

    Continuous ingest (``streaming/index_ingest.py``) appends one file
    per micro-batch per touched partition; after days of small batches
    a cell holds thousands of tiny files and every probe pays their
    open/footer cost. This rewrites the store with
    ``ceil(partition_rows / target_rows_per_file)`` files per
    partition: one pass, shuffle bounded by the store size, partition
    layout (and therefore probe pruning) preserved.

    The compacted copy lands at ``dst_path`` — pointing readers at it /
    swapping directories atomically is a table-format concern
    (Delta/Iceberg) deliberately out of scope; a plain-parquet
    in-place rewrite would race concurrent readers.
    """
    df = spark.read.parquet(src_path)
    if partition_col not in df.columns:
        raise ValueError(f"{src_path} has no {partition_col!r} column")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(partition_col).count().collect()
    }
    max_files = max(
        -(-n // target_rows_per_file) for n in counts.values()
    ) if counts else 1
    # repartition on (partition, uniform sub-key) so each partition
    # lands in at most max_files write tasks without a global sort
    sub = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(max_files))
    (
        df.repartition(max(len(counts), 1) * max_files, F.col(partition_col), sub)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(dst_path)
    )
