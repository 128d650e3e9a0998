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

from pyspark.sql import DataFrame, SparkSession


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
