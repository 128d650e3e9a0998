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

    The compacted copy lands at ``dst_path`` — an in-place rewrite
    would race concurrent readers. Use the versioned-store helpers for
    the swap: ``compact_store(spark, current_store_path(spark, base),
    next_store_version_path(spark, base))`` makes the compacted copy
    the new current version atomically-on-commit (see
    :func:`store_versions`).
    """
    df = spark.read.parquet(src_path)
    if partition_col not in df.columns:
        raise ValueError(f"{src_path} has no {partition_col!r} column")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(partition_col).count().collect()
    }
    # Per-PARTITION sub-key modulus, not the global max: under skew
    # (one hot cell forcing a high file count) a global modulus splits
    # every small cell into that many tiny files — recreating exactly
    # the small-files problem this function exists to fix. Each cell
    # gets ceil(its_rows / target) sub-buckets via a broadcast-joined
    # per-cell count (a literal map would bloat the plan for stores
    # with many cells; the broadcast join is size-independent).
    files_for = {
        cell: -(-n // target_rows_per_file) for cell, n in counts.items()
    }
    total_files = sum(files_for.values()) or 1
    data_cols = df.columns
    from pyspark.sql.types import IntegerType

    files_df = spark.createDataFrame(
        [(c, int(nf)) for c, nf in files_for.items()] or [(None, 1)],
        schema=df.select(partition_col).schema.add("_nfiles", IntegerType()),
    )
    # eqNullSafe: a NULL partition value is a legitimate cell — the
    # plain name-join's null != null would leave it _nfiles=null and
    # collapse all its rows into one file regardless of target size.
    # coalesce(_nfiles, 1) backstops any key that still misses.
    sub = F.pmod(
        F.xxhash64(*[F.col(c) for c in data_cols]),
        F.coalesce(F.col("_nfiles"), F.lit(1)),
    )
    (
        df.join(
            F.broadcast(files_df),
            df[partition_col].eqNullSafe(files_df[partition_col]),
            "left",
        )
        .drop(files_df[partition_col])
        .repartition(total_files, F.col(partition_col), sub)
        .select(*data_cols)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(dst_path)
    )


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    uri = jvm.java.net.URI.create(path)
    return jvm.org.apache.hadoop.fs.FileSystem.get(
        uri, spark._jsc.hadoopConfiguration()
    )


def store_versions(spark: SparkSession, base_path: str) -> list[int]:
    """Committed version numbers under ``base_path`` (ascending).

    A version is the directory ``_v<N>`` and counts as committed only
    once its writer's success marker exists — ``_SUCCESS`` for batch
    writes, ``_spark_metadata`` for streaming sinks. Spark's output
    committer materializes the marker only after every task commit, so
    a crashed or in-flight write is invisible to readers by
    construction: that, plus never rewriting an existing version, is
    what makes :func:`current_store_path` an atomic pointer without a
    transaction log (the Delta/Iceberg log generalizes exactly this).
    """
    import re

    fs = _hadoop_fs(spark, base_path)
    jvm = spark._jvm
    base = jvm.org.apache.hadoop.fs.Path(base_path)
    if not fs.exists(base):
        return []
    out = []
    for st in fs.listStatus(base):
        name = st.getPath().getName()
        m = re.fullmatch(r"_v(\d+)", name)
        if not m or not st.isDirectory():
            continue
        committed = fs.exists(
            jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
        ) or fs.exists(
            jvm.org.apache.hadoop.fs.Path(st.getPath(), "_spark_metadata")
        )
        if committed:
            out.append(int(m.group(1)))
    return sorted(out)


def current_store_path(spark: SparkSession, base_path: str) -> str:
    """Resolve the newest committed version — what readers open."""
    vs = store_versions(spark, base_path)
    if not vs:
        raise FileNotFoundError(f"no committed store version under {base_path}")
    return f"{base_path}/_v{vs[-1]}"


def next_store_version_path(spark: SparkSession, base_path: str) -> str:
    """Path for the next version — what writers (ingest bootstrap,
    :func:`compact_store`) target. Versions are append-only: a rewrite
    lands in a NEW directory and becomes current only when its success
    marker commits, so concurrent readers of the old version are never
    disturbed and a failed rewrite changes nothing."""
    vs = store_versions(spark, base_path)
    return f"{base_path}/_v{(vs[-1] + 1) if vs else 1}"
