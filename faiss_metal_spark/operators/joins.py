"""Temporal join operators Spark SQL lacks as built-ins.

The reference has no joins at all (SURVEY §2.9); event-pipeline
engines need AS-OF semantics constantly ("state of X at the time of
Y"). Implemented as compositions of existing DataFrame ops — no UDF,
one shuffle — so Catalyst keeps pushdown/pruning and the shape scales:

- ``as_of_join`` — for each left row, the most recent right row with
  ``right.ts <= left.ts`` on the same key. The classic scalable plan is
  union-tag-and-carry-forward: tag both inputs, sort within key by
  (ts, tag), carry right values forward with ``last(ignorenulls)``,
  keep left rows. One hash-partition by key; no range-explode, no
  per-row probe — at 100 TB this is a single shuffle of both inputs.
- ``range_bucket_join`` — join points to half-open ranges by bucketing
  both sides to a fixed granule so the theta condition becomes an
  equi-join key plus a residual filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    inclusive: bool = True,
) -> DataFrame:
    """Left rows + latest right values as of each left timestamp.

    Matching is inclusive (``right.ts <= left.ts``) by default, the
    ASOF JOIN convention. Right-side ties on (key, ts): the greatest
    row wins deterministically (last carried forward after a stable
    sort on the value columns).

    Returns all left columns plus ``value_cols`` (null when no right
    row precedes the left row).
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    # tag order decides equal-timestamp semantics: right sorts before
    # left iff inclusive, so a right row at exactly left.ts is visible
    right_tag, left_tag = (0, 1) if inclusive else (1, 0)

    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(left_tag).alias("_tag"),
        F.struct(*left.columns).alias("_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(right_tag).alias("_tag"),
        F.lit(None).cast(
            l_tagged.schema["_left"].dataType
        ).alias("_left"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )

    # the struct tiebreaker makes equal-(key, ts) right rows carry a
    # deterministic winner (the greatest value tuple)
    tie = F.struct(*[F.col(f"_v_{c}") for c in value_cols]).asc_nulls_first()
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_tag").asc(), tie)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "_tag",
        "_left",
        *[F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_cf_{c}") for c in value_cols],
    )
    out = carried.where(F.col("_tag") == left_tag).select(
        *[F.col(f"_left.{c}").alias(c) for c in left.columns],
        *[F.col(f"_cf_{c}").alias(c) for c in value_cols],
    )
    return out


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Inner equi-join that survives heavy key skew.

    A hot key sends all its rows to one reducer in a plain shuffle
    join; salting splits each left key's rows across ``n_salts``
    sub-partitions (deterministically, by hashing ``salt_col``) and
    replicates the right side once per salt — reducer load shrinks by
    n_salts at the cost of n_salts× the (small) right side. AQE's skew
    handling covers sort-merge joins adaptively; this is the explicit
    form for when the build side must shuffle anyway. Result equals the
    plain join exactly (pinned by test).
    """
    l_s = left.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)).cast("int")
    )
    salts = left.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
    r_s = right.crossJoin(salts)
    return l_s.join(r_s, [on, "_salt"]).drop("_salt")


def range_bucket_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    granule: float,
) -> DataFrame:
    """Join points to half-open ranges [lo, hi) without a theta join.

    Each range explodes to its covering granules; points bucket to one
    granule — the join is an equi-join on the bucket id plus a residual
    bounds filter. Shuffle volume is points + Σ range-width/granule
    rows instead of |points|·|ranges|. Granule choice trades fan-out
    against bucket skew; pick ≈ median range width.
    """
    p = points.withColumn("_b", F.floor(F.col(point_col) / F.lit(granule)).cast("long"))
    r = ranges.withColumn(
        "_bs",
        F.sequence(
            F.floor(F.col(lo_col) / F.lit(granule)).cast("long"),
            F.floor((F.col(hi_col) - F.lit(1e-9)) / F.lit(granule)).cast("long"),
        ),
    ).withColumn("_b", F.explode("_bs")).drop("_bs")
    return (
        p.join(r, "_b")
        .where((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("_b")
    )
