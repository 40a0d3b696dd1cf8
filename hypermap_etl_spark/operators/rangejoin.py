"""Bucketed interval join — the point-in-range join Spark has no good
native plan for.

A predicate like ``p BETWEEN lo AND hi`` with no equi-key gives Catalyst
nothing to hash on: the physical plan degenerates to
BroadcastNestedLoopJoin (or CartesianProduct), O(|points| × |intervals|)
compares — the classic scale-killer for time-window joins at 100 TB.

The standard fix (used by every warehouse range-join implementation,
e.g. the published Databricks range-join optimization and the
bucketing recipe in the open literature): quantize the range dimension
into fixed-width buckets,

  - each point maps to exactly ONE bucket (its own),
  - each interval is exploded to every bucket it overlaps
    (≈ length/bucket_width rows, a small constant when the width is
    chosen near the typical interval length),

then equi-join on the bucket id — hashable, shuffle-partitionable,
AQE-skew-splittable — and re-check the exact predicate to discard the
same-bucket-but-outside-range pairs. Each qualifying (point, interval)
pair survives exactly once because the point's bucket is unique, so no
distinct step is needed.

Beyond-reference extension: the reference has equi-joins only
(/root/reference — SURVEY.md §2.4 "no theta/range/as-of/interval joins
anywhere"); this is the interval counterpart to operators/asof.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner-join every point to every interval containing it
    (inclusive bounds: lo <= p <= hi), as a bucket equi-join.

    All three range columns must be nonnegative integers on the same
    scale (e.g. epoch micros) — integral ``div`` is floor there, which
    keeps the bucket math exact where float division of large epochs
    would not be. Column names must be disjoint between the two inputs.

    ``bucket_width`` tunes the explode factor: an interval emits
    (hi div w) - (lo div w) + 1 bucket rows. Pick it near the typical
    interval length (1 row for most intervals, never a blowup); Spark's
    sequence-length guard fails loudly if a pathological interval would
    explode past it, rather than silently producing a giant join.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    w = int(bucket_width)
    pb = points.withColumn("__bucket", F.expr(f"{point_col} div {w}"))
    ib = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(F.expr(f"{lo_col} div {w}"), F.expr(f"{hi_col} div {w}"))),
    )
    return (
        pb.join(ib, "__bucket")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col)))
        .drop("__bucket")
    )
