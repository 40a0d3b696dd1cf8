"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Repartition a narrow input before CPU-heavy per-row work.

    A single small parquet file scans as ONE task (maxPartitionBytes
    sizing), which would serialize compute-bound stages (hashing,
    similarity kernels, ABI decode) no matter how many cores exist. At
    lake scale inputs arrive in thousands of splits and this shuffle is
    skipped by the caller or costs ~nothing relative to the work it
    parallelizes — the round-robin exchange moves only the narrow input
    rows once.
    """
    sc = df.sparkSession.sparkContext
    n = partitions or sc.defaultParallelism
    return df.repartition(n)


def paginate(df: DataFrame, order_by: list[Column], page: int, limit: int) -> DataFrame:
    """Skip/limit pagination without a global single-partition sort.

    A bare ``row_number() OVER (ORDER BY ...)`` window shuffles every
    filtered row to ONE task — the classic deep-pagination scale-killer.
    Since skip+limit is known and small (pages are user-facing), the
    scale-safe plan is:

      1. ``orderBy(...).limit(skip+limit)`` → TakeOrderedAndProject:
         each partition keeps its local top-(skip+limit), the driver
         merges bounded heaps — no full sort, no single-task shuffle.
      2. row_number over the ≤ skip+limit survivors (trivially small)
         to drop the first ``skip``.

    ``order_by`` must be a total order (tie-broken) for stable pages.
    """
    page, limit = max(1, int(page)), int(limit)
    top = df.orderBy(*order_by).limit(page * limit)
    if page == 1:
        return top
    skip = (page - 1) * limit
    w = Window.orderBy(*order_by)
    return (
        top.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > skip)
        .drop("__rn")
    )


def stage_boundary(df: DataFrame) -> DataFrame:
    """Hard plan barrier: materialize ``df`` and cut lineage.

    Catalyst fuses adjacent projections (CollapseProject) and pushes
    filters through exchanges all the way into the scan. When a frame is
    produced by one heavy expression pipeline and consumed by another
    (e.g. ABI *encode* feeding the ABI *decode* operator in the
    roundtrip fixture), that fusion substitutes the producer's whole
    expression tree into every consumer expression — the generated
    method blows janino's 64 KB limit and the stage silently falls back
    to interpreted eval (observed: BENCH_r01 hm_decode_roundtrip, 4.5 s
    of a 13.4 s bench).

    ``persist()`` puts an InMemoryRelation between producer and
    consumer: the consumer plans against the cache's opaque output
    attributes, so neither projection collapse nor pushdown
    substitution can cross it — exactly the shape production has,
    where encode writes to storage and decode reads raw logs back.
    Measured against the alternatives at sf0.1 (roundtrip wall time):
    persist 0.97 s, temp-parquet write/read 1.6 s, localCheckpoint
    3.1 s (InternalRow serialization dominates). The columnar cache is
    LRU-evicted, so not unpersisting per-query frames is safe.
    """
    return df.persist()


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple],
    salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed keys.

    Stage 1 groups by (key, random-salt) so one hot key fans out over
    ``salt`` reducers; stage 2 re-combines the partials per key. AQE's
    skew-join splitting covers joins, but a single monster group in a
    groupBy still lands on one task without this.

    aggs: output_name → (column, partial_fn, combine_fn), e.g.
    {"n": (F.lit(1), F.count, F.sum), "total": (F.col("v"), F.sum, F.sum)}
    — each partial/combine pair must be algebraic (count→sum, sum→sum,
    min→min, max→max).
    """
    salted = df.withColumn("__salt", (F.rand(seed=0) * salt).cast("int"))
    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[pf(col).alias(f"__p_{name}") for name, (col, pf, _cf) in aggs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[cf(F.col(f"__p_{name}")).alias(name) for name, (_col, _pf, cf) in aggs.items()]
    )
