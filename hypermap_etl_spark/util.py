"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
