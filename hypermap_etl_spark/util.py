"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
