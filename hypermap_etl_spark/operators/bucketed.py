"""Bucketed-table layout for co-located (exchange-free) joins.

The directory partitioning in merge.py prunes SCANS; bucketing fixes
JOINS: two tables bucketed on the same key with the same bucket count
are joined without ANY shuffle — each task reads bucket i of both
sides. At 100 TB this is the difference between re-shuffling the fact
table on every events⋈entries query and never shuffling it again
after load.

Spark requires bucketed tables to live in a catalog (`saveAsTable`);
with an explicit ``path`` they are external tables, so the data sits
wherever the lake wants it and only the bucket metadata lives in the
metastore. Join both sides bucketed on the join key and the plan shows
SortMergeJoin with ZERO Exchange operators (pinned in
tests/test_plans.py::test_bucketed_join_has_no_exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    path: str | None = None,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``bucket_col``.

    Sorting within buckets additionally removes the join's Sort step
    (sort-merge join reads both sides pre-sorted). Bucket count must
    match on both join sides; pick it once per key domain (32 here
    mirrors the cluster-core default elsewhere in the engine).
    """
    writer = df.write.format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    if path:
        writer = writer.option("path", path)
    writer.mode("overwrite").saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog —
    a plain spark.read.parquet(path) would lose it)."""
    return spark.table(table_name)
