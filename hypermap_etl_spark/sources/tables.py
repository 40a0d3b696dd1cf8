"""Loaders for the driver's parquet star schema (TESTDATA.md).

Reads are plain ``spark.read.parquet`` so Catalyst gets predicate
pushdown + column pruning into the scan for free. At 100 TB the same
call reads a partitioned lake directory; nothing here changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimensions we always broadcast in joins; at any realistic scale
# these stay tiny relative to fact tables.
DIM_TABLES = {"region", "nation", "customer", "supplier", "part"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS); Spark reads it as long
        # (legacy nanosAsLong conf, set in get_spark) — normalize to a
        # proper microsecond TimestampType column. `div` keeps the
        # arithmetic in exact integer math (ns values exceed 2^53).
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for spark.sql use."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
