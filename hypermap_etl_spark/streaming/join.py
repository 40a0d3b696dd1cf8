"""Watermarked stream-stream interval join — event attribution.

The classic streaming correlation: join two live event streams (e.g.
clicks and purchases) on a key where the right event lands within a
bounded interval AFTER the left one. This is the one join shape
Structured Streaming can run with BOUNDED state: both sides carry an
event-time watermark and the join condition constrains the two event
times relative to each other, so Spark can prove when a buffered row
can never match again and evict it.

Scale shape: state per executor is (watermark horizon × arrival rate)
rows per side, independent of stream length; the join itself shuffles
both sides by the equi-key exactly like a batch SortMergeJoin. Without
the time bound (or with only one watermark) Spark would have to keep
EVERY past row of both sides — the unbounded-state trap this operator
exists to avoid.

Beyond the reference (its tail is a single-stream indexer), but the
natural extension of its continuous-scan design (SURVEY §2.8) to
multi-stream correlation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    max_lag_seconds: int = 600,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inner-join two watermarked event streams: rows pair when they
    share ``key`` and the right event's ts falls in
    [left.ts, left.ts + max_lag_seconds]. Returns the streaming
    DataFrame (left_id, right_id, key, left_ts, right_ts, lag_seconds).

    Both watermarks are REQUIRED for state eviction: Spark derives the
    per-side retention from the watermark delta plus the interval
    bounds. Keep ``watermark`` >= the worst expected cross-stream
    skew; rows later than that are dropped, the documented lateness
    contract (same policy as windowed_event_counts).
    """
    l = left.withWatermark("ts", watermark).alias("l")
    r = right.withWatermark("ts", watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr(f"INTERVAL {max_lag_seconds} SECONDS"))
    )
    return l.join(r, cond, "inner").select(
        F.col("l.event_id").alias("left_id"),
        F.col("r.event_id").alias("right_id"),
        F.col(f"l.{key}").alias(key),
        F.col("l.ts").alias("left_ts"),
        F.col("r.ts").alias("right_ts"),
        (F.unix_timestamp("r.ts") - F.unix_timestamp("l.ts")).alias("lag_seconds"),
    )


def start_attribution_stream(
    spark: SparkSession,
    left_path: str,
    right_path: str,
    out_path: str,
    checkpoint_path: str,
    key: str = "user_id",
    max_lag_seconds: int = 600,
    watermark: str = "10 minutes",
    trigger: dict | None = None,
    max_files_per_trigger: int = 10,
):
    """File-source form: tail two parquet event directories, append the
    attributed pairs to ``out_path``. Returns the StreamingQuery."""
    def _read(path: str) -> DataFrame:
        return (
            spark.readStream.schema(EVENT_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path)
        )

    joined = interval_join_streams(
        _read(left_path),
        _read(right_path),
        key=key,
        max_lag_seconds=max_lag_seconds,
        watermark=watermark,
    )
    writer = (
        joined.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
    )
    trigger = trigger or {"availableNow": True}
    return writer.trigger(**trigger).start()
