"""T1-T5: continuous ingest as Structured Streaming (SURVEY.md §2.8).

The reference's scan loop polls the chain head every 30 s and processes
new block ranges in chunks (/root/reference/scripts/scan-events.ts:
123-168). Spark-first mapping:

  T1 continuous tail      readStream file source +
                          trigger(processingTime='30 seconds')
  T2 checkpoint/resume    checkpointLocation (exactly-once source
                          progress); batch resume = high-water mark
  T3 effectively-once     foreachBatch → MERGE on event_id (idempotent
                          sink; at-least-once delivery × idempotent
                          upsert = effectively-once, same equation as
                          the reference's _id bulkWrite)
  T4 rate control         maxFilesPerTrigger (the chunk-size analog)
  T5 progress telemetry   query.lastProgress / StreamingQueryListener

Beyond-parity extension (the reference cannot have late data because
block numbers are totally ordered): event-time tumbling windows with a
watermark over an out-of-order event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hypermap_etl_spark.operators.decode import parse_raw_logs
from hypermap_etl_spark.operators.merge import merge_into_parquet
from hypermap_etl_spark.schemas import RAW_LOG_SCHEMA


def read_raw_log_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 10
) -> DataFrame:
    """Unbounded raw-log source: files landing in ``path`` (each file =
    one fetched chunk, the eth_getLogs analog)."""
    return (
        spark.readStream.schema(RAW_LOG_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def start_ingest_stream(
    spark: SparkSession,
    source_path: str,
    table_path: str,
    checkpoint_path: str,
    trigger: dict | None = None,
    max_files_per_trigger: int = 10,
):
    """Decode + idempotently MERGE each micro-batch into the events table.

    trigger: e.g. {"availableNow": True} for catch-up (the reference's
    chunked backfill), {"processingTime": "30 seconds"} for the
    continuous tail. Returns the StreamingQuery.
    """
    raw = read_raw_log_stream(spark, source_path, max_files_per_trigger)

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        events = parse_raw_logs(batch_df)
        merge_into_parquet(spark, table_path, events, ["event_id"])

    writer = raw.writeStream.foreachBatch(_merge_batch).option(
        "checkpointLocation", checkpoint_path
    )
    trigger = trigger or {"availableNow": True}
    return writer.trigger(**trigger).start()


def start_index_stream(
    spark: SparkSession,
    source_path: str,
    table_path: str,
    entries_path: str,
    checkpoint_path: str,
    trigger: dict | None = None,
    max_files_per_trigger: int = 10,
):
    """Continuous `index-events`: per micro-batch, MERGE decoded events
    into the events table AND incrementally update the materialized
    entries (only the namehashes the batch touches —
    operators/materialize.incremental_entries_update). The streaming
    equivalent of the reference's index loop
    (/root/reference/scripts/index-events.ts:216), with per-batch work
    O(touched entries) instead of a full refold.
    """
    from hypermap_etl_spark.operators.materialize import incremental_entries_update

    raw = read_raw_log_stream(spark, source_path, max_files_per_trigger)

    def _index_batch(batch_df: DataFrame, batch_id: int) -> None:
        events = parse_raw_logs(batch_df)
        if events.isEmpty():
            return
        merge_into_parquet(spark, table_path, events, ["event_id"])
        full_log = spark.read.parquet(table_path)
        incremental_entries_update(spark, entries_path, full_log, events)

    writer = raw.writeStream.foreachBatch(_index_batch).option(
        "checkpointLocation", checkpoint_path
    )
    trigger = trigger or {"availableNow": True}
    return writer.trigger(**trigger).start()


def high_water_mark(spark: SparkSession, table_path: str) -> int | None:
    """T2 batch-resume cursor: next scan starts at max(blockNumber)+1
    (mirrors /root/reference/scripts/status.ts:96-99)."""
    import os

    if not os.path.exists(table_path):
        return None
    row = spark.read.parquet(table_path).agg(F.max("blockNumber").alias("m")).collect()[0]
    return row["m"]


def streaming_type_counts(
    spark: SparkSession, source_path: str, max_files_per_trigger: int = 10
) -> DataFrame:
    """A6 as a streaming aggregate: running per-type counts over the
    decoded stream (update output mode when started)."""
    raw = read_raw_log_stream(spark, source_path, max_files_per_trigger)
    return parse_raw_logs(raw).groupBy("eventType").count()


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time tumbling window with late-data watermark (extension;
    the reference needs none because block order is total)."""
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
        )
    )
