"""Streaming A/B monitor — the streaming face of
profile.welch_ab_test.

Per micro-batch, rows collapse to per-(group, arm) MOMENT partials —
(n, Σv, Σv²) in exact long/decimal — written to the batch's own
partition of a moment STORE:

    store/
      batch_id=0/ … batch_id=N/    (group…, __arm, n, s, ss) rows

Replayed batches after a crash OVERWRITE their own partition
(effectively-once by layout — the drift/topk store discipline), and
a batch at or below the compaction watermark is skipped entirely.
Moments are ADDITIVE partials: reading the store is one SUM by
(group, arm), which equals the single-batch aggregate bit-for-bit
because decimal sums associate exactly. The verdict is then the SAME
epilogue batch processing uses (profile.welch_from_moments), so a
live experiment dashboard and an offline rerun can never disagree.

Store size: one (groups × 2)-row file per batch — telemetry-is-a-
table; ``ab_store_compact`` folds history when file count matters.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hypermap_etl_spark.operators.profile import _hash_arm, welch_from_moments
from hypermap_etl_spark.streaming.drift import _folded_through


def start_ab_stream(
    stream: DataFrame,
    value_col: str,
    unit_col: str,
    group_cols: list[str],
    store_path: str,
    checkpoint: str,
    salt: str = "ab",
    once: bool = True,
    on_progress=None,
):
    """Fold a stream into the per-batch arm-moment store. Arm
    assignment is the one md5 split every batch operator uses
    (profile._hash_arm), so the streamed experiment IS the batch
    experiment."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        if batch_id <= _folded_through(store_path):
            return
        v = F.col(value_col).cast("decimal(12,2)")
        partial = (
            batch.filter(v.isNotNull() & F.col(unit_col).isNotNull())
            .select(
                *group_cols,
                _hash_arm(unit_col, salt).alias("__arm"),
                v.alias("__v"),
            )
            .groupBy(*group_cols, "__arm")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("__v").cast("decimal(38,2)").alias("s"),
                F.sum(F.col("__v") * F.col("__v"))
                .cast("decimal(38,4)")
                .alias("ss"),
            )
        )
        dest = os.path.join(store_path, f"batch_id={batch_id}")
        partial.write.mode("overwrite").parquet(dest)
        if on_progress is not None:
            on_progress(
                batch_id, batch.sparkSession.read.parquet(dest).count()
            )

    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ab_store_read(
    spark: SparkSession, store_path: str, group_cols: list[str]
) -> DataFrame:
    """Accumulated arm moments: SUM the per-batch partials. Scan cost
    is batches × groups × 2 rows — the aggregate's size, never the
    stream's."""
    return (
        spark.read.parquet(store_path)
        .groupBy(*group_cols, "__arm")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("s").cast("decimal(38,2)").alias("s"),
            F.sum("ss").cast("decimal(38,4)").alias("ss"),
        )
    )


def ab_verdict(
    spark: SparkSession,
    store_path: str,
    group_cols: list[str],
    crit: float = 1.96,
) -> DataFrame:
    """Current Welch verdict over everything streamed so far — the
    batch epilogue re-run on the summed store, so streaming and batch
    verdicts agree by construction (decimal partials associate
    exactly)."""
    return welch_from_moments(
        ab_store_read(spark, store_path, group_cols), group_cols, crit=crit
    )


def ab_store_compact(
    spark: SparkSession, store_path: str, group_cols: list[str]
) -> int:
    """Fold all per-batch partitions into batch_id=-1 under the same
    additive reduction — answer-equivalent, file count bounded; the
    ``_folded_through`` watermark keeps a crash-replayed batch from
    re-creating a folded partition. Staged-swap + crash recovery via
    the shared :func:`hypermap_etl_spark.streaming.store.compact_store`."""
    from hypermap_etl_spark.streaming.store import compact_store

    return compact_store(
        spark,
        store_path,
        lambda df: df.groupBy(*group_cols, "__arm").agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("s").cast("decimal(38,2)").alias("s"),
            F.sum("ss").cast("decimal(38,4)").alias("ss"),
        ),
    )
