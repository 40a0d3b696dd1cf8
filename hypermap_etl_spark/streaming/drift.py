"""Streaming ingestion-drift monitor — the streaming face of
profile.cusum_drift.

Per micro-batch, the batch collapses to per-(group, day) partial
counts written to the batch's own partition of a count STORE:

    store/
      batch_id=0/ … batch_id=N/    (group…, day, c) rows each

Replayed batches after a crash OVERWRITE their own partition —
effectively-once by layout, the same idempotency discipline as the
MG summary store (streaming/topk.py) and the streaming MERGE sink.
Counts are additive partials, so reading the store = one SUM by
(group, day) — exactly the series batch processing would have seen,
however the stream was chopped into batches. The CUSUM verdict is then
re-derived by the SAME batch operator (cusum_drift with count_col), so
streaming and batch can never disagree on what "drifted" means.

Store size: one (groups × days-touched)-row file per batch — the
telemetry-is-a-table pattern; ``drift_store_compact`` folds history
when file count matters.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hypermap_etl_spark.operators.profile import cusum_drift


def start_drift_stream(
    stream: DataFrame,
    day_col: str,
    group_cols: list[str],
    store_path: str,
    checkpoint: str,
    once: bool = True,
    on_progress=None,
):
    """Fold a stream into the per-batch daily-count store. ``day_col``
    and ``group_cols`` must be columns of the stream (the caller
    derives day strings, e.g. date_format(ts, 'yyyy-MM-dd'), so the
    grain is explicit). ``once`` uses availableNow."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        # a batch at or below the compaction watermark was already
        # folded into batch_id=-1; a post-crash REPLAY of it must not
        # re-create its partition (that would double-count forever)
        if batch_id <= _folded_through(store_path):
            return
        partial = batch.groupBy(*group_cols, day_col).agg(
            F.count(F.lit(1)).cast("long").alias("c")
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


def drift_store_read(
    spark: SparkSession, store_path: str, day_col: str, group_cols: list[str]
) -> DataFrame:
    """The accumulated daily series: SUM the per-batch partials by
    (group, day). Scan cost is batches × touched-days rows — the
    aggregate's size, never the stream's."""
    return (
        spark.read.parquet(store_path)
        .groupBy(*group_cols, day_col)
        .agg(F.sum("c").cast("long").alias("c"))
    )


def drift_verdict(
    spark: SparkSession,
    store_path: str,
    day_col: str,
    group_cols: list[str],
    threshold: float = 3.0,
) -> DataFrame:
    """Current CUSUM verdict over everything ingested so far — the
    batch operator re-run on the store, so the verdict is
    batch/stream-agnostic by construction."""
    series = drift_store_read(spark, store_path, day_col, group_cols)
    return cusum_drift(
        series, day_col, group_cols, threshold=threshold, count_col="c"
    )


def seasonality_verdict(
    spark: SparkSession,
    store_path: str,
    day_col: str,
    group_cols: list[str],
    lags: list[int] | None = None,
) -> DataFrame:
    """Daily-count autocorrelation over everything ingested so far —
    the same store powers the level monitor (drift_verdict) and this
    seasonality screen; both re-run their batch operator on the summed
    partials, so streaming and batch verdicts agree by construction."""
    from hypermap_etl_spark.operators.profile import autocorr_daily

    series = drift_store_read(spark, store_path, day_col, group_cols)
    return autocorr_daily(
        series, day_col, group_cols, lags=lags, count_col="c"
    )


def ewma_verdict(
    spark: SparkSession,
    store_path: str,
    day_col: str,
    group_cols: list[str],
    alpha: float = 0.3,
    lookback: int = 7,
    rel_threshold: float = 0.5,
) -> DataFrame:
    """Per-DAY anomaly flags over everything ingested so far — the
    third face of the count store (CUSUM answers "did the level
    shift", autocorrelation "is there a cycle", this "which single
    days are off"). Same construction: the batch operator
    (profile.ewma_anomaly with count_col) re-run on the summed
    partials, so streaming and batch flags agree by construction."""
    from hypermap_etl_spark.operators.profile import ewma_anomaly

    series = drift_store_read(spark, store_path, day_col, group_cols)
    return ewma_anomaly(
        series,
        day_col,
        group_cols,
        alpha=alpha,
        lookback=lookback,
        rel_threshold=rel_threshold,
        count_col="c",
    )


from hypermap_etl_spark.streaming.store import folded_through as _folded_through


def drift_store_compact(spark: SparkSession, store_path: str,
                        day_col: str, group_cols: list[str]) -> int:
    """Fold all per-batch partitions into one (batch_id=-1) under the
    same additive reduction — answer-equivalent, file count bounded.
    Only the partitions read are replaced, so a batch appended
    concurrently is never double-counted; the ``_folded_through``
    watermark keeps a CRASH-REPLAYED batch from re-creating a folded
    partition. Staged-swap + crash recovery via
    :func:`hypermap_etl_spark.streaming.store.compact_store` (shared
    with the top-k, A/B-moment, and quantile-histogram stores)."""
    from hypermap_etl_spark.streaming.store import compact_store

    return compact_store(
        spark,
        store_path,
        lambda df: df.groupBy(*group_cols, day_col).agg(
            F.sum("c").cast("long").alias("c")
        ),
    )
