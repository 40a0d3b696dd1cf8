"""Streaming EXACT quantiles — no sketch, no epsilon.

Quantiles do not merge, but value HISTOGRAMS do: per micro-batch,
rows collapse to (group, value[decimal(12,2)], count) partials written
to the batch's own partition of a histogram STORE (the
drift/topk/abmonitor layout — idempotent by batch_id overwrite, with
the compaction watermark guarding crash replays). Counts are additive,
so reading the store is one SUM by (group, value), and the exact lower
q-quantile over everything streamed so far is recovered by the same
cumulative-count pick rule the batch quantile family uses (integer
cum·den >= tot·num, q as an exact Fraction) — streaming and batch
quantiles are equal by construction, at any chop. Because the store
is ALREADY collapsed to the bounded decimal grid, the running sum
here is a plain group-partitioned window over grid rows (the batch
operators' range-partition machinery exists for RAW corpus values,
which this store never holds).

The store is bounded by the DISTINCT quantized values per group
(decimal(12,2) grid), not by stream length — the same distinct-value
collapse the exact batch quantile family already rides. For genuinely
unbounded-cardinality values, quantize coarser upstream; the grid is
the honest contract, not a hidden estimate.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hypermap_etl_spark.streaming.drift import _folded_through


def start_quantile_stream(
    stream: DataFrame,
    value_col: str,
    group_cols: list[str],
    store_path: str,
    checkpoint: str,
    once: bool = True,
):
    """Fold a stream into the per-batch value-histogram store."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        if batch_id <= _folded_through(store_path):
            return
        v = F.col(value_col).cast("decimal(12,2)")
        partial = (
            batch.filter(v.isNotNull())
            .select(*group_cols, v.alias("v"))
            .groupBy(*group_cols, "v")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        partial.write.mode("overwrite").parquet(
            os.path.join(store_path, f"batch_id={batch_id}")
        )

    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def quantile_store_read(
    spark: SparkSession, store_path: str, group_cols: list[str]
) -> DataFrame:
    """Accumulated value histogram: SUM the per-batch partials. Scan
    cost is batches × distinct quantized values — never stream rows."""
    return (
        spark.read.parquet(store_path)
        .groupBy(*group_cols, "v")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def quantile_store_compact(
    spark: SparkSession, store_path: str, group_cols: list[str]
) -> int:
    """Fold all per-batch histogram partitions into batch_id=-1 under
    the same additive (group, v) SUM — answer-equivalent, file count
    bounded by the decimal grid. Staged-swap + crash recovery via the
    shared :func:`hypermap_etl_spark.streaming.store.compact_store`."""
    from hypermap_etl_spark.streaming.store import compact_store

    return compact_store(
        spark,
        store_path,
        lambda df: df.groupBy(*group_cols, "v").agg(
            F.sum("c").cast("long").alias("c")
        ),
    )


def quantile_verdict(
    spark: SparkSession,
    store_path: str,
    group_cols: list[str],
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact lower q-quantiles over everything streamed so far — the
    integer pick rule over the summed histogram, so a live p99 equals
    the offline rerun bit-for-bit."""
    from fractions import Fraction

    from pyspark.sql.window import Window

    hist = quantile_store_read(spark, store_path, group_cols)
    fracs = [Fraction(str(q)) for q in qs]
    if not fracs or any(not 0 < f <= 1 for f in fracs):
        raise ValueError("quantile_verdict: every q must be in (0, 1]")
    w_run = (
        Window.partitionBy(*group_cols)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    cum = hist.select(
        *group_cols,
        "v",
        F.sum("c").over(w_run).alias("__cum"),
        F.sum("c").over(w_all).alias("__tot"),
    )
    qarr = F.array(
        *[
            F.struct(
                F.lit(float(f)).alias("q"),
                F.lit(f.numerator).alias("__num"),
                F.lit(f.denominator).alias("__den"),
            )
            for f in fracs
        ]
    )
    exploded = cum.select(
        *group_cols, "v", "__cum", "__tot", F.explode(qarr).alias("__q")
    ).filter(
        F.col("__cum").cast("decimal(38,0)") * F.col("__q.__den")
        >= F.col("__tot").cast("decimal(38,0)") * F.col("__q.__num")
    )
    return (
        exploded.groupBy(*group_cols, F.col("__q.q").alias("q"))
        .agg(
            F.min("v").cast("double").alias("value"),
            F.first(F.col("__tot")).cast("long").alias("n_rows"),
        )
        .orderBy(*group_cols, "q")
    )
