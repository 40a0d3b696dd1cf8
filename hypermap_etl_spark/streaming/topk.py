"""Streaming frequent items — heavy hitters over an unbounded stream
in bounded state, the streaming face of sketch.mg_topk.

Per micro-batch, the batch collapses to a ≤ k-entry Misra-Gries
summary (operators/sketch.mg_topk — bounded memory however large or
high-cardinality the batch is) written to a per-batch partition of a
summary STORE:

    store/
      batch_id=0/ … batch_id=N/    ≤ k (item, est_count) rows each

Replayed batches after a crash OVERWRITE their own partition, so the
store is effectively-once without any read-modify-write — the same
idempotency-by-layout discipline as the streaming MERGE sink
(streaming/scan.py) and the signature store (operators/dedup.py).

Reading the current top items = merging all per-batch summaries
(sketch.mg_merge_summaries, the mergeable-summaries reduction); by
Agarwal et al. 2012 the merged estimate keeps the global guarantee:
every item with true frequency > n_total/(k+1) is present, with
true − n_total/(k+1) ≤ est ≤ true. The store grows one k-row file per
batch; ``topk_store_compact`` folds history to a single summary
partition when file count matters (the HLL "sketch table" pattern:
telemetry is a table you fold, not a query you re-run).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hypermap_etl_spark.operators.sketch import mg_merge_summaries, mg_topk


def start_topk_stream(
    stream: DataFrame,
    value_col: str,
    store_path: str,
    checkpoint: str,
    k: int = 64,
    once: bool = True,
    on_progress=None,
):
    """Fold a stream's value column into the per-batch MG summary
    store. ``once`` uses availableNow (catch-up then stop) — pass
    False for a continuous trigger."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        # a batch folded into batch_id=-1 by compaction must not be
        # re-created by a post-crash replay (double-counted forever)
        if batch_id <= _folded_through(store_path):
            return
        summ = mg_topk(batch, value_col, k=k)
        dest = os.path.join(store_path, f"batch_id={batch_id}")
        summ.write.mode("overwrite").parquet(dest)
        if on_progress is not None:
            # count the ≤ k written rows — never re-run the MG pipeline
            on_progress(batch_id, batch.sparkSession.read.parquet(dest).count())

    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


from hypermap_etl_spark.streaming.store import folded_through as _folded_through


def topk_store_read(spark: SparkSession, store_path: str, k: int) -> DataFrame:
    """Current heavy-hitter summary: merge every per-batch summary in
    the store down to ≤ k (item, est_count) rows. The scan reads
    batches × k tiny rows — model-sized however long the stream ran."""
    df = spark.read.parquet(store_path).select(
        "item", F.col("est_count").alias("cnt")
    )
    return mg_merge_summaries(df, k)


def topk_store_compact(spark: SparkSession, store_path: str, k: int) -> int:
    """Fold all per-batch partitions into one summary partition
    (batch_id=-1, merged under the same reduction so the guarantee is
    unchanged). Returns the number of partitions folded. Safe against
    concurrent appends of NEW batches: only the partitions read are
    replaced. Staged-swap + crash recovery via the shared
    :func:`hypermap_etl_spark.streaming.store.compact_store`."""
    from hypermap_etl_spark.streaming.store import compact_store

    return compact_store(
        spark,
        store_path,
        lambda df: mg_merge_summaries(
            df.select("item", F.col("est_count").alias("cnt")), k
        ),
    )
