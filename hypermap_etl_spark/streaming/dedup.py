"""Streaming deduplication — the streaming analog of operators/dedup.py
for continuous document/event ingest.

Two engine-native strategies, picked by memory model:

  dedup_stream_exact      dropDuplicatesWithinWatermark: state holds
                          one entry per key but is EVICTED once the
                          watermark passes — bounded state for unbounded
                          streams, the only viable shape at 100 TB/day.
                          Duplicates arriving within the lateness bound
                          are dropped; later re-arrivals are a table-
                          side concern (the MERGE sink is idempotent,
                          so stream dedup is an optimization that cuts
                          sink work, not a correctness requirement).
  dedup_stream_keyed      dropDuplicates on the key alone: exact across
                          the whole stream but state grows O(distinct
                          keys) forever — correct for bounded key
                          domains (e.g. a catch-up over a finite log),
                          documented as NOT the unbounded-stream choice.

Content keying uses md5(text) like the batch operator, so the stream
and batch paths agree on what "identical" means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_content_key(df: DataFrame, text_col: str = "text") -> DataFrame:
    """md5 content key, identical to operators/dedup.exact_dedup's."""
    return df.withColumn("__content_key", F.md5(F.col(text_col)))


def dedup_stream_exact(
    stream: DataFrame,
    time_col: str,
    delay: str = "10 minutes",
    text_col: str = "text",
) -> DataFrame:
    """Bounded-state streaming exact dedup: keep exactly one arrival of
    each content key (which one is arrival-order dependent within a
    micro-batch), evict state once ``time_col`` passes the watermark.
    Use over unbounded streams.
    """
    return (
        with_content_key(stream, text_col)
        .withWatermark(time_col, delay)
        .dropDuplicatesWithinWatermark(["__content_key"])
        .drop("__content_key")
    )


def dedup_stream_keyed(stream: DataFrame, key_cols: list[str]) -> DataFrame:
    """Whole-stream dedup on explicit keys (state grows with distinct
    keys — bounded key domains only, e.g. event_id during a finite
    catch-up)."""
    return stream.dropDuplicates(key_cols)
