"""J1: block-timestamp enrichment as a broadcast left join (SURVEY.md §2.4).

The reference does an N+1 per-event RPC ``getBlock(n).timestamp`` lookup
with retry/backoff (/root/reference/src/lib/services/events.ts:44-78,
called at :100-107). Spark-first: the blocks dimension is a table; the
enrichment is one broadcast hash join on ``blockNumber`` — no shuffle of
the (huge) event side, null timestamp preserved on misses.

At 100 TB of events the blocks dim for a full chain history is ~tens of
millions of (long, long) rows ≈ hundreds of MB — still broadcastable to
executors with normal memory; if it ever isn't, drop the hint and AQE
picks a shuffled hash join keyed on blockNumber.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_timestamps(events: DataFrame, blocks: DataFrame, broadcast: bool = True) -> DataFrame:
    """Attach ``timestamp`` from the blocks dim; null when block unknown
    (mirrors the null-on-failure tolerance of events.ts:101-107)."""
    dim = blocks.select(
        F.col("blockNumber").cast("long").alias("blockNumber"),
        F.col("timestamp").cast("long").alias("__block_ts"),
    )
    if broadcast:
        dim = F.broadcast(dim)
    return (
        events.drop("timestamp")
        .join(dim, "blockNumber", "left")
        .withColumnRenamed("__block_ts", "timestamp")
    )
