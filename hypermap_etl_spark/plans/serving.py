"""Serving-layer queries over the decoded event table (SURVEY.md §3.3).

Same response shapes as the reference's Next.js server actions, each a
single declarative DataFrame expression:

  get_status            /root/reference/src/app/actions.ts:84-163
  get_events            /root/reference/src/app/events/actions.ts:14-60
  get_entry             /root/reference/src/lib/services/mongodb.ts:105
  get_events_for_entry  /root/reference/src/lib/services/mongodb.ts:75-94

Design upgrades over the reference (SURVEY.md §4): the 7-query
countDocuments fan-out collapses into ONE hash aggregate (A1); the
arg-max "last event" is max_by, not an index scan; pagination page 1 is
TakeOrderedAndProject (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hypermap_etl_spark.constants import PAGE_LIMIT_DEFAULT, PAGE_LIMIT_MAX
from hypermap_etl_spark.util import paginate


def status_counts(events: DataFrame) -> DataFrame:
    """A1+A3+A4+O3: per-type counts with percentage, sorted desc.

    One shuffle-light hash aggregate (partial+final) instead of the
    reference's 7 countDocuments round-trips (actions.ts:92-98).
    The percent-of-total uses a single-row broadcast cross join, not a
    global window, so no single-partition bottleneck at scale.
    """
    counts = events.groupBy("eventType").agg(F.count(F.lit(1)).alias("count"))
    total = counts.agg(F.sum("count").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "eventType",
            "count",
            F.round(F.col("count") * 100.0 / F.col("__total"), 0)
            .cast("long")
            .alias("percentage"),
        )
        .filter(F.col("count") > 0)  # P12 nonzero filter
        .orderBy(F.desc("count"), F.asc("eventType"))
    )


def last_event(events: DataFrame) -> DataFrame:
    """A5/O4: arg-max by (blockNumber, logIndex) → TakeOrderedAndProject."""
    return events.orderBy(
        F.desc("blockNumber"), F.desc("logIndex")
    ).limit(1)


def get_status(events: DataFrame) -> dict:
    """Full StatusData shape (src/app/page.tsx:36-51): counts, total,
    last block + its timestamp, hours since last block (A7)."""
    counts_rows = status_counts(events).collect()
    last = last_event(events).select("blockNumber", "timestamp").collect()
    last_block = last[0]["blockNumber"] if last else None
    last_ts = last[0]["timestamp"] if last else None
    return {
        "eventCounts": [r.asDict() for r in counts_rows],
        "totalEvents": sum(r["count"] for r in counts_rows),
        "lastBlock": last_block,
        "lastBlockTimestamp": last_ts,
    }


def get_events(
    events: DataFrame,
    event_type: str | None = None,
    start_date: str | None = None,
    page: int = 1,
    limit: int = PAGE_LIMIT_DEFAULT,
) -> DataFrame:
    """P8+P9 filters, O1 sort desc + skip/limit pagination.

    Bounds clamped like the reference (events/actions.ts:22-24):
    limit∈[1,100], page≥1. Every page compiles to TakeOrderedAndProject
    over skip+limit rows (util.paginate) — per-partition bounded heaps,
    never a single-task global sort.
    """
    limit = max(1, min(int(limit), PAGE_LIMIT_MAX))
    out = events
    if event_type and event_type != "All":
        out = out.filter(F.col("eventType") == event_type)  # P8
    if start_date:
        t0 = F.unix_timestamp(F.to_timestamp(F.lit(start_date), "yyyy-MM-dd"))
        out = out.filter(F.col("timestamp").isNotNull() & (F.col("timestamp") >= t0))  # P9
    return paginate(out, [F.desc("blockNumber"), F.desc("logIndex")], page, limit)


def count_events(
    events: DataFrame, event_type: str | None = None, start_date: str | None = None
) -> int:
    """A2: total matching count for the pagination header."""
    out = events
    if event_type and event_type != "All":
        out = out.filter(F.col("eventType") == event_type)
    if start_date:
        t0 = F.unix_timestamp(F.to_timestamp(F.lit(start_date), "yyyy-MM-dd"))
        out = out.filter(F.col("timestamp").isNotNull() & (F.col("timestamp") >= t0))
    return out.count()


def entry_reference_predicate(namehash: str):
    """P10: the 6-arm disjunctive 'all events touching entry X' predicate
    (mongodb.ts:82-91). A plain boolean column expression — Catalyst
    normalizes and pushes it down."""
    h = F.lit(namehash)
    et = F.col("eventType")
    return (
        ((et == "Mint") & ((F.col("parenthash") == h) | (F.col("childhash") == h)))
        | ((et == "Fact") & ((F.col("parenthash") == h) | (F.col("facthash") == h)))
        | ((et == "Note") & ((F.col("parenthash") == h) | (F.col("notehash") == h)))
        | ((et == "Gene") & (F.col("entry") == h))
        | ((et == "Transfer") & (F.col("id") == h))
    )


def get_events_for_entry(events: DataFrame, namehash: str) -> DataFrame:
    """P10 + O2: an entry's full history in canonical replay order."""
    return events.filter(entry_reference_predicate(namehash)).orderBy(
        "blockNumber", "logIndex"
    )


def get_entry(entries: DataFrame, namehash: str) -> DataFrame:
    """P11: point lookup by key."""
    return entries.filter(F.col("namehash") == namehash).limit(1)
