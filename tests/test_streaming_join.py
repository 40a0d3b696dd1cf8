"""Stream-stream interval join: watermarked attribution pairs across
micro-batches, bounded state, checkpoint restart."""

from __future__ import annotations

import datetime as dt
import os
import tempfile


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 12, minute, second)


def _write(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).coalesce(1).write.mode("append").parquet(path)


def test_interval_join_pairs_within_lag(spark):
    from hypermap_etl_spark.streaming.join import start_attribution_stream

    base = tempfile.mkdtemp()
    clicks, buys = os.path.join(base, "c"), os.path.join(base, "b")
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")

    _write(spark, clicks, [
        (1, _ts(0), 7, "click", 0.0),
        (2, _ts(1), 8, "click", 0.0),
        (3, _ts(30), 7, "click", 0.0),     # too late to pair with buy 101
    ])
    _write(spark, buys, [
        (101, _ts(5), 7, "purchase", 9.99),   # 5 min after click 1 -> pair
        (102, _ts(20), 8, "purchase", 5.00),  # 19 min after click 2 -> outside lag
        (103, _ts(2), 9, "purchase", 1.00),   # no click for user 9
    ])

    q = start_attribution_stream(
        spark, clicks, buys, out, ckpt, max_lag_seconds=600, watermark="1 hour"
    )
    q.awaitTermination()

    rows = spark.read.parquet(out).collect()
    assert [(r["left_id"], r["right_id"], r["lag_seconds"]) for r in rows] == [(1, 101, 300)]

    # restart from checkpoint: a new buy pairs with the already-seen
    # click 3 (both sides' state survived via the checkpointed source
    # offsets + join state)
    _write(spark, buys, [(104, _ts(35), 7, "purchase", 2.00)])
    q = start_attribution_stream(
        spark, clicks, buys, out, ckpt, max_lag_seconds=600, watermark="1 hour"
    )
    q.awaitTermination()

    rows = {(r["left_id"], r["right_id"]) for r in spark.read.parquet(out).collect()}
    assert rows == {(1, 101), (3, 104)}


def test_interval_join_requires_bounded_condition(spark):
    """The streaming frame itself: interval_join_streams emits a plan
    with both watermarks attached (state eviction is provable)."""
    from hypermap_etl_spark.streaming.join import (
        EVENT_STREAM_SCHEMA,
        interval_join_streams,
    )

    base = tempfile.mkdtemp()
    _write(spark, os.path.join(base, "s"), [(1, _ts(0), 1, "x", 0.0)])
    left = spark.readStream.schema(EVENT_STREAM_SCHEMA).parquet(os.path.join(base, "s"))
    right = spark.readStream.schema(EVENT_STREAM_SCHEMA).parquet(os.path.join(base, "s"))
    joined = interval_join_streams(left, right, watermark="5 minutes")
    assert joined.isStreaming
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") >= 2
