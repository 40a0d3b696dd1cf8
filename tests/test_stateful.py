"""applyInPandasWithState sessionization: state must persist across
micro-batches (a session spanning two stream runs stays one session)."""

from __future__ import annotations

import os
import tempfile

from hypermap_etl_spark.streaming.stateful import sessionize_stream

MIN = 60 * 1_000_000


def _write_chunk(spark, path, rows):
    spark.createDataFrame(rows, "user_id long, ts_us long").write.mode("append").parquet(path)


def _run_stream(spark, src, ckpt):
    collected = []

    def _sink(batch_df, batch_id):
        collected.extend(r.asDict() for r in batch_df.collect())

    stream = spark.readStream.schema("user_id long, ts_us long").parquet(src)
    q = (
        sessionize_stream(stream)
        .writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return collected


def test_state_spans_batches(spark):
    base = tempfile.mkdtemp()
    src, ckpt = f"{base}/src", f"{base}/ckpt"
    os.makedirs(src)

    # run 1: user 1 has events at t=0 and t=10min (one open session);
    # user 2 has two sessions split by a 100min gap inside the batch
    _write_chunk(spark, src, [(1, 0), (1, 10 * MIN), (2, 0), (2, 100 * MIN)])
    out1 = _run_stream(spark, src, ckpt)

    u1 = [r for r in out1 if r["user_id"] == 1]
    assert [(r["session_start_us"], r["n_events"], r["closed"]) for r in u1] == [(0, 2, False)]
    u2_closed = [r for r in out1 if r["user_id"] == 2 and r["closed"]]
    assert [(r["session_start_us"], r["n_events"]) for r in u2_closed] == [(0, 1)]

    # run 2 (fresh query, same checkpoint → state restored): user 1
    # continues 10 min later (same session — state must carry), then
    # jumps 2h (closes it, opens a new one)
    _write_chunk(spark, src, [(1, 20 * MIN), (1, 140 * MIN)])
    out2 = _run_stream(spark, src, ckpt)

    u1_closed = [r for r in out2 if r["user_id"] == 1 and r["closed"]]
    # the closed session spans run 1 AND run 2 events: 0 → 20min, 3 events
    assert [(r["session_start_us"], r["session_end_us"], r["n_events"]) for r in u1_closed] == [
        (0, 20 * MIN, 3)
    ]
    u1_open = [r for r in out2 if r["user_id"] == 1 and not r["closed"]]
    assert [(r["session_start_us"], r["n_events"]) for r in u1_open] == [(140 * MIN, 1)]
