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


class _FakeState:
    """Minimal GroupState stand-in for direct group-function tests."""

    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.timeout_set = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def _run_group(state, ts_list, idle_timeout_ms=None):
    import pandas as pd

    from hypermap_etl_spark.streaming.stateful import _sessionize_group

    out = list(
        _sessionize_group((1,), iter([pd.DataFrame({"ts_us": ts_list})]), state, idle_timeout_ms)
    )
    return out[0].to_dict("records")


def test_late_event_does_not_move_session_end_backwards():
    """A late arrival (ts < stored last_us) in a later micro-batch must
    not rewind last_us — that would falsely split the session on the
    next on-time event."""
    state = _FakeState((0, 20 * MIN, 3))
    rows = _run_group(state, [15 * MIN])  # late: before last_us
    assert rows == [
        {"user_id": 1, "session_start_us": 0, "session_end_us": 20 * MIN, "n_events": 4, "closed": False}
    ]
    # next on-time event 25min after the TRUE end still joins the session
    rows = _run_group(state, [45 * MIN])
    assert rows[0]["closed"] is False and rows[0]["n_events"] == 5


def test_idle_timeout_closes_and_removes_state():
    state = _FakeState((0, 20 * MIN, 3), timed_out=True)
    rows = _run_group(state, [], idle_timeout_ms=1000)
    assert rows == [
        {"user_id": 1, "session_start_us": 0, "session_end_us": 20 * MIN, "n_events": 3, "closed": True}
    ]
    assert not state.exists


def test_timeout_registered_only_when_enabled():
    state = _FakeState()
    _run_group(state, [0], idle_timeout_ms=None)
    assert state.timeout_set is None
    state2 = _FakeState()
    _run_group(state2, [0], idle_timeout_ms=5000)
    assert state2.timeout_set == 5000
