"""Custom stateful streaming operator: cross-batch sessionization with
``applyInPandasWithState`` (the brief's named mechanism for operators
Structured Streaming lacks natively).

State per user: the currently-open session (start, last event time,
count). Each micro-batch extends or closes it; closed sessions are
emitted downstream, the open one persists in the state store across
batches/restarts (checkpointed). This is the streaming form of
star_queries.events_sessions — same gap semantics — demonstrating
arbitrary keyed state where watermarked session windows wouldn't give
custom per-event logic.

Scale notes: state is partitioned by the grouping key (user) across the
cluster's state store; each batch touches only keys present in the
batch. Arrow-batched pandas per key-group, not per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, session_start_us long, session_end_us long, n_events long, closed boolean"
STATE_SCHEMA = "start_us long, last_us long, n long"

DEFAULT_GAP_US = 30 * 60 * 1_000_000
# processing-time idle expiry for open sessions (2x the gap: generous
# slack for micro-batch scheduling before an inactive key is closed out)
IDLE_TIMEOUT_MS = 2 * 30 * 60 * 1_000


def _sessionize_group(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState, idle_timeout_ms: int | None = None
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    gap = DEFAULT_GAP_US
    cols = ["user_id", "session_start_us", "session_end_us", "n_events", "closed"]

    # idle-key expiry: close and drop the open session when no event
    # arrived for IDLE_TIMEOUT_MS — without this, state for inactive
    # keys accumulates forever
    if state.hasTimedOut:
        expired = []
        if state.exists:
            start_us, last_us, n = state.get
            expired = [(user_id, start_us, last_us, n, True)]
        state.remove()
        yield pd.DataFrame(expired, columns=cols)
        return

    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us = last_us = None
        n = 0

    closed = []
    for pdf in pdfs:
        for ts_us in sorted(int(t) for t in pdf["ts_us"]):
            if start_us is None:
                start_us, last_us, n = ts_us, ts_us, 1
            elif ts_us - last_us > gap:
                closed.append((user_id, start_us, last_us, n, True))
                start_us, last_us, n = ts_us, ts_us, 1
            else:
                # max() so a cross-batch LATE event (ts_us < last_us)
                # joins the session without moving its end backwards —
                # a stale smaller last_us would falsely split on the
                # next on-time event
                last_us, n = max(last_us, ts_us), n + 1

    if start_us is not None:
        state.update((start_us, last_us, n))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        open_row = [(user_id, start_us, last_us, n, False)]
    else:
        open_row = []
    yield pd.DataFrame(closed + open_row, columns=cols)


def sessionize_stream(
    events_stream: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """events stream (user_id, ts_us) → closed sessions + current open
    session per user, state persisted across micro-batches.

    ``idle_timeout_ms`` (e.g. IDLE_TIMEOUT_MS) enables processing-time
    expiry of idle keys on CONTINUOUS streams — without it, state for
    inactive users persists forever. Leave None for availableNow /
    backfill runs: a pending processing-time timeout keeps an
    availableNow query alive past its data (measured: the query never
    self-terminates), so batch catch-ups must run without expiry.
    """

    def _group(key, pdfs, state):
        yield from _sessionize_group(key, pdfs, state, idle_timeout_ms)

    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
