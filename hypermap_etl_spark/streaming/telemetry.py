"""T5: streaming progress telemetry (SURVEY.md §2.8).

The reference prints a status line every 15 s during long scans —
blocks processed, events found, rate
(/root/reference/scripts/extract-events.ts:197-202,
 /root/reference/scripts/scan-events.ts:132-137). Spark-first analog:

  - ``ProgressListener``: a StreamingQueryListener capturing every
    micro-batch's QueryProgressEvent (rows/sec, batch duration, source
    offsets) — engine-level telemetry for ANY query on the session.
  - per-batch ``on_progress`` callbacks in streaming/scan.py's
    foreachBatch sinks — sink-level telemetry (rows merged, high-water
    block) that the listener cannot see because foreachBatch hides the
    sink from the engine.

Both feed ``progress_printer`` for the CLI status line.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Callable

from pyspark.sql.streaming import StreamingQueryListener


class ProgressListener(StreamingQueryListener):
    """Capture micro-batch progress events; optionally print a status
    line at most every ``interval`` seconds (the reference's 15 s
    cadence). Thread-safe enough for the single listener bus thread."""

    def __init__(self, printer: Callable[[str], None] | None = None, interval: float = 15.0):
        self.events: list[dict] = []
        self.printer = printer
        self.interval = interval
        self._last_print = 0.0

    def onQueryStarted(self, event):  # noqa: N802 (Spark API casing)
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        rec = {
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "input_rows_per_second": p.inputRowsPerSecond,
            "duration_ms": (p.durationMs or {}).get("triggerExecution"),
            "timestamp": p.timestamp,
        }
        self.events.append(rec)
        now = time.monotonic()
        if self.printer is not None and now - self._last_print >= self.interval:
            self._last_print = now
            self.printer(
                f"[stream] batch={rec['batch_id']} rows={rec['num_input_rows']} "
                f"trigger_ms={rec['duration_ms']}"
            )

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def onQueryTerminated(self, event):  # noqa: N802
        pass


def attach_progress_listener(
    spark, printer: Callable[[str], None] | None = None, interval: float = 15.0
) -> ProgressListener:
    """Register a ProgressListener on the session; returns it (caller
    may remove via spark.streams.removeListener)."""
    listener = ProgressListener(printer, interval)
    spark.streams.addListener(listener)
    return listener


def progress_printer(stream=None) -> Callable[[dict], None]:
    """on_progress callback for streaming/scan.py sinks: one JSON status
    line per micro-batch (rows merged, high-water block, batch secs) —
    the reference's periodic status output, but structured."""
    out = stream or sys.stderr

    def _print(rec: dict) -> None:
        print(json.dumps({"progress": rec}), file=out, flush=True)

    return _print
