"""Streaming CUSUM drift monitor (streaming/drift.py): per-batch
additive count partials in an idempotent partition store, verdict
re-derived by the batch operator — batch/stream equivalence pinned."""

from __future__ import annotations

import tempfile

from pyspark.sql import Row, functions as F

from hypermap_etl_spark.operators.profile import cusum_drift
from hypermap_etl_spark.streaming.drift import (
    drift_store_compact,
    drift_store_read,
    drift_verdict,
    ewma_verdict,
    start_drift_stream,
)


def _rows(shift: bool):
    rows = []
    for d in range(40):
        day = f"2026-03-{d + 1:02d}" if d < 31 else f"2026-04-{d - 30:02d}"
        n = (30 if d >= 20 else 10) if shift else (10 + d % 2)
        rows += [Row(g="feed", day=day)] * n
    return rows


def _run_stream(spark, rows, base, n_files=3):
    src, store, ckpt = f"{base}/src", f"{base}/store", f"{base}/ckpt"
    chunk = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        spark.createDataFrame(rows[i * chunk:(i + 1) * chunk]).coalesce(
            1
        ).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("g string, day string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_drift_stream(stream, "day", ["g"], store, ckpt)
    q.awaitTermination()
    return store


def test_stream_verdict_equals_batch_operator(spark):
    rows = _rows(shift=True)
    store = _run_stream(spark, rows, tempfile.mkdtemp())
    got = drift_verdict(spark, store, "day", ["g"]).collect()[0]
    want = cusum_drift(
        spark.createDataFrame(rows), "day", ["g"]
    ).collect()[0]
    assert got.asDict() == want.asDict()
    assert got["drifted"] is True


def test_stream_stable_feed_not_flagged_and_series_exact(spark):
    rows = _rows(shift=False)
    store = _run_stream(spark, rows, tempfile.mkdtemp())
    got = drift_verdict(spark, store, "day", ["g"]).collect()[0]
    assert got["drifted"] is False
    series = {
        r["day"]: r["c"]
        for r in drift_store_read(spark, store, "day", ["g"]).collect()
    }
    # batch chopping split days across micro-batches; partials must
    # re-sum to the true per-day counts
    from collections import Counter

    want = Counter(r["day"] for r in rows)
    assert series == dict(want)


def test_drift_store_compact_preserves_verdict(spark):
    rows = _rows(shift=True)
    store = _run_stream(spark, rows, tempfile.mkdtemp())
    before = drift_verdict(spark, store, "day", ["g"]).collect()[0].asDict()
    folded = drift_store_compact(spark, store, "day", ["g"])
    assert folded == 3
    after = drift_verdict(spark, store, "day", ["g"]).collect()[0].asDict()
    assert before == after
    assert drift_store_compact(spark, store, "day", ["g"]) == 0  # idempotent


def test_replay_after_compact_does_not_double_count(spark):
    import shutil

    rows = _rows(shift=False)
    base = tempfile.mkdtemp()
    store = _run_stream(spark, rows, base)
    before = {
        r["day"]: r["c"]
        for r in drift_store_read(spark, store, "day", ["g"]).collect()
    }
    assert drift_store_compact(spark, store, "day", ["g"]) == 3
    # a lost checkpoint replays every batch from scratch; the folded
    # watermark must keep the replays from re-creating their partitions
    shutil.rmtree(f"{base}/ckpt")
    stream = (
        spark.readStream.schema("g string, day string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/src")
    )
    q = start_drift_stream(stream, "day", ["g"], store, f"{base}/ckpt")
    q.awaitTermination()
    after = {
        r["day"]: r["c"]
        for r in drift_store_read(spark, store, "day", ["g"]).collect()
    }
    assert after == before


def test_seasonality_verdict_equals_batch_operator(spark):
    from hypermap_etl_spark.operators.profile import autocorr_daily
    from hypermap_etl_spark.streaming.drift import seasonality_verdict

    rows = _rows(shift=True)
    store = _run_stream(spark, rows, tempfile.mkdtemp())
    got = sorted(
        map(tuple, seasonality_verdict(spark, store, "day", ["g"], [1, 7]).collect())
    )
    want = sorted(
        map(
            tuple,
            autocorr_daily(
                spark.createDataFrame(rows), "day", ["g"], lags=[1, 7]
            ).collect(),
        )
    )
    assert got == want


def test_ewma_verdict_equals_batch_operator_and_flags_spike(spark):
    """The third store face: EWMA per-day flags re-derived from the
    summed partials equal the batch operator on the raw rows, and a
    planted final-day spike is flagged."""
    from hypermap_etl_spark.operators.profile import ewma_anomaly

    rows = []
    for d in range(1, 21):
        rows += [Row(g="feed", day=f"2026-02-{d:02d}")] * 50
    rows += [Row(g="feed", day="2026-02-21")] * 200  # 4x spike
    store = _run_stream(spark, rows, tempfile.mkdtemp())
    got = {r["day"]: r for r in
           ewma_verdict(spark, store, "day", ["g"]).collect()}
    want = {r["day"]: r for r in ewma_anomaly(
        spark.createDataFrame(rows), "day", ["g"]).collect()}
    assert {d: r.asDict() for d, r in got.items()} == \
        {d: r.asDict() for d, r in want.items()}
    assert got["2026-02-21"]["is_anomaly"]
    assert not got["2026-02-10"]["is_anomaly"]
