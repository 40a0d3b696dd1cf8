"""Streaming A/B monitor (streaming/abmonitor.py): per-batch additive
MOMENT partials in an idempotent partition store, Welch verdict
re-derived by the batch epilogue — batch/stream equivalence pinned
exactly (decimal partials associate)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Row

from hypermap_etl_spark.operators.profile import welch_ab_test
from hypermap_etl_spark.streaming.abmonitor import (
    ab_store_compact,
    ab_store_read,
    ab_verdict,
    start_ab_stream,
)


def _rows():
    rows = []
    for uid in range(300):
        for i in range(1 + uid % 3):
            rows.append(
                Row(g="exp1", user_id=uid, value=float((uid * 7 + i) % 23))
            )
    return rows


def _run_stream(spark, rows, base, n_files=3):
    src, store, ckpt = f"{base}/src", f"{base}/store", f"{base}/ckpt"
    chunk = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        spark.createDataFrame(rows[i * chunk:(i + 1) * chunk]).coalesce(
            1
        ).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("g string, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_ab_stream(stream, "value", "user_id", ["g"], store, ckpt)
    q.awaitTermination()
    return store


def test_stream_verdict_equals_batch_welch(spark):
    rows = _rows()
    base = tempfile.mkdtemp()
    store = _run_stream(spark, rows, base)
    # at least two batch partitions landed
    parts = [d for d in os.listdir(store) if d.startswith("batch_id=")]
    assert len(parts) >= 2
    got = ab_verdict(spark, store, ["g"]).collect()[0]
    full = spark.createDataFrame(rows)
    want = welch_ab_test(full, "value", "user_id", ["g"]).collect()[0]
    # EXACT equality: additive decimal partials summed across batches
    # equal the single-batch moments bit-for-bit
    assert got.asDict() == want.asDict()


def test_ab_store_compact_preserves_verdict_and_watermark(spark):
    rows = _rows()
    base = tempfile.mkdtemp()
    store = _run_stream(spark, rows, base)
    before = ab_verdict(spark, store, ["g"]).collect()[0]
    folded = ab_store_compact(spark, store, ["g"])
    assert folded >= 2
    parts = [d for d in os.listdir(store) if d.startswith("batch_id=")]
    assert parts == ["batch_id=-1"]
    after = ab_verdict(spark, store, ["g"]).collect()[0]
    assert after.asDict() == before.asDict()
    # a crash-replayed pre-compaction batch must be skipped, not
    # double-counted: replay batch 0 through the sink guard
    from hypermap_etl_spark.streaming.abmonitor import _folded_through

    assert _folded_through(store) >= 0
    n_before = ab_store_read(spark, store, ["g"]).collect()
    src = f"{base}/src2"
    spark.createDataFrame(rows[:10]).write.parquet(src)
    stream = (
        spark.readStream.schema("g string, user_id long, value double")
        .parquet(src)
    )
    q = start_ab_stream(
        stream, "value", "user_id", ["g"], store, f"{base}/ckpt2"
    )
    q.awaitTermination()
    # checkpoint2 restarts batch ids at 0 -> at/below watermark -> no-op
    assert sorted(
        r.asDict().items() for r in ab_store_read(spark, store, ["g"]).collect()
    ) == sorted(r.asDict().items() for r in n_before)
