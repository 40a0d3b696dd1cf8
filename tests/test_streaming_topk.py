"""Streaming heavy hitters (streaming/topk.py): per-batch MG summaries
in an idempotent partition store, global guarantee preserved across
batches, compaction folds history without changing the answer class."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from hypermap_etl_spark.streaming.topk import (
    start_topk_stream,
    topk_store_compact,
    topk_store_read,
)


def _write_file(spark, path, items):
    spark.createDataFrame(
        [(i, v) for i, v in enumerate(items)], "i long, item string"
    ).coalesce(1).write.mode("append").parquet(path)


def _stream(spark, src):
    return (
        spark.readStream.schema("i long, item string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def test_topk_stream_guarantee_across_batches(spark):
    base = tempfile.mkdtemp()
    src, store, ckpt = f"{base}/src", f"{base}/store", f"{base}/ckpt"
    # two files → two micro-batches; 'hot' is heavy across BOTH, the
    # uniform tail exceeds k so per-batch compression really happens
    batch1 = ["hot"] * 200 + [f"u{i}" for i in range(150)]
    batch2 = ["hot"] * 150 + ["mid"] * 120 + [f"v{i}" for i in range(130)]
    _write_file(spark, src, batch1)
    _write_file(spark, src, batch2)

    seen = []
    k = 8
    q = start_topk_stream(
        _stream(spark, src), "item", store, ckpt, k=k,
        on_progress=lambda bid, n: seen.append((bid, n)),
    )
    q.awaitTermination()
    assert len(seen) == 2 and all(n <= k for _, n in seen)

    n_total = len(batch1) + len(batch2)
    bound = n_total / (k + 1)
    out = {r["item"]: r["est_count"] for r in topk_store_read(spark, store, k).collect()}
    assert len(out) <= k
    for item, true in (("hot", 350), ("mid", 120)):
        if true > bound:
            assert item in out
        if item in out:
            assert true - bound <= out[item] <= true, (item, out[item], true)


def test_topk_store_replay_is_idempotent(spark):
    base = tempfile.mkdtemp()
    src, store, ckpt = f"{base}/src", f"{base}/store", f"{base}/ckpt"
    _write_file(spark, src, ["a"] * 30 + ["b"] * 5)
    q = start_topk_stream(_stream(spark, src), "item", store, ckpt, k=4)
    q.awaitTermination()
    before = sorted(tuple(r) for r in topk_store_read(spark, store, 4).collect())
    # simulate a replay of batch 0: a fresh checkpoint reprocesses the
    # same file into the SAME batch_id partition — overwrite, not double
    q = start_topk_stream(_stream(spark, src), "item", store, f"{base}/ckpt2", k=4)
    q.awaitTermination()
    after = sorted(tuple(r) for r in topk_store_read(spark, store, 4).collect())
    assert after == before


def test_topk_store_compact_folds_history(spark):
    base = tempfile.mkdtemp()
    src, store, ckpt = f"{base}/src", f"{base}/store", f"{base}/ckpt"
    _write_file(spark, src, ["x"] * 20 + ["y"] * 3)
    _write_file(spark, src, ["x"] * 10 + ["z"] * 2)
    q = start_topk_stream(_stream(spark, src), "item", store, ckpt, k=4)
    q.awaitTermination()
    before = sorted(tuple(r) for r in topk_store_read(spark, store, 4).collect())
    folded = topk_store_compact(spark, store, 4)
    assert folded == 2
    assert os.path.isdir(os.path.join(store, "batch_id=-1"))
    assert sorted(
        tuple(r) for r in topk_store_read(spark, store, 4).collect()
    ) == before
    # second compaction is a no-op (single partition already)
    assert topk_store_compact(spark, store, 4) == 0
