"""Streaming curate: cross-batch exact dedup against the sink, quality
filter + redaction + chunking per micro-batch, restart-safe."""

from __future__ import annotations

import os
import tempfile

from hypermap_etl_spark.streaming.curate import start_curate_stream


def _write_file(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(path)


GOOD = "the quick brown fox jumps over the lazy dog and runs on for a while longer today"


def test_curate_stream_dedups_across_batches(spark):
    base = tempfile.mkdtemp()
    src = os.path.join(base, "src")
    docs = os.path.join(base, "docs")
    chunks = os.path.join(base, "chunks")
    ckpt = os.path.join(base, "ckpt")

    # file 1: two distinct good docs (one with PII) + one too-short doc
    _write_file(
        spark,
        src,
        [
            (1, GOOD + " alpha"),
            (2, GOOD + " beta mail me at bob@mail.com please"),
            (3, "too short"),
        ],
    )
    progress = []
    q = start_curate_stream(
        spark, src, docs, chunks, ckpt,
        min_words=10, min_quality=0.2, max_files_per_trigger=1, on_progress=progress.append,
    )
    q.awaitTermination()

    # file 2: an exact duplicate of doc 1's text + one new doc
    _write_file(spark, src, [(10, GOOD + " alpha"), (11, GOOD + " gamma")])
    q = start_curate_stream(
        spark, src, docs, chunks, ckpt,
        min_words=10, min_quality=0.2, max_files_per_trigger=1, on_progress=progress.append,
    )
    q.awaitTermination()

    out = spark.read.parquet(docs)
    texts = [r["text"] for r in out.collect()]
    # 3 distinct texts survive; the cross-batch duplicate was dropped
    assert len(texts) == 3
    assert len(set(texts)) == 3
    # quality filter dropped the short doc
    assert not any(t == "too short" for t in texts)
    # PII was redacted before the content key was taken
    assert any("<EMAIL>" in t for t in texts) and not any("bob@mail.com" in t for t in texts)

    ch = spark.read.parquet(chunks)
    assert ch.select("doc_id").distinct().count() == 3
    assert {r["batch_id"] for r in progress} >= {0}
    assert sum(p["accepted"] for p in progress) == 3
    assert sum(p["docs_in"] for p in progress) == 5
