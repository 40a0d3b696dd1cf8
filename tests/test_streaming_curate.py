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


def test_curate_stream_neardup_via_signature_store(spark):
    """With signature_store set, micro-batches are MinHash-checked
    against the index of everything accepted so far: near-dups (not
    just exact dups) of earlier batches are dropped, the store
    accumulates survivor signatures, and in-batch near-dups keep only
    the min-id doc — including in the very first batch."""
    base = tempfile.mkdtemp()
    src = os.path.join(base, "src")
    docs = os.path.join(base, "docs")
    chunks = os.path.join(base, "chunks")
    ckpt = os.path.join(base, "ckpt")
    store = "stream_sig_store_test"
    spark.sql(f"DROP TABLE IF EXISTS {store}")

    # batch 1: two NEAR-identical docs (one-word tail change) + one distinct
    _write_file(
        spark,
        src,
        [
            (1, GOOD + " alpha one"),
            (2, GOOD + " alpha two"),
            (5, "completely different text about columnar engines and "
                "shuffle services running inside a big data lake stack"),
        ],
    )
    progress = []
    q = start_curate_stream(
        spark, src, docs, chunks, ckpt,
        min_words=10, min_quality=0.2, max_files_per_trigger=1,
        signature_store=store, neardup_threshold=0.7,
        on_progress=progress.append,
    )
    q.awaitTermination()
    accepted_1 = {r["doc_id"] for r in spark.read.parquet(docs).collect()}
    assert accepted_1 == {1, 5}          # in-batch near-dup 2 dropped
    assert progress[-1]["neardup_dropped"] == 1

    # batch 2: a near-dup of batch 1's doc 1 (NOT byte-identical, so the
    # exact content-key anti-join would keep it) + one new doc
    _write_file(
        spark, src,
        [(10, GOOD + " alpha three"), (11, GOOD.replace("quick", "slow") +
          " entirely new family of words beta gamma delta epsilon")],
    )
    q = start_curate_stream(
        spark, src, docs, chunks, ckpt,
        min_words=10, min_quality=0.2, max_files_per_trigger=1,
        signature_store=store, neardup_threshold=0.7,
        on_progress=progress.append,
    )
    q.awaitTermination()
    accepted_2 = {r["doc_id"] for r in spark.read.parquet(docs).collect()}
    assert 10 not in accepted_2 and 11 in accepted_2
    assert progress[-1]["neardup_dropped"] >= 1
    # the store holds exactly the survivors' band rows (32 bands/doc)
    assert spark.table(store).count() == len(accepted_2) * 32
    spark.sql(f"DROP TABLE IF EXISTS {store}")


def test_curate_stream_excludes_colliding_ids(spark):
    """A source that restarts its doc_id counter must not alias an
    accepted doc: colliding ids are excluded and counted, never
    near-dup-verified against the wrong text."""
    base = tempfile.mkdtemp()
    src = os.path.join(base, "src")
    docs = os.path.join(base, "docs")
    chunks = os.path.join(base, "chunks")
    ckpt = os.path.join(base, "ckpt")
    store = "stream_sig_store_clash"
    spark.sql(f"DROP TABLE IF EXISTS {store}")

    _write_file(spark, src, [(1, GOOD + " alpha")])
    progress = []
    kw = dict(min_words=10, min_quality=0.2, max_files_per_trigger=1,
              signature_store=store, on_progress=progress.append)
    q = start_curate_stream(spark, src, docs, chunks, ckpt, **kw)
    q.awaitTermination()

    # id 1 re-arrives with COMPLETELY different text + a genuinely new doc
    _write_file(
        spark, src,
        [(1, "totally different content about warehouse compaction jobs "
             "and file pruning strategies in modern lake houses"),
         (2, "another fresh document describing adaptive query execution "
             "and dynamic partition coalescing behaviors in detail")],
    )
    q = start_curate_stream(spark, src, docs, chunks, ckpt, **kw)
    q.awaitTermination()
    assert progress[-1]["id_collisions"] == 1
    got = {r["doc_id"] for r in spark.read.parquet(docs).collect()}
    assert got == {1, 2}  # original 1 kept once; new text under id 1 excluded
    assert spark.read.parquet(docs).count() == 2
    spark.sql(f"DROP TABLE IF EXISTS {store}")
