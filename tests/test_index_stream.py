"""Streaming index mode: events table + incrementally materialized
entries must equal a batch full recompute; descendants BFS."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from hypermap_etl_spark.constants import ROOT_HASH
from hypermap_etl_spark.operators.materialize import (
    descendants_of,
    materialize_entries,
)
from hypermap_etl_spark.sources.raw_logs import build_raw_logs
from hypermap_etl_spark.streaming.scan import start_index_stream
from tests.helpers import ev, events_df, h
from tests.test_materialize import _fixture_rows


def test_streaming_index_matches_batch(spark):
    rows = _fixture_rows()
    base = tempfile.mkdtemp()
    src, tbl, ent, ckpt = f"{base}/src", f"{base}/tbl", f"{base}/entries", f"{base}/ckpt"
    os.makedirs(src)

    # two chunks land before catch-up; one more afterwards (resume path)
    build_raw_logs(events_df(spark, rows[:8])).write.mode("append").parquet(src)
    build_raw_logs(events_df(spark, rows[8:14])).write.mode("append").parquet(src)
    q = start_index_stream(spark, src, tbl, ent, ckpt)
    q.awaitTermination(240)
    build_raw_logs(events_df(spark, rows[14:])).write.mode("append").parquet(src)
    q2 = start_index_stream(spark, src, tbl, ent, ckpt)
    q2.awaitTermination(240)

    # decode-normalized expectation: run the same events through the
    # encode→decode path once, then fold
    from hypermap_etl_spark.operators.decode import parse_raw_logs

    expected_events = parse_raw_logs(build_raw_logs(events_df(spark, rows)))
    expected = {
        r["namehash"]: r.asDict()
        for r in materialize_entries(expected_events).collect()
    }
    got = {r["namehash"]: r.asDict() for r in spark.read.parquet(ent).collect()}
    assert set(got) == set(expected)
    for k in expected:
        e, g = expected[k], got[k]
        for fld in ("label", "parentHash", "owner", "gene", "creationBlock", "lastUpdateBlock"):
            assert g[fld] == e[fld], (k, fld, g[fld], e[fld])
        assert sorted(g["children"]) == sorted(e["children"])
        assert g["facts"] == e["facts"] and g["notes"] == e["notes"]


def _bucket_fingerprint(table, bucket):
    import glob
    import hashlib

    files = sorted(glob.glob(f"{table}/block_bucket={bucket}/*.parquet"))
    return [
        (os.path.basename(f), hashlib.md5(open(f, "rb").read()).hexdigest())
        for f in files
    ]


def test_stream_merge_rewrites_only_touched_buckets(spark):
    """A micro-batch whose blocks land in one bucket must leave every
    other bucket's files byte-identical (the partitioned MERGE wired
    through the stream — VERDICT r2 task 1)."""
    from hypermap_etl_spark.streaming.scan import start_ingest_stream

    base = tempfile.mkdtemp()
    src, tbl, ckpt = f"{base}/src", f"{base}/tbl", f"{base}/ckpt"
    os.makedirs(src)
    # bucket 0 (blocks 10..) and bucket 2 (blocks 250_000..)
    rows_b0 = [
        ev(eventType="Mint", blockNumber=10 + i, logIndex=0, parenthash=h(1),
           childhash=h(10 + i), label=f"a{i}")
        for i in range(3)
    ]
    rows_b2 = [
        ev(eventType="Mint", blockNumber=250_000 + i, logIndex=0, parenthash=h(2),
           childhash=h(20 + i), label=f"b{i}")
        for i in range(2)
    ]
    build_raw_logs(events_df(spark, rows_b0 + rows_b2)).write.mode("append").parquet(src)
    start_ingest_stream(spark, src, tbl, ckpt).awaitTermination(240)
    assert set(os.listdir(tbl)) >= {"block_bucket=0", "block_bucket=2"}
    before_b0 = _bucket_fingerprint(tbl, 0)
    assert before_b0

    # second batch touches ONLY bucket 2
    more = [
        ev(eventType="Mint", blockNumber=250_005, logIndex=0, parenthash=h(2),
           childhash=h(25), label="late")
    ]
    build_raw_logs(events_df(spark, more)).write.mode("append").parquet(src)
    progress = []
    q = start_ingest_stream(spark, src, tbl, ckpt, on_progress=progress.append)
    q.awaitTermination(240)

    assert _bucket_fingerprint(tbl, 0) == before_b0
    assert spark.read.parquet(tbl).count() == 6
    # T5: the foreachBatch sink reported the batch
    assert progress and progress[-1]["rows"] == 1
    assert progress[-1]["high_water"] == 250_005


def test_index_stream_prunes_replay_to_touched_buckets(spark):
    """A batch touching only bucket-2 keys must replay only bucket 2 —
    the key→bucket side index prunes the log scan (VERDICT r2 task 2)."""
    from hypermap_etl_spark.streaming.scan import start_index_stream

    base = tempfile.mkdtemp()
    src, tbl, ent, ckpt = f"{base}/src", f"{base}/tbl", f"{base}/entries", f"{base}/ckpt"
    os.makedirs(src)
    rows_b0 = [
        ev(eventType="Mint", blockNumber=10 + i, logIndex=0, parenthash=h(1),
           childhash=h(10 + i), label=f"a{i}")
        for i in range(3)
    ]
    rows_b2 = [
        ev(eventType="Mint", blockNumber=250_000 + i, logIndex=0, parenthash=h(2),
           childhash=h(20 + i), label=f"b{i}")
        for i in range(2)
    ]
    build_raw_logs(events_df(spark, rows_b0 + rows_b2)).write.mode("append").parquet(src)
    # strategy pinned: this test asserts REPLAY-path telemetry
    # (replay_buckets); 'auto' may legitimately pick delta here
    start_index_stream(
        spark, src, tbl, ent, ckpt, entries_strategy="replay"
    ).awaitTermination(240)

    # Note on h(20) (lives in bucket 2 only) + its own block in bucket 2
    late = [
        ev(eventType="Note", blockNumber=250_010, logIndex=0, parenthash=h(20),
           notehash=h(31), labelhash=h(32), label="note1", data="0x01")
    ]
    build_raw_logs(events_df(spark, late)).write.mode("append").parquet(src)
    progress = []
    q = start_index_stream(spark, src, tbl, ent, ckpt,
                           on_progress=progress.append,
                           entries_strategy="replay")
    q.awaitTermination(240)

    assert progress, "index stream must report per-batch progress (T5)"
    buckets = progress[-1]["replay_buckets"]
    assert buckets is not None and 0 not in buckets and 2 in buckets

    # and the pruned incremental result still equals the batch recompute
    from hypermap_etl_spark.operators.decode import parse_raw_logs

    expected_events = parse_raw_logs(
        build_raw_logs(events_df(spark, rows_b0 + rows_b2 + late))
    )
    expected = {
        r["namehash"]: r.asDict() for r in materialize_entries(expected_events).collect()
    }
    got = {r["namehash"]: r.asDict() for r in spark.read.parquet(ent).collect()}
    assert set(got) == set(expected)
    for k in expected:
        for fld in ("label", "parentHash", "creationBlock", "lastUpdateBlock"):
            assert got[k][fld] == expected[k][fld], (k, fld)
        assert got[k]["notes"] == expected[k]["notes"]


def test_replay_scan_partition_pruned(spark):
    """The pruned replay frame's physical plan must carry a partition
    filter on block_bucket (scan I/O bounded by touched buckets)."""
    import glob

    from hypermap_etl_spark.operators.merge import with_block_bucket
    from hypermap_etl_spark.operators.merge import merge_into_parquet

    base = tempfile.mkdtemp()
    tbl = f"{base}/tbl"
    rows = [
        ev(eventType="Mint", blockNumber=b, logIndex=0, parenthash=h(1),
           childhash=h(40 + b), label="x")
        for b in (5, 150_000, 250_000)
    ]
    merge_into_parquet(
        spark, tbl, with_block_bucket(events_df(spark, rows)), ["event_id"],
        partition_col="block_bucket",
    )
    pruned = spark.read.parquet(tbl).filter(F.col("block_bucket").isin([2]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "block_bucket" in plan
    # only bucket-2 files are read
    assert pruned.count() == 1
    assert len(glob.glob(f"{tbl}/block_bucket=*")) == 3


def test_high_water_mark_prunes_to_max_bucket(spark):
    """T2 cursor on a bucketed table must read only the max bucket's
    partition (directory-listing prune, no full-table scan)."""
    from hypermap_etl_spark.operators.merge import merge_into_parquet, with_block_bucket
    from hypermap_etl_spark.streaming.scan import _partition_values, high_water_mark

    base = tempfile.mkdtemp()
    tbl = f"{base}/tbl"
    rows = [
        ev(eventType="Mint", blockNumber=b, logIndex=0, parenthash=h(1),
           childhash=h(50 + b % 97), label="x")
        for b in (42, 150_001, 250_007)
    ]
    merge_into_parquet(
        spark, tbl, with_block_bucket(events_df(spark, rows)), ["event_id"],
        partition_col="block_bucket",
    )
    assert sorted(_partition_values(tbl, "block_bucket")) == [0, 1, 2]
    assert high_water_mark(spark, tbl) == 250_007
    # the pruned scan shape: partition filter on the max bucket
    pruned = spark.read.parquet(tbl).filter(F.col("block_bucket") == 2)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "block_bucket" in plan


def test_ingest_stream_listener_captures_progress(spark):
    """T5 engine-level telemetry: a StreamingQueryListener sees at least
    one QueryProgressEvent during an availableNow catch-up."""
    import time

    from hypermap_etl_spark.streaming.scan import start_ingest_stream
    from hypermap_etl_spark.streaming.telemetry import attach_progress_listener

    base = tempfile.mkdtemp()
    src, tbl, ckpt = f"{base}/src", f"{base}/tbl", f"{base}/ckpt"
    os.makedirs(src)
    rows = [
        ev(eventType="Mint", blockNumber=7, logIndex=0, parenthash=h(1),
           childhash=h(70), label="t")
    ]
    build_raw_logs(events_df(spark, rows)).write.mode("append").parquet(src)
    listener = attach_progress_listener(spark)
    try:
        q = start_ingest_stream(spark, src, tbl, ckpt)
        q.awaitTermination(240)
        # listener events arrive on an async bus — poll briefly
        deadline = time.monotonic() + 30
        while not listener.events and time.monotonic() < deadline:
            time.sleep(0.2)
        assert listener.events, "listener saw no QueryProgressEvent"
        assert any(e["num_input_rows"] >= 1 for e in listener.events)
    finally:
        spark.streams.removeListener(listener)


def test_descendants_bfs(spark):
    rows = [
        ev(eventType="Mint", blockNumber=1, logIndex=0, parenthash=ROOT_HASH, childhash=h(1), label="os"),
        ev(eventType="Mint", blockNumber=2, logIndex=0, parenthash=h(1), childhash=h(2), label="a"),
        ev(eventType="Mint", blockNumber=3, logIndex=0, parenthash=h(1), childhash=h(3), label="b"),
        ev(eventType="Mint", blockNumber=4, logIndex=0, parenthash=h(2), childhash=h(4), label="deep"),
        ev(eventType="Mint", blockNumber=5, logIndex=0, parenthash=h(9), childhash=h(5), label="other"),
    ]
    entries = materialize_entries(events_df(spark, rows))
    got = {(r["namehash"], r["depth"]) for r in descendants_of(entries, h(1)).collect()}
    assert got == {(h(2), 1), (h(3), 1), (h(4), 2)}


def test_index_stream_autocompacts_key_index(spark):
    """With compact_index_every=1 the blind-appended key index collapses
    to one distinct file after the second batch."""
    import glob

    from hypermap_etl_spark.streaming.scan import start_index_stream

    base = tempfile.mkdtemp()
    src, tbl, ent, ckpt = f"{base}/src", f"{base}/tbl", f"{base}/entries", f"{base}/ckpt"
    idx = f"{ent}__keyidx"
    os.makedirs(src)
    rows = [
        ev(eventType="Mint", blockNumber=10 + i, logIndex=0, parenthash=h(1),
           childhash=h(10 + i), label=f"a{i}")
        for i in range(2)
    ]
    build_raw_logs(events_df(spark, rows)).write.mode("append").parquet(src)
    start_index_stream(spark, src, tbl, ent, ckpt,
                       compact_index_every=1).awaitTermination(240)

    more = [ev(eventType="Mint", blockNumber=20, logIndex=0, parenthash=h(1),
               childhash=h(30), label="b")]
    build_raw_logs(events_df(spark, more)).write.mode("append").parquet(src)
    q = start_index_stream(spark, src, tbl, ent, ckpt, compact_index_every=1)
    q.awaitTermination(240)

    files = glob.glob(f"{idx}/*.parquet")
    assert len(files) == 1, files
    pairs = {tuple(r) for r in spark.read.parquet(idx).collect()}
    # distinct (namehash, bucket) pairs only — duplicates compacted away
    assert len(pairs) == spark.read.parquet(idx).count()


def test_index_stream_bounds_entries_files(spark):
    """Entries-table maintenance symmetry (VERDICT r3 task 7): across a
    many-batch availableNow run with per-batch compaction, every
    entry_bucket partition stays at ≤ 1 file, and the compacted entries
    still equal a batch recompute."""
    import glob

    from hypermap_etl_spark.operators.decode import parse_raw_logs
    from hypermap_etl_spark.streaming.scan import start_index_stream

    base = tempfile.mkdtemp()
    src, tbl, ent, ckpt = f"{base}/src", f"{base}/tbl", f"{base}/entries", f"{base}/ckpt"
    os.makedirs(src)
    # 4 single-file chunks → 4 micro-batches (max_files_per_trigger=1),
    # all touching the same parent so its bucket is rewritten every batch
    all_rows = []
    for i in range(4):
        rows = [
            ev(eventType="Mint", blockNumber=100 + 10 * i + j, logIndex=0,
               parenthash=h(1), childhash=h(100 + 10 * i + j), label=f"c{i}_{j}")
            for j in range(2)
        ]
        all_rows += rows
        build_raw_logs(events_df(spark, rows)).write.mode("append").parquet(src)
    q = start_index_stream(
        spark, src, tbl, ent, ckpt, max_files_per_trigger=1,
        compact_entries_every=1, entries_max_files=1,
    )
    q.awaitTermination(240)

    buckets = glob.glob(f"{ent}/entry_bucket=*")
    assert buckets, "entries table must be entry_bucket-partitioned"
    for b in buckets:
        files = glob.glob(f"{b}/*.parquet")
        assert len(files) <= 1, (b, files)

    expected = {
        r["namehash"]: r.asDict()
        for r in materialize_entries(
            parse_raw_logs(build_raw_logs(events_df(spark, all_rows)))
        ).collect()
    }
    got = {r["namehash"]: r.asDict() for r in spark.read.parquet(ent).collect()}
    assert set(got) == set(expected)
    for k in expected:
        assert got[k]["label"] == expected[k]["label"]
        assert sorted(got[k]["children"]) == sorted(expected[k]["children"])


def test_streaming_index_delta_strategy_matches_batch(spark):
    """entries_strategy='delta' (batch-only fold + associative merge,
    no history replay) must produce the same entries as the batch full
    recompute when batches arrive in block order — the chain-scan
    contract. Chunks are cut at block boundaries (a real scan's
    fromBlock/toBlock ranges)."""
    rows = sorted(
        _fixture_rows(), key=lambda r: (r["blockNumber"], r["logIndex"])
    )
    chunks = [
        [r for r in rows if r["blockNumber"] <= 15],
        [r for r in rows if 15 < r["blockNumber"] <= 19],
        [r for r in rows if r["blockNumber"] > 19],
    ]
    base = tempfile.mkdtemp()
    src, tbl, ent, ckpt = (
        f"{base}/src", f"{base}/tbl", f"{base}/entries", f"{base}/ckpt"
    )
    os.makedirs(src)
    # one FILE per extract range (coalesce(1)) — the chain-scan layout
    # the delta strategy requires: the file source chops micro-batches
    # at file boundaries, so a multi-file range could split one block's
    # events across batches in arbitrary file order, violating the
    # block-order contract (the replay strategy has no such
    # requirement; this is documented on start_index_stream)
    build_raw_logs(events_df(spark, chunks[0])).coalesce(1).write.mode(
        "append").parquet(src)
    build_raw_logs(events_df(spark, chunks[1])).coalesce(1).write.mode(
        "append").parquet(src)
    q = start_index_stream(spark, src, tbl, ent, ckpt, entries_strategy="delta")
    q.awaitTermination(240)
    build_raw_logs(events_df(spark, chunks[2])).coalesce(1).write.mode(
        "append").parquet(src)
    q2 = start_index_stream(spark, src, tbl, ent, ckpt, entries_strategy="delta")
    q2.awaitTermination(240)

    from hypermap_etl_spark.operators.decode import parse_raw_logs

    expected_events = parse_raw_logs(build_raw_logs(events_df(spark, rows)))
    expected = {
        r["namehash"]: r.asDict()
        for r in materialize_entries(expected_events).collect()
    }
    got = {r["namehash"]: r.asDict() for r in spark.read.parquet(ent).collect()}
    assert set(got) == set(expected)
    for k in expected:
        e, g = expected[k], got[k]
        for fld in (
            "label", "parentHash", "owner", "gene",
            "creationBlock", "lastUpdateBlock",
        ):
            assert g[fld] == e[fld], (k, fld, g[fld], e[fld])
        assert sorted(g["children"]) == sorted(e["children"])
        assert g["facts"] == e["facts"] and g["notes"] == e["notes"]


def test_auto_strategy_picks_delta_on_chain_scan_layout(spark):
    """VERDICT r8 task 3: the default 'auto' strategy detects the
    chain-scan writer's one-sorted-file-per-range layout (disjoint
    per-file block spans, mtime order = block order) from parquet
    footers alone and runs the O(batch) delta path — no side-index
    lookups, no history replay — and the result still equals the batch
    recompute."""
    import time as _time

    from hypermap_etl_spark.operators.decode import parse_raw_logs
    from hypermap_etl_spark.streaming.scan import (
        source_layout_block_aligned,
        start_index_stream,
    )

    rows = sorted(
        _fixture_rows(), key=lambda r: (r["blockNumber"], r["logIndex"])
    )
    chunks = [
        [r for r in rows if r["blockNumber"] <= 15],
        [r for r in rows if 15 < r["blockNumber"] <= 19],
        [r for r in rows if r["blockNumber"] > 19],
    ]
    base = tempfile.mkdtemp()
    src, tbl, ent, ckpt = (
        f"{base}/src", f"{base}/tbl", f"{base}/entries", f"{base}/ckpt"
    )
    os.makedirs(src)
    for c in chunks:
        build_raw_logs(events_df(spark, c)).repartition(
            1
        ).sortWithinPartitions("blockNumber").write.mode("append").parquet(
            src
        )
        _time.sleep(0.05)  # distinct mtimes, as a polling writer has
    assert source_layout_block_aligned(src) is True
    progress = []
    q = start_index_stream(
        spark, src, tbl, ent, ckpt, on_progress=progress.append
    )
    q.awaitTermination(240)
    assert progress and all(
        p["entries_strategy"] == "delta" for p in progress
    )
    assert all(p["replay_buckets"] is None for p in progress)

    expected_events = parse_raw_logs(build_raw_logs(events_df(spark, rows)))
    expected = {
        r["namehash"]: r.asDict()
        for r in materialize_entries(expected_events).collect()
    }
    got = {r["namehash"]: r.asDict() for r in spark.read.parquet(ent).collect()}
    assert set(got) == set(expected)
    for k in expected:
        for fld in ("label", "parentHash", "owner", "gene",
                    "creationBlock", "lastUpdateBlock"):
            assert got[k][fld] == expected[k][fld], (k, fld)


def test_auto_strategy_falls_back_to_replay_on_shuffled_layout(spark):
    """A source whose files have OVERLAPPING block spans (a range
    re-written as shuffled part files) fails the layout check, so
    'auto' runs replay — which is indifferent to layout — and still
    matches the batch recompute."""
    from hypermap_etl_spark.operators.decode import parse_raw_logs
    from hypermap_etl_spark.streaming.scan import (
        source_layout_block_aligned,
        start_index_stream,
    )

    rows = _fixture_rows()
    base = tempfile.mkdtemp()
    src, tbl, ent, ckpt = (
        f"{base}/src", f"{base}/tbl", f"{base}/entries", f"{base}/ckpt"
    )
    os.makedirs(src)
    # two chunks whose block ranges interleave (rows[:8] spans 10..20,
    # rows[8:] spans 17..25) — each possibly multi-file too
    build_raw_logs(events_df(spark, rows[:8])).write.mode("append").parquet(src)
    build_raw_logs(events_df(spark, rows[8:])).write.mode("append").parquet(src)
    assert source_layout_block_aligned(src) is False
    progress = []
    q = start_index_stream(
        spark, src, tbl, ent, ckpt, on_progress=progress.append
    )
    q.awaitTermination(240)
    assert progress and all(
        p["entries_strategy"] == "replay" for p in progress
    )

    expected_events = parse_raw_logs(build_raw_logs(events_df(spark, rows)))
    expected = {
        r["namehash"]: r.asDict()
        for r in materialize_entries(expected_events).collect()
    }
    got = {r["namehash"]: r.asDict() for r in spark.read.parquet(ent).collect()}
    assert set(got) == set(expected)
    for k in expected:
        assert got[k]["label"] == expected[k]["label"]


def test_auto_strategy_empty_source_has_no_evidence(spark):
    from hypermap_etl_spark.streaming.scan import source_layout_block_aligned

    assert source_layout_block_aligned(tempfile.mkdtemp()) is False


def test_layout_mtime_ties_are_no_evidence(spark):
    """ADVICE r10: equal mtimes between adjacent files fail the layout
    check — Spark orders equal-timestamp files arbitrarily, so a tie
    proves nothing about pickup order even when block spans are
    disjoint and sorted."""
    from hypermap_etl_spark.streaming.scan import source_layout_block_aligned

    rows = sorted(
        _fixture_rows(), key=lambda r: (r["blockNumber"], r["logIndex"])
    )
    src = tempfile.mkdtemp()
    build_raw_logs(
        events_df(spark, [r for r in rows if r["blockNumber"] <= 15])
    ).coalesce(1).write.mode("append").parquet(src)
    build_raw_logs(
        events_df(spark, [r for r in rows if r["blockNumber"] > 15])
    ).coalesce(1).write.mode("append").parquet(src)
    # pin every data file to ONE mtime (coarse-clock / fast-writer tie)
    files = [
        os.path.join(root, n)
        for root, _d, names in os.walk(src)
        for n in names
        if n.endswith(".parquet")
    ]
    assert len(files) == 2
    for f in files:
        os.utime(f, (1_700_000_000, 1_700_000_000))
    assert source_layout_block_aligned(src) is False


def test_delta_demotes_to_replay_on_midstream_disorder(spark):
    """ADVICE r10: the delta contract is re-verified per micro-batch.
    An attested 'delta' stream that receives a batch whose blocks are
    NOT strictly above the applied high-water mark (a backfill file
    landing late) demotes itself to 'replay' for the rest of the run —
    and the final entries still equal the batch recompute, because
    replay re-folds the touched keys' full history."""
    from hypermap_etl_spark.operators.decode import parse_raw_logs

    rows = sorted(
        _fixture_rows(), key=lambda r: (r["blockNumber"], r["logIndex"])
    )
    a = [r for r in rows if r["blockNumber"] <= 15]
    b = [r for r in rows if r["blockNumber"] > 19]
    c = [r for r in rows if 15 < r["blockNumber"] <= 19]
    base = tempfile.mkdtemp()
    src, tbl, ent, ckpt = (
        f"{base}/src", f"{base}/tbl", f"{base}/entries", f"{base}/ckpt"
    )
    os.makedirs(src)
    import time as _time

    # written (and hence picked up) in order A, B, C — C's blocks sit
    # BELOW the high-water B establishes, violating the contract
    for chunk in (a, b, c):
        build_raw_logs(events_df(spark, chunk)).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(0.05)
    progress = []
    q = start_index_stream(
        spark, src, tbl, ent, ckpt,
        max_files_per_trigger=1,
        entries_strategy="delta",  # the caller's (wrong) attestation
        on_progress=progress.append,
    )
    q.awaitTermination(240)
    strategies = [p["entries_strategy"] for p in progress]
    assert strategies == ["delta", "delta", "replay"], strategies
    assert progress[-1]["delta_fallback_at"] == progress[-1]["batch_id"]

    expected_events = parse_raw_logs(build_raw_logs(events_df(spark, rows)))
    expected = {
        r["namehash"]: r.asDict()
        for r in materialize_entries(expected_events).collect()
    }
    got = {r["namehash"]: r.asDict() for r in spark.read.parquet(ent).collect()}
    assert set(got) == set(expected)
    for k in expected:
        for fld in ("label", "parentHash", "owner", "gene",
                    "creationBlock", "lastUpdateBlock"):
            assert got[k][fld] == expected[k][fld], (k, fld)
        assert sorted(got[k]["children"]) == sorted(expected[k]["children"])
        assert got[k]["facts"] == expected[k]["facts"]
