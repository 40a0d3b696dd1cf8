"""Shared store compaction (streaming/store.py): staged-swap crash
windows are recoverable — roll BACK when the swap never landed (tmp
still present), roll FORWARD when it landed but the epilogue didn't
(trash left behind) — and the next compact/read sees exact counts
either way. These are the windows the r7 review flagged in
ab_store_compact (inherited by drift/topk/quantile stores)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import Row, functions as F

from hypermap_etl_spark.streaming.store import (
    compact_store,
    folded_through,
    recover_compact,
)


def _fold(df):
    return df.groupBy("g", "day").agg(F.sum("c").cast("long").alias("c"))


def _write_store(spark, base, n_batches=3):
    store = os.path.join(base, "store")
    for b in range(n_batches):
        spark.createDataFrame(
            [Row(g="feed", day=f"2026-03-{d + 1:02d}", c=b + 1) for d in range(4)]
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(store, f"batch_id={b}")
        )
    return store


def _totals(spark, store):
    rows = _fold(spark.read.parquet(store)).orderBy("day").collect()
    return [(r["day"], r["c"]) for r in rows]


def test_compact_roundtrip_and_watermark(spark):
    store = _write_store(spark, tempfile.mkdtemp())
    before = _totals(spark, store)
    n = compact_store(spark, store, _fold)
    assert n == 3
    assert folded_through(store) == 2
    assert _totals(spark, store) == before
    parts = [d for d in os.listdir(store) if d.startswith("batch_id=")]
    assert parts == ["batch_id=-1"]
    # idempotent: a second compact with one partition is a no-op
    assert compact_store(spark, store, _fold) == 0


def _crash_mid_swap(spark, store, moved: int):
    """Reproduce the state after a crash with `moved` partitions moved
    into the trash and the tmp fold staged but NOT renamed."""
    parts = sorted(d for d in os.listdir(store) if d.startswith("batch_id="))
    merged = _fold(
        spark.read.parquet(*[os.path.join(store, d) for d in parts])
    )
    tmp = os.path.join(store, ".compact.tmp")
    merged.write.mode("overwrite").parquet(tmp)
    trash = os.path.join(store, ".compact.trash")
    os.makedirs(trash)
    for d in parts[:moved]:
        os.rename(os.path.join(store, d), os.path.join(trash, d))
    return parts


def test_rollback_partial_move(spark):
    """Crash with SOME partitions moved: recovery restores them and
    discards the staged fold; counts are exactly the pre-compact ones
    and the next compact succeeds."""
    store = _write_store(spark, tempfile.mkdtemp())
    before = _totals(spark, store)
    _crash_mid_swap(spark, store, moved=2)
    assert recover_compact(store) == "rolled_back"
    assert not os.path.exists(os.path.join(store, ".compact.tmp"))
    assert not os.path.exists(os.path.join(store, ".compact.trash"))
    assert _totals(spark, store) == before
    assert compact_store(spark, store, _fold) == 3
    assert _totals(spark, store) == before


def test_rollback_all_moved_store_momentarily_empty(spark):
    """The exact r7-flagged window: ALL partitions moved, swap not yet
    renamed — the store has zero readable partitions and the old code's
    re-run short-circuited on len(parts) <= 1 without restoring.
    compact_store now recovers on entry and refolds."""
    store = _write_store(spark, tempfile.mkdtemp())
    before = _totals(spark, store)
    _crash_mid_swap(spark, store, moved=3)
    assert [d for d in os.listdir(store) if d.startswith("batch_id=")] == []
    # entry-point recovery built into compact_store, not just recover_compact
    assert compact_store(spark, store, _fold) == 3
    assert _totals(spark, store) == before
    assert folded_through(store) == 2


def test_rollforward_after_swap_landed(spark):
    """Crash AFTER the rename landed (tmp gone, trash left): restoring
    the trash would double-count; recovery must drop it and set the
    watermark."""
    store = _write_store(spark, tempfile.mkdtemp())
    before = _totals(spark, store)
    parts = _crash_mid_swap(spark, store, moved=3)
    # land the swap, then "crash" before watermark+cleanup
    os.rename(
        os.path.join(store, ".compact.tmp"),
        os.path.join(store, "batch_id=-1"),
    )
    assert recover_compact(store) == "rolled_forward"
    assert not os.path.exists(os.path.join(store, ".compact.trash"))
    assert folded_through(store) == 2
    assert _totals(spark, store) == before
    assert len(parts) == 3


def test_recover_clean_is_noop(spark):
    store = _write_store(spark, tempfile.mkdtemp())
    before = _totals(spark, store)
    assert recover_compact(store) == "clean"
    assert _totals(spark, store) == before
