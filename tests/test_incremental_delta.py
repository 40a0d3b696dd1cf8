"""True delta maintenance (incremental_entries_delta) must equal the
full-log recompute for block-ordered batch feeds — WITHOUT ever
replaying history. Covers the associative-merge edge cases: repeat
Mint across batches (first wins), placeholder→Mint upgrade, writes to
stored-only targets, NULL-data last-writes, cross-batch children
union, and multi-way batch splits."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from hypermap_etl_spark.constants import ROOT_HASH
from hypermap_etl_spark.operators.materialize import (
    incremental_entries_delta,
    materialize_entries,
    with_entry_bucket,
)
from tests.helpers import addr, ev, events_df, h
from tests.test_materialize import _fixture_rows


def _flat(df):
    out = {}
    for r in df.collect():
        d = r.asDict()
        d["children"] = tuple(d["children"])
        d["notes"] = tuple(sorted(d["notes"].items()))
        d["facts"] = tuple(sorted(d["facts"].items()))
        d.pop("entry_bucket", None)
        out[d["namehash"]] = d
    return out


def _feed_delta(spark, rows, block_cuts, entry_buckets=None):
    """Feed the log in block-boundary batches through the delta path;
    the first batch bootstraps the table via a plain fold+write."""
    entries_path = tempfile.mkdtemp() + "/entries"
    srt = sorted(rows, key=lambda r: (r["blockNumber"], r["logIndex"]))
    prev = float("-inf")
    for i, cut in enumerate(block_cuts):
        batch = [r for r in srt if prev < r["blockNumber"] <= cut]
        prev = cut
        if not batch:
            continue
        bdf = events_df(spark, batch)
        if i == 0:
            base = materialize_entries(bdf)
            if entry_buckets:
                with_entry_bucket(base, entry_buckets).write.mode(
                    "overwrite"
                ).partitionBy("entry_bucket").parquet(entries_path)
            else:
                base.write.mode("overwrite").parquet(entries_path)
        else:
            incremental_entries_delta(
                spark, entries_path, bdf, entry_buckets=entry_buckets
            )
    got = spark.read.parquet(entries_path)
    return _flat(got.drop("entry_bucket") if entry_buckets else got)


def test_delta_equals_full_three_batches(spark):
    rows = _fixture_rows()
    expected = _flat(materialize_entries(events_df(spark, rows)))
    got = _feed_delta(spark, rows, [14, 18, 10**9])
    assert got == expected


def test_delta_equals_full_bucketed_many_cuts(spark):
    rows = _fixture_rows()
    expected = _flat(materialize_entries(events_df(spark, rows)))
    got = _feed_delta(spark, rows, [12, 15, 17, 19, 22, 10**9], entry_buckets=4)
    assert got == expected


def test_delta_placeholder_upgrades_to_mint(spark):
    """X is only a referenced parent (placeholder) in batch 1, then
    minted in batch 2 — the merged identity must be the minted one,
    exactly as a full refold resolves it."""
    X, C = h(70), h(71)
    rows = [
        ev(eventType="Mint", blockNumber=10, logIndex=0, parenthash=X,
           childhash=C, labelhash=h(72), label="kid"),
        ev(eventType="Mint", blockNumber=20, logIndex=0, parenthash=ROOT_HASH,
           childhash=X, labelhash=h(73), label="realname"),
    ]
    expected = _flat(materialize_entries(events_df(spark, rows)))
    got = _feed_delta(spark, rows, [15, 10**9])
    assert got == expected
    assert got[X]["label"] == "realname"
    assert got[X]["creationBlock"] == 20


def test_delta_repeat_mint_keeps_first_identity(spark):
    P = h(80)
    rows = [
        ev(eventType="Mint", blockNumber=10, logIndex=0, parenthash=ROOT_HASH,
           childhash=P, labelhash=h(81), label="first"),
        ev(eventType="Mint", blockNumber=30, logIndex=0, parenthash=ROOT_HASH,
           childhash=P, labelhash=h(81), label="second"),
    ]
    expected = _flat(materialize_entries(events_df(spark, rows)))
    got = _feed_delta(spark, rows, [20, 10**9])
    assert got == expected
    assert got[P]["label"] == "first"
    assert got[P]["lastUpdateBlock"] == 30  # repeat mint still touches


def test_delta_writes_to_stored_only_targets(spark):
    """Batch 2 carries ONLY Fact/Note/Gene/Transfer writes to entries
    minted in batch 1 — no Mints at all; the batch-only fold must keep
    them (known_extra) and the merge must apply them."""
    P = h(90)
    rows = [
        ev(eventType="Mint", blockNumber=10, logIndex=0, parenthash=ROOT_HASH,
           childhash=P, labelhash=h(91), label="p"),
        ev(eventType="Fact", blockNumber=20, logIndex=0, parenthash=P,
           facthash=h(92), labelhash=h(93), label="color", data="0xaa"),
        ev(eventType="Gene", blockNumber=21, logIndex=0, entry=P, gene=addr(4)),
        ev(eventType="Transfer", blockNumber=22, logIndex=0,
           **{"from": addr(0), "to": addr(5), "id": P}),
        # ghost targets must STILL be dropped in the delta fold
        ev(eventType="Fact", blockNumber=23, logIndex=0, parenthash=h(999),
           facthash=h(94), labelhash=h(95), label="lost", data="0xcc"),
    ]
    expected = _flat(materialize_entries(events_df(spark, rows)))
    got = _feed_delta(spark, rows, [15, 10**9])
    assert got == expected
    assert got[P]["facts"] == (("color", "0xaa"),)
    assert got[P]["gene"] == addr(4)
    assert got[P]["owner"] == addr(5)
    assert h(999) not in got


def test_delta_null_data_last_write_keeps_stored_value(spark):
    """A later batch's NULL-data Fact for a label must not clobber the
    stored value (NULL-skipping arg_max semantics) but still bumps
    lastUpdateBlock — pinned against the full fold."""
    P = h(60)
    rows = [
        ev(eventType="Mint", blockNumber=10, logIndex=0, parenthash=ROOT_HASH,
           childhash=P, labelhash=h(61), label="p"),
        ev(eventType="Fact", blockNumber=11, logIndex=0, parenthash=P,
           facthash=h(62), labelhash=h(63), label="color", data="0xaa"),
        ev(eventType="Fact", blockNumber=20, logIndex=0, parenthash=P,
           facthash=h(62), labelhash=h(63), label="color", data=None),
    ]
    expected = _flat(materialize_entries(events_df(spark, rows)))
    got = _feed_delta(spark, rows, [15, 10**9])
    assert got == expected
    assert got[P]["facts"] == (("color", "0xaa"),)
    assert got[P]["lastUpdateBlock"] == 20


def test_delta_children_union_across_batches(spark):
    P, C1, C2, C3 = h(50), h(51), h(52), h(53)
    rows = [
        ev(eventType="Mint", blockNumber=10, logIndex=0, parenthash=ROOT_HASH,
           childhash=P, labelhash=h(54), label="p"),
        ev(eventType="Mint", blockNumber=11, logIndex=0, parenthash=P,
           childhash=C1, labelhash=h(55), label="c1"),
        ev(eventType="Mint", blockNumber=20, logIndex=0, parenthash=P,
           childhash=C2, labelhash=h(56), label="c2"),
        ev(eventType="Mint", blockNumber=21, logIndex=0, parenthash=P,
           childhash=C3, labelhash=h(57), label="c3"),
        # C1 re-minted in batch 2: children must stay deduped
        ev(eventType="Mint", blockNumber=22, logIndex=0, parenthash=P,
           childhash=C1, labelhash=h(55), label="c1-again"),
    ]
    expected = _flat(materialize_entries(events_df(spark, rows)))
    got = _feed_delta(spark, rows, [15, 10**9])
    assert got == expected
    assert got[P]["children"] == tuple(sorted([C1, C2, C3]))


def test_delta_manifest_composition(spark):
    """Delta maintenance committed through the manifest protocol
    (incremental_entries_delta_manifest): equals the full refold,
    carries untouched buckets' manifest entries forward verbatim, and
    a bad batch is undone by a pointer-only rollback."""
    import json

    from hypermap_etl_spark.operators.materialize import (
        incremental_entries_delta_manifest,
    )
    from hypermap_etl_spark.sources.manifest import (
        read_manifest,
        read_table,
        rollback_table,
    )

    rows = sorted(
        _fixture_rows(), key=lambda r: (r["blockNumber"], r["logIndex"])
    )
    batches = [
        [r for r in rows if r["blockNumber"] <= 15],
        [r for r in rows if 15 < r["blockNumber"] <= 19],
        [r for r in rows if r["blockNumber"] > 19],
    ]
    table = tempfile.mkdtemp() + "/entries"
    manifests = []
    for b in batches:
        incremental_entries_delta_manifest(
            spark, table, events_df(spark, b), entry_buckets=4
        )
        manifests.append(read_manifest(table))

    expected = _flat(materialize_entries(events_df(spark, rows)))
    got = _flat(read_table(spark, table).drop("entry_bucket"))
    assert got == expected

    # untouched buckets carry forward: every bucket NOT touched by
    # batch 3 keeps its batch-2 manifest entry byte-for-byte
    m2, m3 = manifests[1], manifests[2]
    changed = {
        k for k in m3["partitions"]
        if m2["partitions"].get(k) != m3["partitions"][k]
    }
    untouched = set(m2["partitions"]) - changed
    assert untouched or len(m2["partitions"]) == len(changed)
    for k in untouched:
        assert m3["partitions"][k] == m2["partitions"][k]

    # rollback to the post-batch-2 state: pointer-only restore
    rollback_table(table, m2["version"])
    mid = _flat(
        materialize_entries(events_df(spark, batches[0] + batches[1]))
    )
    assert _flat(read_table(spark, table).drop("entry_bucket")) == mid
