"""M1-M9 fold semantics (reference: src/lib/services/mongodb.ts:113-270).

Covers: first-Mint-wins identity, children set dedupe, placeholder
parents, Fact/Note last-write-wins maps + unknown-entry drops, gene and
owner last-write-wins, lastUpdateBlock touches, quarantine, and
row-order insensitivity (the fold is a pure function of the log).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from hypermap_etl_spark.constants import ROOT_HASH
from hypermap_etl_spark.operators.materialize import (
    materialize_entries,
    quarantine_bad_events,
)
from tests.helpers import addr, ev, events_df, h

P, C1, C2, GHOST = h(1), h(2), h(3), h(99)


def _fixture_rows():
    return [
        # P minted at block 10 under ROOT, label 'alpha'
        ev(eventType="Mint", blockNumber=10, logIndex=0, parenthash=ROOT_HASH, childhash=P,
           labelhash=h(11), label="alpha"),
        # repeat Mint of P at block 20 with different label → must NOT win
        ev(eventType="Mint", blockNumber=20, logIndex=0, parenthash=ROOT_HASH, childhash=P,
           labelhash=h(11), label="alpha-렉"),
        # C1, C2 minted under P; C2 minted twice (children must dedupe)
        ev(eventType="Mint", blockNumber=12, logIndex=1, parenthash=P, childhash=C1,
           labelhash=h(12), label="c1"),
        ev(eventType="Mint", blockNumber=13, logIndex=0, parenthash=P, childhash=C2,
           labelhash=h(13), label="c2"),
        ev(eventType="Mint", blockNumber=14, logIndex=0, parenthash=P, childhash=C2,
           labelhash=h(13), label="c2-again"),
        # Mint under GHOST (never minted) → placeholder
        ev(eventType="Mint", blockNumber=15, logIndex=0, parenthash=GHOST, childhash=h(4),
           labelhash=h(14), label="orphan"),
        # Facts on P: same label twice → last wins; one unknown target → dropped
        ev(eventType="Fact", blockNumber=16, logIndex=0, parenthash=P, facthash=h(21),
           labelhash=h(22), label="color", data="0xaa"),
        ev(eventType="Fact", blockNumber=17, logIndex=0, parenthash=P, facthash=h(21),
           labelhash=h(22), label="color", data="0xbb"),
        ev(eventType="Fact", blockNumber=17, logIndex=1, parenthash=h(777), facthash=h(23),
           labelhash=h(24), label="lost", data="0xcc"),
        # Notes on C1
        ev(eventType="Note", blockNumber=18, logIndex=0, parenthash=C1, notehash=h(31),
           labelhash=h(32), label="note1", data="0x01"),
        ev(eventType="Note", blockNumber=18, logIndex=1, parenthash=C1, notehash=h(31),
           labelhash=h(32), label="note1", data="0x02"),
        # Gene on P twice → last wins; gene on unknown → dropped
        ev(eventType="Gene", blockNumber=19, logIndex=0, entry=P, gene=addr(1)),
        ev(eventType="Gene", blockNumber=19, logIndex=1, entry=P, gene=addr(2)),
        ev(eventType="Gene", blockNumber=19, logIndex=2, entry=h(888), gene=addr(3)),
        # Transfers of C1 (id = namehash, canonical hex) → owner last wins
        ev(eventType="Transfer", blockNumber=21, logIndex=0,
           **{"from": addr(0), "to": addr(5), "id": C1}),
        ev(eventType="Transfer", blockNumber=22, logIndex=0,
           **{"from": addr(5), "to": addr(6), "id": C1}),
        # Transfer of unknown id → dropped
        ev(eventType="Transfer", blockNumber=23, logIndex=0,
           **{"from": addr(6), "to": addr(7), "id": h(555)}),
        # Zero/Upgraded carry no entry mutation
        ev(eventType="Zero", blockNumber=24, logIndex=0, zeroTba=addr(8)),
        ev(eventType="Upgraded", blockNumber=25, logIndex=0, implementation=addr(9)),
    ]


def _entries_map(spark, rows):
    out = materialize_entries(events_df(spark, rows)).collect()
    return {r["namehash"]: r.asDict() for r in out}


def test_fold_semantics(spark):
    m = _entries_map(spark, _fixture_rows())

    # M1 first-mint-wins
    assert m[P]["label"] == "alpha"
    assert m[P]["parentHash"] == ROOT_HASH
    assert m[P]["creationBlock"] == 10
    assert m[C2]["label"] == "c2"

    # M2 children dedupe + sort
    assert m[P]["children"] == sorted([C1, C2])

    # M3 placeholder parent
    assert m[GHOST]["label"] == "[unknown]"
    assert m[GHOST]["parentHash"] == ROOT_HASH
    assert m[GHOST]["creationBlock"] == 15

    # M4 facts last-write-wins, unknown target dropped
    assert m[P]["facts"] == {"color": "0xbb"}
    assert h(777) not in m

    # M5 notes last-write-wins by logIndex within one block
    assert m[C1]["notes"] == {"note1": "0x02"}

    # M6 gene last-write-wins
    assert m[P]["gene"] == addr(2)
    assert h(888) not in m

    # M7 owner last-write-wins on canonical hex id
    assert m[C1]["owner"] == addr(6)
    assert h(555) not in m

    # defaults
    assert m[C2]["facts"] == {} and m[C2]["notes"] == {} and m[C2]["children"] == []
    assert m[C2]["owner"] is None and m[C2]["gene"] is None

    # M8 lastUpdateBlock: P touched by child mints (14), facts (17), gene (19)
    assert m[P]["lastUpdateBlock"] == 20  # repeat self-mint at 20 bumps it
    assert m[C1]["lastUpdateBlock"] == 22  # transfer at 22
    assert m[C2]["lastUpdateBlock"] == 14  # repeat mint at 14
    assert m[GHOST]["lastUpdateBlock"] == 15


def test_fold_is_order_insensitive(spark):
    rows = _fixture_rows()
    base = _entries_map(spark, rows)
    for seed in (1, 7):
        shuffled = rows[:]
        random.Random(seed).shuffle(shuffled)
        assert _entries_map(spark, shuffled) == base


def test_quarantine(spark):
    rows = [
        ev(eventType="Mint", blockNumber=1, logIndex=0, childhash=None, parenthash=P),
        ev(eventType="Fact", blockNumber=1, logIndex=1, parenthash=None),
        ev(eventType="Transfer", blockNumber=1, logIndex=2, id=None),
        ev(eventType="Gene", blockNumber=1, logIndex=3, entry=None),
        ev(eventType="Mint", blockNumber=1, logIndex=4, childhash=C1, parenthash=P,
           label="ok"),
    ]
    assert quarantine_bad_events(events_df(spark, rows)).count() == 4


def test_argminmax_skip_null_values(spark):
    """arg_min/arg_max semantics: a NULL field on the winning event is
    skipped (DuckDB arg_min parity), not returned."""
    rows = [
        # first Mint of c100 has NULL parenthash; second carries one
        ev(eventType="Mint", blockNumber=1, logIndex=0, childhash=h(100),
           parenthash=None, label="first"),
        ev(eventType="Mint", blockNumber=2, logIndex=0, childhash=h(100),
           parenthash=h(1), label="second"),
        # owner: last Transfer has NULL 'to'; earlier one has a value
        ev(eventType="Transfer", blockNumber=3, logIndex=0, id=h(100), to="0xaa"),
        ev(eventType="Transfer", blockNumber=4, logIndex=0, id=h(100), to=None),
    ]
    entry = (
        materialize_entries(events_df(spark, rows))
        .filter(F.col("namehash") == h(100))
        .collect()[0]
    )
    assert entry["label"] == "first"  # non-null: first-wins unchanged
    assert entry["parentHash"] == h(1)  # NULL skipped -> later value
    assert entry["owner"] == "0xaa"  # NULL skipped -> earlier value
