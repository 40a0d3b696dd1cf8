"""fullName tree walk + hypothesis property tests for the fold and the
encode→decode roundtrip (SURVEY §5.2#4).
"""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hypermap_etl_spark.constants import ROOT_HASH
from hypermap_etl_spark.operators.decode import parse_raw_logs
from hypermap_etl_spark.operators.materialize import (
    materialize_entries,
    with_full_names,
)
from hypermap_etl_spark.sources.raw_logs import build_raw_logs
from tests.helpers import ev, events_df, h


def test_full_names(spark):
    rows = [
        ev(eventType="Mint", blockNumber=1, logIndex=0, parenthash=ROOT_HASH, childhash=h(1),
           label="os"),
        ev(eventType="Mint", blockNumber=2, logIndex=0, parenthash=h(1), childhash=h(2),
           label="alice"),
        ev(eventType="Mint", blockNumber=3, logIndex=0, parenthash=h(2), childhash=h(3),
           label="blog"),
        ev(eventType="Mint", blockNumber=4, logIndex=0, parenthash=h(50), childhash=h(4),
           label="stray"),  # parent is a placeholder
    ]
    entries = with_full_names(materialize_entries(events_df(spark, rows)))
    names = {r["namehash"]: r["fullName"] for r in entries.collect()}
    assert names[h(1)] == "os"
    assert names[h(2)] == "alice.os"
    assert names[h(3)] == "blog.alice.os"
    assert names[h(4)] == "stray.[unknown]"
    assert names[h(50)] == "[unknown]"


# --- hypothesis: random logs --------------------------------------------

_label = st.text(alphabet="abcdefg-.", min_size=0, max_size=8)


@st.composite
def _event_log(draw):
    n = draw(st.integers(2, 14))
    rows = []
    for i in range(n):
        kind = draw(st.sampled_from(["Mint", "Fact", "Note", "Gene", "Transfer"]))
        blk = draw(st.integers(1, 6))
        li = i  # unique (block, logIndex) per row not required; event_id unique via helpers
        ent = h(draw(st.integers(1, 5)))
        par = draw(st.sampled_from([ROOT_HASH, h(1), h(2), h(6)]))
        if kind == "Mint":
            rows.append(ev(eventType="Mint", blockNumber=blk, logIndex=li, parenthash=par,
                           childhash=ent, labelhash=h(90), label=draw(_label)))
        elif kind in ("Fact", "Note"):
            key = "facthash" if kind == "Fact" else "notehash"
            rows.append(ev(eventType=kind, blockNumber=blk, logIndex=li, parenthash=ent,
                           labelhash=h(91), label=draw(_label),
                           data="0x" + draw(st.sampled_from(["aa", "bb", "cc"])),
                           **{key: h(92)}))
        elif kind == "Gene":
            rows.append(ev(eventType="Gene", blockNumber=blk, logIndex=li, entry=ent,
                           gene="0x" + "12" * 20))
        else:
            rows.append(ev(eventType="Transfer", blockNumber=blk, logIndex=li,
                           **{"from": "0x" + "01" * 20, "to": "0x" + "02" * 20, "id": ent}))
    return rows


def _fold_dict(spark, rows):
    out = {}
    for r in materialize_entries(events_df(spark, rows)).collect():
        d = r.asDict()
        d["children"] = tuple(d["children"])
        d["notes"] = tuple(sorted(d["notes"].items()))
        d["facts"] = tuple(sorted(d["facts"].items()))
        out[d["namehash"]] = d
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_event_log(), seed=st.integers(0, 2**16))
def test_fold_permutation_invariant(spark, rows, seed):
    base = _fold_dict(spark, rows)
    shuffled = rows[:]
    random.Random(seed).shuffle(shuffled)
    assert _fold_dict(spark, shuffled) == base


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_event_log())
def test_encode_decode_roundtrip(spark, rows):
    """decode(encode(events)) reproduces every decodable field. Labels are
    UTF-8 text; Fact/Note data is hex bytes."""
    src = events_df(spark, rows)
    decoded = parse_raw_logs(build_raw_logs(src))
    want = {
        r["event_id"]: (r["eventType"], r["parenthash"], r["childhash"], r["label"], r["data"], r["id"])
        for r in src.collect()
    }
    got = {
        r["event_id"]: (r["eventType"], r["parenthash"], r["childhash"], r["label"], r["data"], r["id"])
        for r in decoded.collect()
    }
    assert got == want
