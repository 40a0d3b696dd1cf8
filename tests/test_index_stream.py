"""Streaming index mode: events table + incrementally materialized
entries must equal a batch full recompute; descendants BFS."""

from __future__ import annotations

import os
import tempfile

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
