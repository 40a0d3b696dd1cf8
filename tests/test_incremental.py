"""Incremental entries materialization must equal the full-log recompute
regardless of how the log is split into batches."""

from __future__ import annotations

import tempfile

from hypermap_etl_spark.operators.materialize import (
    incremental_entries_update,
    materialize_entries,
)
from tests.test_materialize import _fixture_rows
from tests.helpers import events_df


def _flat(df):
    rows = df.collect()
    out = {}
    for r in rows:
        d = r.asDict()
        d["children"] = tuple(d["children"])
        d["notes"] = tuple(sorted(d["notes"].items()))
        d["facts"] = tuple(sorted(d["facts"].items()))
        out[d["namehash"]] = d
    return out


def test_incremental_equals_full(spark):
    rows = _fixture_rows()
    full_df = events_df(spark, rows)
    expected = _flat(materialize_entries(full_df))

    entries_path = tempfile.mkdtemp() + "/entries"
    # feed the log in three uneven batches; events table grows as batches land
    cuts = [6, 13, len(rows)]
    prev = 0
    landed = []
    for cut in cuts:
        batch = rows[prev:cut]
        landed.extend(batch)
        landed_df = events_df(spark, landed)
        new_df = events_df(spark, batch)
        incremental_entries_update(spark, entries_path, landed_df, new_df)
        prev = cut

    got = _flat(spark.read.parquet(entries_path))
    assert got == expected


def test_incremental_single_batch_equals_full(spark):
    rows = _fixture_rows()
    full_df = events_df(spark, rows)
    entries_path = tempfile.mkdtemp() + "/entries"
    incremental_entries_update(spark, entries_path, full_df, full_df)
    assert _flat(spark.read.parquet(entries_path)) == _flat(materialize_entries(full_df))
