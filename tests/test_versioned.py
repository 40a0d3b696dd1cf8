"""Versioned corpus snapshots (sources/versioned.py): atomic latest
pointer, pinned reads, rollback, retention — and composition with
table_diff for the what-changed-between-drops question."""

from __future__ import annotations

import os
import tempfile

import pytest

from hypermap_etl_spark.sources import versioned as V


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_write_read_latest_and_pinned(spark):
    t = tempfile.mkdtemp() + "/corpus"
    assert V.latest_version(t) is None
    v1 = V.write_version(_df(spark, [(1, "a")]), t)
    v2 = V.write_version(_df(spark, [(1, "a"), (2, "b")]), t)
    assert (v1, v2) == (1, 2)
    assert V.read_version(spark, t).count() == 2          # latest
    assert V.read_version(spark, t, version=1).count() == 1  # pinned
    assert V.list_versions(t) == [1, 2]
    with pytest.raises(FileNotFoundError):
        V.read_version(spark, t, version=9)


def test_rollback_flips_pointer_keeps_data(spark):
    t = tempfile.mkdtemp() + "/corpus"
    V.write_version(_df(spark, [(1, "good")]), t)
    V.write_version(_df(spark, [(1, "bad")]), t)
    V.rollback(t, 1)
    assert V.latest_version(t) == 1
    assert V.read_version(spark, t).collect()[0]["text"] == "good"
    assert V.list_versions(t) == [1, 2]  # bad version kept for forensics
    # next write resumes above the HIGHEST snapshot, not latest+1==2
    v3 = V.write_version(_df(spark, [(1, "fixed")]), t)
    assert v3 == 3 and V.latest_version(t) == 3


def test_vacuum_keeps_newest_and_blessed(spark):
    t = tempfile.mkdtemp() + "/corpus"
    for i in range(4):
        V.write_version(_df(spark, [(i, f"v{i}")]), t)
    V.rollback(t, 1)  # bless the oldest
    dropped = V.vacuum(t, keep=2)
    assert dropped == [2]  # v1 blessed, v3/v4 newest-2, v2 dropped
    assert V.list_versions(t) == [1, 3, 4]
    assert V.read_version(spark, t).collect()[0]["text"] == "v0"
    with pytest.raises(ValueError):
        V.vacuum(t, keep=0)


def test_versioned_composes_with_table_diff(spark):
    from hypermap_etl_spark.operators.profile import table_diff

    t = tempfile.mkdtemp() + "/corpus"
    V.write_version(_df(spark, [(1, "a"), (2, "b")]), t)
    V.write_version(_df(spark, [(1, "a"), (2, "B"), (3, "c")]), t)
    diff = table_diff(
        V.read_version(spark, t, 1), V.read_version(spark, t, 2), ["doc_id"]
    )
    statuses = {r["doc_id"]: r["status"] for r in diff.collect()}
    assert statuses == {1: "unchanged", 2: "changed", 3: "added"}


def test_pointer_is_atomic_no_tmp_left_behind(spark):
    t = tempfile.mkdtemp() + "/corpus"
    V.write_version(_df(spark, [(1, "a")]), t)
    assert not any(n.startswith("._latest") for n in os.listdir(t))
    with open(os.path.join(t, "_latest")) as fh:
        assert fh.read().strip() == "1"


def test_latest_fallback_never_blesses_half_written_snapshot(spark):
    t = tempfile.mkdtemp() + "/corpus"
    # crash simulation: v=1 dir exists but has no _SUCCESS marker and
    # no pointer — the fallback must not bless it
    os.makedirs(t + "/v=1")
    with open(t + "/v=1/part-00000.parquet", "w") as fh:
        fh.write("partial garbage")
    assert V.latest_version(t) is None
    # recovery: the next write lands ABOVE the orphan and gets blessed
    v = V.write_version(_df(spark, [(1, "ok")]), t)
    assert v == 2 and V.latest_version(t) == 2
    assert V.read_version(spark, t).count() == 1
