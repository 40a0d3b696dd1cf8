"""SCD2 dimension maintenance (operators/scd2.py): version fold
semantics, idempotence, delete policy, and time-travel reads."""

from __future__ import annotations

import pytest

from hypermap_etl_spark.operators.scd2 import scd2_apply, scd2_at, scd2_init


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, name string, tier string")


def _by_version(dim):
    out = {}
    for r in dim.collect():
        out.setdefault(r["k"], []).append(r)
    for v in out.values():
        v.sort(key=lambda r: r["valid_from_us"])
    return out


def test_init_and_basic_fold(spark):
    dim = scd2_init(_snap(spark, [(1, "a", "gold"), (2, "b", "free")]),
                    ["k"], ts_us=100)
    upd = _snap(spark, [(1, "a", "platinum"),   # changed
                        (2, "b", "free"),       # unchanged
                        (3, "c", "free")])      # new
    out = scd2_apply(dim, upd, ["k"], ts_us=200)
    v = _by_version(out)
    # k=1: closed v0 + new current
    assert [r["is_current"] for r in v[1]] == [False, True]
    assert v[1][0]["valid_to_us"] == 200 and v[1][0]["tier"] == "gold"
    assert v[1][1]["valid_from_us"] == 200 and v[1][1]["tier"] == "platinum"
    # k=2 untouched: one current row from ts=100
    assert len(v[2]) == 1 and v[2][0]["is_current"] is True
    assert v[2][0]["valid_from_us"] == 100
    # k=3 brand new
    assert len(v[3]) == 1 and v[3][0]["valid_from_us"] == 200


def test_idempotent_reapply(spark):
    dim = scd2_init(_snap(spark, [(1, "a", "gold")]), ["k"], ts_us=100)
    upd = _snap(spark, [(1, "a", "plat")])
    once = scd2_apply(dim, upd, ["k"], ts_us=200)
    twice = scd2_apply(once, upd, ["k"], ts_us=300)
    # same snapshot again: no new versions
    a = sorted(tuple(r) for r in once.collect())
    b = sorted(tuple(r) for r in twice.collect())
    assert a == b


def test_close_missing_policy(spark):
    dim = scd2_init(_snap(spark, [(1, "a", "gold"), (2, "b", "free")]),
                    ["k"], ts_us=100)
    upd = _snap(spark, [(1, "a", "gold")])
    keep = scd2_apply(dim, upd, ["k"], ts_us=200)
    assert _by_version(keep)[2][0]["is_current"] is True
    drop = scd2_apply(dim, upd, ["k"], ts_us=200, close_missing=True)
    v2 = _by_version(drop)[2]
    assert len(v2) == 1 and v2[0]["is_current"] is False
    assert v2[0]["valid_to_us"] == 200


def test_two_batches_and_time_travel(spark):
    dim = scd2_init(_snap(spark, [(1, "a", "t0")]), ["k"], ts_us=100)
    dim = scd2_apply(dim, _snap(spark, [(1, "a", "t1")]), ["k"], ts_us=200)
    dim = scd2_apply(dim, _snap(spark, [(1, "a", "t2")]), ["k"], ts_us=300)
    assert [r["tier"] for r in _by_version(dim)[1]] == ["t0", "t1", "t2"]
    # half-open intervals: at 200 the t1 version is in force
    assert scd2_at(dim, 150).collect()[0]["tier"] == "t0"
    assert scd2_at(dim, 200).collect()[0]["tier"] == "t1"
    assert scd2_at(dim, 99).count() == 0
    assert scd2_at(dim, 10_000).collect()[0]["tier"] == "t2"
    # NULL tracked values are fingerprint-distinct from strings/''
    dim2 = scd2_apply(dim, _snap(spark, [(1, "a", None)]), ["k"], ts_us=400)
    assert scd2_at(dim2, 500).collect()[0]["tier"] is None


def test_validation(spark):
    snap = _snap(spark, [(1, "a", "x")])
    dim = scd2_init(snap, ["k"], ts_us=1)
    with pytest.raises(ValueError, match="non-empty"):
        scd2_init(snap, [], 1)
    with pytest.raises(ValueError, match="already carries"):
        scd2_init(dim, ["k"], 1)
    with pytest.raises(ValueError, match="bookkeeping"):
        scd2_apply(snap, snap, ["k"], 1)
    with pytest.raises(ValueError, match="updates columns"):
        scd2_apply(dim, snap.drop("tier"), ["k"], 1)
