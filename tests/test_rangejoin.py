"""Interval-join semantics + plan shape: bucketed equi-join, never a
nested-loop, with exact inclusive-bound rechecking."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hypermap_etl_spark.operators.rangejoin import interval_join


def _pts(spark, vals):
    return spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "pid long, p long")


def _ivs(spark, rows):
    return spark.createDataFrame(rows, "iid long, lo long, hi long")


def test_interval_join_inclusive_bounds_and_overlap(spark):
    pts = _pts(spark, [5, 10, 15, 20, 99])
    ivs = _ivs(spark, [(1, 5, 15), (2, 10, 30), (3, 50, 60)])
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(pts, ivs, "p", "lo", "hi", bucket_width=7).collect()
    )
    # p=5 in [5,15] (lo inclusive); p=10 in both; p=15 in both (hi
    # inclusive); p=20 in [10,30]; p=99 nowhere
    assert got == [(0, 1), (1, 1), (1, 2), (2, 1), (2, 2), (3, 2)]


def test_interval_spanning_many_buckets_matches_once(spark):
    # interval [0, 100] spans 11 buckets of width 10 — every point must
    # match exactly once (no dup rows from the explode)
    pts = _pts(spark, list(range(0, 101, 10)))
    ivs = _ivs(spark, [(1, 0, 100)])
    rows = interval_join(pts, ivs, "p", "lo", "hi", bucket_width=10).collect()
    assert len(rows) == 11
    assert len({r["pid"] for r in rows}) == 11


def test_interval_join_rejects_bad_width(spark):
    with pytest.raises(ValueError):
        interval_join(_pts(spark, [1]), _ivs(spark, [(1, 0, 1)]), "p", "lo", "hi", 0)


def test_interval_join_plan_is_equi_join(spark):
    """The whole point: the range predicate must NOT plan as a
    nested-loop — the bucket column gives Catalyst an equi-key."""
    pts = _pts(spark, list(range(50)))
    ivs = _ivs(spark, [(i, i * 3, i * 3 + 10) for i in range(10)])
    plan = (
        interval_join(pts, ivs, "p", "lo", "hi", bucket_width=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


# --- hypothesis: bucketed join ≡ naive range predicate ---------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    points=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=30),
    spans=st.lists(
        st.tuples(st.integers(min_value=0, max_value=500), st.integers(min_value=0, max_value=80)),
        min_size=1,
        max_size=10,
    ),
    width=st.integers(min_value=1, max_value=64),
)
def test_interval_join_equals_naive_join(spark, points, spans, width):
    """For arbitrary points, intervals, and bucket widths, the bucketed
    equi-join returns exactly the pairs the naive BETWEEN cross join
    returns — bucketing is a pure physical rewrite, never a semantic
    one."""
    pts = _pts(spark, points)
    ivs = _ivs(spark, [(i, lo, lo + ln) for i, (lo, ln) in enumerate(spans)])
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(pts, ivs, "p", "lo", "hi", bucket_width=width).collect()
    )
    naive = sorted(
        (pid, iid)
        for pid, p in enumerate(points)
        for iid, (lo, ln) in enumerate(spans)
        if lo <= p <= lo + ln
    )
    assert got == naive
