"""asof_join semantics: greatest right ts ≤ left ts, tie visibility,
null when nothing precedes, key isolation."""

from __future__ import annotations

from hypermap_etl_spark.operators.asof import asof_join


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 50), (3, "a", 10), (4, "b", 100)],
        "lid long, k string, t long",
    )
    right = spark.createDataFrame(
        [("a", 20, "r20"), ("a", 50, "r50"), ("a", 99, "r99"), ("b", 101, "r101")],
        "k string, t long, v string",
    )
    out = {
        r["lid"]: r["v_asof"]
        for r in asof_join(left, right, ["k"], "t", "t", ["v"]).collect()
    }
    assert out[1] == "r99"  # greatest ≤ 100
    assert out[2] == "r50"  # tie at 50 is visible
    assert out[3] is None  # nothing ≤ 10
    assert out[4] is None  # key isolation: b's only row is at 101 > 100


def test_asof_null_fields_come_from_matched_row(spark):
    """All output columns must come from the SAME matched right row: a
    NULL field in the matched row stays NULL instead of being
    back-filled from an older row (DuckDB ASOF JOIN semantics)."""
    left = spark.createDataFrame([(1, "a", 100)], "lid long, k string, t long")
    right = spark.createDataFrame(
        [("a", 10, "old_v", "old_w"), ("a", 90, None, "new_w")],
        "k string, t long, v string, w string",
    )
    row = asof_join(left, right, ["k"], "t", "t", ["v", "w"]).collect()[0]
    assert row["w_asof"] == "new_w"
    assert row["v_asof"] is None  # matched row's NULL, not old_v


def test_resample_ffill_semantics(spark):
    import pytest

    from hypermap_etl_spark.operators.asof import resample_ffill

    df = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 25, 2.0), ("b", 18, 9.0)],
        "k string, ts long, v double",
    )
    rows = {(r["k"], r["ts"]): r["v"]
            for r in resample_ffill(df, ["k"], "ts", ["v"], step=5).collect()}
    # shared global grid 10..25 step 5, forward fill per key
    assert rows[("a", 10)] == 1.0 and rows[("a", 20)] == 1.0
    assert rows[("a", 25)] == 2.0  # tie at grid instant is visible
    assert rows[("b", 10)] is None and rows[("b", 15)] is None
    assert rows[("b", 20)] == 9.0 and rows[("b", 25)] == 9.0
    assert len(rows) == 2 * 4
    # explicit extent overrides the global one
    ext = resample_ffill(df, ["k"], "ts", ["v"], step=10, start=0, end=30)
    assert ext.count() == 2 * 4
    with pytest.raises(ValueError, match="step"):
        resample_ffill(df, ["k"], "ts", ["v"], step=0)
    with pytest.raises(ValueError, match="no observations"):
        resample_ffill(df.filter("ts IS NULL"), ["k"], "ts", ["v"], step=5)


def test_sliding_distinct_actives_window_semantics(spark):
    from pyspark.sql import Row

    from hypermap_etl_spark.operators.asof import sliding_distinct_actives

    rows = [
        Row(ts="2026-01-01 10:00:00", user_id=1),
        Row(ts="2026-01-01 11:00:00", user_id=1),  # same user+day dedups
        Row(ts="2026-01-02 10:00:00", user_id=2),
        Row(ts="2026-01-09 10:00:00", user_id=3),  # 1/1 ages out by 1/9
        Row(ts=None, user_id=4),
    ]
    df = spark.createDataFrame(rows).selectExpr(
        "CAST(ts AS TIMESTAMP_NTZ) AS ts", "user_id"
    )
    got = {r["day"]: r["n_active"] for r in
           sliding_distinct_actives(df, "ts", "user_id", 7).collect()}
    assert got["2026-01-01"] == 1           # just user 1
    assert got["2026-01-02"] == 2           # users 1, 2
    assert got["2026-01-07"] == 2           # 1/1 still inside [1/1..1/7]
    assert got["2026-01-08"] == 1           # user 1 aged out, user 2 remains
    assert got["2026-01-09"] == 1           # only user 3 (1/2 aged out... )
    # 1/2 is within [1/3..1/9]? window is [day-6, day] = [1/3, 1/9] -> no
    assert max(got) == "2026-01-09"         # clamped: no phantom tail days
