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
