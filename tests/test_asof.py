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
