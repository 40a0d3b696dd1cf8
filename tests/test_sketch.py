"""KMV sketch semantics: exact below k, bounded error above k, and the
merge property (sketch of a union = k smallest of unioned sketches)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hypermap_etl_spark.operators.sketch import kmv_distinct


def test_kmv_exact_when_under_k(spark):
    df = spark.createDataFrame(
        [("g", i % 10) for i in range(100)], "grp string, v long"
    )
    row = kmv_distinct(df, "v", ["grp"], k=64).collect()[0]
    assert row["n_kept"] == 10
    assert row["est_distinct"] == 10  # sketch IS the distinct set


def test_kmv_estimate_within_error_bound(spark):
    # 5000 distinct values, k=256 -> stderr ~ 1/sqrt(254) ~ 6.3%;
    # assert within 4 sigma (deterministic data, deterministic hash —
    # this pins the estimator, it cannot flake)
    df = spark.createDataFrame([("g", i) for i in range(5000)], "grp string, v long")
    row = kmv_distinct(df, "v", ["grp"], k=256).collect()[0]
    assert row["n_kept"] == 256
    assert abs(row["est_distinct"] - 5000) / 5000 < 0.25


def test_kmv_ignores_nulls_and_duplicates(spark):
    df = spark.createDataFrame(
        [("g", None), ("g", 1), ("g", 1), ("g", 2)], "grp string, v long"
    )
    row = kmv_distinct(df, "v", ["grp"], k=8).collect()[0]
    assert row["n_kept"] == 2 and row["est_distinct"] == 2


def test_kmv_rejects_bad_k(spark):
    df = spark.createDataFrame([("g", 1)], "grp string, v long")
    with pytest.raises(ValueError):
        kmv_distinct(df, "v", ["grp"], k=1)


def test_kmv_merge_property(spark):
    """The at-scale property: the sketch of A ∪ B equals merging the
    two sketches (k smallest of the union of kept hashes) — incremental
    pipelines fold per-partition sketches instead of rescanning."""
    k = 32
    a = spark.createDataFrame([("g", i) for i in range(0, 300)], "grp string, v long")
    b = spark.createDataFrame([("g", i) for i in range(150, 500)], "grp string, v long")
    whole = kmv_distinct(a.unionByName(b), "v", ["grp"], k=k).collect()[0]

    # merge by hand: union the two kept-hash sets, keep k smallest
    def kept_fracs(df):
        frac = (
            F.conv(F.substring(F.md5(F.col("v").cast("string")), 1, 8), 16, 10)
            .cast("double") / (1 << 32)
        )
        return sorted(r[0] for r in df.select(frac).distinct().collect())[:k]

    merged = sorted(set(kept_fracs(a) + kept_fracs(b)))[:k]
    kth = round(max(merged), 9)
    import math

    assert whole["n_kept"] == k
    assert whole["est_distinct"] == math.floor((k - 1) / kth)
