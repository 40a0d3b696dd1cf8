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


def test_kmv_set_ops_exact_regime(spark):
    """Unions smaller than k: the union sketch IS the union, so every
    estimate is exact — union 15, intersection 5, Jaccard 1/3."""
    from hypermap_etl_spark.operators.sketch import kmv_set_ops, kmv_sketch

    rows = [("A", i) for i in range(10)] + [("B", i) for i in range(5, 15)]
    df = spark.createDataFrame(rows, "g string, v long")
    sk = kmv_sketch(df, "v", ["g"], k=64)
    out = kmv_set_ops(sk, "g", k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["g_a"], r["g_b"]) == ("A", "B")
    assert r["n_kept"] == 15 and r["union_est"] == 15
    assert r["n_common"] == 5 and r["inter_est"] == 5
    assert r["jaccard_est"] == round(5 / 15, 6)


def test_kmv_set_ops_estimates_close_and_partition_invariant(spark):
    """Sketch-only estimates track truth within the KMV error regime,
    and the physical layout of the input never changes a bit."""
    from hypermap_etl_spark.operators.sketch import kmv_set_ops, kmv_sketch

    # |A| = 1200, |B| = 1000, overlap 600 -> J = 600/1600 = 0.375
    rows = [("A", i) for i in range(1200)] + [("B", i) for i in range(600, 1600)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = kmv_set_ops(kmv_sketch(df, "v", ["g"], k=64), "g", k=64).collect()[0]
    assert abs(out["union_est"] - 1600) / 1600 < 0.3
    assert abs(out["jaccard_est"] - 0.375) < 0.25
    out7 = kmv_set_ops(
        kmv_sketch(df.repartition(7), "v", ["g"], k=64), "g", k=64
    ).collect()[0]
    assert out.asDict() == out7.asDict()


def test_kmv_set_ops_all_pairs_and_disjoint(spark):
    """Three groups -> three unordered pairs; disjoint pair estimates
    zero intersection (no shared hash can enter both sketches)."""
    from hypermap_etl_spark.operators.sketch import kmv_set_ops, kmv_sketch

    rows = (
        [("A", i) for i in range(20)]
        + [("B", i) for i in range(100, 120)]
        + [("C", i) for i in range(10, 30)]
    )
    df = spark.createDataFrame(rows, "g string, v long")
    out = {
        (r["g_a"], r["g_b"]): r
        for r in kmv_set_ops(kmv_sketch(df, "v", ["g"], k=64), "g", k=64).collect()
    }
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    assert out[("A", "B")]["n_common"] == 0
    assert out[("A", "B")]["inter_est"] == 0
    assert out[("A", "C")]["n_common"] == 10  # values 10..19 shared, all kept


def test_bloom_no_false_negatives_and_merge(spark):
    """Every inserted value tests positive; OR-merging two half
    sketches equals the whole-set sketch word for word; a disjoint
    probe set stays mostly negative at the designed FP rate."""
    from hypermap_etl_spark.operators.sketch import bloom_build, bloom_contains

    a = spark.createDataFrame([(i,) for i in range(0, 40)], "v long")
    b = spark.createDataFrame([(i,) for i in range(40, 80)], "v long")
    both = a.unionByName(b)

    whole = bloom_build(both, "v").collect()[0]
    ha = bloom_build(a, "v").collect()[0]
    hb = bloom_build(b, "v").collect()[0]
    for j in range(4):
        assert whole[f"w{j}"] == ha[f"w{j}"] | hb[f"w{j}"]
    assert whole["n_values"] == ha["n_values"] + hb["n_values"]

    bloom = bloom_build(both, "v").drop("n_values")
    hits = bloom_contains(both, bloom, "v").collect()
    assert all(r["in_bloom"] for r in hits)  # no false negatives

    far = spark.createDataFrame([(i,) for i in range(10_000, 10_200)], "v long")
    fp = bloom_contains(far, bloom, "v").filter(F.col("in_bloom")).count()
    # n=80, m=252, k=4 → p_fp = (1-exp(-320/252))^4 ≈ 0.26; allow slack
    assert fp <= 200 * 0.45


def test_bloom_grouped_sketches(spark):
    from hypermap_etl_spark.operators.sketch import bloom_build

    df = spark.createDataFrame(
        [("x", 1), ("x", 1), ("y", 2), ("y", None)], "grp string, v long"
    )
    rows = {r["grp"]: r for r in bloom_build(df, "v", ["grp"]).collect()}
    assert rows["x"]["n_values"] == 2      # duplicates both counted
    assert rows["y"]["n_values"] == 1      # NULL dropped
    assert rows["x"]["w0"] != rows["y"]["w0"] or rows["x"]["w1"] != rows["y"]["w1"]


def test_sampled_quantiles_merge_property(spark):
    """Hash sampling commutes with union: quantiles of the combined
    sample equal quantiles computed after merging two halves' samples —
    the property that lets per-day sketches fold without rescans."""
    from hypermap_etl_spark.operators.sketch import sampled_quantiles

    a = spark.createDataFrame([("g", i, float(i)) for i in range(0, 500)],
                              "grp string, k long, v double")
    b = spark.createDataFrame([("g", i, float(i)) for i in range(500, 1000)],
                              "grp string, k long, v double")
    whole = sampled_quantiles(a.unionByName(b), "v", ["grp"], "k").collect()[0]

    frac = (
        F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, 8), 16, 10)
        .cast("double") / (1 << 32)
    )
    merged_sample = (
        a.filter(frac < 0.25).unionByName(b.filter(frac < 0.25))
    )
    again = sampled_quantiles(merged_sample, "v", ["grp"], "k", rate=1.1).collect()[0]
    assert whole["n_sample"] == again["n_sample"]
    for c in ("q_0_5", "q_0_9", "q_0_99"):
        assert whole[c] == again[c], c
    # estimates track the true quantiles of 0..999 at 25% sampling
    assert abs(whole["q_0_5"] - 499.5) < 80


def test_cms_overestimates_only_and_merges(spark):
    """Count-min invariants: estimate >= true count for every probed
    value (never an undercount); summing two halves' long-format
    sketches on (d, bucket) equals the whole-set sketch row for row —
    the fold an incremental pipeline stores per day; absent buckets
    prove zero."""
    from hypermap_etl_spark.operators.sketch import cms_build, cms_estimate

    a = spark.createDataFrame([(i % 7,) for i in range(0, 400)], "v long")
    b = spark.createDataFrame([(i % 11,) for i in range(0, 300)], "v long")
    both = a.unionByName(b)

    whole = cms_build(both, "v", depth=4, width=64)
    ha, hb = cms_build(a, "v", depth=4, width=64), cms_build(b, "v", depth=4, width=64)
    merged = (
        ha.unionByName(hb).groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0

    true_counts = {r["v"]: r["cnt"] for r in
                   both.groupBy("v").agg(F.count("*").alias("cnt")).collect()}
    probes = both.select("v").distinct()
    for r in cms_estimate(probes, whole, "v", depth=4, width=64).collect():
        assert r["est_count"] >= true_counts[r["v"]]

    absent = spark.createDataFrame([(10_000 + i,) for i in range(50)], "v long")
    ests = cms_estimate(absent, whole, "v", depth=4, width=64).collect()
    # width 64 >> 13 distinct values: most absent probes hit an empty
    # bucket in at least one of 4 rows and estimate exactly 0
    assert sum(1 for r in ests if r["est_count"] == 0) >= 25


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(st.integers(min_value=-10**9, max_value=10**9),
                     min_size=1, max_size=60, unique=True))
def test_bloom_property_never_misses(spark, vals):
    """Property: every inserted value tests positive regardless of the
    value distribution (negatives, extremes, singletons)."""
    from hypermap_etl_spark.operators.sketch import bloom_build, bloom_contains

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    bloom = bloom_build(df, "v").drop("n_values")
    hits = bloom_contains(df, bloom, "v").collect()
    assert all(r["in_bloom"] for r in hits)


# ------------------------------------------------- DataSketches HLL ----


def test_hll_merge_equals_whole(spark):
    """union-of-parts ≡ build-of-whole: rolling daily sketches up with
    hll_union_agg gives the SAME estimate as sketching the union
    directly — the associativity that lets a pipeline store per-day
    sketches and never rescan history."""
    from hypermap_etl_spark.operators.sketch import (
        hll_build,
        hll_estimate,
        hll_merge,
    )

    df = spark.createDataFrame(
        [("t", i % 7, i % 4000) for i in range(20000)],
        "grp string, day long, v long",
    )
    daily = hll_build(df, "v", ["grp", "day"], lg_k=12)
    rolled = hll_estimate(hll_merge(daily, ["grp"])).collect()[0]
    whole = hll_estimate(hll_build(df, "v", ["grp"], lg_k=12)).collect()[0]
    # Register state is max-per-bucket (split-invariant), but the
    # estimate is not bit-stable across merge trees: Datasketches
    # unions drop the stream-order HIP estimator, so different rollup
    # shapes can differ by a fraction of the ~1.6% standard error.
    # Assert agreement well inside one SE.
    assert abs(rolled["est_distinct"] - whole["est_distinct"]) <= 0.01 * 4000
    assert rolled["n_rows"] == whole["n_rows"] == 20000


def test_hll_estimate_within_error_bound(spark):
    # 50k distinct at lg_k=12 (~1.6% SE) — dense mode; assert 4 sigma.
    # Deterministic input + order-invariant sketch: pins, cannot flake.
    from hypermap_etl_spark.operators.sketch import hll_build, hll_estimate

    df = spark.createDataFrame([("g", i) for i in range(50000)], "grp string, v long")
    row = hll_estimate(hll_build(df, "v", ["grp"], lg_k=12)).collect()[0]
    assert abs(row["est_distinct"] - 50000) / 50000 < 0.065


def test_hll_partition_invariant_and_null_safe(spark):
    from hypermap_etl_spark.operators.sketch import hll_build, hll_estimate

    rows = [("g", i % 500) for i in range(3000)] + [("g", None)] * 10
    df = spark.createDataFrame(rows, "grp string, v long")
    for n in (1, 3, 13):
        row = hll_estimate(
            hll_build(df.repartition(n), "v", ["grp"], lg_k=12)
        ).collect()[0]
        # The estimate wobbles ~1% with the partition layout (each
        # layout is a different union tree, and unions drop the HIP
        # estimator — measured 497/501/504 here) — the reason the
        # driver gate asserts a 5% tolerance, not the estimate value.
        assert abs(row["est_distinct"] - 500) <= 0.02 * 500
        assert row["n_rows"] == 3000  # exact and invariant; nulls excluded


def test_hll_type_stable_across_widening(spark):
    """The cast-to-string contract: the same logical values sketch
    identically whether stored as int or bigint — stored sketches
    survive a schema widening."""
    from hypermap_etl_spark.operators.sketch import hll_build, hll_estimate

    ints = spark.createDataFrame([("g", i) for i in range(1000)], "grp string, v int")
    longs = spark.createDataFrame([("g", i) for i in range(1000)], "grp string, v long")
    a = hll_estimate(hll_build(ints, "v", ["grp"])).collect()[0]["est_distinct"]
    b = hll_estimate(hll_build(longs, "v", ["grp"])).collect()[0]["est_distinct"]
    assert a == b


# --------------------------------------------------- Misra-Gries top-k ----

from hypermap_etl_spark.operators.sketch import mg_summaries, mg_topk


def _stream(spark, items, parts=4):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(items)], "i long, item string"
    ).repartition(parts, "i")


def test_mg_topk_exact_when_dictionary_fits(spark):
    items = ["a"] * 10 + ["b"] * 5 + ["c"] * 2
    out = {r["item"]: r["est_count"] for r in mg_topk(_stream(spark, items), "item", k=8).collect()}
    assert out == {"a": 10, "b": 5, "c": 2}  # no compression: exact counts


@pytest.mark.parametrize("parts", [1, 3, 16])
def test_mg_topk_guarantee_any_partition_layout(spark, parts):
    # skewed stream: 'hot' 40%, 'mid' 12%, 100-item uniform tail
    items = ["hot"] * 400 + ["mid"] * 120 + [f"u{i % 100}" for i in range(480)]
    n, k = len(items), 8
    bound = n / (k + 1)
    true = {"hot": 400, "mid": 120}
    out = {
        r["item"]: r["est_count"]
        for r in mg_topk(_stream(spark, items, parts), "item", k=k).collect()
    }
    assert len(out) <= k
    for item, t in true.items():
        if t > bound:  # every true heavy hitter must be present
            assert item in out, (parts, out)
        if item in out:  # lower-bound estimate within n/(k+1)
            assert t - bound <= out[item] <= t, (parts, item, out[item], t)
    # no tail item can be overestimated above its true count
    for item, est in out.items():
        if item.startswith("u"):
            assert est <= items.count(item)


def test_mg_summaries_bounded_per_partition(spark):
    items = [f"v{i % 50}" for i in range(600)]
    df = _stream(spark, items, parts=4)
    per_part = (
        mg_summaries(df, "item", k=6)
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .collect()
    )
    assert per_part and all(r["count"] <= 6 for r in per_part)


def test_mg_topk_ignores_nulls_and_rejects_bad_k(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, "b")], "i long, item string"
    )
    out = {r["item"]: r["est_count"] for r in mg_topk(df, "item", k=4).collect()}
    assert out == {"a": 2, "b": 1}
    with pytest.raises(ValueError):
        mg_topk(df, "item", k=0)


def test_approx_quantile_bounds_guarantee_any_layout(spark):
    """The rank guarantee holds under 1/3/16 partitions even though the
    estimates themselves are layout-dependent."""
    from hypermap_etl_spark.operators.sketch import approx_quantile_bounds

    df = spark.range(10_000).select((F.col("id") * 7 % 10_000).alias("v"))
    for parts in (1, 3, 16):
        rows = approx_quantile_bounds(
            df.repartition(parts), "v", [0.1, 0.5, 0.9], accuracy=100
        ).collect()
        assert all(r["within_bound"] for r in rows), (parts, rows)
        for r in rows:
            assert abs(r["exact_rank"] - r["p"]) <= 0.02 + 1e-9


def test_approx_quantile_bounds_validation_and_nulls(spark):
    import pytest

    from hypermap_etl_spark.operators.sketch import approx_quantile_bounds

    df = spark.createDataFrame(
        [(float(i),) for i in range(100)] + [(None,)], "v double"
    )
    rows = approx_quantile_bounds(df, "v", [0.5], accuracy=10_000).collect()
    # high accuracy on a small set: the estimate is exact, rank == 0.5
    assert rows[0]["within_bound"] and abs(rows[0]["exact_rank"] - 0.5) < 0.01
    with pytest.raises(ValueError, match="0 < p < 1"):
        approx_quantile_bounds(df, "v", [1.5])


def test_cms_join_estimate_overestimates_and_is_exact_without_collisions(spark):
    from pyspark.sql import Row

    from hypermap_etl_spark.operators import sketch

    # duplicate-heavy overlap: true join size = sum over shared keys of
    # cnt_a * cnt_b = 3*2 (k1) + 1*4 (k2) = 10
    a = spark.createDataFrame(
        [Row(k="k1")] * 3 + [Row(k="k2")] * 1 + [Row(k="only_a")] * 5
    )
    b = spark.createDataFrame(
        [Row(k="k1")] * 2 + [Row(k="k2")] * 4 + [Row(k="only_b")] * 7
    )
    est = sketch.cms_join_estimate(
        sketch.cms_build(a, "k", depth=4, width=1024),
        sketch.cms_build(b, "k", depth=4, width=1024),
        depth=4,
    ).collect()[0]["est_join_rows"]
    # 4 distinct keys in 4x1024 buckets: no collisions, the inner
    # product is exact
    assert est == 10


def test_cms_join_estimate_disjoint_keys(spark):
    from pyspark.sql import Row

    from hypermap_etl_spark.operators import sketch

    a = spark.createDataFrame([Row(k=f"a{i}") for i in range(20)])
    b = spark.createDataFrame([Row(k=f"b{i}") for i in range(20)])
    est = sketch.cms_join_estimate(
        sketch.cms_build(a, "k", depth=4, width=1024),
        sketch.cms_build(b, "k", depth=4, width=1024),
        depth=4,
    ).collect()[0]["est_join_rows"]
    # est >= true (=0) always; with 40 keys in 1024 buckets some depth
    # almost surely separates them entirely
    assert est >= 0
    assert est <= 2  # generous: expected collisions ~ 20*20/1024 < 0.4 per depth
