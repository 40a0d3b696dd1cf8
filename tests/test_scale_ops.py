"""Unit tests for operators/scale.py: key-skew diagnosis, distributed
global rank, and weight-balanced shard assignment."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from hypermap_etl_spark.operators import scale


def _skewed(spark, hot=900, cold_keys=10, cold_each=10):
    rows = [Row(k="hot", v=i) for i in range(hot)]
    for j in range(cold_keys):
        rows += [Row(k=f"c{j}", v=i) for i in range(cold_each)]
    return spark.createDataFrame(rows)


def test_skew_report_flags_hot_key(spark):
    df = _skewed(spark)  # 900 hot + 10*10 cold = 1000 rows, 11 keys
    rep = scale.key_skew_report(df, ["k"], top=3).collect()
    assert rep[0]["k"] == "hot"
    assert rep[0]["cnt"] == 900
    assert rep[0]["share"] == 0.9
    # splitting the hot key to the average (1000/11 ≈ 91) takes
    # ceil(900*11/1000) = 10 salt buckets; cold keys need none
    assert rep[0]["key_salt"] == 10
    assert rep[1]["key_salt"] == 1
    assert rep[0]["n_keys"] == 11 and rep[0]["n_rows"] == 1000


def test_skew_entropy_uniform_is_ln_k(spark):
    df = spark.createDataFrame(
        [Row(k=f"k{i % 4}", v=i) for i in range(400)]
    )
    rep = scale.key_skew_report(df, ["k"], top=1).collect()[0]
    import math

    assert rep["key_entropy"] == round(math.log(4), 6)
    assert rep["key_salt"] == 1


def test_global_rank_matches_window(spark):
    df = spark.createDataFrame(
        [Row(x=(i * 37) % 101, id=i) for i in range(101)]
    )
    got = {
        r["id"]: r["rank"]
        for r in scale.global_rank(
            df, [F.col("x").desc(), F.col("id").asc()], partitions=7
        ).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.selectExpr(
            "id", "row_number() over (order by x desc, id asc) as rn"
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("in_parts", [1, 3, 13])
@pytest.mark.parametrize("rank_parts", [2, 8])
def test_global_rank_partition_invariant(spark, in_parts, rank_parts):
    df = spark.createDataFrame(
        [Row(x=i % 10, id=i) for i in range(50)]
    ).repartition(in_parts)
    got = {
        r["id"]: r["rank"]
        for r in scale.global_rank(
            df, [F.col("x").asc(), F.col("id").asc()], partitions=rank_parts
        ).collect()
    }
    assert sorted(got.values()) == list(range(1, 51))
    # total order ⇒ rank is the position in the (x, id) sort, whatever
    # the input layout or range-partition count
    want = {
        id_: pos + 1
        for pos, (_, id_) in enumerate(
            sorted((i % 10, i) for i in range(50))
        )
    }
    assert got == want


def test_balanced_shards_bounds_spread(spark):
    # heavy-tailed weights: hash sharding would leave the two giant
    # docs wherever they land; LPT round-robin puts them on different
    # shards and the spread stays within one wave's weight
    rows = [Row(id=i, w=(1000 if i < 2 else 10)) for i in range(30)]
    df = spark.createDataFrame(rows)
    sh = scale.balanced_shards(df, "w", "id", n_shards=2)
    rep = {
        r["shard"]: r["total_weight"]
        for r in scale.shard_balance_report(sh, "w").collect()
    }
    assert set(rep) == {0, 1}
    assert abs(rep[0] - rep[1]) <= 10  # one light item, not one giant


def test_balanced_shards_rejects_bad_n(spark):
    df = spark.createDataFrame([Row(id=1, w=1)])
    with pytest.raises(ValueError, match="n_shards"):
        scale.balanced_shards(df, "w", "id", n_shards=0)


def test_shard_assignment_is_round_robin(spark):
    df = spark.createDataFrame([Row(id=i, w=100 - i) for i in range(9)])
    got = {
        r["id"]: r["shard"]
        for r in scale.balanced_shards(df, "w", "id", n_shards=3).collect()
    }
    # weights strictly descending with id ⇒ rank == id+1
    assert got == {i: i % 3 for i in range(9)}


def test_scale_ops_empty_inputs(spark):
    empty = spark.createDataFrame([], "k string, w long, id long")
    assert scale.key_skew_report(empty, ["k"]).count() == 0
    assert scale.global_rank(empty, [F.col("w").asc(), F.col("id").asc()]).count() == 0
    assert scale.balanced_shards(empty, "w", "id", 3).count() == 0
    assert scale.shard_balance_report(
        scale.balanced_shards(empty, "w", "id", 3), "w"
    ).count() == 0


def test_global_percent_rank_matches_sql(spark):
    df = spark.createDataFrame(
        [Row(x=(i * 7) % 23, id=i) for i in range(46)]
    )
    got = {
        r["id"]: r["pct_rank"]
        for r in scale.global_percent_rank(
            df, [F.col("x").asc(), F.col("id").asc()], partitions=5
        ).collect()
    }
    want = {
        r["id"]: round(r["pr"], 6)
        for r in df.selectExpr(
            "id", "percent_rank() over (order by x asc, id asc) as pr"
        ).collect()
    }
    assert got == want


def test_global_percent_rank_single_row(spark):
    df = spark.createDataFrame([Row(x=1, id=1)])
    got = scale.global_percent_rank(df, [F.col("x").asc(), F.col("id").asc()]).collect()
    assert got[0]["pct_rank"] == 0.0


def test_gini_known_distributions(spark):
    # uniform -> 0; one key holding everything (of 10) -> (n-1)/n = 0.9
    uni = spark.createDataFrame([Row(k=f"k{i % 10}", v=1) for i in range(100)])
    assert scale.gini_concentration(uni, ["k"]).collect()[0]["gini"] == 0.0
    skew = spark.createDataFrame(
        [Row(k="hot", v=1)] * 991 + [Row(k=f"c{i}", v=1) for i in range(9)]
    )
    g = scale.gini_concentration(skew, ["k"]).collect()[0]
    assert g["n_keys"] == 10 and g["gini"] > 0.88
    one = spark.createDataFrame([Row(k="only", v=1)] * 5)
    assert scale.gini_concentration(one, ["k"]).collect()[0]["gini"] is None


def test_gini_huge_weights_no_int64_overflow(spark):
    # per-key totals near the int64 ceiling: rank·x (and n_keys·sx)
    # exceed int64 — the decimal(19,0)-product accumulation must not
    # raise ARITHMETIC_OVERFLOW under ANSI, and the value must match
    # the exact-rank formula computed in Python ints
    big = 4_000_000_000_000_000_000  # 4e18, rank*"x" far past 2^63
    rows = [Row(k=f"k{i}", w=big + i) for i in range(5)]
    df = spark.createDataFrame(rows)
    got = scale.gini_concentration(df, ["k"], weight_col="w").collect()[0]
    xs = sorted(big + i for i in range(5))
    n, sx = len(xs), sum(xs)
    srx = sum((r + 1) * x for r, x in enumerate(xs))
    want = round(2.0 * srx / (n * sx) - (n + 1) / n, 6)
    assert got["n_keys"] == 5 and got["total"] == sx
    assert got["gini"] == want


def test_pareto_share_planted(spark):
    # 10 keys: one whale holds 91 of 100 units; top 20% = 2 keys
    rows = [Row(k="whale", w=91.0)] + [Row(k=f"m{i}", w=1.0) for i in range(9)]
    got = scale.pareto_share(
        spark.createDataFrame(rows), ["k"], "w", top_fraction=0.2
    ).collect()[0]
    assert got["n_keys"] == 10 and got["n_top"] == 2
    assert got["top_share"] == 0.92  # whale + one 1-unit key

    import pytest as _pytest

    with _pytest.raises(ValueError, match="top_fraction"):
        scale.pareto_share(spark.createDataFrame(rows), ["k"], "w", 1.5)


def test_weighted_median_hand_computable_and_layout_invariant(spark):
    from hypermap_etl_spark.operators.scale import grouped_weighted_median

    # values 10,20,30 with weights 1,1,10 -> half of 12 mass is 6,
    # cumw reaches 6 only at value 30 (weighted median != row median)
    rows = [("a", 10.0, 1.0), ("a", 20.0, 1.0), ("a", 30.0, 10.0)]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    out = grouped_weighted_median(df, "v", "w", ["g"]).collect()[0]
    assert out["median_w"] == 30.0
    assert out["total_weight_c"] == 1200 and out["n_rows"] == 3

    # symmetric weights -> classic lower median; duplicate values merge
    rows2 = [("b", float(v), 1.0) for v in (1, 2, 2, 3, 4)]
    df2 = spark.createDataFrame(rows2, "g string, v double, w double")
    out2 = grouped_weighted_median(df2, "v", "w", ["g"]).collect()[0]
    assert out2["median_w"] == 2.0 and out2["n_rows"] == 5

    both = df.unionByName(df2).repartition(7)
    got = {
        r["g"]: r["median_w"]
        for r in grouped_weighted_median(both, "v", "w", ["g"]).collect()
    }
    assert got == {"a": 30.0, "b": 2.0}


def test_weighted_median_matches_python_reference(spark):
    import random

    from hypermap_etl_spark.operators.scale import grouped_weighted_median

    rng = random.Random(13)
    rows = [
        (f"g{i % 3}", round(rng.uniform(0, 50), 2), round(rng.uniform(0.5, 9), 2))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    got = {
        r["g"]: r["median_w"]
        for r in grouped_weighted_median(df, "v", "w", ["g"]).collect()
    }

    def ref(group):
        pts = sorted((v, int(round(w * 100))) for g, v, w in rows if g == group)
        tot = sum(w for _, w in pts)
        cum = 0
        for v, w in pts:
            cum += w
            if 2 * cum >= tot:
                return v
        raise AssertionError

    for g in ("g0", "g1", "g2"):
        assert got[g] == ref(g)


def test_heavy_coverage_known_distribution(spark):
    """10 keys: one key holds 91 of 100 events -> 1 key covers 50%/90%;
    99% needs enough of the singleton tail; layout-invariant."""
    from hypermap_etl_spark.operators.scale import heavy_coverage
    from hypermap_etl_spark.util import release_persisted

    rows = [(0,)] * 91 + [(k,) for k in range(1, 10)]
    df = spark.createDataFrame(rows, "user_id long").repartition(7)
    got = {r["threshold"]: r for r in heavy_coverage(df, ["user_id"]).collect()}
    release_persisted()
    assert got[0.5]["n_keys_needed"] == 1
    assert got[0.9]["n_keys_needed"] == 1
    # 99% of 100 = 99 events -> 91 + 8 singletons -> 9 keys
    assert got[0.99]["n_keys_needed"] == 9
    assert got[0.99]["n_keys_total"] == 10
    assert got[0.99]["key_fraction"] == 0.9

    # empty input -> empty frame with the right schema, no crash
    empty = spark.createDataFrame([], "user_id long")
    out = heavy_coverage(empty, ["user_id"])
    assert out.count() == 0
    assert out.columns == [
        "threshold", "n_keys_needed", "n_keys_total", "key_fraction"
    ]


def test_weighted_quantile_generalizes_median(spark):
    """q=0.5 reproduces grouped_weighted_median exactly; q=1.0 is the
    max value; hand-checkable p75 on a tiny weighted set; q outside
    (0, 1] raises; fractional q converts exactly (no float threshold)."""
    import pytest

    from hypermap_etl_spark.operators.scale import (
        grouped_weighted_median,
        grouped_weighted_quantile,
    )
    from hypermap_etl_spark.util import release_persisted

    rows = [("g", 10.0, 1.0), ("g", 20.0, 1.0), ("g", 30.0, 1.0),
            ("g", 40.0, 97.0)]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    med = grouped_weighted_median(df, "v", "w", ["g"]).collect()[0]
    q50 = grouped_weighted_quantile(df, "v", "w", ["g"], q=0.5,
                                    out_col="median_w").collect()[0]
    assert med.asDict() == q50.asDict()
    assert med["median_w"] == 40.0  # the heavy tail holds the mass
    # uniform weights: p75 of {10,20,30,40} at weight 1 each -> 30
    uni = spark.createDataFrame(
        [("g", float(v), 1.0) for v in (10, 20, 30, 40)],
        "g string, v double, w double",
    )
    p75 = grouped_weighted_quantile(uni, "v", "w", ["g"], q=0.75).collect()[0]
    assert p75["quantile_w"] == 30.0
    p100 = grouped_weighted_quantile(uni, "v", "w", ["g"], q=1.0).collect()[0]
    assert p100["quantile_w"] == 40.0
    # 2/3: cum*3 >= tot*2 -> first v with cum >= 2.666.. units -> 30
    p23 = grouped_weighted_quantile(
        uni, "v", "w", ["g"], q=2 / 3
    ).collect()[0]
    assert p23["quantile_w"] == 30.0
    with pytest.raises(ValueError):
        grouped_weighted_quantile(uni, "v", "w", ["g"], q=0.0)
    with pytest.raises(ValueError):
        grouped_weighted_quantile(uni, "v", "w", ["g"], q=1.5)
    release_persisted()


def test_grouped_quantile_table_matches_single_q_calls(spark):
    from hypermap_etl_spark.operators.scale import (
        grouped_quantile_table,
        grouped_weighted_quantile,
    )
    from hypermap_etl_spark.util import release_persisted

    rows = [("g1", float(i % 37)) for i in range(500)] + [
        ("g2", float((i * 7) % 101)) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    table = {
        (r["g"], r["q"]): r["value"]
        for r in grouped_quantile_table(df, "v", ["g"]).collect()
    }
    release_persisted()
    # one-pass table equals the certified single-q operator at every q
    one = df.withColumn("w", F.lit(1.0))
    for q in (0.1, 0.5, 0.9):
        want = {
            r["g"]: r["quantile_w"]
            for r in grouped_weighted_quantile(
                one, "v", "w", ["g"], q=q
            ).collect()
        }
        release_persisted()
        for g in ("g1", "g2"):
            assert table[(g, q)] == want[g], (g, q)
    # q=1.0 is the max; count carried through
    full = grouped_quantile_table(df, "v", ["g"], qs=(1.0,)).collect()
    release_persisted()
    got = {r["g"]: (r["value"], r["n_rows"]) for r in full}
    assert got["g1"] == (36.0, 500) and got["g2"] == (100.0, 300)

    import pytest as _pt

    with _pt.raises(ValueError):
        grouped_quantile_table(df, "v", ["g"], qs=())
    with _pt.raises(ValueError):
        grouped_quantile_table(df, "v", ["g"], qs=(0.0,))
