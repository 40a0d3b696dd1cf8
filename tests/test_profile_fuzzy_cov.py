"""Round-4 operators: single-pass profiler, deletion-neighborhood
fuzzy join, count-min estimates (gate-side), covariance matrix."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hypermap_etl_spark.operators.fuzzy import edit_distance_pairs
from hypermap_etl_spark.operators.profile import profile_table
from hypermap_etl_spark.operators.similarity import covariance_matrix


# ------------------------------------------------------------ profiler ----

def test_profile_counts_nulls_distinct_minmax(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, "a", None), (3, None, -1.0), (3, "b", 4.0)],
        "k long, s string, v double",
    )
    rows = {r["col_name"]: r for r in profile_table(df).collect()}
    assert rows["k"]["n_nulls"] == 0 and rows["k"]["n_distinct"] == 3
    assert rows["k"]["min_num"] == 1.0 and rows["k"]["max_num"] == 3.0
    assert rows["s"]["n_nulls"] == 1 and rows["s"]["n_distinct"] == 2
    assert rows["s"]["min_num"] is None and rows["s"]["max_num"] is None
    assert rows["v"]["n_nulls"] == 1
    assert rows["v"]["min_num"] == -1.0 and rows["v"]["max_num"] == 4.0


def test_profile_single_scan(spark):
    """The at-scale property: all per-column aggregates compile into a
    plan that scans the relation once (one Expand-fed aggregate, not
    one job per column)."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("m"), F.col("id").cast("string").alias("s")
    )
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 1


def test_profile_approx_mode(spark):
    df = spark.range(1000).select(F.col("id"))
    row = profile_table(df, exact=False).collect()[0]
    assert abs(row["n_distinct"] - 1000) / 1000 < 0.1   # HLL++ default rsd 5%


# ---------------------------------------------------------- fuzzy join ----

def test_fuzzy_join_catches_every_edit_kind(spark):
    df = spark.createDataFrame(
        [
            (1, "kitten"),
            (2, "kitte"),     # deletion of 1
            (3, "kittex"),    # substitution of 1
            (4, "kittens"),   # insertion on 1
            (5, "kitzzz"),    # distance 3 from 1
            (6, "kitten"),    # exact duplicate of 1
        ],
        "id long, name string",
    )
    pairs = {
        (r["id1"], r["id2"]): r["dist"]
        for r in edit_distance_pairs(df, "id", "name").collect()
    }
    assert pairs[(1, 2)] == 1 and pairs[(1, 3)] == 1 and pairs[(1, 4)] == 1
    assert pairs[(1, 6)] == 0
    assert (1, 5) not in pairs
    # deletion/substitution neighbors of each other too
    assert (2, 3) in pairs and pairs[(2, 3)] == 1  # kitte -> kittex (insert)


def test_fuzzy_join_matches_bruteforce(spark):
    """Blocking completeness: the deletion-neighborhood candidates
    recover EXACTLY the quadratic scan's distance<=1 pairs on a random
    string set (including empty and length-1 strings)."""
    import itertools
    import random

    rng = random.Random(7)
    strings = [
        "".join(rng.choice("ab") for _ in range(rng.randrange(0, 6)))
        for _ in range(40)
    ]
    df = spark.createDataFrame(list(enumerate(strings)), "id long, s string")
    got = {
        (r["id1"], r["id2"], r["dist"])
        for r in edit_distance_pairs(df, "id", "s").collect()
    }

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (i, j, lev(strings[i], strings[j]))
        for i, j in itertools.combinations(range(len(strings)), 2)
        if lev(strings[i], strings[j]) <= 1
    }
    assert got == want


def test_fuzzy_join_tau2_matches_bruteforce(spark):
    """τ=2 blocking completeness (VERDICT r6 #4): the ≤2-deletion
    neighborhood candidates recover EXACTLY the quadratic scan's
    distance<=2 pairs on a random string set, including the empty
    string, length-1/2 strings, and dist-2 pairs of every alignment
    shape (2 subs, sub+indel, 2 indels)."""
    import itertools
    import random

    rng = random.Random(13)
    strings = [
        "".join(rng.choice("abc") for _ in range(rng.randrange(0, 7)))
        for _ in range(45)
    ] + ["kitten", "mitten", "sitting", "kitty", "kit", "kitden"]
    df = spark.createDataFrame(
        list(enumerate(strings)), "id long, s string"
    ).repartition(4)
    got = {
        (r["id1"], r["id2"], r["dist"])
        for r in edit_distance_pairs(df, "id", "s", max_dist=2).collect()
    }

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (i, j, lev(strings[i], strings[j]))
        for i, j in itertools.combinations(range(len(strings)), 2)
        if lev(strings[i], strings[j]) <= 2
    }
    assert got == want


def test_fuzzy_join_rejects_wide_threshold(spark):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    with pytest.raises(NotImplementedError):
        edit_distance_pairs(df, "id", "s", max_dist=3)


# ------------------------------------------------------ covariance ----

def test_covariance_matches_numpy(spark):
    rng = np.random.default_rng(3)
    X = rng.normal(size=(60, 5)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    ).repartition(7)  # partial sums across several partitions
    got = {(r["i"], r["j"]): r["cov"] for r in covariance_matrix(df).collect()}
    want = np.cov(X.astype(np.float64), rowvar=False, ddof=0)
    assert len(got) == 5 * 6 // 2
    for (i, j), v in got.items():
        assert v == pytest.approx(want[i, j], abs=2e-6)


# --------------------------------------------------- table_diff ----


def test_table_diff_all_four_statuses(spark):
    from hypermap_etl_spark.operators.profile import diff_summary, table_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k long, v string, n long",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "C", 30), (4, None, 40), (5, "e", 50)],
        "k long, v string, n long",
    )
    got = {r["k"]: r["status"] for r in table_diff(old, new, ["k"]).collect()}
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "unchanged",  # NULL == NULL for diff purposes
        5: "added",
    }
    counts = {r["status"]: r["n"] for r in
              diff_summary(table_diff(old, new, ["k"])).collect()}
    assert counts == {"removed": 1, "unchanged": 2, "changed": 1, "added": 1}


def test_table_diff_null_vs_null_string(spark):
    # the sentinel must keep NULL, 'NULL', and '' three distinct values
    from hypermap_etl_spark.operators.profile import table_diff

    old = spark.createDataFrame([(1, None), (2, "")], "k long, v string")
    new = spark.createDataFrame([(1, "NULL"), (2, None)], "k long, v string")
    got = {r["k"]: r["status"] for r in table_diff(old, new, ["k"]).collect()}
    assert got == {1: "changed", 2: "changed"}


def test_table_diff_compare_col_selection(spark):
    from hypermap_etl_spark.operators.profile import table_diff

    old = spark.createDataFrame([(1, "a", "x")], "k long, v string, only_old string")
    new = spark.createDataFrame([(1, "a", "y")], "k long, v string, only_new string")
    # default: only shared non-key columns (v) — extras ignored
    assert table_diff(old, new, ["k"]).collect()[0]["status"] == "unchanged"
    # naming a one-sided column raises instead of silently ignoring
    import pytest as _pytest

    with _pytest.raises(ValueError):
        table_diff(old, new, ["k"], compare_cols=["only_old"])
    with _pytest.raises(ValueError):
        table_diff(old, new, [])


# ------------------------------------------------------------ psi_drift ----

def test_psi_drift_identical_zero_shifted_large(spark):
    import pytest

    from hypermap_etl_spark.operators.profile import psi_drift

    vals = [(float(i % 40),) for i in range(400)]
    a = spark.createDataFrame(vals, "value double")
    same = {r["bin"]: r["psi_term"] for r in psi_drift(a, a, "value").collect()}
    assert len(same) == 10 and all(t == 0.0 for t in same.values())

    shifted = spark.createDataFrame(
        [(v + 30.0,) for (v,) in vals], "value double"
    )
    terms = [r["psi_term"] for r in psi_drift(a, shifted, "value").collect()]
    assert len(terms) == 10
    assert sum(terms) > 0.25  # industry "shifted" threshold

    with pytest.raises(ValueError):
        psi_drift(a, a, "value", n_bins=1)
    empty = spark.createDataFrame([], "value double")
    with pytest.raises(ValueError):
        psi_drift(empty, empty, "value")


def test_psi_drift_counts_partition_and_null_safe(spark):
    from hypermap_etl_spark.operators.profile import psi_drift

    a = spark.createDataFrame(
        [(float(i),) for i in range(100)] + [(None,)], "value double"
    )
    b = spark.createDataFrame([(float(i),) for i in range(50)], "value double")
    out = psi_drift(a.repartition(7), b.repartition(3), "value").collect()
    assert sum(r["n_old"] for r in out) == 100  # null dropped
    assert sum(r["n_new"] for r in out) == 50
    # new values live only in the lower half of the combined extent
    assert all(r["n_new"] == 0 for r in out if r["bin"] >= 5)


def test_psi_drift_values_past_1e10_survive(spark):
    # decimal(12,2) used to make |value| >= 1e10 an ANSI cast ERROR
    # (silent row-drop with ANSI off); decimal(38,2) keeps them exact
    from hypermap_etl_spark.operators.profile import psi_drift

    a = spark.createDataFrame(
        [(1.0e10 + i,) for i in range(20)], "value double"
    )
    b = spark.createDataFrame(
        [(1.0e10 + 10 + i,) for i in range(20)], "value double"
    )
    out = psi_drift(a, b, "value").collect()
    assert sum(r["n_old"] for r in out) == 20
    assert sum(r["n_new"] for r in out) == 20
    assert sum(r["psi_term"] for r in out) > 0.0


def test_cusum_flags_planted_level_shift(spark):
    from pyspark.sql import Row

    from hypermap_etl_spark.operators.profile import cusum_drift

    rows = []
    # stable series: ~10/day with small alternation; shifted series:
    # jumps from 10 to 30 halfway — CUSUM must flag only the shift
    for d in range(40):
        day = f"2026-01-{d + 1:02d}" if d < 31 else f"2026-02-{d - 30:02d}"
        rows += [Row(g="stable", day=day)] * (10 + (d % 2))
        rows += [Row(g="shifted", day=day)] * (10 if d < 20 else 30)
    df = spark.createDataFrame(rows)
    got = {r["g"]: r.asDict() for r in cusum_drift(df, "day", ["g"]).collect()}
    assert got["shifted"]["drifted"] is True
    assert got["stable"]["drifted"] is False
    assert got["shifted"]["max_cusum"] > got["stable"]["max_cusum"]
    assert got["stable"]["n_days"] == 40


def test_cusum_constant_series_is_null_not_error(spark):
    from pyspark.sql import Row

    from hypermap_etl_spark.operators.profile import cusum_drift

    df = spark.createDataFrame(
        [Row(g="c", day=f"d{d}") for d in range(5)]
    )
    got = cusum_drift(df, "day", ["g"]).collect()[0]
    # zero variance: z is NULL per day (try_divide), so the STATISTIC
    # is NULL — never an ANSI divide-by-zero error — while the verdict
    # is False like every other boolean flag in the module (a NULL
    # verdict silently drops the group from `NOT drifted` filters)
    assert got["std_daily"] == 0.0
    assert got["max_cusum"] is None and got["drifted"] is False


def test_mad_outliers_robust_to_giant_value(spark):
    from pyspark.sql import Row

    from hypermap_etl_spark.operators.profile import mad_outliers

    # values 0..99 plus one 1e6 spike: mean/std z of the spike's peers
    # collapses (std inflated ~1e5) but MAD doesn't move, so exactly
    # the spike is flagged
    rows = [Row(g="a", id=i, v=float(i)) for i in range(100)]
    rows.append(Row(g="a", id=999, v=1_000_000.0))
    got = {
        r["id"]: r
        for r in mad_outliers(
            spark.createDataFrame(rows), "v", ["g"], k=3.0
        ).collect()
    }
    assert got[999]["is_outlier"] is True
    assert sum(1 for r in got.values() if r["is_outlier"]) == 1
    assert got[0]["med"] == 50.0  # median of 0..99 + spike


def test_mad_outliers_constant_group_yields_null(spark):
    from pyspark.sql import Row

    from hypermap_etl_spark.operators.profile import mad_outliers

    got = mad_outliers(
        spark.createDataFrame([Row(g="c", id=i, v=5.0) for i in range(4)]),
        "v",
        ["g"],
    ).collect()
    assert all(r["mad"] == 0.0 for r in got)
    # statistic NULL, verdict False (the module-wide flag convention)
    assert all(r["robust_z"] is None and r["is_outlier"] is False for r in got)


def test_fd_histogram_counts_and_edges(spark):
    from pyspark.sql import Row

    from hypermap_etl_spark.operators.profile import fd_histogram

    # uniform 0..999: IQR=499.5, w = 999/10 ≈ 99.9-ish; every value
    # binned exactly once, edges tile [min, max], max value clamped
    # into the last bin
    df = spark.createDataFrame([Row(v=float(i)) for i in range(1000)])
    rows = fd_histogram(df, "v").collect()
    assert sum(r["cnt"] for r in rows) == 1000
    assert rows[0]["bin"] == 0 and rows[0]["lo"] == 0.0
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] == b["lo"] and b["bin"] == a["bin"] + 1
    assert rows[-1]["hi"] >= 999.0


def test_fd_histogram_constant_column_one_bin(spark):
    from pyspark.sql import Row

    from hypermap_etl_spark.operators.profile import fd_histogram

    df = spark.createDataFrame([Row(v=7.0)] * 50)
    rows = fd_histogram(df, "v").collect()
    assert len(rows) == 1 and rows[0]["cnt"] == 50 and rows[0]["bin"] == 0


def test_fd_histogram_ignores_nulls(spark):
    from pyspark.sql import Row

    from hypermap_etl_spark.operators.profile import fd_histogram

    rows = [Row(v=float(i)) for i in range(100)] + [Row(v=None)] * 5
    out = fd_histogram(
        spark.createDataFrame(rows, "v double"), "v"
    ).collect()
    # NULLs must not inflate any bin (they used to land in the last one)
    assert sum(r["cnt"] for r in out) == 100


def test_winsorize_clamps_tails_only(spark):
    from pyspark.sql import Row

    from hypermap_etl_spark.operators.profile import winsorize

    rows = [Row(g="a", v=float(i)) for i in range(1, 100)] + [
        Row(g="a", v=10_000.0),
        Row(g="a", v=None),
    ]
    out = winsorize(
        spark.createDataFrame(rows, "g string, v double"),
        "v", 0.0, 0.95, ["g"],
    ).collect()
    spike = [r for r in out if r["v"] == 10_000.0][0]
    assert spike["was_clamped"] is True
    assert spike["v_w"] < 10_000.0
    mid = [r for r in out if r["v"] == 50.0][0]
    assert mid["was_clamped"] is False and mid["v_w"] == 50.0
    nul = [r for r in out if r["v"] is None][0]
    assert nul["was_clamped"] is False and nul["v_w"] is None

    import pytest as _pytest

    with _pytest.raises(ValueError, match="lo_p"):
        winsorize(spark.createDataFrame(rows), "v", 0.9, 0.1)


def test_benford_known_digits(spark):
    from pyspark.sql import Row

    from hypermap_etl_spark.operators.profile import benford_profile

    # digits across magnitudes: 0.023 -> 2, 7 -> 7, 19 -> 1, 450 -> 4,
    # 1e6 -> 1, -300 -> 3 (|v|); 0 and NULL excluded
    vals = [0.023, 7.0, 19.0, 450.0, 1_000_000.0, -300.0, 0.0, None]
    df = spark.createDataFrame([Row(v=x) for x in vals], "v double")
    got = {r["digit"]: r for r in benford_profile(df, "v").collect()}
    assert {d: got[d]["n_obs"] for d in range(1, 10)} == {
        1: 2, 2: 1, 3: 1, 4: 1, 5: 0, 6: 0, 7: 1, 8: 0, 9: 0
    }
    assert got[1]["exp_share"] == 0.30103  # log10(2), the Benford head
    assert all(r["chi2_term"] >= 0 for r in got.values())
    assert abs(sum(r["obs_share"] for r in got.values()) - 1.0) < 1e-5


def test_benford_synthetic_benford_sample_has_low_chi2(spark):
    import math

    from pyspark.sql import Row

    from hypermap_etl_spark.operators.profile import benford_profile

    # construct a sample matching Benford shares exactly (counts
    # proportional to log10(1+1/d) over 10000): chi2 must be tiny
    rows = []
    for d in range(1, 10):
        n = round(10_000 * math.log10(1 + 1 / d))
        rows += [Row(v=float(d) * 10.0)] * n
    df = spark.createDataFrame(rows)
    chi2 = sum(
        r["chi2_term"] for r in benford_profile(df, "v").collect()
    )
    assert chi2 < 1.0  # rounding residue only; the 1% critical value is ~20


def test_autocorr_weekly_cycle_and_edges(spark):
    from pyspark.sql import Row

    from hypermap_etl_spark.operators.profile import autocorr_daily

    rows = []
    for d in range(1, 29):
        n = 10 + (7 if d % 7 == 0 else 0)
        rows += [Row(g="w", day=f"2026-01-{d:02d}")] * n
    rows += [Row(g="const", day=f"2026-01-{d:02d}") for d in range(1, 11)]
    out = {
        (r["g"], r["lag"]): r
        for r in autocorr_daily(
            spark.createDataFrame(rows), "day", ["g"], lags=[1, 7]
        ).collect()
    }
    assert out[("w", 7)]["autocorr"] == 1.0   # spikes align exactly
    assert out[("w", 1)]["autocorr"] < 0.0    # spike follows a base day
    assert out[("const", 1)]["autocorr"] is None  # zero variance -> NULL
    assert out[("w", 7)]["n_pairs"] == 21     # 28 days, 7 unmatched

    import pytest as _pytest

    with _pytest.raises(ValueError, match="lags"):
        autocorr_daily(spark.createDataFrame(rows), "day", ["g"], lags=[0])


def test_bootstrap_ci_covers_planted_mean_and_is_layout_invariant(spark):
    from hypermap_etl_spark.operators.profile import bootstrap_ci

    # values 0..199 -> mean 99.5; percentile bootstrap should bracket it
    rows = [("a", i, float(i % 200)) for i in range(1000)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = bootstrap_ci(df, "v", ["g"], "id", n_replicates=50).collect()[0]
    assert out["n"] == 1000 and out["n_reps"] == 50
    assert out["ci_lo"] < 99.5 < out["ci_hi"]
    assert out["ci_hi"] - out["ci_lo"] < 20  # sane width at n=1000
    assert out["ci_lo"] <= out["mean_value"] <= out["ci_hi"]
    out7 = bootstrap_ci(
        df.repartition(7), "v", ["g"], "id", n_replicates=50
    ).collect()[0]
    assert out.asDict() == out7.asDict()


def test_bootstrap_ci_width_shrinks_with_n(spark):
    from hypermap_etl_spark.operators.profile import bootstrap_ci

    def width(n):
        rows = [("a", i, float(i % 100)) for i in range(n)]
        df = spark.createDataFrame(rows, "g string, id long, v double")
        r = bootstrap_ci(df, "v", ["g"], "id", n_replicates=40).collect()[0]
        return r["ci_hi"] - r["ci_lo"]

    assert width(2000) < width(100)


def test_bootstrap_ci_degenerate_and_validation(spark):
    import pytest as _pt

    from hypermap_etl_spark.operators.profile import bootstrap_ci

    one = spark.createDataFrame([("a", 1, 5.0)], "g string, id long, v double")
    r = bootstrap_ci(one, "v", ["g"], "id", n_replicates=30).collect()[0]
    # single row: replicates where its Poisson weight is 0 are dropped
    assert 0 < r["n_reps"] <= 30
    assert r["ci_lo"] == r["ci_hi"] == 5.0  # only possible resample mean
    with _pt.raises(ValueError):
        bootstrap_ci(one, "v", ["g"], "id", n_replicates=1)


def test_ewma_anomaly_flags_planted_spike(spark):
    from hypermap_etl_spark.operators.profile import ewma_anomaly

    # 20 steady days of ~100 events, then one 3x spike day
    rows = []
    for d in range(1, 21):
        rows += [("a", f"2026-01-{d:02d}")] * 100
    rows += [("a", "2026-01-21")] * 300
    df = spark.createDataFrame(rows, "g string, day string")
    out = {r["day"]: r for r in ewma_anomaly(df, "day", ["g"]).collect()}
    assert out["2026-01-01"]["ewma_prior"] is None
    assert not out["2026-01-01"]["is_anomaly"]  # no baseline, never flagged
    assert not out["2026-01-10"]["is_anomaly"]  # steady
    spike = out["2026-01-21"]
    assert spike["is_anomaly"] and spike["rel_dev"] > 1.5
    assert spike["ewma_prior"] == 100.0


def test_ewma_anomaly_renormalizes_short_history_and_validates(spark):
    import pytest as _pt

    from hypermap_etl_spark.operators.profile import ewma_anomaly

    # day2 judged against exactly 1 prior day (weight renormalized)
    rows = [("a", "d1")] * 50 + [("a", "d2")] * 55
    df = spark.createDataFrame(rows, "g string, day string")
    out = {r["day"]: r for r in ewma_anomaly(df, "day", ["g"]).collect()}
    assert out["d2"]["ewma_prior"] == 50.0
    assert out["d2"]["rel_dev"] == 0.1
    with _pt.raises(ValueError):
        ewma_anomaly(df, "day", ["g"], alpha=1.5)
    with _pt.raises(ValueError):
        ewma_anomaly(df, "day", ["g"], lookback=0)


def test_categorical_mi_independent_and_dependent(spark):
    import math

    from hypermap_etl_spark.operators.profile import categorical_mi

    # independent: uniform product distribution -> every term 0
    ind = spark.createDataFrame(
        [(f"x{i}", f"y{j}") for i in range(3) for j in range(4) for _ in range(5)],
        "x string, y string",
    )
    terms = [r["mi_term"] for r in categorical_mi(ind, "x", "y").collect()]
    assert len(terms) == 12 and all(t == 0.0 for t in terms)

    # perfectly dependent: y == x -> MI = H(X) = ln(2) for 2 classes
    dep = spark.createDataFrame(
        [("a", "a")] * 10 + [("b", "b")] * 10, "x string, y string"
    )
    mi = sum(r["mi_term"] for r in categorical_mi(dep, "x", "y").collect())
    assert abs(mi - math.log(2)) < 1e-6

    # NULLs in either column are excluded, not a category
    withnull = spark.createDataFrame(
        [("a", "u"), ("a", None), (None, "u"), ("b", "v")], "x string, y string"
    )
    out = categorical_mi(withnull, "x", "y").collect()
    assert sum(r["n_xy"] for r in out) == 2


def test_welch_ab_detects_planted_effect(spark):
    import hashlib

    from hypermap_etl_spark.operators.profile import welch_ab_test

    # plant a large arm effect using the REAL assignment hash so the
    # expected statistics are hand-computable
    def arm(uid):
        return int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:8], 16) % 2

    rows = []
    for uid in range(400):
        base = 10.0 if arm(uid) == 0 else 30.0
        rows.append(("g", uid, base + (uid % 7) * 0.5))
    df = spark.createDataFrame(rows, "g string, user_id long, value double")
    out = welch_ab_test(df, "value", "user_id", ["g"]).collect()[0]
    assert out["n_a"] + out["n_b"] == 400
    assert abs(out["n_a"] - out["n_b"]) < 80  # hash split roughly balanced
    # noise term isn't identically distributed across arms — the
    # effect shows up within one noise-amplitude of the planted 20
    assert abs((out["mean_b"] - out["mean_a"]) - 20.0) < 1.0
    assert out["significant"] and out["t_stat"] < -50

    # reference Welch t from the same sums
    va = [r[2] for r in rows if arm(r[1]) == 0]
    vb = [r[2] for r in rows if arm(r[1]) == 1]

    def stats(v):
        n = len(v)
        m = sum(v) / n
        var = (sum(x * x for x in v) - sum(v) ** 2 / n) / (n - 1)
        return n, m, var

    na, ma, s2a = stats(va)
    nb, mb, s2b = stats(vb)
    t = (ma - mb) / ((s2a / na + s2b / nb) ** 0.5)
    assert out["t_stat"] == pytest.approx(round(t, 6), abs=2e-6)


def test_welch_ab_null_effect_and_degenerates(spark):
    from hypermap_etl_spark.operators.profile import welch_ab_test

    # A/A: same distribution in both arms -> |t| small, not significant
    rows = [("g", uid, float(uid % 20)) for uid in range(2000)]
    df = spark.createDataFrame(rows, "g string, user_id long, value double")
    out = welch_ab_test(df, "value", "user_id", ["g"]).collect()[0]
    assert not out["significant"]

    # constant values: zero variance -> t NULL, never significant
    const = spark.createDataFrame(
        [("g", uid, 5.0) for uid in range(50)],
        "g string, user_id long, value double",
    )
    oc = welch_ab_test(const, "value", "user_id", ["g"]).collect()[0]
    assert oc["t_stat"] is None and oc["significant"] is False

    # tiny group (an arm with n<=1) emits no row
    tiny = spark.createDataFrame(
        [("g", 1, 1.0)], "g string, user_id long, value double"
    )
    assert welch_ab_test(tiny, "value", "user_id", ["g"]).count() == 0


def test_linkage_scores_classification(spark):
    from hypermap_etl_spark.operators.fuzzy import linkage_scores

    rows = [
        # 1-2: exact name, all fields agree -> strong match
        (1, "acme corp", 5, "A", 100.0),
        (2, "acme corp", 5, "A", 120.0),
        # 3: one edit away, all fields disagree -> weight 3.5-1.5-0.75-1.0
        (3, "acme corX", 9, "B", 9000.0),
        # 4: unrelated name (distance > 1 from all) -> no candidate pair
        (4, "zzzzzzzzz", 5, "A", 100.0),
    ]
    df = spark.createDataFrame(
        rows, "id long, name string, nat int, seg string, bal double"
    )
    out = {
        (r["id1"], r["id2"]): r
        for r in linkage_scores(
            df, "id", "name",
            cat_fields=[("nat", 2.25, -1.5), ("seg", 1.25, -0.75)],
            num_col="bal",
        ).collect()
    }
    assert (1, 4) not in out and (2, 4) not in out
    strong = out[(1, 2)]
    assert strong["name_dist"] == 0 and strong["verdict"] == "match"
    assert strong["weight"] == 6.5 + 2.25 + 1.25 + 1.5
    weak = out[(1, 3)]
    assert weak["name_dist"] == 1 and weak["verdict"] == "non_match"
    assert weak["weight"] == 3.5 - 1.5 - 0.75 - 1.0
    # balance proximity is exact-cent: 100.0 vs 120.0 within 500.00
    assert strong["close_bal"] is True


# ------------------------------------------- r7 stats wave ----


def test_mann_whitney_detects_planted_shift(spark):
    """A location shift between arms must push |z| far past crit,
    while an A/A split of one distribution stays quiet; all-tied
    values yield sigma=0 -> null z, significant False (not an error)."""
    from hypermap_etl_spark.operators.profile import mann_whitney_u

    rows = []
    # group "shift": arm assignment is md5-based, so plant the shift
    # THROUGH the arm hash: give every unit its arm's distribution
    import hashlib

    def arm_of(uid):
        return int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:8], 16) % 2

    rng_vals = {0: 10.0, 1: 30.0}
    for uid in range(400):
        a = arm_of(uid)
        rows.append(("shift", uid, rng_vals[a] + (uid % 7) * 0.5))
        rows.append(("aa", uid, (uid % 13) * 1.0))
        rows.append(("tied", uid, 5.0))
    df = spark.createDataFrame(rows, "event_type string, user_id long, value double")
    out = {r["event_type"]: r for r in mann_whitney_u(
        df, "value", "user_id", ["event_type"]).collect()}
    assert out["shift"]["significant"] is True
    assert abs(out["shift"]["z_stat"]) > 10
    assert out["aa"]["significant"] is False
    assert out["tied"]["z_stat"] is None
    assert out["tied"]["significant"] is False
    # U is within its valid range everywhere
    for r in out.values():
        assert 0 <= r["u_stat"] <= r["n_a"] * r["n_b"]


def test_mann_whitney_matches_scipy_free_reference(spark):
    """Exact U and tie-corrected z against a hand-rolled pure-Python
    rank-sum on a small mixed-tie sample."""
    from hypermap_etl_spark.operators.profile import mann_whitney_u
    import hashlib

    def arm_of(uid):
        return int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:8], 16) % 2

    import random

    rng = random.Random(5)
    rows = [("g", uid, float(rng.randrange(0, 8))) for uid in range(60)]
    df = spark.createDataFrame(rows, "event_type string, user_id long, value double")
    got = mann_whitney_u(df, "value", "user_id", ["event_type"]).collect()[0]

    vals = [(v, arm_of(u)) for _, u, v in rows]
    svals = sorted(vals)
    # average ranks
    ranks = {}
    i = 0
    while i < len(svals):
        j = i
        while j < len(svals) and svals[j][0] == svals[i][0]:
            j += 1
        avg = (i + 1 + j) / 2.0
        ranks[svals[i][0]] = avg
        i = j
    ra = sum(ranks[v] for v, a in vals if a == 0)
    n_a = sum(1 for _, a in vals if a == 0)
    n_b = len(vals) - n_a
    u_a = ra - n_a * (n_a + 1) / 2.0
    from collections import Counter

    tie = sum(t**3 - t for t in Counter(v for v, _ in vals).values())
    n = n_a + n_b
    sigma2 = n_a * n_b / 12.0 * ((n + 1) - tie / (n * (n - 1)))
    z = (u_a - n_a * n_b / 2.0) / sigma2**0.5
    assert got["n_a"] == n_a and got["n_b"] == n_b
    assert abs(got["u_stat"] - u_a) < 1e-6
    assert abs(got["z_stat"] - round(z, 6)) < 1e-6


def test_theil_sen_shrugs_off_outlier_day(spark):
    """A planted linear series with one wild outlier day: Theil-Sen
    recovers the true slope; the same data's OLS slope is dragged."""
    from hypermap_etl_spark.operators.profile import theil_sen_trend

    rows = []
    for d in range(30):
        n = 5 + 2 * d if d != 15 else 500  # outlier day
        for i in range(n):
            rows.append(("g", f"2024-01-{d + 1:02d}"))
    df = spark.createDataFrame(rows, "event_type string, day string")
    got = theil_sen_trend(df, "day", ["event_type"]).collect()[0]
    assert abs(got["ts_slope"] - 2.0) < 0.35
    assert got["n_pairs"] == 30 * 29 // 2


def test_changepoint_finds_planted_shift_day(spark):
    """Level shift 10 -> 40 after day 20 of 40: the argmax split must
    land on the boundary day and flag; a flat series must not flag."""
    from hypermap_etl_spark.operators.profile import changepoint_screen

    rows = []
    for d in range(40):
        n = 10 if d < 20 else 40
        for i in range(n):
            rows.append(("shifty", f"2024-02-{d + 1:02d}" if d < 28
                         else f"2024-03-{d - 27:02d}"))
    for d in range(40):
        for i in range(7):
            rows.append(("flat", f"2024-02-{d + 1:02d}" if d < 28
                         else f"2024-03-{d - 27:02d}"))
    df = spark.createDataFrame(rows, "event_type string, day string")
    got = {r["event_type"]: r for r in changepoint_screen(
        df, "day", ["event_type"]).collect()}
    assert got["shifty"]["shifted"] is True
    assert got["shifty"]["change_day"] == "2024-02-20"  # last pre-shift day
    assert got["flat"]["shifted"] is False


def test_seasonal_naive_perfect_on_periodic_series(spark):
    """A strictly 12-periodic series backtests with ape = 0 for every
    month past the first season, and null forecasts before it."""
    from hypermap_etl_spark.operators.profile import seasonal_naive_backtest

    rows = []
    for y in (2023, 2024):
        for m in range(1, 13):
            for i in range(10 + m):  # seasonal level varies by month
                rows.append((f"{y}-{m:02d}",))
    df = spark.createDataFrame(rows, "month string")
    out = seasonal_naive_backtest(df, "month").collect()
    by_month = {r["month"]: r for r in out}
    assert by_month["2023-06"]["forecast"] is None
    assert by_month["2024-06"]["forecast"] == 16
    assert all(
        by_month[f"2024-{m:02d}"]["ape"] == 0.0 for m in range(1, 13)
    )


def test_golden_records_fusion_rules(spark):
    """Survivorship: max wins for numerics, majority (smallest on tie)
    for categoricals; singletons pass through as their own cluster."""
    from hypermap_etl_spark.operators.fuzzy import golden_records

    ents = spark.createDataFrame(
        [
            (1, 100.0, "A"),
            (2, 300.0, "B"),
            (3, 200.0, "B"),
            (9, 50.0, "Z"),  # singleton, no cluster row
        ],
        "id long, bal double, seg string",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id long, cluster_id long"
    )
    got = {r["cluster_id"]: r for r in golden_records(
        ents, clusters, "id", max_cols=["bal"], mode_cols=["seg"]
    ).collect()}
    assert got[1]["n_members"] == 3
    assert got[1]["max_bal"] == 300.0
    assert got[1]["mode_seg"] == "B"  # majority
    assert got[9]["n_members"] == 1 and got[9]["max_bal"] == 50.0

    # tie on mode -> smallest value wins
    ents2 = spark.createDataFrame(
        [(1, "B"), (2, "A")], "id long, seg string"
    )
    cl2 = spark.createDataFrame([(1, 1), (2, 1)], "doc_id long, cluster_id long")
    got2 = golden_records(ents2, cl2, "id", mode_cols=["seg"]).collect()[0]
    assert got2["mode_seg"] == "A"


def test_seasonal_index_outliers_absorbs_cycle_flags_spike(spark):
    """A clean weekly cycle (weekend half the weekday level) must NOT
    flag; a genuine one-day spike must flag even after its day-of-week
    index discounts it."""
    from hypermap_etl_spark.operators.profile import seasonal_index_outliers

    rows = []
    for d in range(28):
        dow = d % 7
        n = 10 if dow < 5 else 5  # weekday 10, weekend 5
        if d == 9:
            n = 40  # planted spike on a weekday
        day = f"2024-03-{d + 1:02d}"
        for _ in range(n):
            rows.append(("g", day, str(dow)))
    df = spark.createDataFrame(rows, "event_type string, day string, dow string")
    out = {r["day"]: r for r in seasonal_index_outliers(
        df, "day", "dow", ["event_type"]).collect()}
    flagged = {d for d, r in out.items() if r["is_outlier"]}
    assert "2024-03-10" in flagged  # the spike
    # weekends do NOT flag (a raw z/EWMA screen would): deseasonalized
    # weekend counts sit at the overall mean
    weekend_days = {f"2024-03-{d + 1:02d}" for d in range(28) if d % 7 >= 5}
    assert not (flagged & weekend_days)
    # spike aside, indexes multiply back to the raw counts
    r = out["2024-03-03"]
    assert abs(r["deseasonalized"] * r["seasonal_index"] - r["n"]) < 1e-3


def test_bot_screen_flags_ticker_not_bursty(spark):
    """A constant-interval ticker flags as regular; a bursty human-ish
    pattern does not; below-min-events keys are omitted."""
    from datetime import datetime, timedelta

    from hypermap_etl_spark.operators.profile import bot_regularity_screen

    t0 = datetime(2024, 1, 1)
    rows = []
    for i in range(30):
        rows.append(("bot", t0 + timedelta(seconds=60 * i)))  # exact minute
    bursty = [1, 5, 6, 300, 301, 310, 2000, 2100, 2105, 9000,
              9500, 9501, 20000, 21000, 21005, 40000, 40001, 42000,
              80000, 80100, 80200, 100000]
    for s in bursty:
        rows.append(("human", t0 + timedelta(seconds=s)))
    rows += [("sparse", t0 + timedelta(seconds=s)) for s in (1, 2, 3)]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {r["user_id"]: r for r in bot_regularity_screen(
        df, "user_id", min_events=20).collect()}
    assert set(got) == {"bot", "human"}  # sparse omitted
    assert got["bot"]["is_regular"] is True and got["bot"]["gap_cv"] == 0.0
    assert got["bot"]["mean_gap_s"] == 60.0
    assert got["human"]["is_regular"] is False
    assert got["human"]["gap_cv"] > 0.3


def test_ks_two_sample_detects_shape_shift(spark):
    """Same-mean different-shape arms must flag (the case Welch
    misses); an A/A split stays quiet; D is the exact ECDF gap."""
    import hashlib

    from hypermap_etl_spark.operators.profile import ks_two_sample

    def arm_of(uid):
        return int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:8], 16) % 2

    rows = []
    for uid in range(600):
        a = arm_of(uid)
        # shape group: arm 0 constant 10; arm 1 half 0 / half 20 (same mean)
        v = 10.0 if a == 0 else (0.0 if uid % 2 == 0 else 20.0)
        rows.append(("shape", uid, v))
        rows.append(("aa", uid, float(uid % 13)))
    df = spark.createDataFrame(rows, "event_type string, user_id long, value double")
    got = {r["event_type"]: r for r in ks_two_sample(
        df, "value", "user_id", ["event_type"]).collect()}
    assert got["shape"]["distributions_differ"] is True
    assert got["shape"]["ks_d"] > 0.4  # ECDF gap ~0.5 at v in [0,10)
    assert got["aa"]["distributions_differ"] is False
    # hand check: D for two known tiny samples
    # uids 1,2 hash to arm 0; 3,6 to arm 1 (md5 parity) -> arm A
    # {1.0, 2.0}, arm B {3.0, 4.0}: ECDF gap peaks at 1.0 after v=2
    tiny = spark.createDataFrame(
        [("t", 1, 1.0), ("t", 2, 2.0), ("t", 3, 3.0), ("t", 6, 4.0)],
        "event_type string, user_id long, value double",
    )
    r = ks_two_sample(tiny, "value", "user_id", ["event_type"]).collect()[0]
    assert r["n_a"] == 2 and r["n_b"] == 2
    assert r["ks_d"] == 1.0  # disjoint supports -> exact maximum gap


# ------------------------------------------- chi2 / spearman ----


def test_chi2_independent_is_zero_dependent_is_large(spark):
    """A product-form contingency (counts = row x col pattern) gives
    chi2 exactly 0; a diagonal-concentrated one gives a large chi2
    and Cramer's V near 1; dof = (R-1)(C-1)."""
    from hypermap_etl_spark.operators.profile import chi2_independence

    rows = []
    # independent: n(x, y) = rowweight(x) * colweight(y)
    for x, rw in [("a", 1), ("b", 2)]:
        for y, cw in [(0, 3), (1, 5)]:
            rows += [(x, y)] * (rw * cw)
    df = spark.createDataFrame(rows, "x string, y long")
    r = chi2_independence(df, "x", "y").collect()[0]
    assert r["n"] == 24 and r["dof"] == 1
    assert r["chi2"] == 0.0
    assert r["cramers_v"] == 0.0

    # dependent: x fully determines y
    dep = spark.createDataFrame(
        [("a", 0)] * 50 + [("b", 1)] * 50, "x string, y long"
    )
    d = chi2_independence(dep, "x", "y").collect()[0]
    assert d["chi2"] == 100.0  # exact for the 2x2 perfect association
    assert d["cramers_v"] == 1.0


def test_chi2_matches_hand_reference_and_degenerate(spark):
    """chi2 against the textbook formula on a small 2x2; single-column
    input yields dof 0, chi2 0, NULL V (not a crash)."""
    from hypermap_etl_spark.operators.profile import chi2_independence

    # contingency [[10, 20], [30, 40]]
    rows = (
        [("a", 0)] * 10 + [("a", 1)] * 20 + [("b", 0)] * 30 + [("b", 1)] * 40
    )
    df = spark.createDataFrame(rows, "x string, y long")
    r = chi2_independence(df, "x", "y").collect()[0]
    n, e_a0 = 100, 30.0 * 40.0 / 100
    exp = {
        ("a", 0): 30 * 40 / 100,
        ("a", 1): 30 * 60 / 100,
        ("b", 0): 70 * 40 / 100,
        ("b", 1): 70 * 60 / 100,
    }
    obs = {("a", 0): 10, ("a", 1): 20, ("b", 0): 30, ("b", 1): 40}
    want = sum(
        round((obs[k] - exp[k]) ** 2 / exp[k], 6) for k in obs
    )
    assert abs(r["chi2"] - want) < 1e-9
    assert r["n"] == n and r["dof"] == 1

    one = spark.createDataFrame([("a", 0), ("a", 1)], "x string, y long")
    o = chi2_independence(one, "x", "y").collect()[0]
    assert o["dof"] == 0 and o["chi2"] == 0.0 and o["cramers_v"] is None


def test_spearman_monotone_ties_and_constant(spark):
    """Perfect monotone (even nonlinear) -> rho 1; reversed -> -1;
    a tied sample matches the hand-computed tie-corrected value;
    a constant column -> NULL rho."""
    from hypermap_etl_spark.operators.profile import spearman_corr

    rows = []
    for i in range(20):
        rows.append(("mono", float(i), float(i) ** 3))
        rows.append(("anti", float(i), -float(i) ** 3 / 7.0))
        rows.append(("const", float(i), 5.0))
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in spearman_corr(df, "x", "y", ["g"]).collect()}
    assert out["mono"]["rho"] == 1.0
    assert out["anti"]["rho"] == -1.0
    assert out["const"]["rho"] is None
    assert out["mono"]["n"] == 20

    # tie-corrected reference: x = [1,1,2,3], y = [2,3,3,5]
    tied = spark.createDataFrame(
        [("t", 1.0, 2.0), ("t", 1.0, 3.0), ("t", 2.0, 3.0), ("t", 3.0, 5.0)],
        "g string, x double, y double",
    )
    got = spearman_corr(tied, "x", "y", ["g"]).collect()[0]
    # avg ranks: x -> [1.5, 1.5, 3, 4]; y -> [1, 2.5, 2.5, 4]
    rx = [1.5, 1.5, 3.0, 4.0]
    ry = [1.0, 2.5, 2.5, 4.0]
    n = 4
    sx, sy = sum(rx), sum(ry)
    sxx = sum(v * v for v in rx)
    syy = sum(v * v for v in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    want = (n * sxy - sx * sy) / (
        (n * sxx - sx * sx) ** 0.5 * (n * syy - sy * sy) ** 0.5
    )
    assert abs(got["rho"] - round(want, 6)) < 1e-9


def test_fd_confidence_exact_partial_and_nulls(spark):
    """An exact FD reads 1.0 with zero violations; a partial FD's
    violation count equals the minority rows; NULLs are excluded;
    multiple pairs come back in one frame."""
    from hypermap_etl_spark.operators.profile import fd_confidence

    df = spark.createDataFrame(
        [
            (1, "a", "x"), (2, "a", "x"), (3, "a", "y"),
            (4, "b", "z"), (5, "b", "z"), (6, None, "w"), (7, "c", None),
        ],
        "id long, x string, y string",
    )
    out = {(r["det_col"], r["dep_col"]): r
           for r in fd_confidence(df, [("id", "x"), ("x", "y")]).collect()}
    # id -> x: id unique, FD exact over the 6 non-null rows
    exact = out[("id", "x")]
    assert exact["confidence"] == 1.0 and exact["n_violations"] == 0
    assert exact["n_rows"] == 6 and exact["n_det_keys"] == 6
    # x -> y: a:{x:2, y:1} keeps 2, b:{z:2} keeps 2 -> 4/5, 1 violation
    part = out[("x", "y")]
    assert part["n_rows"] == 5 and part["n_det_keys"] == 2
    assert part["n_violations"] == 1
    assert part["confidence"] == 0.8

    import pytest

    with pytest.raises(ValueError):
        fd_confidence(df, [])


# ---------------------------- hypothesis: stats-op invariants ----------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=3, max_size=40,
    )
)
def test_spearman_properties(spark, pts):
    """|rho| <= 1; invariance under a strictly monotone affine map of
    y (ties preserved exactly at decimal(12,2)); antisymmetry under
    negation."""
    from hypermap_etl_spark.operators.profile import spearman_corr

    rows = [("g", float(x), float(y)) for x, y in pts]
    df = spark.createDataFrame(rows, "g string, x double, y double")

    def rho_of(frame):
        r = spearman_corr(frame, "x", "y", ["g"]).collect()
        return r[0]["rho"] if r else None

    base = rho_of(df)
    if base is None:
        return  # constant column: NULL rho, nothing further to check
    assert -1.0 <= base <= 1.0
    import pyspark.sql.functions as SF

    affine = df.select("g", "x", (SF.col("y") * 2 + 1).alias("y"))
    assert rho_of(affine) == base
    neg = df.select("g", "x", (-SF.col("y")).alias("y"))
    assert rho_of(neg) == -base


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    scored=st.lists(
        st.tuples(st.integers(0, 10), st.booleans()),
        min_size=4, max_size=60,
    )
)
def test_roc_auc_complement_property(spark, scored):
    """AUC of the flipped labels is exactly 1 - AUC (ties counted
    half on both sides), whenever both classes are present."""
    from hypermap_etl_spark.operators.quality_model import roc_auc

    rows = [(s / 10.0, int(y)) for s, y in scored]
    if len({y for _, y in rows}) < 2:
        return
    df = spark.createDataFrame(rows, "score double, label int")
    a = roc_auc(df).collect()[0]["auc"]
    flipped = spark.createDataFrame(
        [(s, 1 - y) for s, y in rows], "score double, label int"
    )
    b = roc_auc(flipped).collect()[0]["auc"]
    assert abs(a + b - 1.0) < 2e-6  # each side rounded to 6 dp


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    cells=st.dictionaries(
        st.tuples(st.sampled_from("ab"), st.sampled_from([0, 1])),
        st.integers(1, 9), min_size=4, max_size=4,
    ),
    k=st.integers(2, 4),
)
def test_chi2_scales_linearly_with_replication(spark, cells, k):
    """Replicating every row k times multiplies chi2 by exactly k
    (each cell term scales by k before rounding; dof unchanged)."""
    from hypermap_etl_spark.operators.profile import chi2_independence

    rows = [(x, y) for (x, y), n in cells.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "x string, y long")
    base = chi2_independence(df, "x", "y").collect()[0]
    rep = spark.createDataFrame(rows * k, "x string, y long")
    scaled = chi2_independence(rep, "x", "y").collect()[0]
    assert scaled["dof"] == base["dof"]
    assert abs(scaled["chi2"] - k * base["chi2"]) < k * 5e-6


def test_phonetic_key_classic_soundex_values(spark):
    """The canonical Soundex test vectors: hearing variants collide
    (Robert/Rupert, Smith/Smyth), the H/W continuation rule holds
    (Ashcraft), the first letter collapses with a same-code follower
    (Pfister), zero-padding and empty-input behavior."""
    from hypermap_etl_spark.operators.fuzzy import phonetic_key

    cases = {
        "Robert": "R163", "Rupert": "R163",
        "Smith": "S530", "Smyth": "S530",
        "Ashcraft": "A261", "Ashcroft": "A261",   # H/W continuation
        "Tymczak": "T522",
        "Pfister": "P236",                          # P,F share code 1
        "Honeyman": "H555",
        "Lee": "L000",                              # zero padding
        "Wu": "W000",
        "123": "",                                  # letters only
    }
    df = spark.createDataFrame([(k,) for k in cases], "name string")
    got = {r["name"]: r["key"] for r in
           df.select("name", phonetic_key(F.col("name")).alias("key")).collect()}
    for name, want in cases.items():
        assert got[name] == want, (name, got[name], want)


def test_phonetic_blocks_counts_and_pair_cost(spark):
    """Blocks group hearing variants; candidate cost is n(n-1)/2;
    distinct spellings counted per block."""
    from hypermap_etl_spark.operators.fuzzy import phonetic_blocks

    rows = [(1, "Smith"), (2, "Smyth"), (3, "Smith"), (4, "Robert"),
            (5, "Rupert"), (6, "Lee")]
    df = spark.createDataFrame(rows, "id long, name string")
    out = {r["skey"]: r for r in phonetic_blocks(df, "id", "name").collect()}
    s = out["S530"]
    assert s["n_rows"] == 3 and s["n_names"] == 2
    assert s["n_candidate_pairs"] == 3
    r = out["R163"]
    assert r["n_rows"] == 2 and r["n_candidate_pairs"] == 1
    assert out["L000"]["n_candidate_pairs"] == 0


def test_theils_u_determinism_direction_and_degenerate(spark):
    """X determining Y gives U(Y|X)=1 even when Y doesn't determine X;
    independence gives 0; a single-valued Y gives NULL (H(Y)=0); a
    hand-computed mixed case matches the entropy formula."""
    import math

    from hypermap_etl_spark.operators.profile import theils_u

    # x in {a,b,c,d} maps onto y in {0,1}: x determines y, not vice versa
    det = spark.createDataFrame(
        [("a", 0)] * 5 + [("b", 0)] * 5 + [("c", 1)] * 5 + [("d", 1)] * 5,
        "x string, y long",
    )
    r = theils_u(det, "x", "y").collect()[0]
    assert r["u_y_given_x"] == 1.0
    rev = theils_u(det.selectExpr("y as x", "x as y"), "x", "y").collect()[0]
    assert rev["u_y_given_x"] < 1.0  # y does NOT determine x

    ind = spark.createDataFrame(
        [(x, y) for x in "ab" for y in (0, 1) for _ in range(10)],
        "x string, y long",
    )
    assert theils_u(ind, "x", "y").collect()[0]["u_y_given_x"] == 0.0

    one = spark.createDataFrame([("a", 1), ("b", 1)], "x string, y long")
    assert theils_u(one, "x", "y").collect()[0]["u_y_given_x"] is None

    # hand case: contingency [[4,1],[1,4]] (n=10)
    rows = [("a", 0)] * 4 + [("a", 1)] + [("b", 0)] + [("b", 1)] * 4
    df = spark.createDataFrame(rows, "x string, y long")
    got = theils_u(df, "x", "y").collect()[0]
    n = 10
    mi = sum(
        round((c / n) * (math.log(c) + math.log(n)
                         - math.log(5) - math.log(5)), 9)
        for c in (4, 1, 1, 4)
    )
    hy = sum(round(-(5 / n) * (math.log(5) - math.log(n)), 9) for _ in range(2))
    assert got["mi_nats"] == round(mi, 6)
    assert got["u_y_given_x"] == round(mi / hy, 6)


def test_sorted_neighborhood_window_semantics(spark):
    """Pairs are exactly the within-window rank neighbors: a sorted
    run of names yields consecutive + skip-one pairs at window 3;
    near-variants with no shared exact block still pair; NULLs drop;
    window < 2 raises."""
    import pytest

    from hypermap_etl_spark.operators.fuzzy import sorted_neighborhood_pairs
    from hypermap_etl_spark.util import release_persisted

    rows = [(1, "john smith"), (2, "jon smith"), (3, "aaron a"),
            (4, "zed zz"), (5, None)]
    df = spark.createDataFrame(rows, "id long, name string")
    out = {(r["id1"], r["id2"]): r["rank_gap"] for r in
           sorted_neighborhood_pairs(df, "id", "name", window=3).collect()}
    # name order: aaron a(3), john smith(1), jon smith(2), zed zz(4)
    assert out == {(3, 1): 1, (3, 2): 2, (1, 2): 1, (1, 4): 2, (2, 4): 1}
    # the Jon/John variants pair despite sharing no exact key
    assert (1, 2) in out
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "id", "name", window=1)
    release_persisted()


def test_kendall_tau_b_reference_and_degenerate(spark):
    """tau-b against a brute-force pair count on a tied sample;
    perfect monotone bands -> 1; reversed -> -1; constant margin ->
    NULL."""
    from hypermap_etl_spark.operators.profile import kendall_tau_b
    from hypermap_etl_spark.util import release_persisted

    pts = [(0, 0), (0, 1), (1, 1), (1, 1), (2, 0), (2, 2), (3, 2)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = kendall_tau_b(df, "x", "y").collect()[0]
    n = len(pts)
    c = d = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            (xa, ya), (xb, yb) = pts[i], pts[j]
            if xa == xb:
                tx += 1
            if ya == yb:
                ty += 1
            if (xa - xb) * (ya - yb) > 0:
                c += 1
            elif (xa - xb) * (ya - yb) < 0:
                d += 1
    n0 = n * (n - 1) / 2
    want = (c - d) / (((n0 - tx) ** 0.5) * ((n0 - ty) ** 0.5))
    assert got["concordant"] == c and got["discordant"] == d
    assert got["n_pairs"] == n0
    assert abs(got["tau_b"] - round(want, 6)) < 1e-9

    mono = spark.createDataFrame([(i, i * 2) for i in range(9)], "x long, y long")
    assert kendall_tau_b(mono, "x", "y").collect()[0]["tau_b"] == 1.0
    anti = spark.createDataFrame([(i, -i) for i in range(9)], "x long, y long")
    assert kendall_tau_b(anti, "x", "y").collect()[0]["tau_b"] == -1.0
    const = spark.createDataFrame([(i, 7) for i in range(9)], "x long, y long")
    assert kendall_tau_b(const, "x", "y").collect()[0]["tau_b"] is None
    release_persisted()


def test_fano_factor_landmarks(spark):
    """Constant daily counts -> 0; a known dispersed series matches
    the hand formula; count_col sums partials."""
    from hypermap_etl_spark.operators.profile import fano_factor

    rows = []
    for d in range(5):
        rows += [("flat", f"d{d}")] * 4          # constant 4/day
    for d, c in enumerate([1, 1, 1, 1, 16]):     # bursty
        rows += [("burst", f"d{d}")] * c
    df = spark.createDataFrame(rows, "g string, day string")
    out = {r["g"]: r for r in fano_factor(df, "day", ["g"]).collect()}
    assert out["flat"]["fano"] == 0.0 and out["flat"]["n_days"] == 5
    cs = [1, 1, 1, 1, 16]
    n, s, ss = 5, sum(cs), sum(c * c for c in cs)
    want = (n * ss - s * s) / (n * s)
    assert out["burst"]["fano"] == round(want, 6)
    assert out["burst"]["total"] == 20


def test_markov_entropy_rate_landmarks(spark):
    """A deterministic cycle has h_rate 0 and predictability 1; an
    i.i.d. alternating-free sequence has h_rate == h_next
    (predictability ~0); transitions never cross keys."""
    from hypermap_etl_spark.operators.profile import markov_entropy_rate
    from hypermap_etl_spark.util import release_persisted

    rows = []
    # user 1: deterministic a->b->a->b...
    for i in range(40):
        rows.append((1, i, "ab"[i % 2]))
    df = spark.createDataFrame(rows, "user_id long, seq long, state string")
    r = markov_entropy_rate(df, "user_id", "state", ["seq"]).collect()[0]
    assert r["h_rate"] == 0.0 and r["predictability"] == 1.0
    assert r["n_transitions"] == 39 and r["n_states"] == 2

    # two users, key boundary respected: each user constant state, so
    # zero cross-state transitions even though states differ by user
    rows2 = [(1, i, "x") for i in range(5)] + [(2, i, "y") for i in range(5)]
    df2 = spark.createDataFrame(rows2, "user_id long, seq long, state string")
    r2 = markov_entropy_rate(df2, "user_id", "state", ["seq"]).collect()[0]
    assert r2["h_rate"] == 0.0 and r2["n_transitions"] == 8
    release_persisted()


def test_basket_rules_hand_counts(spark):
    """Support/confidence/lift against hand counts; presence
    semantics (duplicates in a basket count once); min_support
    filters; a negatively-associated pair lifts below 1."""
    from hypermap_etl_spark.operators.profile import basket_rules
    from hypermap_etl_spark.util import release_persisted

    baskets = {
        1: ["a", "b", "b"],   # dup b counts once
        2: ["a", "b"],
        3: ["a", "c"],
        4: ["b"],
        5: ["a", "b", "c"],
    }
    rows = [(k, i) for k, its in baskets.items() for i in its]
    df = spark.createDataFrame(rows, "bid long, item string")
    out = {(r["item_a"], r["item_b"]): r for r in
           basket_rules(df, ["bid"], "item", min_support=2).collect()}
    ab = out[("a", "b")]
    # n(a)=4, n(b)=4, n(ab)=3, N=5
    assert ab["n_baskets_pair"] == 3
    assert ab["support"] == 0.6
    assert ab["conf_a_to_b"] == 0.75 and ab["conf_b_to_a"] == 0.75
    assert ab["lift"] == round(3 * 5 / (4 * 4), 6)
    ac = out[("a", "c")]
    assert ac["n_baskets_pair"] == 2 and ac["lift"] == round(2 * 5 / (4 * 2), 6)
    assert ("b", "c") not in out  # support 1 < min_support 2
    import pytest

    with pytest.raises(ValueError):
        basket_rules(df, ["bid"], "item", min_support=0)
    release_persisted()


def test_did_removes_shared_shock_and_detects_effect(spark):
    """A shared post-period shock alone yields DiD 0 (not
    significant); a planted treatment-arm-only lift is recovered
    exactly and flags; undersized cells yield NULL z."""
    import hashlib

    from hypermap_etl_spark.operators.profile import did_estimate

    def arm_of(uid):
        return int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:8], 16) % 2

    rows = []
    for uid in range(400):
        a = arm_of(uid)
        noise = (uid % 7) * 0.25
        # pre: both arms baseline; post: shared +10 shock, arm1 +5 more
        rows.append((uid, 0, 20.0 + noise))
        rows.append((uid, 1, 30.0 + noise + (5.0 if a == 1 else 0.0)))
    df = spark.createDataFrame(rows, "user_id long, post int, value double")
    r = did_estimate(df, "value", "user_id", "post").collect()[0]
    assert r["did"] == 5.0 and r["significant"] is True
    assert r["n_pre_a"] + r["n_pre_b"] == 400

    # shock only: no arm-specific effect -> DiD exactly 0
    rows0 = [(uid, p, 20.0 + 10.0 * p + (uid % 7) * 0.25)
             for uid in range(400) for p in (0, 1)]
    df0 = spark.createDataFrame(rows0, "user_id long, post int, value double")
    r0 = did_estimate(df0, "value", "user_id", "post").collect()[0]
    assert r0["did"] == 0.0 and r0["significant"] is False

    tiny = spark.createDataFrame(
        [(1, 0, 1.0), (1, 1, 2.0), (3, 0, 1.0), (3, 1, 2.0)],
        "user_id long, post int, value double",
    )
    rt = did_estimate(tiny, "value", "user_id", "post").collect()[0]
    assert rt["z_stat"] is None and rt["significant"] is False


def test_cuped_matches_reference_and_reduces_variance(spark):
    """theta, adjusted effect, z, and the variance-reduction ratio
    against a pure-Python reference on units with a predictive
    covariate; a useless covariate gives theta ~ 0 and ~no reduction;
    adjustment preserves the effect expectation."""
    import hashlib

    from hypermap_etl_spark.operators.profile import cuped_adjust

    def arm_of(uid):
        return int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:8], 16) % 2

    rows = []
    for uid in range(300):
        a = arm_of(uid)
        x = float(uid % 50)                      # pre covariate
        y = 2.0 * x + 10.0 + 3.0 * a + (uid % 7) * 0.5  # post metric
        rows.append((uid, x, y))
    df = spark.createDataFrame(rows, "user_id long, x double, y double")
    got = cuped_adjust(df, "x", "y", "user_id").collect()[0]

    xs = {0: [], 1: []}
    for uid, x, y in rows:
        xs[arm_of(uid)].append((x, y))
    allp = xs[0] + xs[1]
    n = len(allp)
    sx = sum(p[0] for p in allp); sy = sum(p[1] for p in allp)
    sxy = sum(p[0] * p[1] for p in allp); sxx = sum(p[0] ** 2 for p in allp)
    theta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    assert abs(got["theta"] - round(theta, 6)) < 1e-6
    mx = sx / n

    def adj_mean(pts):
        return (sum(p[1] for p in pts) / len(pts)
                - theta * (sum(p[0] for p in pts) / len(pts) - mx))

    want = adj_mean(xs[1]) - adj_mean(xs[0])
    assert abs(got["effect_adj"] - round(want, 6)) < 1e-5
    # the covariate explains most variance here
    assert got["var_reduction"] > 0.9
    assert got["significant"] is True

    # useless covariate: constant x -> theta NULL-safe 0/0 path
    const = spark.createDataFrame(
        [(uid, 1.0, float(uid % 9)) for uid in range(100)],
        "user_id long, x double, y double",
    )
    c = cuped_adjust(const, "x", "y", "user_id").collect()[0]
    assert c["theta"] is None  # zero covariate variance: try_divide NULL


def test_srm_check_balanced_and_broken(spark):
    """The healthy md5 split is not flagged; simulated differential
    loss (dropping most of arm 0) trips the |z| > 3 bar; units count
    distinct, not rows."""
    import hashlib

    from hypermap_etl_spark.operators.profile import srm_check

    def arm_of(uid):
        return int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:8], 16) % 2

    # duplicated rows per user: SRM must count units once
    rows = [(uid,) for uid in range(2000) for _ in range(3)]
    df = spark.createDataFrame(rows, "user_id long")
    r = srm_check(df, "user_id").collect()[0]
    assert r["n_units"] == 2000 and r["n_a"] + r["n_b"] == 2000
    assert r["srm_suspected"] is False

    # drop 60% of arm-0 users: assignment loss -> SRM fires
    kept = [(uid,) for uid in range(2000)
            if arm_of(uid) == 1 or uid % 5 < 2]
    broken = spark.createDataFrame(kept, "user_id long")
    b = srm_check(broken, "user_id").collect()[0]
    assert b["srm_suspected"] is True and abs(b["z_stat"]) > 3


def test_km_survival_textbook_example(spark):
    """The classic small KM table: durations 1,2+,3,4+,5 with
    censoring — survival matches the hand product; censored subjects
    stay at risk through their time; an exhausted risk set drops the
    curve to exactly 0."""
    from hypermap_etl_spark.operators.profile import km_survival

    rows = [(1, 1), (2, 0), (3, 1), (4, 0), (5, 1)]
    df = spark.createDataFrame(rows, "duration long, event int")
    out = {r["t"]: r for r in km_survival(df, "duration", "event").collect()}
    import math

    # t=1: n=5, d=1 -> S = 4/5
    # t=3: n=3 (2 censored at 2 leaves 3), d=1 -> S = 4/5 * 2/3
    # t=5: n=1, d=1 -> S -> 0 exactly (d == n ends the curve)
    assert out[1]["n_at_risk"] == 5 and out[1]["n_events"] == 1
    s1 = math.exp(round(math.log(1 - 1 / 5), 9))
    assert out[1]["survival"] == round(s1, 6)
    s3 = math.exp(round(math.log(1 - 1 / 5), 9) + round(math.log(1 - 1 / 3), 9))
    assert out[3]["n_at_risk"] == 3
    assert out[3]["survival"] == round(s3, 6)
    assert out[5]["survival"] == 0.0
    assert 2 not in out and 4 not in out  # censor-only times emit no row


def test_km_survival_censoring_vs_naive(spark):
    """Against the naive churn read: heavy censoring keeps KM high
    where percent-still-active would crater."""
    from hypermap_etl_spark.operators.profile import km_survival

    rows = [(10, 1)] + [(10, 0)] * 99  # 1 churn, 99 censored at t=10
    df = spark.createDataFrame(rows, "duration long, event int")
    r = km_survival(df, "duration", "event").collect()[0]
    assert r["n_at_risk"] == 100 and r["n_events"] == 1
    assert r["survival"] > 0.98  # KM: 99/100, not 1/100


def test_logrank_detects_separated_survival(spark):
    """Arm 1 churning systematically earlier trips the test; identical
    arms stay quiet; hand check of O/E on a tiny table."""
    from hypermap_etl_spark.operators.profile import logrank_test

    rows = []
    for i in range(120):
        rows.append((float(5 + (i % 4)), 1, 0))    # arm0 churns at 5-8
        rows.append((float(1 + (i % 4)), 1, 1))    # arm1 churns at 1-4
    df = spark.createDataFrame(rows, "duration double, event int, g int")
    r = logrank_test(df, "duration", "event", "g").collect()[0]
    assert r["significant"] is True and r["z_stat"] > 5
    assert r["n_group_0"] == r["n_group_1"] == 120

    same = spark.createDataFrame(
        [(float((i // 2) % 6), 1, i % 2) for i in range(200)],
        "duration double, event int, g int",
    )
    s = logrank_test(same, "duration", "event", "g").collect()[0]
    assert s["significant"] is False

    # tiny hand case: t=1 d=1 (arm1), t=2 d=1 (arm0); E1 = 1*(1/2)+0? ->
    # at t=1: nt=2, nt1=1, d=1 -> e 0.5, v 0.25; at t=2: nt=1, nt1=0 ->
    # e 0, v 0 (nt=1 branch)
    tiny = spark.createDataFrame(
        [(1.0, 1, 1), (2.0, 1, 0)], "duration double, event int, g int"
    )
    t = logrank_test(tiny, "duration", "event", "g").collect()[0]
    assert t["observed_1"] == 1 and t["expected_1"] == 0.5
    assert t["z_stat"] == round(0.5 / 0.25 ** 0.5, 6)


def test_profile_table_hostile_column_names(spark):
    """Columns with spaces and quotes profile instead of raising out
    of generated SQL text (the arbitrary-drop promise)."""
    from hypermap_etl_spark.operators.profile import profile_table

    df = spark.createDataFrame([(1, "x"), (2, None)], ["user id", "it's"])
    rows = {r["col_name"]: r for r in profile_table(df).collect()}
    assert rows["user id"]["n_distinct"] == 2
    assert rows["it's"]["n_nulls"] == 1


def test_table_diff_fingerprint_injection_safe(spark):
    """Separator-smuggling values and NULL-sentinel lookalikes must
    read as CHANGED, not unchanged (the concat-collision hole)."""
    from hypermap_etl_spark.operators.profile import table_diff

    old = spark.createDataFrame(
        [(1, "a\x1f", "b"), (2, None, "y")], "k long, c1 string, c2 string"
    )
    new = spark.createDataFrame(
        [(1, "a", "\x1fb"), (2, "\x00NULL", "y")],
        "k long, c1 string, c2 string",
    )
    out = {r["k"]: r["status"] for r in table_diff(old, new, ["k"]).collect()}
    assert out[1] == "changed"   # shifted separator must not collide
    assert out[2] == "changed"   # a real '\\x00NULL' value is not NULL


def test_seasonal_naive_index_path_survives_gaps(spark):
    """With a missing period, the row-lag default would misalign
    seasons; the calendar-index path keeps forecast(period) =
    count(period - season) exactly."""
    from hypermap_etl_spark.operators.profile import seasonal_naive_backtest

    # season=3; periods p0..p7 except p4 missing; count(pi) = i+1
    rows = []
    for i in [0, 1, 2, 3, 5, 6, 7]:
        rows += [(f"p{i}", i)] * (i + 1)
    df = spark.createDataFrame(rows, "period string, idx long")
    out = {r["period"]: r for r in seasonal_naive_backtest(
        df, "period", season=3, period_index_col="idx").collect()}
    # p5 forecasts from p2 (idx 5-3=2 -> count 3); p6 from p3; p7 from
    # p4 which is MISSING -> forecast NULL (not p3's count, the row-lag
    # misalignment)
    assert out["p5"]["forecast"] == 3
    assert out["p6"]["forecast"] == 4
    assert out["p7"]["forecast"] is None
    assert out["p0"]["forecast"] is None
    # the row-lag default on the same gapped series DOES misalign:
    naive = {r["period"]: r for r in seasonal_naive_backtest(
        df, "period", season=3).collect()}
    assert naive["p7"]["forecast"] == 4  # p3's count — the trap


def test_poststrat_removes_stratum_imbalance(spark):
    """A metric that differs only BY STRATUM: when arms land unevenly
    across strata the raw effect is biased, the stratified one is ~0;
    a genuine within-stratum lift is recovered; single-arm strata are
    excluded and counted."""
    import hashlib

    from hypermap_etl_spark.operators.profile import poststrat_ab

    def arm_of(uid):
        return int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:8], 16) % 2

    def noise(uid):
        # independent hash so the within-stratum noise cannot
        # correlate with the arm assignment
        return (int(hashlib.md5(f"n:{uid}".encode()).hexdigest()[:8], 16)
                % 5) * 0.5

    rows = []
    uid = 0
    # stratum "hi": value 100; stratum "lo": value 10. Arm 1 users are
    # deliberately over-represented in "hi" (imbalance), but within
    # each stratum the arms share the same distribution.
    while uid < 2000:
        a = arm_of(uid)
        s = "hi" if (uid % 10 < (7 if a == 1 else 3)) else "lo"
        base = 100.0 if s == "hi" else 10.0
        rows.append((uid, s, base + noise(uid)))
        uid += 1
    # one single-arm stratum
    rows.append((999983, "orphan", 50.0))
    df = spark.createDataFrame(rows, "user_id long, s string, value double")
    r = poststrat_ab(df, "value", "user_id", "s").collect()[0]
    assert abs(r["effect_raw"]) > 5          # imbalance fakes an effect
    assert abs(r["effect_strat"]) < 0.2      # stratification removes it
    # no significance assertion on the A/A: with sd ~0.7 the test is
    # powerful enough that the deterministic fixture's residual
    # +-0.08 sits near the 5% boundary — the POINT is the ~500x bias
    # reduction above, not this coin flip
    assert r["n_strata_total"] == 3 and r["n_strata_used"] == 2

    # genuine lift: +2 for arm 1 in every stratum
    lifted = spark.createDataFrame(
        [(u, s, v + (2.0 if arm_of(u) == 1 else 0.0)) for u, s, v in rows],
        "user_id long, s string, value double",
    )
    l = poststrat_ab(lifted, "value", "user_id", "s").collect()[0]
    assert abs(l["effect_strat"] - 2.0) < 0.3 and l["significant"] is True


def test_permutation_test_detects_planted_effect(spark):
    import hashlib

    from hypermap_etl_spark.operators.profile import permutation_test

    def arm(uid):
        return int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:8], 16) % 2

    # a huge planted effect on the REAL split: no re-randomization can
    # reproduce it, so the p-value must be the add-one floor 1/(R+1)
    rows = [
        ("g", uid, 100.0 if arm(uid) == 0 else 1.0) for uid in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, user_id long, value double")
    out = permutation_test(
        df, "value", "user_id", ["g"], n_permutations=49
    ).collect()[0]
    assert out["n_a"] + out["n_b"] == 300
    assert out["n_perms"] == 49 and out["cnt_ge"] == 0
    assert out["p_value"] == pytest.approx(1 / 50, abs=1e-6)
    assert abs(out["diff_obs"]) == pytest.approx(99.0, abs=1e-6)

    # A/A null: values independent of the arm -> p well above 0.05
    null_rows = [("g", uid, float(uid % 13)) for uid in range(600)]
    nd = spark.createDataFrame(
        null_rows, "g string, user_id long, value double"
    )
    nout = permutation_test(
        nd, "value", "user_id", ["g"], n_permutations=49
    ).collect()[0]
    assert nout["p_value"] > 0.05

    # single-unit group: observed split degenerate -> no row
    tiny = spark.createDataFrame(
        [("g", 1, 1.0)], "g string, user_id long, value double"
    )
    assert (
        permutation_test(tiny, "value", "user_id", ["g"], 9).count() == 0
    )

    import pytest as _pt

    with _pt.raises(ValueError):
        permutation_test(df, "value", "user_id", ["g"], n_permutations=0)


def test_bh_fdr_known_reject_set(spark):
    from hypermap_etl_spark.operators.profile import bh_fdr

    # hand-built permutation counts, R=99 everywhere: p-values are
    # (cnt+1)/100. m=5, q=0.1 -> cutoffs 0.02, 0.04, 0.06, 0.08, 0.10.
    # p = [0.01, 0.03, 0.05, 0.20, 0.90]: ranks 1-3 pass their
    # cutoffs (0.01<=0.02, 0.03<=0.04, 0.05<=0.06), rank 4 fails
    # (0.20>0.08), so k=3 and ranks 1..3 reject.
    rows = [
        ("a", 0, 99),
        ("b", 2, 99),
        ("c", 4, 99),
        ("d", 19, 99),
        ("e", 89, 99),
    ]
    df = spark.createDataFrame(rows, "key string, cnt_ge long, n_perms long")
    out = bh_fdr(
        df, ["key"], count_col="cnt_ge", trials_col="n_perms"
    ).collect()
    got = {r["key"]: (r["rank"], r["reject"]) for r in out}
    assert got == {
        "a": (1, True),
        "b": (2, True),
        "c": (3, True),
        "d": (4, False),
        "e": (5, False),
    }
    # cutoffs follow rank*q/m
    cut = {r["key"]: r["bh_cutoff"] for r in out}
    assert cut["a"] == pytest.approx(0.02)
    assert cut["e"] == pytest.approx(0.10)

    # step-up property: a non-monotone passer rescues everything
    # above it. p = [0.09, 0.09, 0.059]: rank-3 cutoff 0.06 passes,
    # ranks 1-2 (cutoffs 0.02/0.04) fail alone but reject anyway.
    rows2 = [("x", 8, 99), ("y", 8, 99), ("z", 5, 99)]
    df2 = spark.createDataFrame(
        rows2, "key string, cnt_ge long, n_perms long"
    )
    out2 = bh_fdr(df2, ["key"]).collect()
    assert all(r["reject"] for r in out2)

    # nothing passes -> empty reject set, never NULL
    rows3 = [("x", 50, 99), ("y", 80, 99)]
    df3 = spark.createDataFrame(
        rows3, "key string, cnt_ge long, n_perms long"
    )
    assert [r["reject"] for r in bh_fdr(df3, ["key"]).collect()] == [
        False,
        False,
    ]

    import pytest as _pt

    with _pt.raises(ValueError):
        bh_fdr(df3, ["key"], q_num=0)


def test_ratio_metric_ab_detects_clustered_ratio_effect(spark):
    import hashlib

    from hypermap_etl_spark.operators.profile import ratio_metric_ab

    def arm(uid):
        return int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:8], 16) % 2

    # per-user value-per-row is 10 in arm A, 12 in arm B, with varying
    # rows per user — the ratio estimator must recover ~10 vs ~12
    rows = []
    for uid in range(400):
        per_row = 10.0 if arm(uid) == 0 else 12.0
        for i in range(1 + uid % 5):
            rows.append(("g", uid, per_row + 0.1 * (i % 3)))
    df = spark.createDataFrame(rows, "g string, user_id long, value double")
    out = ratio_metric_ab(df, "value", "user_id", ["g"]).collect()[0]
    assert abs(out["ratio_a"] - 10.1) < 0.1
    assert abs(out["ratio_b"] - 12.1) < 0.1
    assert out["significant"] and out["z_stat"] < -100

    # A/A: same generator in both arms -> not significant
    null_rows = []
    for uid in range(800):
        for i in range(1 + uid % 3):
            null_rows.append(("g", uid, float(uid % 7) + i))
    nd = spark.createDataFrame(
        null_rows, "g string, user_id long, value double"
    )
    nout = ratio_metric_ab(nd, "value", "user_id", ["g"]).collect()[0]
    assert not nout["significant"]

    # an arm with <=1 unit emits no row
    tiny = spark.createDataFrame(
        [("g", 1, 1.0), ("g", 3, 2.0)],
        "g string, user_id long, value double",
    )
    assert ratio_metric_ab(tiny, "value", "user_id", ["g"]).count() <= 1


def test_power_mde_shrinks_with_sample_size(spark):
    from hypermap_etl_spark.operators.profile import power_mde

    small = spark.createDataFrame(
        [("g", uid, float(uid % 20)) for uid in range(200)],
        "g string, user_id long, value double",
    )
    big = spark.createDataFrame(
        [("g", uid, float(uid % 20)) for uid in range(3200)],
        "g string, user_id long, value double",
    )
    s = power_mde(small, "value", "user_id", ["g"]).collect()[0]
    b = power_mde(big, "value", "user_id", ["g"]).collect()[0]
    assert s["mde_abs"] > 0 and b["mde_abs"] > 0
    # 16x the sample -> ~4x smaller MDE
    assert b["mde_abs"] < s["mde_abs"] / 2.5
    assert s["mde_rel"] == pytest.approx(
        s["mde_abs"] / s["mean_all"], rel=1e-4
    )


def test_holt_linear_forecast_recursion(spark):
    from hypermap_etl_spark.operators.profile import holt_linear_forecast

    # exactly linear counts: 3,5,7,9,... per month -> Holt locks on,
    # every one-step forecast is exact (mae 0), next forecast
    # continues the line
    rows = []
    for i, mo in enumerate(
        [f"2024-{m:02d}" for m in range(1, 9)]
    ):
        for _ in range(3 + 2 * i):
            rows.append(("g", mo))
    df = spark.createDataFrame(rows, "g string, month string")
    out = holt_linear_forecast(df, "month", ["g"]).collect()[0]
    assert out["n_periods"] == 8
    assert out["mae"] == 0.0
    assert out["level"] == 17.0 and out["trend"] == 2.0
    assert out["forecast_next"] == 19.0

    # reference recursion for a bumpy series
    ys = [10, 14, 9, 20, 13, 30]
    rows2 = [
        ("g", f"2024-{m + 1:02d}") for m, y in enumerate(ys) for _ in range(y)
    ]
    df2 = spark.createDataFrame(rows2, "g string, month string")
    got = holt_linear_forecast(df2, "month", ["g"]).collect()[0]
    lev, tr = float(ys[1]), float(ys[1] - ys[0])
    es, k = 0.0, 0
    for t in range(2, len(ys)):
        pred = lev + tr
        es += abs(ys[t] - pred)
        k += 1
        ln = 0.5 * ys[t] + 0.5 * pred
        tr = 0.5 * (ln - lev) + 0.5 * tr
        lev = ln
    # compare against the UNROUNDED recursion (Spark rounds half-up,
    # Python round() is banker's — at an exact .5 tie they differ)
    assert got["level"] == pytest.approx(lev, abs=1e-6)
    assert got["trend"] == pytest.approx(tr, abs=1e-6)
    assert got["mae"] == pytest.approx(es / k, abs=1e-6)

    # 2 periods: recursion initializes but no backtest -> mae null;
    # 1 period: dropped
    two = spark.createDataFrame(
        [("a", "2024-01"), ("a", "2024-02"), ("b", "2024-01")],
        "g string, month string",
    )
    o2 = {r["g"]: r for r in holt_linear_forecast(two, "month", ["g"]).collect()}
    assert "b" not in o2
    assert o2["a"]["mae"] is None and o2["a"]["n_periods"] == 2

    import pytest as _pt

    with _pt.raises(ValueError):
        holt_linear_forecast(df, "month", [])
    with _pt.raises(ValueError):
        holt_linear_forecast(df, "month", ["g"], alpha=0.0)


def test_wilson_ci_known_values_and_edges(spark):
    from hypermap_etl_spark.operators.profile import wilson_ci

    df = spark.createDataFrame(
        [("a", 8, 10), ("b", 0, 10), ("c", 10, 10), ("z", 0, 0)],
        "step string, k long, n long",
    )
    out = {r["step"]: r for r in wilson_ci(df, "k", "n").collect()}
    # textbook value: k=8, n=10 -> Wilson 95% ~ (0.4902, 0.9433)
    assert out["a"]["p_hat"] == pytest.approx(0.8)
    assert out["a"]["ci_lo"] == pytest.approx(0.4902, abs=2e-3)
    assert out["a"]["ci_hi"] == pytest.approx(0.9433, abs=2e-3)
    # k=0: lower bound exactly 0 (clamped), upper strictly positive
    assert out["b"]["ci_lo"] == 0.0 and 0 < out["b"]["ci_hi"] < 0.35
    # k=n: upper exactly 1, lower strictly below 1
    assert out["c"]["ci_hi"] == 1.0 and 0.65 < out["c"]["ci_lo"] < 1
    # CIs always inside [0,1] and contain p_hat
    for s in ("a", "b", "c"):
        r = out[s]
        assert 0.0 <= r["ci_lo"] <= r["p_hat"] <= r["ci_hi"] <= 1.0
    # n=0: undefined -> NULLs, row preserved
    assert out["z"]["p_hat"] is None and out["z"]["ci_lo"] is None


def test_eb_shrink_means_regimes(spark):
    from hypermap_etl_spark.operators.profile import eb_shrink_means

    # strong between-unit signal, tiny within noise -> tau2 dominates,
    # shrink factors near 1 (trust the raw means)
    rows = []
    for u in range(20):
        for i in range(10):
            rows.append(("g", u, float(u * 10) + 0.01 * (i % 2)))
    df = spark.createDataFrame(rows, "g string, user_id long, value double")
    out = eb_shrink_means(df, "value", "user_id", ["g"]).collect()[0]
    assert out["n_units"] == 20 and out["n_rows"] == 200
    assert out["tau2"] > 100 * out["s2_within"]
    assert out["avg_shrink"] > 0.99

    # pure noise: every unit samples the SAME distribution -> tau2
    # collapses toward 0, shrink factors near 0 (pool hard)
    noise = []
    for u in range(40):
        for i in range(6):
            noise.append(("g", u, float((u * 7 + i * 13) % 10)))
    nd = spark.createDataFrame(
        noise, "g string, user_id long, value double"
    )
    nout = eb_shrink_means(nd, "value", "user_id", ["g"]).collect()[0]
    assert nout["avg_shrink"] < 0.5
    assert nout["tau2"] < nout["s2_within"]

    # constant data: both variances 0 -> shrink defined as 1
    const = spark.createDataFrame(
        [("g", u, 5.0) for u in range(6) for _ in range(3)],
        "g string, user_id long, value double",
    )
    cout = eb_shrink_means(const, "value", "user_id", ["g"]).collect()[0]
    assert cout["tau2"] == 0.0 and cout["s2_within"] == 0.0
    assert cout["avg_shrink"] == 1.0

    # a single-unit group is dropped (no between-variance)
    single = spark.createDataFrame(
        [("g", 1, 2.0), ("g", 1, 3.0)],
        "g string, user_id long, value double",
    )
    assert eb_shrink_means(single, "value", "user_id", ["g"]).count() == 0


def test_weighted_ess_kish(spark):
    from hypermap_etl_spark.operators.profile import weighted_ess

    # equal weights: ESS = n exactly, design effect 1
    eq = spark.createDataFrame(
        [("g", 2.0)] * 50, "g string, w double"
    )
    out = weighted_ess(eq, "w", ["g"]).collect()[0]
    assert out["n"] == 50 and out["ess"] == 50.0
    assert out["design_effect"] == 1.0

    # one whale among ones: ESS collapses toward 1
    whale = spark.createDataFrame(
        [("g", 1.0)] * 9 + [("g", 1000.0)], "g string, w double"
    )
    w = weighted_ess(whale, "w", ["g"]).collect()[0]
    assert w["n"] == 10 and w["ess"] < 1.1
    assert w["design_effect"] > 9

    # zero/negative/null weights excluded
    mixed = spark.createDataFrame(
        [("g", 1.0), ("g", 0.0), ("g", -2.0), ("g", None)],
        "g string, w double",
    )
    m = weighted_ess(mixed, "w", ["g"]).collect()[0]
    assert m["n"] == 1


def test_sequential_welch_looks_and_boundaries(spark):
    import datetime
    import hashlib

    from hypermap_etl_spark.operators.profile import sequential_welch

    def arm(uid):
        return int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:8], 16) % 2

    # a huge planted effect across a 10-day window: every look sees
    # it, so the FIRST look already crosses even the 4.877 boundary
    rows = []
    for d in range(10):
        for uid in range(200):
            rows.append(
                (
                    "g",
                    uid,
                    datetime.datetime(2024, 3, 1 + d),
                    100.0 if arm(uid) == 0 else 1.0 + (uid % 3) * 0.1,
                )
            )
    df = spark.createDataFrame(
        rows, "g string, user_id long, ts timestamp, value double"
    )
    out = sequential_welch(df, "value", "user_id", "ts", ["g"]).collect()
    assert [r["look"] for r in out] == list(range(5))
    # OBF boundaries escalate early, relax late
    bs = [r["boundary"] for r in out]
    assert bs == sorted(bs, reverse=True) and bs[0] == 4.877
    assert all(r["crossed"] for r in out)
    # cumulative looks: n grows monotonically
    ns = [r["n_a"] + r["n_b"] for r in out]
    assert ns == sorted(ns) and ns[-1] == 2000

    # A/A: no look crosses its boundary
    null_rows = []
    for d in range(10):
        for uid in range(200):
            null_rows.append(
                (
                    "g",
                    uid,
                    datetime.datetime(2024, 3, 1 + d),
                    float((uid * 7 + d) % 11),
                )
            )
    nd = spark.createDataFrame(
        null_rows, "g string, user_id long, ts timestamp, value double"
    )
    nout = sequential_welch(nd, "value", "user_id", "ts", ["g"]).collect()
    assert not any(r["crossed"] for r in nout)

    import pytest as _pt

    with _pt.raises(ValueError):
        sequential_welch(df, "value", "user_id", "ts", ["g"], boundaries=[])


def test_layer_orthogonality_detects_correlated_salts(spark):
    from hypermap_etl_spark.operators.profile import layer_orthogonality

    df = spark.createDataFrame(
        [(uid,) for uid in range(4000)], "user_id long"
    )
    # independent salts: flat table, chi2 small
    out = layer_orthogonality(df, "user_id").collect()[0]
    assert out["n_units"] == 4000
    assert out["n00"] + out["n01"] + out["n10"] + out["n11"] == 4000
    assert out["orthogonal"] and out["chi2"] < 3.841

    # the SAME salt twice: perfectly correlated -> off-diagonals empty,
    # chi2 = N, verdict red
    bad = layer_orthogonality(df, "user_id", salt_a="ab", salt_b="ab")
    b = bad.collect()[0]
    assert b["n01"] == 0 and b["n10"] == 0
    assert b["chi2"] == 4000.0 and not b["orthogonal"]

    # duplicate rows collapse to distinct units
    dup = spark.createDataFrame(
        [(uid % 10,) for uid in range(100)], "user_id long"
    )
    assert layer_orthogonality(dup, "user_id").collect()[0]["n_units"] == 10


def test_srm_segments_catches_differential_loss(spark):
    import hashlib

    from hypermap_etl_spark.operators.profile import srm_check

    def arm(uid):
        return int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:8], 16) % 2

    # segment "web" logs both arms; segment "ios" silently dropped
    # arm-1 logs -> global check may pass, the ios segment must flag
    rows = []
    for uid in range(2000):
        rows.append(("web", uid))
        if arm(uid) == 0:
            rows.append(("ios", uid))
    df = spark.createDataFrame(rows, "seg string, user_id long")
    out = {
        r["seg"]: r
        for r in srm_check(df, "user_id", group_cols=["seg"]).collect()
    }
    assert not out["web"]["srm_suspected"]
    assert out["ios"]["srm_suspected"] and out["ios"]["n_b"] == 0
    # grouped output preserves the global contract per segment
    assert out["web"]["n_a"] + out["web"]["n_b"] == 2000
    # and the ungrouped call still returns the single global row
    g = srm_check(df, "user_id").collect()
    assert len(g) == 1 and g[0]["n_units"] == 2000


def test_powerlaw_alpha_recovers_planted_exponent(spark):
    import math

    from hypermap_etl_spark.operators.profile import powerlaw_alpha

    # plant counts ~ inverse-CDF of a pure power law alpha=2.5:
    # x_u = ceil(u^(-1/(a-1))) over a uniform grid -> MLE near 2.5
    rows = []
    uid = 0
    a = 2.5
    for i in range(1, 2001):
        u = i / 2001.0
        x = max(1, int(round(u ** (-1.0 / (a - 1.0)))))
        for _ in range(min(x, 500)):
            rows.append(("g", uid))
        uid += 1
    df = spark.createDataFrame(rows, "g string, user_id long")
    out = powerlaw_alpha(df, "user_id", ["g"]).collect()[0]
    assert out["n_units"] == 2000
    assert abs(out["alpha"] - a) < 0.25

    # all-ones degenerate: sum ln = 0 -> alpha NULL, never a crash
    ones = spark.createDataFrame(
        [("g", i) for i in range(50)], "g string, user_id long"
    )
    o = powerlaw_alpha(ones, "user_id", ["g"]).collect()[0]
    assert o["alpha"] is None and o["tail_mean"] == 1.0

    import pytest as _pt

    with _pt.raises(ValueError):
        powerlaw_alpha(df, "user_id", ["g"], x_min=0)


def test_uplift_deciles_concentrates_planted_effect(spark):
    import hashlib

    from hypermap_etl_spark.operators.profile import uplift_deciles

    def arm(uid):
        return int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:8], 16) % 2

    # score = uid; treatment effect ONLY for the top-score half:
    # top bands show uplift ~10, bottom bands ~0
    rows = []
    for uid in range(1000):
        base = 50.0
        lift = 10.0 if (arm(uid) == 1 and uid >= 500) else 0.0
        rows.append((uid, base + lift, float(uid)))
    df = spark.createDataFrame(rows, "user_id long, value double, score double")
    out = uplift_deciles(df, "value", "user_id", "score").collect()
    assert len(out) == 10
    # high-score users land in LOW band ids (rank is score desc)
    top = [r for r in out if r["band"] <= 4]
    bot = [r for r in out if r["band"] >= 5]
    assert all(abs(r["uplift"] - 10.0) < 1e-6 for r in top)
    assert all(abs(r["uplift"]) < 1e-6 for r in bot)
    # band populations cover every unit exactly once
    assert sum(r["n_t"] + r["n_c"] for r in out) == 1000

    import pytest as _pt

    with _pt.raises(ValueError):
        uplift_deciles(df, "value", "user_id", "score", n_bands=1)


def test_new_stats_structural_properties(spark):
    """Cross-operator invariants for the wave: BH rejections are
    monotone in q; Wilson intervals widen as n shrinks at fixed p-hat;
    Holt is shift-equivariant (level shifts with the data, trend and
    backtest error do not)."""
    from hypermap_etl_spark.operators.profile import (
        bh_fdr,
        holt_linear_forecast,
        wilson_ci,
    )

    # BH monotone in q: everything rejected at q=0.05 stays rejected
    # at q=0.2
    rows = [(f"h{i}", i * 3, 99) for i in range(8)]
    df = spark.createDataFrame(rows, "key string, cnt_ge long, n_perms long")
    r_strict = {
        r["key"] for r in bh_fdr(df, ["key"], q_num=1, q_den=20).collect()
        if r["reject"]
    }
    r_loose = {
        r["key"] for r in bh_fdr(df, ["key"], q_num=1, q_den=5).collect()
        if r["reject"]
    }
    assert r_strict <= r_loose

    # Wilson: same p-hat, smaller n -> wider interval
    wdf = spark.createDataFrame(
        [("big", 80, 100), ("small", 8, 10)], "k string, s long, n long"
    )
    w = {r["k"]: r for r in wilson_ci(wdf, "s", "n").collect()}
    assert (w["small"]["ci_hi"] - w["small"]["ci_lo"]) > (
        w["big"]["ci_hi"] - w["big"]["ci_lo"]
    )

    # Holt shift-equivariance: y + 7 per period -> level +7, trend and
    # mae unchanged
    ys = [10, 14, 9, 20, 13, 30]
    rows1 = [("g", f"2024-{m + 1:02d}") for m, y in enumerate(ys)
             for _ in range(y)]
    rows2 = [("g", f"2024-{m + 1:02d}") for m, y in enumerate(ys)
             for _ in range(y + 7)]
    h1 = holt_linear_forecast(
        spark.createDataFrame(rows1, "g string, month string"), "month", ["g"]
    ).collect()[0]
    h2 = holt_linear_forecast(
        spark.createDataFrame(rows2, "g string, month string"), "month", ["g"]
    ).collect()[0]
    assert h2["level"] == pytest.approx(h1["level"] + 7, abs=1e-6)
    assert h2["trend"] == pytest.approx(h1["trend"], abs=1e-6)
    assert h2["mae"] == pytest.approx(h1["mae"], abs=1e-6)
