"""Trained quality classifier: planted-separability recovery (the
documented no-oracle policy for iterative fits), scoring-path
equivalence to a numpy reference, and train→serve roundtrip."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from hypermap_etl_spark.operators.quality_model import (
    score_linear,
    train_quality_classifier,
)


def _planted_docs(n=200):
    """Separable corpus: 'good' docs share clean-prose tokens, 'bad'
    docs share spam tokens; labels follow the plant exactly."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            text = f"the quick study of prose number {i} reads clearly and well"
            label = 1
        else:
            text = f"buy cheap pills now {i} click winner jackpot spam spam"
            label = 0
        rows.append((i, text, label))
    return rows


def test_train_recovers_planted_separation(spark):
    docs = spark.createDataFrame(
        _planted_docs(), "doc_id long, text string, label long"
    )
    model = train_quality_classifier(docs, dim=64, max_iter=50)
    assert model["dim"] == 64 and len(model["weights"]) == 64
    assert all(math.isfinite(w) for w in model["weights"])
    scored = score_linear(docs, model["weights"], model["bias"])
    joined = scored.join(docs.select("doc_id", "label"), "doc_id")
    acc = (
        joined.filter(
            ((F.col("score") >= 0.5) & (F.col("label") == 1))
            | ((F.col("score") < 0.5) & (F.col("label") == 0))
        ).count()
        / 200
    )
    assert acc >= 0.95  # separable plant: the LBFGS fit must nail it


def test_score_linear_matches_numpy_reference(spark):
    import numpy as np

    docs = spark.createDataFrame(
        [(1, "alpha beta beta gamma"), (2, "delta"), (3, "")],
        "doc_id long, text string",
    )
    dim = 8
    weights = [((i * 37) % 11 - 5) / 7.0 for i in range(dim)]
    bias = 0.125
    got = {
        r["doc_id"]: r["score"]
        for r in score_linear(docs, weights, bias).collect()
    }
    # independent reference: md5 hashing trick + L2 norm + sigmoid
    for doc_id, text in [(1, "alpha beta beta gamma"), (2, "delta"), (3, "")]:
        v = np.zeros(dim)
        for t in [w for w in text.lower().split(" ") if w]:
            h = hashlib.md5(t.encode()).hexdigest()
            b = int(h[:8], 16) % dim
            v[b] += 1.0 if int(h[8], 16) % 2 == 0 else -1.0
        n = np.linalg.norm(v)
        x = v / n if n > 0 else v
        want = 1.0 / (1.0 + math.exp(-(float(np.dot(x, weights)) + bias)))
        assert got[doc_id] == pytest.approx(want, abs=1e-12)


def test_score_linear_custom_id_col_and_validation(spark):
    docs = spark.createDataFrame([(7, "x y z")], "rid long, text string")
    out = score_linear(docs, [0.5, -0.5], id_col="rid")
    row = out.collect()[0]
    assert row["rid"] == 7 and 0.0 < row["score"] < 1.0
    with pytest.raises(ValueError):
        score_linear(docs, [])


def test_train_partition_tolerant_accuracy(spark):
    # LBFGS partial-gradient sums reorder across layouts; the fitted
    # decision FUNCTION on a separable plant must not care
    docs = spark.createDataFrame(
        _planted_docs(), "doc_id long, text string, label long"
    )
    for n in (2, 13):
        model = train_quality_classifier(
            docs.repartition(n), dim=64, max_iter=50
        )
        scored = score_linear(docs, model["weights"], model["bias"])
        joined = scored.join(docs.select("doc_id", "label"), "doc_id")
        acc = (
            joined.filter(
                ((F.col("score") >= 0.5) & (F.col("label") == 1))
                | ((F.col("score") < 0.5) & (F.col("label") == 0))
            ).count()
            / 200
        )
        assert acc >= 0.95


def test_calibration_report_hand_computed(spark):
    """Perfectly calibrated bin vs over-confident bin, exact values."""
    from hypermap_etl_spark.operators.quality_model import calibration_report

    rows = [
        # bin 8: mean score 0.85, pos rate 0.5 -> gap 0.35
        (0, 0.85, 1), (1, 0.85, 0),
        # bin 2: mean 0.25, pos rate 0.25 -> gap 0.0
        (2, 0.25, 0), (3, 0.25, 0), (4, 0.25, 1), (5, 0.25, 0),
        # score 1.0 lands in the LAST bin, not bin 10
        (6, 1.0, 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double, label int")
    out = {r["bin"]: r for r in calibration_report(df, n_bins=10).collect()}
    assert set(out) == {2, 8, 9}
    assert out[8]["n"] == 2 and out[8]["abs_gap"] == 0.35
    assert out[2]["abs_gap"] == 0.0 and out[2]["pos_rate"] == 0.25
    assert out[9]["n"] == 1 and out[9]["mean_score"] == 1.0
    # ECE terms: gap * n/total, total=7
    assert out[8]["ece_term"] == round(0.35 * 2 / 7, 6)
    ece = sum(r["ece_term"] for r in out.values())
    assert abs(ece - 0.1) < 1e-6


def test_calibration_report_rejects_bad_bins(spark):
    from hypermap_etl_spark.operators.quality_model import calibration_report

    df = spark.createDataFrame([(0, 0.5, 1)], "doc_id long, score double, label int")
    import pytest as _pt

    with _pt.raises(ValueError):
        calibration_report(df, n_bins=0)


# ------------------------------------------- kappa + Bradley-Terry ----


def test_cohens_kappa_perfect_independent_degenerate(spark):
    from hypermap_etl_spark.operators.quality_model import cohens_kappa

    # perfect agreement -> kappa 1
    perf = spark.createDataFrame(
        [(True, True)] * 6 + [(False, False)] * 4, "a boolean, b boolean"
    )
    r = cohens_kappa(perf, "a", "b").collect()[0]
    assert r["kappa"] == 1.0 and r["p_obs"] == 1.0 and r["n"] == 10

    # independent labels at 50/50 -> kappa ~ 0
    rows = []
    for i in range(200):
        rows.append((i % 2 == 0, (i // 2) % 2 == 0))
    ind = spark.createDataFrame(rows, "a boolean, b boolean")
    r = cohens_kappa(ind, "a", "b").collect()[0]
    assert abs(r["kappa"]) < 0.05

    # single-label degenerate: p_e = 1 -> NULL kappa, not a crash
    dg = spark.createDataFrame([(True, True)] * 5, "a boolean, b boolean")
    r = cohens_kappa(dg, "a", "b").collect()[0]
    assert r["kappa"] is None

    # nulls excluded
    nn = spark.createDataFrame(
        [(True, True), (None, True), (False, None)], "a boolean, b boolean"
    )
    assert cohens_kappa(nn, "a", "b").collect()[0]["n"] == 1


def test_bradley_terry_recovers_planted_order(spark):
    from hypermap_etl_spark.operators.quality_model import bradley_terry

    # A beats B 9/1, B beats C 9/1, A beats C 9/1 -> strengths A>B>C
    rows = (
        [("A", "B")] * 9 + [("B", "A")] * 1
        + [("B", "C")] * 9 + [("C", "B")] * 1
        + [("A", "C")] * 9 + [("C", "A")] * 1
    )
    df = spark.createDataFrame(rows, "winner string, loser string")
    got = {r["item"]: r for r in bradley_terry(df).collect()}
    assert got["A"]["strength"] > got["B"]["strength"] > got["C"]["strength"]
    assert abs(sum(r["strength"] for r in got.values()) - 1.0) < 1e-5
    assert got["A"]["n_wins"] == 18 and got["A"]["n_games"] == 20

    # two-item closed form: pi_a/pi_b = w_ab/w_ba
    two = spark.createDataFrame(
        [("X", "Y")] * 3 + [("Y", "X")] * 1, "winner string, loser string"
    )
    g2 = {r["item"]: r["strength"] for r in bradley_terry(two).collect()}
    assert abs(g2["X"] - 0.75) < 1e-6 and abs(g2["Y"] - 0.25) < 1e-6

    # row-order / partition invariance
    df2 = spark.createDataFrame(list(reversed(rows)), "winner string, loser string").repartition(5)
    got2 = {r["item"]: r["strength"] for r in bradley_terry(df2).collect()}
    assert got2 == {k: v["strength"] for k, v in got.items()}

    # empty input -> empty typed frame
    empty = spark.createDataFrame([], "winner string, loser string")
    assert bradley_terry(empty).count() == 0


def test_conformal_threshold_exact_order_statistic(spark):
    """k = ceil((1-a)(n+1)) and q_hat = the k-th smallest score,
    duplicates counted; too-small groups yield NULL q_hat."""
    from hypermap_etl_spark.operators.quality_model import conformal_threshold

    # n=9, alpha=0.1 -> k = ceil(0.9*10) = 9 -> 9th smallest of 1..9 = 9
    rows = [("g", float(i)) for i in range(1, 10)]
    # n=3, alpha=0.1 -> k = ceil(0.9*4) = 4 > n -> NULL
    rows += [("tiny", 1.0), ("tiny", 2.0), ("tiny", 3.0)]
    # duplicates: n=10 of value 5 except two 7s -> k=ceil(0.9*11)=10
    rows += [("dup", 5.0)] * 8 + [("dup", 7.0)] * 2
    df = spark.createDataFrame(rows, "g string, s double").repartition(4)
    got = {r["g"]: r for r in conformal_threshold(df, "s", ["g"]).collect()}
    assert got["g"]["k"] == 9 and got["g"]["q_hat"] == 9.0
    assert got["tiny"]["k"] == 4 and got["tiny"]["q_hat"] is None
    assert got["dup"]["k"] == 10 and got["dup"]["q_hat"] == 7.0

    import pytest as _pt

    with _pt.raises(ValueError):
        conformal_threshold(df, "s", ["g"], alpha=0.0)


def test_isotonic_calibrate_pools_violators(spark):
    """A dipping reliability curve gets pooled monotone; already-
    monotone bins pass through; averages are count-weighted."""
    from hypermap_etl_spark.operators.quality_model import isotonic_calibrate

    rows = []
    # bin 0: rate 0.2 (10 rows); bin 1: rate 0.8 (10); bin 2: rate 0.4 (10)
    # PAVA pools bins 1,2 -> (8+4)/20 = 0.6
    for i in range(10):
        rows.append((0.05, i < 2))
        rows.append((0.15, i < 8))
        rows.append((0.25, i < 4))
    df = spark.createDataFrame(rows, "s double, y boolean")
    out = {r["bin"]: r for r in isotonic_calibrate(df, "s", "y", n_bins=10).collect()}
    assert out[0]["calibrated"] == 0.2
    assert out[1]["calibrated"] == 0.6 and out[2]["calibrated"] == 0.6
    assert out[1]["rate"] == 0.8 and out[2]["rate"] == 0.4
    # monotone non-decreasing over bins
    cals = [out[b]["calibrated"] for b in sorted(out)]
    assert cals == sorted(cals)
    # score exactly 1.0 lands in the top bin, not out of range
    df2 = spark.createDataFrame([(1.0, True), (0.0, False)], "s double, y boolean")
    out2 = {r["bin"] for r in isotonic_calibrate(df2, "s", "y", n_bins=10).collect()}
    assert out2 == {0, 9}


def test_roc_auc_separation_ties_and_degenerate(spark):
    """Perfect separation -> 1.0; inverted scores -> 0.0; all-tied
    scores -> 0.5 (ties counted half); a known mixed sample matches
    the hand rank formula; single-class groups are dropped."""
    from hypermap_etl_spark.operators.quality_model import roc_auc

    rows = []
    for i in range(10):
        rows.append(("perfect", 0.9 if i < 5 else 0.1, 1 if i < 5 else 0))
        rows.append(("inverted", 0.1 if i < 5 else 0.9, 1 if i < 5 else 0))
        rows.append(("tied", 0.5, 1 if i < 5 else 0))
        rows.append(("onlypos", 0.5, 1))
    df = spark.createDataFrame(rows, "g string, score double, label int")
    out = {r["g"]: r for r in roc_auc(df, group_cols=["g"]).collect()}
    assert out["perfect"]["auc"] == 1.0
    assert out["inverted"]["auc"] == 0.0
    assert out["tied"]["auc"] == 0.5
    assert "onlypos" not in out  # no negatives: AUC undefined, dropped
    assert out["perfect"]["n_pos"] == 5 and out["perfect"]["n_neg"] == 5

    # hand reference with ties straddling classes:
    # scores (label): 0.2(0), 0.4(0), 0.4(1), 0.6(1)
    # avg ranks: [1, 2.5, 2.5, 4]; R+ = 2.5 + 4 = 6.5
    # AUC = (6.5 - 2*3/2) / (2*2) = 3.5/4 = 0.875
    tiny = spark.createDataFrame(
        [(0.2, 0), (0.4, 0), (0.4, 1), (0.6, 1)], "score double, label int"
    )
    r = roc_auc(tiny).collect()[0]
    assert r["auc"] == 0.875


def test_roc_auc_equals_pairwise_probability(spark):
    """AUC == P(score_pos > score_neg) + 0.5 P(=) computed by brute
    force over all pos x neg pairs on a random sample."""
    import random

    from hypermap_etl_spark.operators.quality_model import roc_auc

    rng = random.Random(11)
    rows = [
        (round(rng.random(), 1), rng.randrange(2)) for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "score double, label int")
    got = roc_auc(df).collect()[0]
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    wins = sum(
        1.0 if p > q else (0.5 if p == q else 0.0) for p in pos for q in neg
    )
    want = wins / (len(pos) * len(neg))
    assert abs(got["auc"] - round(want, 6)) < 1e-9
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)


def test_pr_sweep_counts_and_ratios(spark):
    """Hand-checkable sweep: thresholds partition the score axis, the
    at-or-above counts telescope, precision/recall/f1 match the
    formulae, empty-tail thresholds emit NULL precision, recall 0."""
    from hypermap_etl_spark.operators.quality_model import pr_threshold_sweep

    # 4 rows: scores .05(0) .15(1) .15(0) .35(1) with n_steps=4
    df = spark.createDataFrame(
        [(0.05, 0), (0.15, 1), (0.15, 0), (0.35, 1)],
        "score double, label int",
    )
    out = {r["threshold"]: r for r in pr_threshold_sweep(df, n_steps=4).collect()}
    assert set(out) == {0.0, 0.25, 0.5, 0.75}
    # tau=0: everything predicted positive
    assert out[0.0]["n_pred"] == 4 and out[0.0]["tp"] == 2
    assert out[0.0]["precision"] == 0.5 and out[0.0]["recall"] == 1.0
    # tau=0.25: only the 0.35 row
    assert out[0.25]["n_pred"] == 1 and out[0.25]["tp"] == 1
    assert out[0.25]["precision"] == 1.0 and out[0.25]["recall"] == 0.5
    assert out[0.25]["f1"] == round(2 * 1.0 * 0.5 / 1.5, 6)
    # tau=0.5 and 0.75: nothing at or above
    for t in (0.5, 0.75):
        assert out[t]["n_pred"] == 0 and out[t]["precision"] is None
        assert out[t]["recall"] == 0.0 and out[t]["f1"] is None


def test_pr_sweep_edge_scores_groups_and_no_positives(spark):
    """Score 1.0 counts toward the top threshold; grouped sweeps keep
    groups separate; a group with zero positives yields NULL recall
    everywhere (not a drop, not a crash)."""
    from hypermap_etl_spark.operators.quality_model import pr_threshold_sweep

    df = spark.createDataFrame(
        [("g1", 1.0, 1), ("g1", 0.0, 0), ("g2", 0.6, 0), ("g2", 0.2, 0)],
        "g string, score double, label int",
    )
    rows = pr_threshold_sweep(df, n_steps=10, group_cols=["g"]).collect()
    out = {(r["g"], r["threshold"]): r for r in rows}
    assert len(rows) == 20  # 2 groups x 10 thresholds
    assert out[("g1", 0.9)]["n_pred"] == 1  # score 1.0 in the last bin
    assert out[("g1", 0.9)]["precision"] == 1.0
    assert out[("g1", 0.9)]["recall"] == 1.0
    assert out[("g2", 0.0)]["recall"] is None  # no positives in g2
    assert out[("g2", 0.0)]["precision"] == 0.0


def test_fleiss_kappa_perfect_independent_and_unequal(spark):
    """Perfect three-rater agreement -> kappa 1; an independent
    panel hovers near 0; unequal rater counts surface as NULL kappa
    with min/max shown; a hand example matches the textbook value."""
    from hypermap_etl_spark.operators.quality_model import fleiss_kappa

    rows = []
    for i in range(30):
        for rater in ("a", "b", "c"):
            rows.append((f"perfect{i}", rater, i % 3))
    perfect = spark.createDataFrame(rows, "item string, rater string, cat long")
    p = fleiss_kappa(perfect, "item", "rater", "cat").collect()[0]
    assert p["kappa"] == 1.0 and p["p_bar"] == 1.0
    assert p["n_raters_min"] == 3 and p["n_raters_max"] == 3
    assert p["n_items"] == 30 and p["n_categories"] == 3

    # independent: rater votes depend only on rater, not item
    rows = []
    for i in range(60):
        rows.append((f"x{i}", "a", i % 2))
        rows.append((f"x{i}", "b", (i // 2) % 2))
        rows.append((f"x{i}", "c", (i // 4) % 2))
    ind = spark.createDataFrame(rows, "item string, rater string, cat long")
    k = fleiss_kappa(ind, "item", "rater", "cat").collect()[0]["kappa"]
    assert abs(k) < 0.2

    # unequal panels: one item has only two votes
    rows = [("i1", "a", 0), ("i1", "b", 0), ("i1", "c", 0),
            ("i2", "a", 1), ("i2", "b", 1)]
    une = spark.createDataFrame(rows, "item string, rater string, cat long")
    u = fleiss_kappa(une, "item", "rater", "cat").collect()[0]
    assert u["kappa"] is None and u["p_bar"] is None
    assert u["n_raters_min"] == 2 and u["n_raters_max"] == 3


def test_fleiss_kappa_matches_hand_reference(spark):
    """The classic worked example shape: compute kappa by hand from
    the per-item category counts and compare exactly."""
    from hypermap_etl_spark.operators.quality_model import fleiss_kappa

    # 4 items, 3 raters, categories {0,1}
    votes = {
        "i1": [0, 0, 1],
        "i2": [1, 1, 1],
        "i3": [0, 1, 1],
        "i4": [0, 0, 0],
    }
    rows = [
        (item, f"r{j}", c)
        for item, cats in votes.items()
        for j, c in enumerate(cats)
    ]
    df = spark.createDataFrame(rows, "item string, rater string, cat long")
    got = fleiss_kappa(df, "item", "rater", "cat").collect()[0]
    n, n_items = 3, 4
    p_is = []
    c_tot = {0: 0, 1: 0}
    for cats in votes.values():
        from collections import Counter

        cc = Counter(cats)
        for k, v in cc.items():
            c_tot[k] += v
        p_is.append((sum(v * v for v in cc.values()) - n) / (n * (n - 1)))
    p_bar = sum(p_is) / n_items
    t = n * n_items
    p_e = sum(v * v for v in c_tot.values()) / (t * t)
    want = (p_bar - p_e) / (1 - p_e)
    assert abs(got["kappa"] - round(want, 6)) < 1e-9
    assert got["p_exp"] == round(p_e, 6)


def test_multiclass_report_asymmetric_classes(spark):
    """Confusion [[3,1,0],[0,2,0],[1,0,0]] plus a prediction-only
    class: tp/fp/fn bookkeeping, NULL precision for never-predicted
    classes, NULL recall for prediction-only classes, NULL f1 when
    either side is NULL or tp is 0 on both."""
    from hypermap_etl_spark.operators.quality_model import multiclass_report

    rows = (
        [("a", "a")] * 3 + [("a", "b")] * 1
        + [("b", "b")] * 2
        + [("c", "a")] * 1          # class c never predicted
        + [("a", "d")] * 1          # class d never true
    )
    df = spark.createDataFrame(rows, "t string, p string")
    out = {r["label"]: r for r in multiclass_report(df, "t", "p").collect()}
    a = out["a"]
    assert (a["support"], a["predicted"], a["tp"]) == (5, 4, 3)
    assert a["precision"] == 0.75 and a["recall"] == 0.6
    assert a["f1"] == round(2 * 0.75 * 0.6 / 1.35, 6)
    b = out["b"]
    assert (b["support"], b["predicted"], b["tp"]) == (2, 3, 2)
    c = out["c"]
    assert c["predicted"] == 0 and c["precision"] is None
    assert c["recall"] == 0.0 and c["f1"] is None
    d = out["d"]
    assert d["support"] == 0 and d["recall"] is None
    assert d["precision"] == 0.0 and d["f1"] is None


def test_brier_score_hand_values_and_bounds(spark):
    """Exact hand values: perfect prediction 0, inverted 1, constant
    0.5 scores 0.25 regardless of labels; grouped output; exact
    decimal residuals (0.1 quantizes losslessly at 6 dp)."""
    from hypermap_etl_spark.operators.quality_model import brier_score

    rows = []
    for i in range(10):
        y = 1 if i < 5 else 0
        rows.append(("perfect", float(y), y))
        rows.append(("inverted", float(1 - y), y))
        rows.append(("half", 0.5, y))
        rows.append(("tenth", 0.1, y))
    df = spark.createDataFrame(rows, "g string, score double, label int")
    out = {r["g"]: r for r in brier_score(df, group_cols=["g"]).collect()}
    assert out["perfect"]["brier"] == 0.0
    assert out["inverted"]["brier"] == 1.0
    assert out["half"]["brier"] == 0.25
    # 0.1 vs labels half 1 half 0: (0.81*5 + 0.01*5)/10 = 0.41 exactly
    assert out["tenth"]["brier"] == 0.41
    assert out["perfect"]["n"] == 10


def test_lift_table_perfect_model(spark):
    from hypermap_etl_spark.operators.quality_model import lift_table

    # 100 rows, scores strictly descending, all 10 positives at the
    # top -> band 0 captures everything: resp=1.0, lift=10, cum_gain=1
    rows = [
        (float(100 - i), i, 1 if i < 10 else 0) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "score double, doc_id long, label int")
    out = lift_table(df).collect()
    assert [r["band"] for r in out] == list(range(10))
    b0 = out[0]
    assert b0["n"] == 10 and b0["n_pos"] == 10
    assert b0["resp_rate"] == 1.0 and b0["lift"] == 10.0
    assert b0["cum_gain"] == 1.0 and b0["cum_lift"] == 10.0
    # later bands hold no positives but cumulative gain stays 1
    assert out[5]["n_pos"] == 0 and out[5]["cum_gain"] == 1.0
    # cum_lift decays as depth grows: 1/(share of rows)
    assert out[9]["cum_lift"] == 1.0

    # uneven split: 103 rows across 10 bands -> sizes 10 or 11,
    # total preserved, bands contiguous
    rows2 = [(float(200 - i), i, i % 2) for i in range(103)]
    df2 = spark.createDataFrame(
        rows2, "score double, doc_id long, label int"
    )
    out2 = lift_table(df2).collect()
    assert sum(r["n"] for r in out2) == 103
    assert all(10 <= r["n"] <= 11 for r in out2)
    assert out2[-1]["cum_n"] == 103

    # ties split by id: same score everywhere still bands evenly
    rows3 = [(1.0, i, 1 if i < 5 else 0) for i in range(50)]
    df3 = spark.createDataFrame(
        rows3, "score double, doc_id long, label int"
    )
    out3 = lift_table(df3).collect()
    assert out3[0]["n_pos"] == 5 and out3[0]["n"] == 5

    # empty input -> empty table; bad n_bands raises
    empty = df.filter("score IS NULL")
    assert lift_table(empty).count() == 0
    import pytest as _pt

    with _pt.raises(ValueError):
        lift_table(df, n_bands=1)
