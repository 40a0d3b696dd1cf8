"""Model-based document quality filtering (beyond-reference,
north-star set): a fastText-style linear classifier over the
feature-hashing embeddings.

The heuristic quality scores in operators/curation.py (length /
punctuation / stopword ratios, Gopher-style rules) are stage one of a
real curation stack; stage two is a TRAINED filter — fastText
classifiers scoring "looks like a reference corpus" are the published
recipe behind CCNet (Wenzek et al. 2020), LLaMA's CommonCrawl
curation, and DSIR's discriminative cousin. This module is that stage
with zero external model dependencies: features are the deterministic
md5 hashing-trick embeddings (operators/textstats.hash_embed), the
trainer is Spark MLlib's LogisticRegression (distributed LBFGS,
JVM-side tree aggregation — the standard linear-model path at 100 TB),
and the MODEL IS PLAIN DATA (a weight list + bias), so serving needs
no MLlib at all.

Train/serve split, the repo's PCA/BPE pattern: training touches the
corpus once per LBFGS pass (data-sized, distributed); the fitted model
is dim+1 doubles on the driver (model-sized). Serving
(:func:`score_linear`) is pure column expressions — zip_with dot
product + sigmoid over the hash-embed array, no UDF, no Python, no
MLlib — so the scoring path is SQL-expressible and driver-gated
bit-for-bit with literal weights (plans/doc_queries.doc_model_scores),
while the iterative trainer is certified by planted-separability unit
tests (the documented no-oracle policy for iterative fits,
tests/test_quality_model.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hypermap_etl_spark.operators.textstats import hash_embed


def train_quality_classifier(
    labeled_docs: DataFrame,
    dim: int = 64,
    ngrams: int = 1,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
    max_iter: int = 100,
    reg_param: float = 1e-4,
) -> dict:
    """Fit a binary quality classifier on (text, label∈{0,1}) rows;
    returns the model as plain data: ``{"weights": [float]*dim,
    "bias": float, "dim": dim, "ngrams": ngrams}`` — feed it straight
    to :func:`score_linear`, persist it as JSON, or broadcast it.

    Distributed shape: one hash_embed pass (a pure map-side array
    fold, no Python), then MLlib LogisticRegression — each LBFGS iteration
    is one treeAggregate of per-partition gradient partials, the
    canonical linear-model scaling on a 1000-executor cluster. The
    driver holds dim+1 doubles.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    emb = hash_embed(
        labeled_docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias(text_col)
        ),
        dim=dim,
        text_col=text_col,
        ngrams=ngrams,
    )
    train = emb.join(
        labeled_docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(label_col).cast("double").alias("label"),
        ),
        "doc_id",
    ).select(array_to_vector("embedding").alias("features"), "label")
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=False
    )
    model = lr.fit(train)
    return {
        "weights": [float(v) for v in model.coefficients.toArray()],
        "bias": float(model.intercept),
        "dim": dim,
        "ngrams": ngrams,
    }


def score_linear(
    docs: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    ngrams: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents with a linear model over hash-embed features:
    ``score = sigmoid(w · embed(text) + bias)`` as (id_col, score).

    Pure column expressions end to end — the weight vector becomes an
    array literal, the dot product is zip_with + aggregate (JVM higher-
    order functions), sigmoid is exp — so scoring inherits hash_embed's
    scale shape (one explode + one doc-keyed aggregate, no UDF) and is
    reproducible in any SQL engine, which is how the driver gate
    certifies this exact serving path. ``len(weights)`` fixes the
    embedding dimension and must match the model's training dim.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    emb = hash_embed(
        docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias(text_col)
        ),
        dim=len(weights),
        text_col=text_col,
        ngrams=ngrams,
    )
    warr = F.array(*[F.lit(float(v)) for v in weights])
    z = F.aggregate(
        F.zip_with("embedding", warr, lambda x, w: x * w),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) + F.lit(float(bias))
    return emb.select(
        F.col("doc_id").alias(id_col),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("score"),
    )


def calibration_report(
    scored: DataFrame,
    n_bins: int = 10,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Reliability diagram for a probabilistic quality filter: bucket
    rows by predicted score into ``n_bins`` equal-width bins over
    [0, 1] and compare each bin's mean prediction against its
    empirical positive rate — the per-bin view whose weighted gap sum
    is expected calibration error (ECE). A filter whose 0.9-bin is
    only 60% positive is over-confident: its threshold sweeps lie.

    Input: rows carrying ``score_col`` ∈ [0, 1] and a 0/1
    ``label_col``. Bin = min(floor(score·n_bins), n_bins−1), so 1.0
    lands in the last bin; floor on IEEE doubles is engine-identical
    given identical inputs. Output per non-empty bin:
    (bin, n, mean_score, pos_rate, abs_gap, ece_term), rounded at the
    final step only. Σ ece_term over bins = ECE.

    Scale shape: ONE hash aggregate keyed by ≤ n_bins values, then a
    broadcast single-row total for the ECE weights — the same
    percentage-of-total construction as the serving plans; nothing
    corpus-sized shuffles.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("long"), F.lit(n_bins - 1)
    )
    per = scored.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(F.col(score_col)).alias("__ms"),
        (
            F.sum(F.col(label_col).cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("__pr"),
    )
    total = per.agg(F.sum("n").alias("__total"))
    gap = F.abs(F.col("__ms") - F.col("__pr"))
    return (
        per.join(F.broadcast(total))
        .select(
            "bin",
            "n",
            F.round("__ms", 6).alias("mean_score"),
            F.round("__pr", 6).alias("pos_rate"),
            F.round(gap, 6).alias("abs_gap"),
            F.round(
                gap * F.col("n").cast("double") / F.col("__total").cast("double"),
                6,
            ).alias("ece_term"),
        )
        .orderBy("bin")
    )


def roc_auc(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Area under the ROC curve for a binary quality filter — the
    threshold-free ranking metric that completes the eval family next
    to :func:`calibration_report` (is the score CALIBRATED?) and the
    threshold sweeps (is THIS cut good?): AUC asks whether the score
    RANKS positives above negatives at all, ties counted half.

    Construction (no corpus ranking window): AUC is the normalized
    Mann-Whitney U of positives vs negatives, so the rank machinery is
    operators/profile.mann_whitney_u's — scores collapse to ONE hash
    aggregate keyed (group, score) carrying (rows, positive rows);
    average ranks come from a running sum over each group's DISTINCT
    scores (window bounded by score cardinality, never corpus rows);
    AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻) with R⁺ = Σ tp·avgrank.

    Numerics: 2·avgrank = 2·cum − (t−1) is an exact integer, so the
    doubled rank sum accumulates in decimal(19,0)-product /
    decimal(38,0)-sum arithmetic (the gini_concentration discipline —
    no float wobble, no int64 overflow at corpus scale); the final
    AUC is one fixed-order double expression over exact aggregates,
    rounded at the output only. Callers that want bit-identical SQL
    parity should round scores BEFORE calling (the
    calibration_report gate convention) so tie groups coincide.

    Output per group: (group_cols, n_pos, n_neg, auc); groups with no
    positives or no negatives are dropped (AUC undefined).
    """
    from pyspark.sql.window import Window

    group_cols = group_cols or []
    base = scored.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        *group_cols,
        F.col(score_col).alias("__s"),
        F.col(label_col).cast("long").alias("__y"),
    )
    per_val = base.groupBy(*group_cols, "__s").agg(
        F.count(F.lit(1)).cast("long").alias("__t"),
        F.sum("__y").cast("long").alias("__tp"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("__s").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = per_val.withColumn("__cum", F.sum("__t").over(w))
    # 2*avgrank = 2*cum - (t - 1): exact integer, decimal-safe product
    r2 = (
        F.lit(2) * F.col("__cum") - (F.col("__t") - F.lit(1))
    ).cast("decimal(19,0)")
    g = ranked.groupBy(*group_cols).agg(
        F.sum("__tp").cast("long").alias("n_pos"),
        F.sum(F.col("__t") - F.col("__tp")).cast("long").alias("n_neg"),
        F.sum(F.col("__tp").cast("decimal(19,0)") * r2)
        .cast("decimal(38,0)")
        .alias("__r2"),
    ).filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
    np_, nn_ = F.col("n_pos").cast("double"), F.col("n_neg").cast("double")
    # AUC = (S2/2 - n_pos(n_pos+1)/2) / (n_pos*n_neg), S2 = doubled R+
    auc = (
        F.col("__r2").cast("double") / F.lit(2.0)
        - np_ * (np_ + F.lit(1.0)) / F.lit(2.0)
    ) / (np_ * nn_)
    return g.select(
        *group_cols, "n_pos", "n_neg", F.round(auc, 6).alias("auc")
    )


def pr_threshold_sweep(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_steps: int = 20,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Precision / recall / F1 at every cut of a fixed threshold grid
    — the sweep you actually tune a quality filter with ("keep docs
    scoring ≥ τ: what survives, and how clean is it?"), completing
    the eval family beside :func:`calibration_report` (is the score
    calibrated?) and :func:`roc_auc` (does it rank at all?).

    Thresholds are τ_i = i/n_steps for i = 0..n_steps−1; a row
    predicts positive at τ_i iff score ≥ τ_i. Scores bin exactly like
    calibration_report (min(floor(score·n_steps), n_steps−1), so
    score 1.0 counts toward every threshold) and the at-or-above
    counts come from ONE descending running sum over the ≤ n_steps
    bins per group. Every output value is a ratio of exact longs
    rounded at the output — per-row arithmetic only, no cross-row
    float accumulation anywhere.

    Scale shape: ONE corpus hash aggregate keyed (group, bin); the
    grid join, running sums, and ratios all run on groups × n_steps
    rows. Empty-grid thresholds (no scores at or above) emit NULL
    precision/F1 and recall 0 via try_divide semantics; groups with
    zero positives emit NULL recall rather than dropping (the sweep
    is still meaningful for precision).

    Output per (group, threshold): (group_cols, threshold, n_pred,
    tp, precision, recall, f1).
    """
    from pyspark.sql.window import Window

    if n_steps < 1:
        raise ValueError("n_steps must be >= 1")
    group_cols = group_cols or []
    b = F.least(
        F.floor(F.col(score_col) * n_steps).cast("long"), F.lit(n_steps - 1)
    )
    base = scored.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    )
    per_bin = base.groupBy(*group_cols, b.alias("__bin")).agg(
        F.count(F.lit(1)).cast("long").alias("__t"),
        F.sum(F.col(label_col).cast("long")).cast("long").alias("__tp"),
    )
    spark = scored.sparkSession
    grid = spark.range(n_steps).select(F.col("id").alias("__bin"))
    if group_cols:
        groups = per_bin.select(*group_cols).distinct()
        grid = groups.crossJoin(F.broadcast(grid))
    full = grid.join(per_bin, [*group_cols, "__bin"], "left").select(
        *group_cols,
        "__bin",
        F.coalesce(F.col("__t"), F.lit(0)).alias("__t"),
        F.coalesce(F.col("__tp"), F.lit(0)).alias("__tp"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("__bin").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = Window.partitionBy(*group_cols)
    cum = (
        full.withColumn("__n_pred", F.sum("__t").over(w))
        .withColumn("__ctp", F.sum("__tp").over(w))
        .withColumn("__n_pos", F.sum("__tp").over(wp))
    )
    prec = F.try_divide(
        F.col("__ctp").cast("double"), F.col("__n_pred").cast("double")
    )
    rec = F.try_divide(
        F.col("__ctp").cast("double"), F.col("__n_pos").cast("double")
    )
    f1 = F.try_divide(F.lit(2.0) * prec * rec, prec + rec)
    return cum.select(
        *group_cols,
        F.round(F.col("__bin").cast("double") / F.lit(float(n_steps)), 6).alias(
            "threshold"
        ),
        F.col("__n_pred").alias("n_pred"),
        F.col("__ctp").alias("tp"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def cohens_kappa(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Cohen's kappa between two categorical label columns — the
    agreement-beyond-chance check a labeling pipeline runs when two
    quality models (or a model and a human sample) grade the same
    documents: kappa = (p_o − p_e) / (1 − p_e), with observed
    agreement p_o from the contingency diagonal and expected
    agreement p_e from the marginal products.

    One hash aggregate to the (a, b) contingency (bounded by label
    cardinality squared); marginals and the kappa arithmetic run on
    that aggregate — exact integer counts into one fixed-order double
    expression, so a SQL oracle reproduces it bit-for-bit. Rows where
    either label is NULL are excluded (no-grade ≠ disagreement).
    Output: one row (n, p_obs, p_exp, kappa), kappa NULL when p_e = 1
    (degenerate single-label case — try_divide, not a crash).
    """
    base = df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    cont = base.groupBy(
        F.col(col_a).alias("__a"), F.col(col_b).alias("__b")
    ).agg(F.count(F.lit(1)).cast("long").alias("__n"))
    agg = cont.agg(
        F.sum("__n").cast("long").alias("n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__n")).otherwise(0))
        .cast("long")
        .alias("__diag"),
    )
    ra = cont.groupBy("__a").agg(F.sum("__n").alias("__ra"))
    cb = cont.groupBy("__b").agg(F.sum("__n").alias("__cb"))
    pe_num = (
        ra.join(cb, ra["__a"] == cb["__b"])
        .agg(F.sum(F.col("__ra") * F.col("__cb")).cast("double").alias("__pe_num"))
    )
    nn = F.col("n").cast("double")
    po = F.col("__diag").cast("double") / nn
    pe = F.col("__pe_num") / (nn * nn)
    return (
        agg.crossJoin(F.broadcast(pe_num))
        .select(
            "n",
            F.round(po, 6).alias("p_obs"),
            F.round(pe, 6).alias("p_exp"),
            F.round(F.try_divide(po - pe, F.lit(1.0) - pe), 6).alias("kappa"),
        )
    )


def fleiss_kappa(
    ratings: DataFrame,
    item_col: str,
    rater_col: str,
    category_col: str,
) -> DataFrame:
    """Fleiss' kappa over N raters — the multi-rater generalization of
    :func:`cohens_kappa`, the agreement statistic for an LLM-judge
    ENSEMBLE (three graders label every document: do they agree more
    than chance?): κ = (P̄ − P̄_e)/(1 − P̄_e) with per-item agreement
    P_i = (Σ_j n_ij² − n)/(n(n−1)) and chance agreement P̄_e = Σ_j p_j².

    Input: one row per (item, rater) vote carrying the category; rows
    with a NULL item/category are excluded. The standard statistic
    assumes a CONSTANT rater count n per item — the output carries
    (n_raters_min, n_raters_max) and kappa is NULL when they differ
    (a malformed panel is surfaced, not silently averaged) or when
    P̄_e = 1 (single category: agreement is vacuous).

    Numerics: with constant n, P̄ = (Σ_i Σ_j n_ij² − Σ_i n)/(N·n·(n−1))
    and P̄_e = (Σ_j c_j²)/T² are ratios of PURE INTEGERS — the squared
    counts accumulate in decimal(19,0)/(38,0), and κ is one
    fixed-order double expression over those exact aggregates.

    Scale shape: ONE corpus hash aggregate to (item, category) counts;
    per-item and per-category reductions run on that frame; everything
    after is a handful of broadcast scalars. No windows, no collect.
    """
    it, cat = F.col(item_col), F.col(category_col)
    cnt = (
        ratings.filter(it.isNotNull() & cat.isNotNull())
        .groupBy(item_col, category_col)
        .agg(F.count(F.lit(1)).cast("long").alias("__nij"))
    )
    d19 = "decimal(19,0)"
    per_item = cnt.groupBy(item_col).agg(
        F.sum("__nij").cast("long").alias("__n_i"),
        F.sum(F.col("__nij").cast(d19) * F.col("__nij").cast(d19))
        .cast("decimal(38,0)")
        .alias("__ssq_i"),
    )
    items = per_item.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.min("__n_i").alias("__nmin"),
        F.max("__n_i").alias("__nmax"),
        F.sum("__ssq_i").cast("decimal(38,0)").alias("__ssq"),
        F.sum("__n_i").cast("decimal(38,0)").alias("__t"),
    )
    per_cat = cnt.groupBy(category_col).agg(
        F.sum("__nij").cast("long").alias("__c_j")
    )
    cats = per_cat.agg(
        F.count(F.lit(1)).cast("long").alias("n_categories"),
        F.sum(F.col("__c_j").cast(d19) * F.col("__c_j").cast(d19))
        .cast("decimal(38,0)")
        .alias("__csq"),
    )
    g = items.crossJoin(F.broadcast(cats))
    nI = F.col("n_items").cast("double")
    n = F.col("__nmin").cast("double")
    t = F.col("__t").cast("double")
    p_bar = F.try_divide(
        F.col("__ssq").cast("double") - t,
        nI * n * (n - F.lit(1.0)),
    )
    p_e = F.col("__csq").cast("double") / (t * t)
    kappa = F.when(
        F.col("__nmin") == F.col("__nmax"),
        F.try_divide(p_bar - p_e, F.lit(1.0) - p_e),
    )
    return g.select(
        "n_items",
        F.col("__nmin").alias("n_raters_min"),
        F.col("__nmax").alias("n_raters_max"),
        "n_categories",
        F.round(F.when(F.col("__nmin") == F.col("__nmax"), p_bar), 6).alias(
            "p_bar"
        ),
        F.round(p_e, 6).alias("p_exp"),
        F.round(kappa, 6).alias("kappa"),
    )


def brier_score(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Brier score — the proper scoring rule completing the
    calibration corner of the eval family (ECE tells you WHERE the
    reliability curve gaps; Brier is the single number a model
    comparison sorts by): mean((score − label)²), lower is better,
    with the classic decomposition bound 0 ≤ BS ≤ 1.

    Numerics — EXACT: scores quantize to decimal(8,6) (callers round
    to 6 dp first, the calibration_report convention, so this cast is
    lossless), the squared residual is decimal(17,12), and the
    corpus sum accumulates in decimal(38,12) — no float accumulation;
    one double division by n at the output.

    Output per group: (group_cols, n, brier).
    """
    group_cols = group_cols or []
    s = F.col(score_col).cast("decimal(8,6)")
    resid = s - F.col(label_col).cast("decimal(8,6)")
    sq = (resid * resid).cast("decimal(17,12)")
    g = (
        scored.filter(
            F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(sq).cast("decimal(38,12)").alias("__ss"),
        )
    )
    return g.select(
        *group_cols,
        "n",
        F.round(
            F.col("__ss").cast("double") / F.col("n").cast("double"), 6
        ).alias("brier"),
    )


def multiclass_report(
    df: DataFrame,
    true_col: str,
    pred_col: str,
) -> DataFrame:
    """Per-class precision/recall/F1 with supports — the multiclass
    sibling of :func:`pr_threshold_sweep` (which is binary-score
    shaped), e.g. grading the language router against labeled data
    before trusting it to split a corpus: per class c, tp = the
    confusion diagonal, fp = everything predicted c but not c,
    fn = everything truly c predicted otherwise.

    Construction: ONE corpus hash aggregate to the (true, pred)
    confusion matrix; per-class reductions run on that class²-sized
    frame via a full outer join of the true- and pred-marginals (a
    class may appear only among predictions — precision is still
    defined for it — or only among truths). Every metric is a ratio
    of exact longs rounded at the output; classes NULL on either side
    are excluded. No macro/micro summary row here on purpose: a
    cross-class float mean belongs to the consumer (the CLI sums the
    collected per-class rows), keeping this frame free of cross-row
    float accumulation.

    Output per class: (label, support, predicted, tp, precision,
    recall, f1); precision NULL when nothing was predicted as the
    class, recall NULL when the class has no true rows, f1 NULL when
    either is (try_divide semantics).
    """
    t, p = F.col(true_col), F.col(pred_col)
    conf = (
        df.filter(t.isNotNull() & p.isNotNull())
        .groupBy(t.alias("__t"), p.alias("__p"))
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    truth = conf.groupBy(F.col("__t").alias("label")).agg(
        F.sum("__n").cast("long").alias("support"),
        F.sum(F.when(F.col("__t") == F.col("__p"), F.col("__n")).otherwise(0))
        .cast("long")
        .alias("__tp_t"),
    )
    pred = conf.groupBy(F.col("__p").alias("label")).agg(
        F.sum("__n").cast("long").alias("predicted"),
    )
    j = truth.join(pred, "label", "full_outer").select(
        "label",
        F.coalesce(F.col("support"), F.lit(0)).cast("long").alias("support"),
        F.coalesce(F.col("predicted"), F.lit(0)).cast("long").alias("predicted"),
        F.coalesce(F.col("__tp_t"), F.lit(0)).cast("long").alias("tp"),
    )
    prec = F.try_divide(F.col("tp").cast("double"), F.col("predicted").cast("double"))
    rec = F.try_divide(F.col("tp").cast("double"), F.col("support").cast("double"))
    f1 = F.try_divide(F.lit(2.0) * prec * rec, prec + rec)
    return j.select(
        "label",
        "support",
        "predicted",
        "tp",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def bradley_terry(
    pairs: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    n_iter: int = 50,
) -> "DataFrame":
    """Bradley-Terry preference strengths from pairwise outcomes — the
    reward-modeling primitive of an RLHF data pipeline (which response
    is stronger, given many noisy A-beats-B judgments).

    Scale shape: the corpus of judgments collapses to ONE hash
    aggregate of (winner, loser, n) pair counts — items², model-sized
    for any real label set — and the MM fixed-point iteration
    (Hunter 2004: π_i ← W_i / Σ_j n_ij/(π_i+π_j), normalized) runs
    driver-side on that aggregate, the documented model-sized-loop
    policy (kmeans/PCA/BPE family). Deterministic: fixed iteration
    count, items processed in sorted order, uniform init.

    Output: (item, strength, n_wins, n_games), strengths summing to 1,
    round 6. Items seen only as losers still get a (shrinking)
    strength; ties in the data are the caller's job to split.
    """
    counts = (
        pairs.filter(
            F.col(winner_col).isNotNull() & F.col(loser_col).isNotNull()
        )
        .groupBy(
            F.col(winner_col).alias("__w"), F.col(loser_col).alias("__l")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        .collect()
    )
    n_wl: dict[tuple, int] = {}
    items: set = set()
    for r in counts:
        n_wl[(r["__w"], r["__l"])] = n_wl.get((r["__w"], r["__l"]), 0) + r["__n"]
        items.add(r["__w"])
        items.add(r["__l"])
    items_sorted = sorted(items)
    if not items_sorted:
        return pairs.sparkSession.createDataFrame(
            [], "item string, strength double, n_wins long, n_games long"
        )
    # games matrix n_ij = games between i and j (either direction)
    games: dict[tuple, int] = {}
    wins: dict = {}
    for (w, loser), c in n_wl.items():
        games[(w, loser)] = games.get((w, loser), 0) + c
        games[(loser, w)] = games.get((loser, w), 0) + c
        wins[w] = wins.get(w, 0) + c
    pi = {i: 1.0 / len(items_sorted) for i in items_sorted}
    for _ in range(n_iter):
        nxt = {}
        for i in items_sorted:
            denom = 0.0
            for j in items_sorted:
                g = games.get((i, j), 0)
                if g and i != j:
                    denom += g / (pi[i] + pi[j])
            nxt[i] = (wins.get(i, 0) / denom) if denom > 0 else 0.0
        total = sum(nxt.values())
        if total <= 0:
            break
        pi = {i: v / total for i, v in nxt.items()}
    rows = [
        (
            str(i),
            round(pi[i], 6),
            int(wins.get(i, 0)),
            int(sum(games.get((i, j), 0) for j in items_sorted if j != i)),
        )
        for i in items_sorted
    ]
    return pairs.sparkSession.createDataFrame(
        rows, "item string, strength double, n_wins long, n_games long"
    )


def conformal_threshold(
    df: DataFrame,
    score_col: str,
    group_cols: list[str] | None = None,
    alpha: float = 0.1,
) -> DataFrame:
    """Split-conformal quantile threshold per group: the k-th smallest
    calibration score with k = ⌈(1−α)(n+1)⌉ — the finite-sample-valid
    cut ("accept only scores ≤ q̂, and the accept set covers a fresh
    example with probability ≥ 1−α", Vovk et al. / Angelopoulos &
    Bates 2021). The thresholding primitive for risk-controlled
    filtering of model-scored corpora.

    Construction (no per-group sort task): scores collapse to a
    (group, score) count aggregate; a running sum over each group's
    DISTINCT scores (window over the aggregate) finds the first value
    whose cumulative count reaches k — the grouped_weighted_median
    discipline. Exact integer rank selection; no interpolation, so any
    engine agrees bit-for-bit. Groups with k > n (too few calibration
    points for the requested α) return NULL q̂ rather than a lying
    threshold.

    Output: (group..., n, k, q_hat).
    """
    from pyspark.sql.window import Window

    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0,1): {alpha}")
    group_cols = group_cols or []
    per = (
        df.filter(F.col(score_col).isNotNull())
        .groupBy(*group_cols, F.col(score_col).alias("__s"))
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("__s").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*group_cols)
    cum = (
        per.withColumn("__cum", F.sum("__c").over(w))
        .withColumn("__n", F.sum("__c").over(wall))
    )
    # k = ceil((1-alpha)(n+1)) in exact integer arithmetic via the
    # Fraction of alpha (floats like 0.1 are exactly mirrorable, but
    # ceil of a double product is the CAST-rounding trap — integers
    # only)
    from fractions import Fraction

    fr = Fraction(str(alpha))
    an, ad = fr.numerator, fr.denominator
    # (1 - an/ad)(n+1) = (ad-an)(n+1)/ad ; ceil(x/y) = floor((x+y-1)/y)
    k = F.floor(
        ((F.lit(ad - an) * (F.col("__n") + 1)) + F.lit(ad - 1)) / F.lit(ad)
    ).cast("long")
    hit = cum.filter(F.col("__cum") >= k)
    pick = Window.partitionBy(*group_cols).orderBy(F.col("__s").asc())
    first = (
        hit.withColumn("__rn", F.row_number().over(pick))
        .filter(F.col("__rn") == 1)
        .select(*group_cols, F.col("__n"), k.alias("__k"), F.col("__s"))
    )
    base = per.groupBy(*group_cols).agg(
        F.sum("__c").cast("long").alias("n")
    )
    if group_cols:
        joined = base.join(first.drop("__n", "__k"), group_cols, "left")
    else:
        # global case: one base row, at most one hit row
        joined = base.crossJoin(F.broadcast(first.drop("__n", "__k")))
    # k recomputed from the authoritative per-group n (always present,
    # even when no row reaches it and q_hat is NULL)
    k_out = F.floor(
        ((F.lit(ad - an) * (F.col("n") + 1)) + F.lit(ad - 1)) / F.lit(ad)
    ).cast("long")
    return joined.select(
        *group_cols,
        "n",
        k_out.alias("k"),
        F.when(k_out <= F.col("n"), F.col("__s")).alias("q_hat"),
    )


def isotonic_calibrate(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 100,
) -> DataFrame:
    """Isotonic calibration of a [0,1] score against boolean labels:
    bin the scores (fixed uniform grid — bounds the driver work no
    matter the corpus), pool-adjacent-violators over the bin means,
    and return the monotone step function as (bin, lo, hi, n, rate,
    calibrated) rows — the standard nonparametric fix when
    calibration_report shows a bent reliability curve.

    Scale shape: ONE corpus aggregate to n_bins rows (bin by pure
    integer arithmetic, the CAST-truncation-safe construction); PAVA
    runs driver-side on the bin aggregate (model-sized, like the
    kmeans/BPE loops — unit-certified under the documented no-SQL-
    oracle policy for sequential fits). The pooled solution is the
    unique L2-optimal monotone fit, weighted by bin counts.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    s = F.col(score_col).cast("double")
    b = F.least(
        F.floor(s * F.lit(n_bins)).cast("int"), F.lit(n_bins - 1)
    )
    agg = (
        df.filter(s.isNotNull() & F.col(label_col).isNotNull())
        .filter((s >= 0) & (s <= 1))
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col(label_col).cast("int")).cast("long").alias("pos"),
        )
        .collect()
    )
    rows = sorted((r["bin"], r["n"], r["pos"]) for r in agg)
    # PAVA: pool adjacent bins while the mean decreases
    blocks: list[list] = []  # [sum_pos, sum_n, bins]
    for bin_id, n, pos in rows:
        blocks.append([pos, n, [bin_id]])
        while len(blocks) > 1 and (
            blocks[-2][0] * blocks[-1][1] > blocks[-1][0] * blocks[-2][1]
        ):  # prev_mean > cur_mean in exact integer cross-mult
            p2, n2, b2 = blocks.pop()
            blocks[-1][0] += p2
            blocks[-1][1] += n2
            blocks[-1][2].extend(b2)
    out = []
    by_bin = {bin_id: (n, pos) for bin_id, n, pos in rows}
    for pos_sum, n_sum, bin_ids in blocks:
        cal = round(pos_sum / n_sum, 6)
        for bin_id in bin_ids:
            n, pos = by_bin[bin_id]
            out.append(
                (
                    int(bin_id),
                    round(bin_id / n_bins, 6),
                    round((bin_id + 1) / n_bins, 6),
                    int(n),
                    round(pos / n, 6),
                    cal,
                )
            )
    return df.sparkSession.createDataFrame(
        sorted(out),
        "bin int, lo double, hi double, n long, rate double, calibrated double",
    )


def lift_table(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    id_col: str = "doc_id",
    n_bands: int = 10,
) -> DataFrame:
    """Decile lift / cumulative-gains table — the campaign-targeting
    readout of a scoring model ("mail the top 2 deciles"): rows sort
    by score descending, split into ``n_bands`` equal bands, and each
    band reports its response rate, lift over the base rate, and the
    cumulative share of all positives captured down to that band.

    Band assignment uses scale.global_rank over the UNIQUE order
    (score desc, id asc) — the range-shuffle + per-partition-offset
    construction, never a single-partition `ntile() OVER (ORDER BY)` —
    and the band index is pure int64 arithmetic,
    ((rank−1)·n_bands) div n, so no float can misplace a boundary row.
    Ties at a score split by id, identically in any engine.

    Output per band (0 = best-scored): n, n_pos, resp_rate, lift,
    cum_n, cum_pos, cum_gain (recall at depth), cum_lift — every rate
    a ratio of exact longs, rounded 6.

    Scale shape: one distributed rank pass over the corpus, ONE hash
    aggregate to n_bands rows, then windows over those n_bands rows.
    """
    if n_bands < 2:
        raise ValueError("lift_table: need n_bands >= 2")
    from pyspark.sql.window import Window

    from hypermap_etl_spark.operators.scale import _global_rank_with_total

    base = scored.select(
        F.col(score_col).alias("__s"),
        F.col(id_col).alias("__id"),
        F.col(label_col).cast("long").alias("__y"),
    ).filter(F.col("__s").isNotNull() & F.col("__y").isNotNull())
    ranked, total = _global_rank_with_total(
        base,
        [F.col("__s").desc(), F.col("__id").asc()],
        rank_col="__grank",
    )
    if total == 0:
        return ranked.select(
            F.lit(0).cast("int").alias("band"),
            F.lit(0).cast("long").alias("n"),
            F.lit(0).cast("long").alias("n_pos"),
            F.lit(0.0).alias("resp_rate"),
            F.lit(0.0).alias("lift"),
            F.lit(0).cast("long").alias("cum_n"),
            F.lit(0).cast("long").alias("cum_pos"),
            F.lit(0.0).alias("cum_gain"),
            F.lit(0.0).alias("cum_lift"),
        ).limit(0)
    band = (
        (F.col("__grank") - F.lit(1)) * F.lit(n_bands)
        - F.pmod((F.col("__grank") - F.lit(1)) * F.lit(n_bands), F.lit(total))
    ) / F.lit(total)
    per = (
        ranked.select(band.cast("int").alias("band"), "__y")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__y").cast("long").alias("n_pos"),
        )
    )
    w = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum_n = F.sum("n").over(w).cast("long")
    cum_pos = F.sum("n_pos").over(w).cast("long")
    tot_n = F.sum("n").over(wall).cast("double")
    tot_pos = F.sum("n_pos").over(wall).cast("double")
    resp = F.col("n_pos").cast("double") / F.col("n").cast("double")
    base_rate = tot_pos / tot_n
    cum_gain = F.try_divide(cum_pos.cast("double"), tot_pos)
    cum_share = cum_n.cast("double") / tot_n
    return (
        per.select(
            "band",
            "n",
            "n_pos",
            F.round(resp, 6).alias("resp_rate"),
            F.round(F.try_divide(resp, base_rate), 6).alias("lift"),
            cum_n.alias("cum_n"),
            cum_pos.alias("cum_pos"),
            F.round(cum_gain, 6).alias("cum_gain"),
            F.round(F.try_divide(cum_gain, cum_share), 6).alias("cum_lift"),
        )
        .orderBy("band")
    )
