"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator family from
SURVEY.md §2 plus the north-star LLM-data-pipeline operators;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each (all entries
have oracles). The driver runs both at sf=0.01 and compares row count,
schema, and order-insensitive value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hypermap_etl_spark.plans.doc_queries import DOC_QUERIES
from hypermap_etl_spark.plans.hm_queries import HM_QUERIES
from hypermap_etl_spark.plans.star_queries import STAR_QUERIES

_MERGED: dict[str, tuple] = {**STAR_QUERIES, **HM_QUERIES, **DOC_QUERIES}

# ROUND-7 WINDOW. The driver's correctness gate runs only the FIRST 50
# queries() entries (dict order). Evidence policy unchanged: first-time
# evidence beats re-certification; re-cert after an operator change
# outranks an untouched re-cert; untouched re-certs rotate oldest
# evidence first. r6 landed 50/50 green, closing the whole
# never-checked backlog except the 8 gates registered late in that
# session. This window leads with those 8 (first-time evidence), then
# the 4 gates whose operators changed THIS session (triangle
# orientation, PPJoin positional filter, capped dictionary pulls in
# the BPE/unigram gates), then 16 first-time continuation-wave gates
# (they displaced the 16 r2-only re-certs late in the session — the
# policy ranks first-time evidence above untouched re-certification,
# and the displaced gates keep their valid r2 rows), then the 22
# gates NEW in the r7 build session, which had earlier displaced the
# whole r3-evidence re-cert tail back-to-front as they landed.
_WINDOW: list[str] = [
    # ---- 8 first-time gates (registered+local-green in r6, outran
    # the window; queued per VERDICT r6 task 1) ----
    "events_ab_welch",
    "customer_linkage",
    "customer_l_diversity",
    "customer_rfm",
    "doc_hybrid_rrf",
    "emb_hard_negatives",
    "doc_calibration",
    "q7_volume_shipping",
    # ---- operator-changed this session: re-cert outranks untouched ----
    "parts_copurchase_triangles",  # degree-based edge orientation
    "doc_prefix_pairs",            # PPJoin positional filter
    "doc_bpe_first_merge",         # capped dictionary + mirrored oracle
    "doc_unigram_seed",            # capped dictionary + mirrored oracle
    # ---- continuation-wave first-time gates (displacing the 16
    # r2-only re-certs: the documented policy ranks first-time
    # evidence above untouched re-certification, and those 16 keep
    # their valid r2 rows — the same displacement rationale the r5
    # and r6 windows applied) ----
    "events_permutation_test",
    "events_fdr_bh",
    "events_delta_ratio",
    "events_ab_power",
    "doc_model_lift",
    "orders_holt_forecast",
    "parts_community_modularity",
    "events_funnel_wilson",
    "events_eb_shrinkage",
    "events_cohort_ltv",
    "events_sequential_welch",
    "parts_link_prediction",
    "doc_score_quantile_norm",
    "emb_centroid_drift",
    "doc_tokenizer_fertility",
    "events_srm_segments",
    # ---- gates NEW in the r7 build session (displace the r3
    # re-certs below back-to-front as they land) ----
    "customer_linkage2",        # tau=2 deletion-neighborhood linkage
    "events_drift_verdict",     # streaming store -> CUSUM verdict
    "events_mannwhitney",       # tie-corrected rank-sum on the A/A split
    "events_theilsen_trend",    # median pairwise slope on the aggregate
    "events_changepoint",       # integer-exact mean-shift scan argmax
    "orders_seasonal_naive",    # lag-12 forecast floor + APE
    "doc_js_divergence",        # source-vs-corpus JSD on top-V vocab
    "emb_matryoshka_recall",    # prefix-dim recall vs full top-k
    "doc_bpe_encode",           # Pandas-UDF encoder vs replace-chain SQL
    "emb_ivfpq_recall",         # composed probe-pruned + ADC + refine
    "customer_golden_record",   # linkage -> CC -> survivorship fusion
    "events_heavy_coverage",    # smallest key set covering X% of events
    "doc_kappa_models",         # agreement-beyond-chance of two graders
    "lineitem_pref_matrix",     # pairwise-preference extraction for BT
    "events_conformal",         # finite-sample valid accept threshold
    "customer_blocking_metrics",  # reduction ratio + completeness cert
    "events_drift_ewma",        # store -> per-day anomaly face
    "events_dp_counts",         # Laplace release calibration plumbing
    "doc_skipgram_cooc",        # windowed co-occ via the delta-join
    "events_dow_seasonality",   # cycle-adjusted daily outliers
    "events_bot_screen",        # inter-arrival regularity flags
    "events_ks_split",          # integer-exact ECDF max difference
    # ---- oldest r3-evidence re-certs fill the tail ----
]

# QUEUED FOR THE r8 WINDOW (registered after this round's window froze;
# every one green in tools/drive_gates.py AND the local parity mirror):
# the r7-continuation gates — the model-eval family (doc_model_auc,
# doc_model_pr_sweep, doc_model_brier, doc_fleiss_models,
# doc_langid_report), the association family (events_chi2_independence,
# events_theils_u, lineitem_spearman, lineitem_kendall_tau,
# events_fd_profile), the graph loops (parts_copurchase_kcore,
# parts_seed_distance, parts_copurchase_lpa), ER blocking
# (parts_phonetic_blocks, customer_sorted_neighborhood), the SGNS trio
# tail (doc_sppmi_matrix, doc_negative_sampling), privacy
# (customer_t_closeness), store/plumbing certifications
# (events_topk_store, doc_media_decode), product analytics
# (events_top_paths, events_stickiness, events_fano,
# events_markov_entropy), lineitem_weighted_p90 — plus doc_hapax_ratio
# and orders_mase from the r7 build session. Re-cert candidates from
# this session's refactors, all re-driven green against unchanged
# oracles: lineitem_weighted_median (delegates to
# grouped_weighted_quantile), doc_skipgram_cooc (_skipgram_pairs
# factored out), hm_entries' incremental sibling (checkpointed
# restricted log — unit-certified path, test_incremental 4/4).
# Second continuation wave (this session, drive_gates-green on
# registration; the 16 listed FIRST below rotated into the window
# above late in the session — the rest queue for r8):
# events_permutation_test (md5-seeded Fisher
# re-randomization, add-one p from exact replicate counts) and
# events_fdr_bh (integer-exact Benjamini–Hochberg step-up over those
# rational p-values — no float enters the reject decision);
# events_delta_ratio (delta-method ratio-metric z-test, per-unit
# clustered) and events_ab_power (MDE from the split's own moments —
# the design readout); doc_model_lift (decile lift/cumulative-gains
# table, int64 band assignment over the distributed global rank);
# orders_holt_forecast (Holt linear trend: aggregate-to-tiny then
# the sequential recursion in applyInPandas, oracle = the identical
# op sequence as a DuckDB recursive CTE, matched bit-for-bit);
# parts_community_modularity (Newman Q of the LPA communities,
# integer-exact numerator/denominator, one float division);
# events_funnel_wilson (Wilson 95% intervals on the funnel's step
# conversions — row-wise closed form, z as a literal);
# events_eb_shrinkage (James-Stein pooling diagnostics, quantized-
# decimal cross-unit sums) and events_weighted_ess (Kish ESS +
# design effect from exact weight moments); events_cohort_ltv
# (cumulative value per cohort member by day age, fixed-denominator
# curves, TZ-sweep-pinned); doc_hellinger_sources (metric companion
# of the JSD monitor, quantized Bhattacharyya terms);
# events_type_stationary (power-iteration stationary distribution of
# the type Markov chain, 8 unrolled steps in the oracle);
# events_sequential_welch (group-sequential monitoring with
# O'Brien-Fleming boundaries — the peeking correction, cumulative
# exact-moment looks, TZ-sweep-pinned); parts_link_prediction
# (Adamic-Adar over the co-purchase graph — degree-capped wedge
# pivots, quantized 1/ln(deg) terms, top-50 non-edges);
# doc_score_quantile_norm (batch-effect correction: per-source vs
# pooled decile knots from grouped_quantile_table — all deciles in
# ONE running-sum pass, integer-exact picks); events_ab_layers
# (layered-experiment orthogonality: closed-form 2x2 chi-squared on
# the joint salt assignment, exact up to one division);
# doc_tokenizer_fertility (BPE tokens/word + chars/token per lang via
# the certified Pandas-UDF encoder vs the replace-chain oracle);
# events_srm_segments (per-surface sample-ratio check — catches
# differential logging loss the global 50/50 hides);
# emb_centroid_drift (per-label cosine/L2 between id-parity half
# centroids — the embedding-geometry A/A self-check; registry 300);
# events_user_powerlaw (CSN power-law MLE of the activity tail,
# quantized ln terms) and doc_source_simpson (unbiased Simpson
# diversity + effective vocabulary, integer-exact);
# doc_source_vocab_overlap (pairwise vocabulary Jaccard — the
# duplicated-crawl screen at source grain); events_uplift_deciles
# (per-band treatment-minus-control over the score rank — the
# targeting readout with its built-in A/A placebo);
# emb_norm_profile (norm-collapse screen: quantized mean + exact
# p50/p90 norms) and events_funnel_latency (time-to-convert p50/p90
# per step — both consumers of grouped_quantile_table);
# emb_balanced_sample (deterministic class rebalancing via an
# integer-exact md5 threshold — no rand(), no float fractions);
# lineitem_price_deciles (the quantile-table primitive on the big
# fact, benched at 1.7 s for all nine exact deciles at sf0.1);
# events_event_study (per-day Welch panel — does an effect grow or
# decay; TZ-sweep-pinned day labels); supplier_nation_hhi
# (supply-risk Herfindahl per nation, integer-exact); parts_item_cf
# (item-item cosine CF over the order-part bipartite graph — scores
# the observed edges, the complement of the AA non-edge ranker);
# orders_repeat_cycle (exact p50/p90 purchase-cycle days per segment
# via the quantile table; TZ-sweep-pinned); events_topk_stability
# (leaderboard churn: consecutive-day top-20 Jaccard, gap-safe
# calendar day-index join; TZ-sweep-pinned); doc_bigram_coverage
# (Zipf-compressibility of the phrase distribution: the heavy-
# coverage construction over the corpus bigram aggregate);
# events_growth_accounting (DAU decomposition into new/retained/
# resurrected + churned — calendar-lag classification,
# TZ-sweep-pinned); events_daily_quantiles (exact daily p50/p90
# bands — the percentile-trend dashboard without sketch wobble);
# doc_quality_length_rho (the confounder screen: Spearman of quality
# score vs raw length per language — is the filter just a length
# filter in a costume); emb_class_separability (silhouette proxy:
# mean cosine to own vs global centroid per label, fully quantized);
# doc_pii_by_source (the compliance dashboard row: PII density per
# feed over the planted fixture); events_mix_shift (Theil-Sen slope
# of each type's DAILY SHARE in ppm — volume-deconfounded trend).


# Window-rotation invariants (VERDICT r4 task 7): exactly the driver's
# 50 slots, no duplicates, and every name registered — a typo'd name
# must fail HERE, not silently fall through to the back via the
# dict-merge fallback below.
assert len(_WINDOW) == 50, f"driver checks exactly 50 queries, got {len(_WINDOW)}"
assert len(set(_WINDOW)) == len(_WINDOW), "window contains duplicates"
_unregistered = [n for n in _WINDOW if n not in _MERGED]
assert not _unregistered, f"window names not registered: {_unregistered}"

_ALL: dict[str, tuple] = {name: _MERGED[name] for name in _WINDOW}
_ALL.update({k: v for k, v in _MERGED.items() if k not in _ALL})
assert len(_ALL) == len(_MERGED), "window must not drop or duplicate queries"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the M1-M9 entries fold
    over the derived hypermap event log (decode → materialize)."""
    from hypermap_etl_spark.plans.hm_queries import hm_entries

    return hm_entries(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _ALL.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _ALL.items() if sql is not None}
