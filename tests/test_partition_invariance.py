"""Partition-count invariance of the rounded-double gates.

The driver builds its OWN SparkSession, so spark.sql.shuffle.partitions
may be anything (Spark's default is 200; ours is 32). Integer/decimal
gates are exact under any partitioning, but gates whose outputs round
floating-point sums could in principle flip a last digit when the
summation ORDER changes with the partition count. This pins the
guarantee empirically at gate scale for every float-rounding gate
family: identical stringified results at 7, 32, and 200 shuffle
partitions.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"

# every gate whose output includes a ROUND(float-sum) column
_FLOAT_GATES = [
    ("star_queries", "events_user_trend"),
    ("star_queries", "events_value_outliers"),
    ("star_queries", "events_moving_avg"),
    ("star_queries", "parts_price_percentiles"),
    ("star_queries", "orders_median_price"),
    ("doc_queries", "emb_covariance"),
    ("doc_queries", "doc_unigram_logprob"),
    ("doc_queries", "doc_dsir_weights"),
    ("doc_queries", "doc_tfidf_top_terms"),
    ("doc_queries", "emb_ann_topk"),
    # r5: gramian-trace rounding + centroid means must not flip a last
    # digit when partial-sum order changes with the partition count;
    # the recall gates round recall before thresholding; the suffix
    # array's distributed ranks must not depend on n_parts at all
    ("doc_queries", "emb_pca_variance"),
    ("doc_queries", "emb_label_centroids"),
    ("doc_queries", "emb_lsh_recall"),
    ("doc_queries", "doc_suffix_array"),
    # r5 continuation: per-pair/per-row rounded floats (cosine max,
    # exact-set jaccard, long-sum fill ratio) are invariant by
    # construction — pinned here so a future rewrite (e.g. a summed
    # similarity) cannot silently lose the property
    ("doc_queries", "emb_decontam"),
    ("doc_queries", "doc_incremental_pairs"),
    ("doc_queries", "doc_pack_efficiency"),
    ("doc_queries", "doc_hash_embed"),
    # r5 continuation: iterated double sums (power iteration) rounded
    # at the end; the HLL gate's tolerance boolean must absorb the
    # union-tree estimate wobble under any layout
    ("star_queries", "events_type_pagerank"),
    ("star_queries", "events_hll_users"),
    ("doc_queries", "doc_model_scores"),
    ("doc_queries", "doc_bigram_logprob"),
    # r5 build session: NTILE over the rounded LM score — a last-digit
    # flip in mean_logprob would reorder the per-lang ranking and move
    # a bucket boundary; the MG gate's containment/error booleans must
    # hold under any layout (estimates themselves are layout-dependent
    # by design — only the bound is pinned)
    ("doc_queries", "doc_ppl_buckets"),
    ("doc_queries", "doc_kn_logprob"),
    ("star_queries", "events_heavy_hitters"),
    # r5 build session late wave: per-bin PSI terms are rounded floats
    # over layout-independent integer bin counts; containment is a
    # per-pair ratio of exact intersection counts — both pinned
    ("star_queries", "events_value_psi"),
    ("doc_queries", "doc_containment_pairs"),
    # r5 continuation: dist/z are rounded float sums and the outlier
    # verdict compares the ROUNDED z, so layout must never flip it;
    # the constraint suite's observed fractions are exact-integer
    # ratios (invariant by construction — pinned against a rewrite)
    ("doc_queries", "emb_outliers"),
    ("star_queries", "orders_constraints"),
    # r5 continuation: GK percentile estimates are layout-dependent by
    # design; the gate's rank-bound booleans must hold under any layout
    ("star_queries", "events_approx_percentiles"),
    # r5 continuation: one ln() over exact-integer count ratios, rounded
    ("doc_queries", "doc_pmi_pairs"),
    # per-row float sum over the char alphabet, rounded (shuffle-free,
    # pinned against a rewrite that aggregates across rows)
    ("doc_queries", "doc_char_entropy"),
    # this session: key-distribution entropy is a rounded float sum
    # over per-key counts; the waterfill line t is a double quotient of
    # ordered cumulative sums; the shard rank rides range-partitioning
    # (invariant only BECAUSE the order is total — pinned); JL values
    # are per-row ordered folds; the join-estimate verdicts compare
    # exact integers but the bound mixes e/width floats
    ("star_queries", "events_key_skew"),
    ("star_queries", "events_join_estimate"),
    ("doc_queries", "doc_epoch_plan"),
    ("doc_queries", "doc_balanced_shards"),
    ("doc_queries", "doc_shard_balance"),
    ("doc_queries", "emb_jl_project"),
    # late build wave: float sums rounded at the edge (HHI shares,
    # pareto weight sums, autocorr/benford/winsorize/cusum/mad
    # statistics); gini is integer-exact but rides the range-partition
    # rank, pinned for the same reason as balanced_shards
    ("doc_queries", "doc_source_hhi"),
    ("star_queries", "orders_pareto"),
    ("star_queries", "events_user_gini"),
    ("star_queries", "events_autocorr"),
    ("star_queries", "events_benford"),
    ("star_queries", "events_winsorized"),
    ("star_queries", "events_cusum_daily"),
    ("star_queries", "events_mad_outliers"),
    ("star_queries", "events_fd_histogram"),
    ("doc_queries", "doc_zipf_fit"),
    ("doc_queries", "doc_ngram_novelty"),
    ("doc_queries", "doc_lexical_diversity"),
    ("doc_queries", "doc_token_pctrank"),
    # r6 wave: bootstrap replicate means are exact-decimal sums divided
    # once in double, percentiled over R values; EWMA/MI/readability/
    # flesch are per-row literal-weight double expressions; the KMV
    # jaccard is a ratio of exact counts from layout-independent
    # sketches; CDC ratios are exact-count quotients; the weighted
    # median rides the range-partition running sum (invariant only
    # BECAUSE offsets derive from actual slice contents — pinned)
    ("star_queries", "events_bootstrap_ci"),
    ("star_queries", "events_ewma_daily"),
    ("star_queries", "events_type_value_mi"),
    ("star_queries", "events_kmv_overlap"),
    ("star_queries", "lineitem_weighted_median"),
    ("star_queries", "events_session_windows"),
    ("doc_queries", "doc_cdc_dedup"),
    ("doc_queries", "doc_readability"),
    ("doc_queries", "doc_prefix_pairs"),
    # r6 continuation: RRF scores are integer-rank arithmetic but the
    # LEG rankings rank rounded float sums (BM25 score, hash-embed
    # cosine) — a layout flip in either leg would reorder the fusion;
    # hard-negative sims are per-pair ordered folds; calibration bins
    # floor rounded sigmoid scores and average them per bin; Q7
    # revenue is an exact-decimal sum surfaced as double
    ("doc_queries", "doc_hybrid_rrf"),
    ("doc_queries", "emb_hard_negatives"),
    ("doc_queries", "doc_calibration"),
    ("star_queries", "q7_volume_shipping"),
    # continuation wave 2: permutation diffs are exact-decimal sums
    # divided once in double per replicate, compared (not summed)
    # against the observed diff; the BH decision is pure int64; the
    # delta/power/EB/ESS/Wilson/LTV/lift/Holt/modularity statistics
    # all follow the exact-moments-then-one-double-expression or
    # quantize-then-exact-sum disciplines — pinned so a rewrite that
    # accumulates raw doubles across rows cannot land silently
    ("star_queries", "events_permutation_test"),
    ("star_queries", "events_fdr_bh"),
    ("star_queries", "events_delta_ratio"),
    ("star_queries", "events_ab_power"),
    ("star_queries", "events_eb_shrinkage"),
    ("star_queries", "events_weighted_ess"),
    ("star_queries", "events_funnel_wilson"),
    ("star_queries", "events_cohort_ltv"),
    ("star_queries", "orders_holt_forecast"),
    ("star_queries", "parts_community_modularity"),
    ("doc_queries", "doc_model_lift"),
    # sequential looks: cumulative exact-decimal moments, one double
    # expression per look; stationary chain: quantized v*M products
    ("star_queries", "events_sequential_welch"),
    ("star_queries", "events_type_stationary"),
    ("doc_queries", "doc_hellinger_sources"),
    # AA terms quantize before the per-pair sum; the top-k cut orders
    # by the ROUNDED score with a total id tie-break
    ("star_queries", "parts_link_prediction"),
    # quantile-norm knots ride the range-partition running sum
    # (invariant only BECAUSE offsets derive from actual slice
    # contents — the weighted-median pin, same reason)
    ("doc_queries", "doc_score_quantile_norm"),
    # centroid drift / fertility: quantized component sums; exact-long
    # token counts with two final divisions
    ("doc_queries", "emb_centroid_drift"),
    ("doc_queries", "doc_tokenizer_fertility"),
    # powerlaw: quantized ln terms; simpson: pure integers + two divides
    ("star_queries", "events_user_powerlaw"),
    ("doc_queries", "doc_source_simpson"),
    # uplift bands ride the distributed rank; vocab jaccard is
    # integer-exact up to one division — both pinned vs rewrites
    ("star_queries", "events_uplift_deciles"),
    ("doc_queries", "doc_source_vocab_overlap"),
    # norm profile: per-row folds rounded, quantized-decimal mean,
    # range-partition quantile knots
    ("doc_queries", "emb_norm_profile"),
    ("star_queries", "events_funnel_latency"),
    # keep decisions are pure integer hash inequalities
    ("doc_queries", "emb_balanced_sample"),
    ("star_queries", "lineitem_price_deciles"),
    ("star_queries", "events_event_study"),
    ("star_queries", "supplier_nation_hhi"),
    ("star_queries", "parts_item_cf"),
    ("star_queries", "orders_repeat_cycle"),
    ("star_queries", "events_topk_stability"),
    # coverage curve rides the range-partition running sum
    ("doc_queries", "doc_bigram_coverage"),
    ("star_queries", "events_daily_quantiles"),
    ("doc_queries", "doc_quality_length_rho"),
    ("doc_queries", "emb_class_separability"),
    ("doc_queries", "doc_pii_by_source"),
    ("star_queries", "events_mix_shift"),
]


def _snap(spark, module, name):
    import importlib

    mod = importlib.import_module(f"hypermap_etl_spark.plans.{module}")
    fn = getattr(mod, name)
    # bypass plan_cache: the cached frame would pin the partitioning it
    # was first planned under
    inner = getattr(fn, "__wrapped__", fn)
    df = inner(spark, SF)
    return sorted(tuple(str(v) for v in row) for row in df.collect())


@pytest.mark.parametrize("module,name", _FLOAT_GATES)
def test_float_gate_partition_invariant(spark, module, name):
    from hypermap_etl_spark.util import release_persisted

    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        snaps = []
        for parts in ("7", "32", "200"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            snaps.append(_snap(spark, module, name))
            release_persisted()
        assert snaps[0] == snaps[1] == snaps[2], name
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
