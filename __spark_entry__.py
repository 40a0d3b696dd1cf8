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

# The driver's correctness gate runs only the FIRST 50 queries() entries
# (dict order), so ordering is evidence policy: lead with the gates that
# lack a green driver row. Round-5 window (VERDICT r4 task 3): first the
# two r4-red gates, now flattened to scalar columns (emb_label_centroids,
# emb_quantize), then the eleven gates NEW in r5 (LSH/IVF recall + PCA
# certificate derived-property gates, char-grain ExactSubstr spans +
# surgery, the distributed suffix array + LCP, BPE first-merge), the
# fourteen r5-continuation gates (Unicode normalization, C4 line cleaning,
# embedding decontamination, incremental signature-store dedup,
# packing-fill report, persisted-IVF-index recall, strict packing,
# feature-hashing embeddings, DataSketches HLL distinct rollup,
# transition-graph PageRank, trained-quality-filter scoring,
# snapshot diff, interpolated bigram LM, PQ-ANN recall), then
# the six gates never yet in any driver window; then the 17 gates whose
# only green row is the r2 artifact (oldest evidence). Gates left
# outside are all r4-green (CORRECTNESS_r04.json) plus the r3/r4-green
# remainder (including the
# fourteen re-cert slots the continuation gates displaced: events_asof_join,
# events_interval_counts, events_salted_counts, events_kmv_users,
# top3_customers_per_segment, events_tumbling_window, orders_cube,
# orders_rollup, q19_disjunctive_revenue, q14_promo_share,
# q9_product_profit, q8_market_share, q6_revenue_delta,
# q4_order_priority — all r3-green, operators untouched; the
# continuation gates consumed every re-cert slot, which is the right
# trade: a first-time row beats re-certifying an already-green gate —
# every registered gate has a green driver row in some round once
# this window lands.
_WINDOW: list[str] = [
    # r4-red, flattened this round — need green rows (VERDICT task 1)
    "emb_label_centroids",
    "emb_quantize",
    # new this round (VERDICT tasks 4/5): char-grain ExactSubstr spans,
    # and derived-property gates for the approximate/iterative
    # operators (LSH + IVF recall vs the exact top-k, PCA certificate)
    "emb_lsh_recall",
    "emb_ivf_recall",
    "emb_quantized_recall",
    "emb_pca_variance",
    "emb_kmeans_quality",
    "doc_dup_char_spans",
    "doc_suffix_array",
    "doc_sa_lcp",
    "doc_bpe_first_merge",
    "doc_winnow_pairs",
    "doc_despanned_char",
    # new in r5 continuation: normalization, C4 line cleaning,
    # semantic decontamination, incremental signature-store dedup
    "doc_normalized",
    "doc_c4_clean",
    "emb_decontam",
    "doc_incremental_pairs",
    "doc_pack_efficiency",
    "emb_ivf_index_recall",
    "doc_packed_strict",
    "doc_hash_embed",
    "events_hll_users",
    "events_type_pagerank",
    "doc_model_scores",
    "doc_snapshot_diff",
    "doc_bigram_logprob",
    "emb_pq_recall",
    # never driver-checked in any round
    "doc_dsir_weights",
    "doc_top_bigrams",
    "events_page_deep",
    "events_user_trend",
    "orders_median_price",
    "parts_price_percentiles",
    # new in the r5 build session: HTML extraction, CCNet quality
    # buckets, Misra-Gries heavy hitters, skew-safe salted join —
    # first-time rows displace four untouched-since-r2 star-join
    # re-certs (customer_nation_stats, orders_with_big_lineitem,
    # nations_without_customers, top_orders_denorm — all r2-green,
    # simplest SQL shapes in the registry)
    "doc_html_text",
    "doc_ppl_buckets",
    "events_heavy_hitters",
    "events_salted_join",
    "doc_sentence_dedup",
    "doc_kn_logprob",
    "doc_gopher_quality",
    "events_pseudonymized",
    "doc_containment_pairs",
    "events_value_psi",
    # new in the r5 continuation session: the Deequ-style constraint
    # suite (first-time evidence displaces doc_token_stats — pure
    # counting, untouched since r2, operator shared with r4-green
    # doc_vocab)
    "orders_constraints",
    # leakage-safe group split (displaces doc_quality — the quality
    # dimension keeps three fresher in-window gates: doc_gopher_quality,
    # doc_model_scores, doc_ppl_buckets)
    "doc_group_split",
    # embedding-space outlier screen (displaces doc_fingerprints —
    # fingerprint machinery keeps in-window coverage via
    # doc_winnow_pairs, which exercises the same rolling-hash stack)
    "emb_outliers",
    # custom GROUPING SETS (displaces doc_langid — langid heuristic
    # untouched since r2, its token machinery in-window via
    # doc_gopher_quality/doc_kn_logprob)
    "events_grouping_sets",
    # SCD2 dimension fold (displaces doc_exact_dedup — same md5-keyed
    # groupBy machinery as r4-green doc_dedup_survivors)
    "customer_scd2",
    # unigram-LM tokenizer seed stage (displaces doc_simhash_pairs —
    # simhash keeps its r2-green row; first-time evidence wins)
    "doc_unigram_seed",
    # cross-document boilerplate removal (displaces emb_ann_topk, the
    # final tail re-cert: its exactness certificate is r2-green and the
    # operator also has in-window recall gates emb_lsh_recall /
    # emb_ivf_recall / emb_pq_recall riding the same stack — with this
    # the whole 50-slot window is first-time evidence)
    "doc_boilerplate",
    # (window saturated at this point — every slot above is a gate
    # with NO driver row yet. Session gates added after saturation
    # queue for the r6 window: events_approx_percentiles,
    # customer_k_anonymity, events_resample_ffill, events_bloom_probe,
    # lineitem_profile, events_lead_lag_ntile, customer_fuzzy_pairs,
    # events_sampled_quantiles, events_moving_avg, doc_sentence_chunks,
    # doc_pmi_pairs, doc_char_entropy, doc_bff_dedup, and the final
    # build wave: events_key_skew, events_join_estimate,
    # events_cusum_daily, doc_balanced_shards, doc_shard_balance,
    # emb_jl_project, doc_epoch_plan, doc_luhn_check,
    # doc_script_profile, doc_keyword_tags, doc_keyword_tags_ac,
    # doc_zipf_fit — plus any later additions at the back of the
    # registry merge.)
    # oldest evidence: green only in the r2 artifact
    # (parts_size_filter, activity_union, doc_simhash_sigs,
    # emb_knn_label, doc_ngram_pairs and emb_neardup displaced too —
    # fifth through tenth new gates; the displaced star shapes are plan-pinned,
    # doc_simhash_pairs / doc_containment_pairs stay in-window
    # covering the simhash and inverted-index machinery, and
    # emb_knn_label's similarity.py was untouched all session)
]

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
