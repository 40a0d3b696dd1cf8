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

# ROUND-11 WINDOW. The driver's correctness gate runs only the FIRST
# 50 queries() entries (dict order). This window executes VERDICT r10
# task 1 verbatim:
#   (a) re-certs for EVERY gate whose operator the r10 optimizer
#       rewrote but whose r10 window slot was set before the rewrite
#       (the gap VERDICT r10 flagged): the M1-M9 fold (hm_entries,
#       hm_fullnames, hm_subtree_sizes, hm_descendants,
#       hm_entry_history), the retrieval stack (doc_hybrid_rrf,
#       doc_hash_embed, doc_bm25_search), the quantile primitives
#       (lineitem_weighted_median/_p90, lineitem_price_deciles), the
#       co-purchase graph family (parts_copurchase_lpa/triangles/
#       kcore, parts_seed_distance, parts_link_prediction,
#       parts_item_cf), and doc_cdc_dedup;
#   (b) re-certs for every gate whose operator changed THIS round:
#       operators/similarity.py (single-slice model-table writes,
#       min_by centroid pick) → the 4 emb_ivf*/ivfpq gates;
#       operators/textstats.py (staged bm25 tokenize, expression-chain
#       semantic leg) → doc_bm25_snippets (hybrid/hash_embed/bm25 are
#       already in (a)); operators/suffixarray.py (seed width +
#       broadcast-pruned refinement rounds) → doc_suffix_array,
#       doc_sa_lcp; operators/multimodal.py (explicit Paeth
#       branch, ADVICE r10) → doc_media_pixels, doc_media_ahash;
#       operators/corpus.py + plans/star_queries.py changes are
#       covered by the curation-family slots in (c) and the graph
#       family in (a);
#   (c) the r4-stale tail, curation-family first (they gate the exact
#       operators curate_pipeline composes, so they double as the
#       curate-change re-certs). 23 of the 41 r4-stale gates fit; the
#       17 leftovers (customer_fuzzy_pairs, emb_covariance,
#       events_cms_counts, events_lead_lag_ntile,
#       events_type_pivot/unpivot, hm_decode_roundtrip,
#       hm_enrich_format, hm_events_page2, hm_get_entry, hm_last_event,
#       hm_status_counts, lineitem_price_histogram, lineitem_profile,
#       q12_priority_shipping, doc_tfidf_top_terms,
#       doc_weighted_sample) head the r12 rotation.
# No new registrations this round (optimization round). Registry
# unchanged: 327 gates.
_WINDOW: list[str] = [
    # ---- (a) re-certs: the r10 optimizer's rewrites ----
    "hm_entries",
    "hm_fullnames",
    "hm_subtree_sizes",
    "hm_descendants",
    "hm_entry_history",
    "doc_hybrid_rrf",
    "doc_hash_embed",
    "doc_bm25_search",
    "lineitem_weighted_median",
    "lineitem_weighted_p90",
    "lineitem_price_deciles",
    "parts_copurchase_lpa",
    "parts_copurchase_triangles",
    "parts_copurchase_kcore",
    "parts_seed_distance",
    "parts_link_prediction",
    "parts_item_cf",
    "doc_cdc_dedup",
    # ---- (b) re-certs: operators changed this round (r11) ----
    "emb_ivf_recall",
    "emb_ivf_probe_sweep",
    "emb_ivf_index_recall",
    "emb_ivfpq_recall",
    "doc_bm25_snippets",
    "doc_suffix_array",
    "doc_sa_lcp",
    "doc_media_pixels",
    "doc_media_ahash",
    # ---- (c) r4-stale tail, curation family first ----
    "doc_train_filter",
    "doc_dedup_survivors",
    "doc_dup_clusters",
    "doc_dup_spans",
    "doc_despanned",
    "doc_chunks",
    "doc_packed",
    "doc_split",
    "doc_shards",
    "doc_pii_redact",
    "doc_pii_tags",
    "doc_minhash_pairs",
    "doc_dedup_best",
    "doc_decontam",
    "doc_length_percentiles",
    "doc_repetition",
    "doc_segment_dedup",
    "doc_source_caps",
    "doc_source_mix",
    "doc_stratified_sample",
    "doc_temperature_mix",
    "doc_unigram_logprob",
    "doc_vocab",
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
