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

# ROUND-10 WINDOW. The driver's correctness gate runs only the FIRST
# 50 queries() entries (dict order). This window executes VERDICT r9
# tasks 1-3 verbatim:
#   (a) the 4 media gates staged under the r9 registration freeze
#       (doc_media_pixels/pcm/ahash/video — the only implemented
#       operators with no driver CORRECTNESS row) plus emb_semdedup,
#       the new planted-fixture oracle for semdedup's dominance rule
#       (the one r9 operator with pytest-only evidence);
#   (b) ALL 37 gates whose newest driver evidence is r3 — after this
#       window the staleness histogram has no r3 entries (r11 takes
#       the r4 tail);
#   (c) re-certs for every gate whose operator changed this round:
#       operators/multimodal.py (mvhd v1 short-payload NULL guard,
#       ADVICE r10) → doc_media_decode, doc_media_audio,
#       media_metadata; operators/similarity.py (ivf_index_compact —
#       the serve-path defragmentation hook — plus the semdedup gate's
#       host module) → the emb_ivf_* family + emb_semantic_survivors
#       (also r4-stale).
# Registered this round: the 4 staged media gates + emb_semdedup
# (all demanded by VERDICT r9). Post-r10 registry: 327 gates.
_WINDOW: list[str] = [
    # ---- (a) newly registered: staged media gates + semdedup ----
    "doc_media_pixels",
    "doc_media_pcm",
    "doc_media_ahash",
    "doc_media_video",
    "emb_semdedup",
    # ---- (b) the 37 r3-stale gates ----
    "q4_order_priority",
    "q6_revenue_delta",
    "q8_market_share",
    "q10_returned_items",
    "q11_important_stock",
    "q14_promo_share",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q19_disjunctive_revenue",
    "q20_bulk_suppliers",
    "customer_balance_quartiles",
    "customer_order_distribution",
    "customer_set_ops",
    "events_bloom_probe",
    "events_funnel",
    "events_interval_counts",
    "events_json_extract",
    "events_kmv_users",
    "events_last_event",
    "events_moving_avg",
    "events_page2",
    "events_running_total",
    "events_salted_counts",
    "events_sampled_quantiles",
    "events_status_counts",
    "events_type_bigrams",
    "events_user_daily",
    "events_value_outliers",
    "exclusive_return_suppliers",
    "large_order_customers",
    "nation_pair_volume",
    "orders_rollup",
    "part_min_price_line",
    "parts_size_rank_ties",
    "rich_inactive_customers",
    "small_quantity_revenue",
    "supplier_nation_balance",
    # ---- (c) re-certs: operators changed this round ----
    "doc_media_decode",
    "doc_media_audio",
    "media_metadata",
    "emb_ivf_recall",
    "emb_ivf_probe_sweep",
    "emb_ivf_index_recall",
    "emb_ivfpq_recall",
    "emb_semantic_survivors",
]

# Remaining rotation debt after r10 (for the r11 window): the ~43
# r4-stale gates (doc_* curation family, hm_decode_roundtrip /
# hm_enrich_format / hm_get_entry / hm_last_event / hm_status_counts /
# hm_events_page2, events_cms_counts, events_lead_lag_ntile,
# events_type_pivot/unpivot, lineitem_price_histogram,
# lineitem_profile, q12_priority_shipping, customer_fuzzy_pairs,
# emb_covariance) — the staleness histogram then starts at r5, and
# future windows are pure freshness rotation plus re-certs for
# whatever operators change.

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
