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

# ROUND-9 WINDOW. The driver's correctness gate runs only the FIRST 50
# queries() entries (dict order). This window executes VERDICT r8 task
# 1 verbatim — close the evidence ledger:
#   (a) the ENTIRE 14-gate never-checked backlog (the 13 deferred by
#       name in the r8 window comment + events_quantile_store, the
#       documented r8 freeze exception) — after this window the
#       never-checked backlog is ZERO;
#   (b) re-certs for every gate whose operator changed in r8/r9: the
#       hm_* fold family (operators/materialize.py changed in r8 —
#       delta hooks — and AGAIN this session: persisted isPlaceholder
#       flag per ADVICE r9-high, retry-bounded + manifest-committed
#       pending store), the drift-store gates (refactored onto
#       streaming/store.py in r8), and doc_media_decode
#       (operators/multimodal.py gained the audio parsers this
#       session);
#   (c) all 17 gates whose newest driver row is r2 (the oldest
#       evidence in the ledger), then the 10 oldest-evidence r3 gates
#       that fit — core TPC-H + sessionization first.
# Registration is frozen except ONE verdict-demanded gate (VERDICT r8
# task 7): doc_media_audio — real WAV/RIFF + MP3 frame-header parsing
# over a fixture whose metadata deliberately lies, so only true byte
# parsing matches the oracle. Post-r9 registry: 322 gates, backlog 0.
_WINDOW: list[str] = [
    # ---- (a) the 14-gate never-checked backlog ----
    "doc_model_pr_sweep",
    "lineitem_kendall_tau",
    "events_theils_u",
    "parts_copurchase_lpa",
    "events_fano",
    "events_hour_profile",
    "events_type_stationary",
    "events_ab_welch_robust",
    "events_srm",
    "lineitem_weighted_p90",
    "orders_repeat_cycle",
    "doc_source_simpson",
    "emb_ivf_probe_sweep",
    "events_quantile_store",
    # ---- the one new gate (VERDICT r8 task 7) ----
    "doc_media_audio",
    # ---- (b) re-certs: operators changed in r8/r9 ----
    "hm_entries",
    "hm_entry_history",
    "hm_fullnames",
    "hm_subtree_sizes",
    "hm_descendants",
    "events_drift_verdict",
    "events_drift_ewma",
    "doc_media_decode",
    # ---- (c) the 17 r2-stale gates (oldest evidence first) ----
    "activity_union",
    "customer_nation_stats",
    "doc_exact_dedup",
    "doc_fingerprints",
    "doc_langid",
    "doc_ngram_pairs",
    "doc_quality",
    "doc_simhash_pairs",
    "doc_simhash_sigs",
    "doc_token_stats",
    "emb_ann_topk",
    "emb_knn_label",
    "emb_neardup",
    "nations_without_customers",
    "orders_with_big_lineitem",
    "parts_size_filter",
    "top_orders_denorm",
    # ---- (c) 10 oldest r3-stale rotations that fit ----
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q9_product_profit",
    "events_sessions",
    "events_asof_join",
    "events_retention_cohorts",
    "events_tumbling_window",
    "orders_cube",
    "top3_customers_per_segment",
]

# Remaining rotation debt after r9 (for the r10 window): 37 r3-stale
# gates (q4/q6/q8/q10/q11/q14/q15/q16/q19/q20, events_* window family,
# customer_* set ops, ...) and 48 r4-stale — never-checked backlog is
# ZERO, so future windows are pure freshness rotation plus re-certs
# for whatever operators change.
#
# Staged-but-UNREGISTERED gates (r9 registration freeze; each has a
# driver-style local parity test green at sf0.001 + sf0.01, so r10
# registers any of them by adding one dict line in doc_queries.py's
# DOC_QUERIES): doc_media_video, doc_media_pixels (real PNG pixel
# decode), doc_media_pcm (real WAV sample decode), doc_media_ahash
# (perceptual hash + image near-dup pairs).

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
