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
# lack a green driver row. Round-4 window: the full hm_* fold (the
# reference's core capability, SURVEY §2.9 — VERDICT r3 task 2 asks for
# a green r4 row for EVERY hm_* query), then the three oracles whose
# HUGEINT typing was fixed this round, then every remaining
# never-driver-checked gate, plus doc_minhash_pairs — its r2 green row
# certifies the old explode/groupBy signature implementation, and the
# r4 map-only rewrite needs a fresh driver row. The 47 star rows
# already green in CORRECTNESS_r03.json and the other doc/emb gates
# green in r2 rotate to the back. Never-checked gates left outside
# (sf0.01 parity-verified, candidates for the r5 window):
# events_page_deep (sibling events_page2 is r3-green, plan pinned),
# doc_top_bigrams (plain bigram count, displaced by doc_minhash_pairs),
# and the two gates added late in r4 (events_user_trend,
# doc_dsir_weights).
_WINDOW: list[str] = [
    # hm_* — decode, serving shapes, M1-M9 materialization fold
    "hm_decode_roundtrip",
    "hm_enrich_format",
    "hm_status_counts",
    "hm_last_event",
    "hm_events_page2",
    "hm_entry_history",
    "hm_get_entry",
    "hm_entries",
    "hm_fullnames",
    "hm_subtree_sizes",
    "hm_descendants",
    # red in r3 (oracle typing), fixed this round — need green rows
    "q12_priority_shipping",
    "events_type_pivot",
    "events_type_unpivot",
    # never driver-checked in any round
    "lineitem_price_histogram",
    "lineitem_profile",
    "events_cms_counts",
    "events_lead_lag_ntile",
    "customer_fuzzy_pairs",
    "doc_dup_clusters",
    "doc_dedup_survivors",
    "doc_dedup_best",
    "doc_dup_spans",
    "doc_despanned",
    "doc_split",
    "doc_temperature_mix",
    "doc_chunks",
    "doc_tfidf_top_terms",
    "doc_unigram_logprob",
    "doc_bm25_search",
    "doc_length_percentiles",
    "doc_stratified_sample",
    "doc_weighted_sample",
    "doc_minhash_pairs",
    "doc_packed",
    "doc_train_filter",
    "doc_vocab",
    "doc_source_mix",
    "doc_source_caps",
    "doc_shards",
    "doc_repetition",
    "doc_pii_tags",
    "doc_pii_redact",
    "doc_decontam",
    "doc_segment_dedup",
    "media_metadata",
    "emb_semantic_survivors",
    "emb_label_centroids",
    "emb_quantize",
    "emb_covariance",
]

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
