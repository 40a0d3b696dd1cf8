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
# lack a green driver row. Round-4 window: the hm_* fold (the reference's
# core capability, SURVEY §2.9), then every never-driver-checked gate,
# then the three oracles whose HUGEINT typing was fixed this round, then
# the doc/emb LLM-pipeline gates last certified in r2. The 47 star rows
# already green in CORRECTNESS_r03.json rotate to the back.
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
    # never driver-checked in any round
    "lineitem_price_histogram",
    "doc_dup_clusters",
    "doc_dedup_survivors",
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
    "doc_packed",
    "doc_train_filter",
    "doc_vocab",
    "doc_source_mix",
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
    # red in r3 (oracle typing), fixed this round — need green rows
    "q12_priority_shipping",
    "events_type_pivot",
    "events_type_unpivot",
    # LLM-pipeline gates last certified in r2 — re-certify
    "doc_exact_dedup",
    "doc_minhash_pairs",
    "doc_ngram_pairs",
    "doc_simhash_pairs",
    "doc_simhash_sigs",
    "emb_ann_topk",
    "emb_neardup",
    "emb_knn_label",
    # new in r4 (never driver-checked; doc_token_stats and doc_quality
    # rotate out on their green r2 rows to make room)
    "doc_source_caps",
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
