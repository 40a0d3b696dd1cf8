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

_ALL: dict[str, tuple] = {**STAR_QUERIES, **HM_QUERIES, **DOC_QUERIES}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the M1-M9 entries fold
    over the derived hypermap event log (decode → materialize)."""
    from hypermap_etl_spark.plans.hm_queries import hm_entries

    return hm_entries(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _ALL.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _ALL.items() if sql is not None}
