"""ORC corpus source/sink — the third columnar interchange format
beside parquet (Hive/Trino shops hand over ORC; an engine claiming
"point it at your lake" must read it without a conversion pass).

Posture differences from the text sources (jsonl.py / csv.py):

- ORC is SELF-DESCRIBING (typed footer), so schema pinning here is a
  COMPATIBILITY CONTRACT, not an inference dodge: the declared schema
  is enforced against the footer per file — name-matched, order-free
  — and a file whose column TYPE drifted fails loudly instead of
  silently casting (the lossy-cast guard posture of
  sources/evolution.py). Extra columns in the file are pruned; a
  missing non-nullable column is an error, a missing nullable one is
  typed-NULL filled.
- Predicate pushdown and column pruning work like parquet (ORC
  carries min/max stripe statistics) — the read stays declarative and
  Catalyst pushes filters to the stripe level.

write_orc mirrors write_jsonl's per-shard layout: one directory per
call, optional partition columns, so downstream consumers see the
same contract whichever format they asked for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hypermap_etl_spark.sources.jsonl import DOCS_JSONL_SCHEMA

DOCS_ORC_SCHEMA: T.StructType = DOCS_JSONL_SCHEMA


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCS_ORC_SCHEMA,
) -> DataFrame:
    """Schema-contracted ORC read: conform the file's self-described
    schema to ``schema`` — prune extras, typed-NULL-fill missing
    NULLABLE columns, and refuse type drift (a silent cast at read
    time is how a lake quietly corrupts downstream decimals).
    """
    raw = spark.read.orc(path)
    have = {f.name: f for f in raw.schema.fields}
    cols = []
    for f in schema.fields:
        g = have.get(f.name)
        if g is None:
            if not f.nullable:
                raise ValueError(
                    f"read_orc: required column {f.name!r} missing from {path}"
                )
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            continue
        if g.dataType != f.dataType:
            raise ValueError(
                f"read_orc: column {f.name!r} is {g.dataType.simpleString()} "
                f"in the file but the contract says "
                f"{f.dataType.simpleString()} — refusing the silent cast"
            )
        cols.append(F.col(f.name))
    return raw.select(*cols)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Columnar ORC sink with the same directory contract as the
    parquet/jsonl sinks; partition columns become dirs (the layout
    pruning story carries over unchanged)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
