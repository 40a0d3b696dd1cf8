"""JSONL document corpus source/sink — the interchange format training
pipelines actually exchange (one JSON object per line, gzip-friendly,
streamable by any loader).

Reads are SCHEMA-PINNED: at 100 TB, schema inference would scan the
corpus once just to guess types (and can guess differently per
partition); an explicit StructType makes the read one pass, gives
Catalyst column pruning into the JSON scan (Spark's JacksonParser
skips unprojected fields), and turns corrupt lines into a quarantine
column instead of a job failure (PERMISSIVE +
``columnNameOfCorruptRecord`` — the same skip-don't-fail posture as
the ABI decode path, SURVEY §7.4.6).

The writer is the inverse of ``cli.py curate --format jsonl``: one
directory per shard when a shard column is present, so a distributed
trainer maps shards to data-loader workers without listing files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

CHUNKS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("chunk_id", T.LongType()),
        T.StructField("chunk_text", T.StringType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("pack_id", T.LongType()),
    ]
)

_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCS_JSONL_SCHEMA,
    drop_corrupt: bool = True,
) -> DataFrame:
    """Schema-pinned JSONL read.

    ``drop_corrupt`` (default) uses DROPMALFORMED — bad lines vanish at
    the scan, no quarantine column, and downstream plans never trip
    Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction. With
    ``drop_corrupt=False`` the read is PERMISSIVE and corrupt lines
    surface in a ``_corrupt_record`` column for inspection (note
    Spark's documented caveat: cache() before queries that reference
    ONLY that column)."""
    if drop_corrupt:
        return (
            spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
        )
    # fresh StructType: StructType.add MUTATES the receiver, which
    # would append the quarantine column to the shared module-level
    # schema once per call
    full = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )


def corrupt_count(
    spark: SparkSession, path: str, schema: T.StructType = DOCS_JSONL_SCHEMA
) -> int:
    """Number of lines that do not parse under ``schema`` — the ingest
    health number a pipeline alerts on.

    Spark refuses queries that project ONLY the internal corrupt-record
    column from a raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN), so
    count physical lines via the text source and subtract the
    well-formed rows — two cheap scans, no caching requirement."""
    total = spark.read.text(path).count()
    good = read_jsonl(spark, path, schema, drop_corrupt=True).count()
    return int(total - good)


def write_jsonl(
    df: DataFrame, path: str, shard_col: str | None = None
) -> None:
    """Write a frame as JSONL; with ``shard_col``, one directory per
    shard (dynamic partitioned write — the layout a distributed
    trainer's data loader maps to workers)."""
    w = df.write.mode("overwrite")
    if shard_col is not None:
        w = w.partitionBy(shard_col)
    w.json(path)
