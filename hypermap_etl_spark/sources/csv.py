"""CSV corpus source/sink — the other interchange format pipelines
exchange (spreadsheet-compatible, header-labeled, splittable when
uncompressed).

Same posture as the JSONL source (sources/jsonl.py): reads are
SCHEMA-PINNED — at 100 TB, `inferSchema` is a FULL extra pass over the
corpus just to guess types (unlike JSON inference, CSV inference
cannot sample-skip: it reads everything), and header-only inference
types every column string. An explicit StructType keeps the read one
pass and turns malformed lines into DROPMALFORMED skips or a
PERMISSIVE quarantine column instead of a job failure (the reference's
skip-don't-fail posture, /root/reference/scripts/index-events.ts:186-194
skipped-count accounting).

Multiline quoted fields are OFF by default: `multiLine` makes a CSV
file non-splittable (one task per file, no intra-file parallelism) —
at scale you want line-grain records; enable it only for small dirty
inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hypermap_etl_spark.sources.jsonl import DOCS_JSONL_SCHEMA

DOCS_CSV_SCHEMA: T.StructType = DOCS_JSONL_SCHEMA

_CORRUPT = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCS_CSV_SCHEMA,
    drop_corrupt: bool = True,
    header: bool = True,
    multiline: bool = False,
) -> DataFrame:
    """Schema-pinned CSV read.

    ``drop_corrupt`` (default) uses DROPMALFORMED — lines whose arity
    or types don't match the schema vanish at the scan. CAVEAT (Spark
    CSV column pruning): malformed detection only sees the columns a
    query actually parses, so a bare ``count()`` — which parses none —
    counts raw lines; project the columns you care about, or use
    ``corrupt_count`` for ingest health. With ``drop_corrupt=False``
    the read is PERMISSIVE and malformed lines surface whole in a
    ``_corrupt_record`` column (same caveat as the JSONL source:
    cache() before queries that project ONLY that column)."""
    reader = (
        spark.read.schema(
            schema
            if drop_corrupt
            # fresh StructType: StructType.add MUTATES the receiver
            else T.StructType(
                list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
            )
        )
        .option("header", str(header).lower())
        .option("multiLine", str(multiline).lower())
        # quoted fields with embedded commas/newlines round-trip
        .option("quote", '"')
        .option("escape", '"')
        # distinguish NULL from '': write_csv emits NULL as the \N
        # sentinel and '' as a quoted empty — without this every ''
        # comes back NULL (Spark CSV's nullValue default is "")
        .option("nullValue", "\\N")
    )
    if drop_corrupt:
        return reader.option("mode", "DROPMALFORMED").csv(path)
    return (
        reader.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .csv(path)
    )


def corrupt_count(
    spark: SparkSession, path: str, schema: T.StructType = DOCS_CSV_SCHEMA
) -> int:
    """Number of data lines that do not parse under ``schema`` — the
    ingest health number a pipeline alerts on.

    Uses the PERMISSIVE quarantine column rather than the JSONL
    source's total-minus-good construction: CSV's per-file header lines
    make raw line counts lie, and the quarantine filter forces a
    full-row parse, which sidesteps the column-pruning caveat on
    DROPMALFORMED counts."""
    df = read_csv(spark, path, schema, drop_corrupt=False).cache()
    try:
        df.count()  # materialize before corrupt-column-only projection
        return int(df.filter(F.col(_CORRUPT).isNotNull()).count())
    finally:
        df.unpersist()


def write_csv(
    df: DataFrame, path: str, shard_col: str | None = None
) -> None:
    """Write a frame as header'd CSV; with ``shard_col``, one directory
    per shard (dynamic partitioned write). Embedded delimiters and
    newlines are quoted+escaped so read_csv(multiline=True) can
    round-trip them. NULL is written as the \\N sentinel and '' as a
    quoted empty so the two survive the round-trip distinctly (a
    literal "\\N" text value is the one collision — the standard CSV
    tradeoff)."""
    w = (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("nullValue", "\\N")
        .option("emptyValue", '""')
    )
    if shard_col is not None:
        w = w.partitionBy(shard_col)
    w.csv(path)
