"""JSONL source/sink: schema-pinned reads, corrupt-line quarantine,
and a full curate-export round-trip (parquet docs -> curate --format
jsonl -> read_jsonl returns the identical rows)."""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F

from hypermap_etl_spark.sources.jsonl import (
    CHUNKS_JSONL_SCHEMA,
    corrupt_count,
    read_jsonl,
    write_jsonl,
)


def test_read_jsonl_quarantines_corrupt_lines(spark):
    base = tempfile.mkdtemp()
    p = os.path.join(base, "docs.jsonl")
    with open(p, "w") as fh:
        fh.write(json.dumps({"doc_id": 1, "text": "ok", "lang": "en",
                             "source": "a", "n_chars": 2}) + "\n")
        fh.write("{not json at all\n")
        fh.write(json.dumps({"doc_id": 2, "text": "also ok", "lang": "en",
                             "source": "b", "n_chars": 7}) + "\n")
    good = read_jsonl(spark, p)
    assert good.count() == 2
    assert set(good.columns) == {"doc_id", "text", "lang", "source", "n_chars"}
    assert corrupt_count(spark, p) == 1


def test_write_jsonl_shards_and_roundtrip(spark):
    base = tempfile.mkdtemp()
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("src").alias("source"),
        F.lit(7).cast("long").alias("n_chars"),
        (F.col("id") % 4).alias("shard"),
    )
    out = os.path.join(base, "sharded")
    write_jsonl(df, out, shard_col="shard")
    import glob

    assert len(glob.glob(os.path.join(out, "shard=*"))) == 4
    back = read_jsonl(spark, out)
    assert back.count() == 100
    assert back.filter(F.col("text") == "text-42").count() == 1


def test_curate_jsonl_export_reads_back(spark, capsys):
    """The cli curate --format jsonl output is readable through the
    schema-pinned source and row counts agree with the report."""
    from hypermap_etl_spark.cli import main

    out = tempfile.mkdtemp()
    main([
        "curate", "--docs", "/root/testdata/sf0.001/documents.parquet",
        "--out", out, "--min-words", "5", "--shards", "4",
        "--format", "jsonl",
    ])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    chunks = read_jsonl(
        spark, os.path.join(out, "chunks.jsonl"), CHUNKS_JSONL_SCHEMA
    )
    assert chunks.count() == rep["chunks"]
    assert corrupt_count(
        spark, os.path.join(out, "chunks.jsonl"), CHUNKS_JSONL_SCHEMA
    ) == 0


def test_read_jsonl_permissive_surfaces_corrupt_rows(spark):
    """drop_corrupt=False: the PERMISSIVE path keeps bad lines in the
    quarantine column for inspection (cache() first — Spark refuses
    corrupt-column-only queries on raw scans)."""
    base = tempfile.mkdtemp()
    p = os.path.join(base, "docs.jsonl")
    with open(p, "w") as fh:
        fh.write(json.dumps({"doc_id": 1, "text": "ok", "lang": "en",
                             "source": "a", "n_chars": 2}) + "\n")
        fh.write("{broken\n")
    df = read_jsonl(spark, p, drop_corrupt=False).cache()
    try:
        assert df.count() == 2
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert bad.count() == 1
        assert "{broken" in bad.collect()[0]["_corrupt_record"]
    finally:
        df.unpersist()
