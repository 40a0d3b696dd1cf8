"""CSV source/sink: schema-pinned reads, malformed-line handling at
both severities, quoted-field round-trip, sharded writes."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from hypermap_etl_spark.sources.csv import (
    corrupt_count,
    read_csv,
    write_csv,
)


def _write_lines(path: str, lines: list[str]) -> None:
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def test_read_csv_drops_malformed_lines(spark):
    base = tempfile.mkdtemp()
    p = os.path.join(base, "docs.csv")
    _write_lines(
        p,
        [
            "doc_id,text,lang,source,n_chars",
            "1,ok,en,a,2",
            "not-a-number,broken,en",  # wrong arity AND type
            "2,also ok,en,b,7",
        ],
    )
    good = read_csv(spark, p)
    # collect() parses every column, so DROPMALFORMED actually drops;
    # a bare count() would parse none and count raw lines (documented
    # column-pruning caveat)
    assert len(good.collect()) == 2
    assert set(good.columns) == {"doc_id", "text", "lang", "source", "n_chars"}
    assert corrupt_count(spark, p) == 1


def test_read_csv_permissive_quarantines(spark):
    base = tempfile.mkdtemp()
    p = os.path.join(base, "docs.csv")
    _write_lines(
        p,
        [
            "doc_id,text,lang,source,n_chars",
            "1,ok,en,a,2",
            "xx,broken,en,b,nope",
        ],
    )
    df = read_csv(spark, p, drop_corrupt=False).cache()
    try:
        assert df.count() == 2
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert bad.count() == 1
        assert "broken" in bad.collect()[0]["_corrupt_record"]
    finally:
        df.unpersist()


def test_write_csv_shards_quotes_and_roundtrip(spark):
    base = tempfile.mkdtemp()
    df = spark.range(80).select(
        F.col("id").alias("doc_id"),
        # embedded comma and quote force the writer's quoting path
        F.concat(F.lit('text, "q" '), F.col("id")).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("src").alias("source"),
        F.lit(9).cast("long").alias("n_chars"),
        (F.col("id") % 4).alias("shard"),
    )
    out = os.path.join(base, "sharded")
    write_csv(df, out, shard_col="shard")
    assert len(glob.glob(os.path.join(out, "shard=*"))) == 4
    back = read_csv(spark, out)
    assert back.count() == 80
    assert back.filter(F.col("text") == 'text, "q" 42').count() == 1
    # corrupt_count sees the per-file headers, not phantom bad rows
    assert corrupt_count(spark, out) == 0


def test_csv_parquet_identity_on_fixtures(spark):
    """documents.parquet -> CSV -> read_csv is row-identical (the
    interchange export a trainer-side loader would consume)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = tempfile.mkdtemp()
    out = os.path.join(base, "docs_csv")
    write_csv(docs, out)
    back = read_csv(spark, out)
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["text"] for r in docs.collect()}
    b = {r["doc_id"]: r["text"] for r in back.collect()}
    assert a == b


def test_csv_null_vs_empty_roundtrip(spark, tmp_path):
    """NULL and '' survive the round-trip as distinct values (the
    nullValue-sentinel/emptyValue pairing; Spark's CSV default reads
    every empty field as NULL)."""
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "x")], "doc_id long, text string"
    ).selectExpr(
        "doc_id", "text", "'en' lang", "'s' source", "cast(0 as long) n_chars"
    )
    out = str(tmp_path / "nv")
    write_csv(df, out)
    got = {r["doc_id"]: r["text"] for r in read_csv(spark, out).collect()}
    assert got == {1: "", 2: None, 3: "x"}
