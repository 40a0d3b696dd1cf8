"""Schema-evolution reads (sources/evolution.py): corpus drops whose
schemas drifted — new columns, widened ids — read back as one frame
conforming to a pinned contract."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hypermap_etl_spark.sources.evolution import conform, read_evolving

TARGET = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("quality", T.DoubleType()),
    ]
)


def _drops(spark):
    base = tempfile.mkdtemp()
    d1, d2 = f"{base}/drop1", f"{base}/drop2"
    # drop 1: pre-lang era, int ids
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id int, text string"
    ).write.parquet(d1)
    # drop 2: bigint ids, lang + quality added
    spark.createDataFrame(
        [(3, "gamma", "en", 0.9)],
        "doc_id long, text string, lang string, quality double",
    ).write.parquet(d2)
    return d1, d2


def test_read_evolving_merges_and_conforms(spark):
    d1, d2 = _drops(spark)
    out = read_evolving(spark, [d1, d2], schema=TARGET)
    assert [f.simpleString() for f in out.schema.fields] == [
        "doc_id:bigint", "text:string", "lang:string", "quality:double",
    ]
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["lang"] is None and rows[1]["quality"] is None
    assert rows[3]["lang"] == "en" and rows[3]["quality"] == 0.9
    assert len(rows) == 3


def test_read_evolving_without_contract_returns_merged_union(spark):
    d1, d2 = _drops(spark)
    out = read_evolving(spark, [d1, d2])
    assert set(out.columns) == {"doc_id", "text", "lang", "quality"}
    assert out.count() == 3


def test_conform_rejects_lossy_casts_unless_forced(spark):
    df = spark.createDataFrame([(2**40, "x")], "doc_id long, text string")
    narrow = T.StructType(
        [T.StructField("doc_id", T.IntegerType()), T.StructField("text", T.StringType())]
    )
    with pytest.raises(ValueError, match="lossy"):
        conform(df, narrow)
    forced = conform(df, narrow, allow_lossy=True)
    assert dict(forced.dtypes)["doc_id"] == "int"


def test_conform_extras_drop_or_keep(spark):
    df = spark.createDataFrame(
        [(1, "x", "stale")], "doc_id long, text string, legacy string"
    )
    target = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    assert conform(df, target).columns == ["doc_id", "text"]
    assert conform(df, target, keep_extras=True).columns == [
        "doc_id", "text", "legacy",
    ]


def test_conform_widens_arrays_and_is_pushdown_transparent(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0])],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("v", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    target = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("v", T.ArrayType(T.DoubleType())),
        ]
    )
    out = conform(df, target)
    assert dict(out.dtypes)["v"] == "array<double>"
    # filters through the conforming projection still reach the scan
    import tempfile as tf

    p = tf.mkdtemp() + "/t"
    spark.createDataFrame([(i, f"t{i}") for i in range(10)],
                          "doc_id int, text string").write.parquet(p)
    wide = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    q = read_evolving(spark, [p], schema=wide).filter(F.col("doc_id") > 5)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,5)]" in plan


def test_merge_schemas_conflict_raises(spark):
    from hypermap_etl_spark.sources.evolution import merge_schemas

    a = T.StructType([T.StructField("x", T.StringType())])
    b = T.StructType([T.StructField("x", T.LongType())])
    with pytest.raises(ValueError, match="cannot reconcile"):
        merge_schemas([a, b])
    # order: first appearance wins; widening picks the wider side
    c = T.StructType(
        [T.StructField("doc_id", T.IntegerType()), T.StructField("t", T.StringType())]
    )
    d = T.StructType(
        [T.StructField("t", T.StringType()), T.StructField("doc_id", T.LongType())]
    )
    merged = merge_schemas([c, d])
    assert [f.simpleString() for f in merged.fields] == ["doc_id:bigint", "t:string"]
