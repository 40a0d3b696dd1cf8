"""Data-layout pruning: clustered writes must produce near-disjoint
per-file min/max stats (the property every stats-based reader —
Spark's row-group pruning, Delta/Iceberg file skipping — prunes on),
while an interleaved layout must not."""

import pytest

from hypermap_etl_spark.sources.layout import (
    file_stats,
    pruning_factor,
    read_pruned,
    write_clustered,
)


@pytest.fixture(scope="module")
def events(spark):
    from hypermap_etl_spark.sources.tables import load_table

    return load_table(spark, "/root/testdata/sf0.001", "events")


def test_clustered_layout_prunes_interleaved_does_not(spark, events, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout")
    clustered = str(base / "clustered")
    interleaved = str(base / "interleaved")

    write_clustered(events, clustered, ["user_id"], n_files=8)
    # worst-case layout: hash-interleave rows across files
    events.repartition(8).write.parquet(interleaved)

    pf_clustered = pruning_factor(clustered, "user_id")
    pf_interleaved = pruning_factor(interleaved, "user_id")
    # 8 near-disjoint ranges: a point lookup can skip ~7/8 of the files
    assert pf_clustered > 0.8, pf_clustered
    # interleaved: every file spans ~the whole id range — nothing skips
    assert pf_interleaved < 0.1, pf_interleaved

    # ranges must actually be non-overlapping (allow touching at
    # boundaries: range partitioning splits on sampled keys)
    stats = sorted(
        (lo, hi) for _, lo, hi in file_stats(clustered, "user_id") if lo is not None
    )
    for (_, prev_hi), (next_lo, _) in zip(stats, stats[1:]):
        assert next_lo >= prev_hi, stats

    # correctness: clustering is pure layout — same rows come back
    assert read_pruned(spark, clustered).count() == events.count()


def test_clustered_point_filter_is_pushed(spark, events, tmp_path_factory):
    """The clustered table needs no special reader: a point filter on
    the cluster column reaches the scan as a PushedFilter."""
    path = str(tmp_path_factory.mktemp("layout2") / "by_user")
    write_clustered(events, path, ["user_id"], n_files=4)
    df = read_pruned(spark, path).filter("user_id = 7")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "user_id" in plan.split("PushedFilters")[1][:80]
    expected = events.filter("user_id = 7").count()
    assert df.count() == expected


def test_zorder_prunes_both_dimensions(spark, events, tmp_path_factory):
    """Z-order clustering on (user_id, value): per-file ranges must be
    LOCAL in both dimensions (pruning on either column), which 1-D
    clustering on user_id alone cannot give for value."""
    from hypermap_etl_spark.sources.layout import write_zordered

    base = tmp_path_factory.mktemp("zorder")
    zpath = str(base / "z")
    upath = str(base / "by_user")
    write_zordered(events, zpath, ["user_id", "value"], n_files=16)
    write_clustered(events, upath, ["user_id"], n_files=16)

    # z-ordered: BOTH dims prune meaningfully (16 files ~ 4x4 grid;
    # measured ~0.74 / ~0.78)
    assert pruning_factor(zpath, "user_id") > 0.5
    assert pruning_factor(zpath, "value") > 0.5
    # 1-D layout: the clustered dim prunes hardest, but the OTHER dim
    # prunes far worse than under z-order (~0.3 here — nonzero only
    # because the fixture's value correlates with user_id)
    assert pruning_factor(upath, "user_id") > 0.8
    assert pruning_factor(upath, "value") < pruning_factor(zpath, "value") - 0.3

    # layout only — same rows come back
    assert read_pruned(spark, zpath).count() == events.count()


def test_zorder_key_guards(spark, events):
    """bits caps at 63 // k (shiftleft wraps mod 64 past bit 63);
    non-numeric / all-null columns raise a diagnostic error instead of
    producing a corrupt key or a bare TypeError."""
    from pyspark.sql import functions as F

    from hypermap_etl_spark.sources.layout import zorder_key

    # 5 columns: 16 requested bits must be capped to 12 -> max position
    # k*(bits-1)+k-1 = 59 < 63, and the key builds + evaluates fine
    five = events.select(
        "user_id", "value", "event_id",
        (F.col("event_id") % 7).alias("m7"),
        (F.col("event_id") % 3).alias("m3"),
    )
    key, _ = zorder_key(five, ["user_id", "value", "event_id", "m7", "m3"])
    assert five.select(key.alias("z")).filter("z < 0").count() == 0

    with pytest.raises(ValueError, match="str-valued"):
        zorder_key(events, ["event_type"])
    with pytest.raises(ValueError, match="no non-null"):
        zorder_key(events.filter("event_id < 0"), ["user_id"])


def test_zorder_key_nan_rows_clamp_to_top_bucket(spark):
    """A NaN cluster value must neither poison the max() range nor make
    the Morton key NULL (floor(NaN) is NULL under default mode, a
    runtime error under ANSI): NaN rows clamp deterministically to the
    top bucket, and non-NaN rows keep the NaN-free ranges."""
    from pyspark.sql import functions as F

    from hypermap_etl_spark.sources.layout import zorder_key

    df = spark.range(100).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") % 10).cast("double").alias("y"),
    ).union(
        spark.sql("SELECT CAST('NaN' AS DOUBLE) AS x, 5.0D AS y")
    )
    key, ranges = zorder_key(df, ["x", "y"])
    # ranges exclude the NaN row
    assert ranges["x"] == (0.0, 99.0)
    out = df.withColumn("z", key)
    assert out.filter("z IS NULL").count() == 0
    # the NaN row lands exactly where x == max(x) would
    z_nan = out.filter(F.isnan("x")).select("z").collect()[0][0]
    z_max = (
        spark.sql("SELECT 99.0D AS x, 5.0D AS y")
        .withColumn("z", key)
        .collect()[0]["z"]
    )
    assert z_nan == z_max


def test_file_stats_recurses_partitioned_dirs_and_errors_on_empty(
    spark, events, tmp_path_factory
):
    """A directory-partitioned table must report real per-file stats
    (not a silent empty list → pruning_factor 0.0), and a path with no
    parquet at all must raise instead of misreporting 'no pruning'."""
    base = tmp_path_factory.mktemp("layout3")
    part = str(base / "partitioned")
    events.limit(200).write.partitionBy("event_type").parquet(part)

    stats = file_stats(part, "user_id")
    assert stats, "partition subdirectories must be recursed"
    assert all("=" in name for name, _, _ in stats)  # relative paths
    assert pruning_factor(part, "user_id") is not None

    empty = base / "empty"
    empty.mkdir()
    (empty / "sub").mkdir()
    with pytest.raises(FileNotFoundError, match="no \\*.parquet"):
        file_stats(str(empty), "user_id")


def test_pruning_factor_handles_decimal_stats(spark, tmp_path_factory):
    """Decimal-typed parquet stats are numeric for the span math
    (zorder_key accepts Decimal cluster columns — the two must agree)."""
    from hypermap_etl_spark.sources.layout import write_clustered

    path = str(tmp_path_factory.mktemp("layout4") / "dec")
    df = spark.range(1000).selectExpr(
        "id", "CAST(id AS DECIMAL(12,2)) AS price"
    )
    write_clustered(df, path, ["price"], n_files=8)
    pf = pruning_factor(path, "price")
    assert pf is not None and pf > 0.8, pf
