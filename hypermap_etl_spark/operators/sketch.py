"""Mergeable cardinality sketches (beyond-reference, north-star set).

KMV (k-minimum-values) distinct-count sketch: hash every value to
[0, 1); keep the k smallest distinct hashes per group; estimate
|distinct| ≈ (k-1) / kth_smallest. Standard analysis (Bar-Yossef et
al. 2002; Beyer et al. 2007): relative error ≈ 1/sqrt(k-2).

Why KMV and not HyperLogLog here: Spark ships approx_count_distinct
(HLL++) already — the point of this operator is the MERGEABLE SKETCH
as data: the k-smallest-hash set is a value you can store per
partition/day and fold (union two sketches = k smallest of the union)
without rescanning history, the property a 100 TB incremental pipeline
needs. And with md5 as the hash it is bit-reproducible in any SQL
engine, so the driver gate can verify it exactly — which HLL++'s
engine-internal hashing never could.

Scale shape: one (group, value) distinct aggregation (map-side
combine), then a per-group top-k window over the distinct hashes —
shuffles keyed by group (+ uniform md5), never a collect_set that
would hold a whole group's values in one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# md5's first 8 hex chars as a uniform fraction in [0, 1)
_HASH_SPACE = float(1 << 32)


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: int = 64,
    n_salts: int = 32,
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Output: group_cols + (n_kept, kth_frac, est_distinct) where
    n_kept = min(k, true distinct), kth_frac = the largest retained
    hash fraction, and est_distinct = exact count when the group has
    fewer than k distinct values (the sketch IS the distinct set
    then), else floor((k-1)/kth_frac).

    Two-stage top-k: a single per-group window would sort EVERY
    distinct hash of a group on one task — with few groups (the common
    sketching shape) that is one monster sort at 100 TB. Stage 1 keeps
    the k smallest per (group, salt) cell in parallel; stage 2 merges
    the ≤ n_salts*k survivors per group. Identical output: the global
    k smallest are each the minimum of their salt cell's k smallest.
    The salt is a deterministic value hash, so results (and the
    oracle) are unaffected by the physical split.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    frac = (
        F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(_HASH_SPACE)
    )
    hashes = (
        df.select(*group_cols, F.col(value_col))
        .filter(F.col(value_col).isNotNull())  # count distinct NON-NULL,
        # like count(DISTINCT x); also avoids NULLS FIRST/LAST ordering
        # divergence between engines in the top-k window
        .distinct()
        .select(
            *group_cols,
            frac.alias("__frac"),
            F.pmod(F.xxhash64(F.col(value_col).cast("string")), F.lit(n_salts)).alias(
                "__salt"
            ),
        )
    )
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy("__frac")
    stage1 = (
        hashes.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__salt")
    )
    w = Window.partitionBy(*group_cols).orderBy("__frac")
    kept = stage1.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    return (
        kept.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.round(F.max("__frac"), 9).alias("kth_frac"),
        )
        .select(
            *group_cols,
            "n_kept",
            "kth_frac",
            F.when(F.col("n_kept") < k, F.col("n_kept"))
            .otherwise(F.floor((k - 1) / F.col("kth_frac")))
            .cast("long")
            .alias("est_distinct"),
        )
    )
