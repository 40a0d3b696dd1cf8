"""Scale-engineering operators: key-skew diagnosis, distributed global
rank, and token-balanced shard assignment.

These are the pre-flight tools a 100 TB pipeline runs BEFORE committing
to a shuffle plan: ``key_skew_report`` tells you whether a join/groupBy
key needs salting (and by how much), ``global_rank`` produces a total-
order rank WITHOUT the single-partition ``row_number() OVER (ORDER BY)``
window (the classic scale-killer), and ``balanced_shards`` uses that
rank for LPT-style round-robin packing of documents into equal-weight
training shards — hash sharding (``corpus.to_shards``) balances counts,
not token mass, so a heavy-tailed length distribution leaves some
shards 2-3x heavier; round-robin over the size-descending order bounds
the spread by one document.

No reference analog (the reference's Mongo indexer never self-tunes);
this is the operational layer its scripts/extract-events.ts chunk-size
retry loop approximates by hand, re-expressed as measurable reports.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from hypermap_etl_spark.util import shuffle_partitions, tracked_persist


def key_skew_report(
    df: DataFrame, key_cols: list[str], top: int = 10
) -> DataFrame:
    """Per-key skew diagnosis for an intended shuffle key.

    Returns the ``top`` heaviest keys with, per key: row count, share
    of all rows, and ``key_salt`` — the number of salt buckets needed
    to split THIS key down to the average key's size (1 = no salting
    needed) — plus the global context columns ``n_keys``, ``n_rows``
    and the key-distribution Shannon entropy (nats, 6 dp). A uniform
    key has entropy ln(n_keys); the gap is the skew.

    Scale shape: ONE hash aggregate over (key) — the same shuffle the
    diagnosed join/groupBy would do, but carrying only the key — then
    two tiny aggregates over the per-key counts (n_keys rows, not
    n_rows) and a broadcast single-row join of the summary; the top-N
    is TakeOrderedAndProject. Nothing driver-side beyond the N rows.
    """
    counts = tracked_persist(
        df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("cnt"))
    )
    # entropy needs the grand total inside a per-key expression; a
    # global window over the counts frame would plan single-partition,
    # so broadcast the one-row totals instead and keep both aggregates
    # linear in the key cardinality.
    totals = counts.agg(
        F.count(F.lit(1)).alias("n_keys"), F.sum("cnt").alias("n_rows")
    )
    summary = (
        counts.join(F.broadcast(totals))
        .agg(
            F.first("n_keys").alias("n_keys"),
            F.first("n_rows").alias("n_rows"),
            F.round(
                -F.sum(
                    (F.col("cnt") / F.col("n_rows"))
                    * F.log(F.col("cnt") / F.col("n_rows"))
                ),
                6,
            ).alias("key_entropy"),
        )
    )
    topk = counts.orderBy(F.col("cnt").desc(), *[F.col(c).asc() for c in key_cols]).limit(top)
    return (
        topk.join(F.broadcast(summary))
        .select(
            *key_cols,
            "cnt",
            F.round(F.col("cnt") / F.col("n_rows"), 6).alias("share"),
            # share-first double math: cnt*n_keys in int64 wraps
            # negative around 1e19 (a trillion-row corpus with a
            # billion-key column is past it)
            F.ceil(F.col("cnt") / F.col("n_rows") * F.col("n_keys"))
            .cast("bigint")
            .alias("key_salt"),
            "n_keys",
            "n_rows",
            "key_entropy",
        )
    )


def _global_rank_with_total(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "rank",
    partitions: int | None = None,
) -> tuple:
    """Total-order 1-based rank without a single-partition window.

    ``row_number() OVER (ORDER BY ...)`` funnels EVERY row through one
    task — the textbook scale-killer this module exists to avoid. The
    distributed construction (the TeraSort rank):

      1. ``repartitionByRange`` on the sort expressions — one range
         shuffle, sampled boundaries;
      2. persist, then collect the P per-partition counts (P rows to
         the driver, never data);
      3. rank = broadcast cumulative offset of the row's partition +
         ``row_number`` over a PARTITIONED window (each task ranks only
         its own range slice).

    ``order_by`` must be a TOTAL order (tie-broken down to a unique
    key): with ties, equal keys can straddle a range boundary and their
    relative rank would depend on boundary sampling. With a total order
    the result is independent of boundary placement and partition
    count. Callers should project to the minimal columns first — the
    persist holds the projected frame.
    """
    spark = df.sparkSession
    p = partitions or shuffle_partitions(spark)
    ranged = tracked_persist(
        df.repartitionByRange(p, *order_by).withColumn(
            "__pid", F.spark_partition_id()
        )
    )
    sizes = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    # empty input: create_map() is VOID-typed and unindexable — the
    # zero literal is the (vacuously correct) offset for zero rows
    off_expr = (
        F.create_map(
            *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
        )[F.col("__pid")]
        if offsets
        else F.lit(0)
    )
    w = Window.partitionBy("__pid").orderBy(*order_by)
    out = ranged.withColumn(
        rank_col,
        (F.row_number().over(w) + off_expr).cast("bigint"),
    ).drop("__pid")
    return out, acc


def global_rank(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "rank",
    partitions: int | None = None,
) -> DataFrame:
    """Public face of :func:`_global_rank_with_total` — see its
    docstring for the construction and the total-order requirement."""
    out, _ = _global_rank_with_total(df, order_by, rank_col, partitions)
    return out


def balanced_shards(
    df: DataFrame,
    weight_col: str,
    tiebreak_col: str,
    n_shards: int,
    shard_col: str = "shard",
) -> DataFrame:
    """Weight-balanced shard assignment: round-robin over the weight-
    DESCENDING global order (greedy LPT without the sequential heap).

    shard = (rank - 1) mod n_shards where rank is the total-order rank
    by (weight desc, tiebreak asc). Heaviest n_shards items spread one
    per shard, next wave likewise — per-shard total weights differ by
    at most one item's weight per wave, so the spread is bounded by
    max(weight) regardless of the length distribution (hash sharding's
    spread grows with variance). Rank comes from ``global_rank`` — one
    range shuffle, partitioned windows, no single-task sort.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    ranked = global_rank(
        df,
        [F.col(weight_col).desc(), F.col(tiebreak_col).asc()],
        rank_col="rank",
    )
    return ranked.withColumn(
        shard_col, ((F.col("rank") - 1) % n_shards).cast("int")
    )


def shard_balance_report(
    sharded: DataFrame, weight_col: str, shard_col: str = "shard"
) -> DataFrame:
    """Per-shard load report for a shard assignment: item count, total
    weight, and each shard's deviation from the mean shard weight
    (ratio, 6 dp — 1.0 everywhere is a perfect pack). One hash
    aggregate on the shard id + a broadcast single-row mean."""
    per = sharded.groupBy(shard_col).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(weight_col).cast("bigint").alias("total_weight"),
    )
    mean = per.agg(F.avg("total_weight").alias("mean_weight"))
    return per.join(F.broadcast(mean)).select(
        shard_col,
        "n_items",
        "total_weight",
        F.round(F.col("total_weight") / F.col("mean_weight"), 6).alias(
            "load_ratio"
        ),
    )


def global_percent_rank(
    df: DataFrame,
    order_by: list[Column],
    pct_col: str = "pct_rank",
    partitions: int | None = None,
) -> DataFrame:
    """percent_rank over the WHOLE frame without the single-partition
    window Spark would plan for ``percent_rank() OVER (ORDER BY ...)``:
    (global_rank − 1) / (n − 1), with n known for free from the same
    per-partition counts the rank construction already collected.
    Same total-order requirement as global_rank. A single row ranks
    0.0 (the SQL percent_rank convention). Rounded 6 dp.
    """
    ranked, total = _global_rank_with_total(
        df, order_by, rank_col="__grank", partitions=partitions
    )
    denom = max(total - 1, 1)
    return ranked.withColumn(
        pct_col,
        F.round((F.col("__grank") - 1) / F.lit(float(denom)), 6),
    ).drop("__grank")


def gini_concentration(
    df: DataFrame, key_cols: list[str], weight_col: str | None = None
) -> DataFrame:
    """Gini coefficient of the per-key load distribution — the
    scalar companion of key_skew_report (entropy says "how uneven";
    Gini is the standard 0=uniform..1=one-key-has-everything number a
    capacity planner quotes). Exact rank formula over the SORTED
    per-key totals: G = 2·Σ(rank·x) / (n·Σx) − (n+1)/n.

    One corpus-sized hash aggregate to per-key totals; the rank comes
    from :func:`global_rank` over that AGGREGATE frame (range shuffle
    + partitioned windows — no single-task sort even when the key
    cardinality itself is huge). Integer-exact sums make G
    bit-deterministic; single-key or empty inputs yield NULL
    (concentration is undefined).
    """
    agg = (F.sum(weight_col) if weight_col else F.count(F.lit(1))).cast(
        "long"
    )
    per = df.groupBy(*key_cols).agg(agg.alias("x"))
    ranked = global_rank(
        per, [F.col("x").asc(), *[F.col(c).asc() for c in key_cols]],
        rank_col="__r",
    )
    m = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        # per-key totals are long, but the corpus-wide total can pass
        # int64 when weight_col is e.g. bytes — accumulate exact decimal
        F.sum(F.col("x").cast("decimal(19,0)")).alias("sx"),
        # rank·x exceeds int64 once rank (≤ n_keys) times per-key long
        # totals passes ~9.2e18 — ANSI would raise ARITHMETIC_OVERFLOW.
        # decimal(19,0)·decimal(19,0) → decimal(38,0): exact products,
        # exact sum, 38 digits of headroom before any rounding happens.
        F.sum(
            F.col("__r").cast("decimal(19,0)")
            * F.col("x").cast("decimal(19,0)")
        ).alias("srx"),
    )
    # the n_keys·sx denominator has the same int64 trap; divide in
    # double (exact operands → one rounding at the divide, then round-6)
    g = (
        F.lit(2.0) * F.col("srx").cast("double")
        / (F.col("n_keys").cast("double") * F.col("sx").cast("double"))
        - (F.col("n_keys") + 1) / F.col("n_keys")
    )
    return m.select(
        "n_keys",
        F.col("sx").cast("decimal(38,0)").alias("total"),
        F.round(
            F.when(F.col("n_keys") > 1, g), 6
        ).alias("gini"),
    )


def pareto_share(
    df: DataFrame,
    key_cols: list[str],
    weight_col: str,
    top_fraction: float = 0.2,
) -> DataFrame:
    """The 80/20 check: what share of total weight do the top
    ``top_fraction`` of keys hold? (Pareto concentration — the revenue
    twin of gini_concentration's single number.)

    Per-key totals (one hash aggregate), then
    :func:`global_percent_rank` by weight DESCENDING over the
    aggregate frame picks the top slice without a single-task window;
    two broadcastable sums finish it. Output: one row — n_keys, keys
    in the slice, slice share (6 dp).
    """
    if not (0.0 < top_fraction < 1.0):
        raise ValueError(f"top_fraction must be in (0,1): {top_fraction}")
    per = df.groupBy(*key_cols).agg(
        F.sum(weight_col).cast("double").alias("w")
    )
    ranked = global_percent_rank(
        per,
        [F.col("w").desc(), *[F.col(c).asc() for c in key_cols]],
        pct_col="__p",
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(F.when(F.col("__p") <= top_fraction, 1).otherwise(0))
        .cast("bigint")
        .alias("n_top"),
        F.round(
            F.try_divide(
                F.sum(F.when(F.col("__p") <= top_fraction, F.col("w"))),
                F.sum("w"),
            ),
            6,
        ).alias("top_share"),
    )


def grouped_weighted_median(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Exact lower weighted median per group: the smallest value v
    whose cumulative weight reaches half the group's total —
    ``percentile(x, 0.5)`` answers "middle ROW"; this answers "middle
    unit of MASS" (the median price per UNIT SOLD, not per line item),
    and no interpolation means pure integer/decimal math, bit-identical
    in any engine.

    Values order as exact decimal(12,2); weights accumulate as exact
    integer centi-units (decimal(12,2)·100 → long). Output per group:
    (group, median_w DOUBLE, total_weight_c LONG, n_rows LONG).

    Scale shape: a hash aggregate collapses duplicate values per group
    (everything after runs on DISTINCT values), then the cumulative
    weight uses the distributed running-sum construction — NOT
    ``sum() OVER (PARTITION BY group ORDER BY v)``, which with few
    groups sorts each group's whole value set on ONE task (the
    few-groups twin of the global-window scale-killer global_rank
    avoids). Instead: range-partition by (group, v); within-slice
    running sums; per-(slice, group) totals (P·G rows) get their
    prefix offsets from a window over that TINY frame and come back
    as a broadcast join. No driver collect, no single-task sort, and
    the result is independent of slice boundaries because offsets are
    derived from actual slice contents.
    """
    return grouped_weighted_quantile(
        df, value_col, weight_col, group_cols, q=0.5, out_col="median_w"
    )


def grouped_weighted_quantile(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_cols: list[str],
    q: float = 0.5,
    out_col: str = "quantile_w",
) -> DataFrame:
    """Exact lower weighted q-quantile per group — the generalization
    of :func:`grouped_weighted_median` (which is the q = 1/2 call):
    the smallest value v whose cumulative weight reaches q of the
    group's total mass. The SLA view of a weighted distribution ("the
    price under which 90% of sold UNITS fall"), still interpolation-
    free: pure integer/decimal comparisons, bit-identical in any
    engine.

    ``q`` converts to an exact rational via Fraction(str(q)) (the
    prefix_filter_pairs discipline — no float-rounded thresholds), so
    the pick condition is cum·den >= tot·num in decimal arithmetic.
    Same distributed running-sum construction as the median: distinct-
    value collapse, range partition, per-slice running sums, broadcast
    prefix offsets — no single-task group sort at any group count.
    """
    from fractions import Fraction

    frac = Fraction(str(q))
    if not 0 < frac <= 1:
        raise ValueError("q must be in (0, 1]")
    num, den = frac.numerator, frac.denominator
    v = F.col(value_col).cast("decimal(12,2)")
    wc = (F.col(weight_col).cast("decimal(12,2)") * 100).cast("long")
    per_value = (
        df.filter(v.isNotNull() & wc.isNotNull())
        .select(*group_cols, v.alias("__v"), wc.alias("__w"))
        .groupBy(*group_cols, "__v")
        .agg(F.sum("__w").alias("__w"), F.count(F.lit(1)).cast("long").alias("__n"))
    )
    spark = df.sparkSession
    p = shuffle_partitions(spark)
    ranged = tracked_persist(
        per_value.repartitionByRange(
            p, *[F.col(c) for c in group_cols], F.col("__v")
        ).withColumn("__pid", F.spark_partition_id())
    )
    psums = ranged.groupBy("__pid", *group_cols).agg(
        F.sum("__w").alias("__s"), F.sum("__n").alias("__pn")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # the group totals ride the SAME tiny per-(slice, group) frame as
    # the prefix offsets (r10, guide §2.4): a whole-partition window
    # over psums replaces the separate totals branch, which re-scanned
    # the cached distinct-value frame a third time and came back
    # through a second broadcast join
    w_tot = Window.partitionBy(*group_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = psums.select(
        "__pid",
        *group_cols,
        F.coalesce(F.sum("__s").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__s").over(w_tot).alias("__tot"),
        F.sum("__pn").over(w_tot).alias("__nrows"),
    )
    w_run = (
        Window.partitionBy("__pid", *group_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = (
        ranged.withColumn("__runw", F.sum("__w").over(w_run))
        .join(F.broadcast(offs), ["__pid", *group_cols])
        .withColumn("__cumw", F.col("__off") + F.col("__runw"))
        .filter(
            F.col("__cumw").cast("decimal(38,0)") * F.lit(den)
            >= F.col("__tot").cast("decimal(38,0)") * F.lit(num)
        )
        .groupBy(*group_cols)
        .agg(
            F.min("__v").cast("double").alias(out_col),
            F.first("__tot").alias("total_weight_c"),
            F.first("__nrows").alias("n_rows"),
        )
    )
    return picked.select(
        *group_cols,
        out_col,
        F.col("total_weight_c").cast("long").alias("total_weight_c"),
        F.col("n_rows").cast("long").alias("n_rows"),
    )


def heavy_coverage(
    df: DataFrame,
    key_cols: list[str],
    thresholds: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Coverage curve of a skewed key distribution: the smallest number
    of keys (taken heaviest-first) whose events cover each threshold
    share of the corpus — "how many users produce 90% of the traffic",
    the capacity-planning twin of pareto_share (which fixes the key
    fraction and asks for the share; this fixes the share and asks for
    the key count).

    Construction: per-key counts (one corpus hash aggregate), then the
    distributed running sum in (count DESC, key ASC) total order — the
    grouped_weighted_median discipline: range shuffle on the order,
    within-slice cumulative window, per-slice offsets broadcast from a
    P-row collect. NEVER ``SUM() OVER (ORDER BY ...)`` over all keys
    in one task. Threshold probing is a keys×|thresholds| conditional
    aggregate.

    Output: (threshold, n_keys_needed, n_keys_total, key_fraction)
    rows; thresholds with no qualifying prefix (empty input) are
    omitted.
    """
    spark = df.sparkSession
    per = (
        df.filter(
            F.lit(True)
            if not key_cols
            else F.expr(" AND ".join(f"{c} IS NOT NULL" for c in key_cols))
        )
        .groupBy(*key_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("__x"))
    )
    order = [F.col("__x").desc(), *[F.col(c).asc() for c in key_cols]]
    p = shuffle_partitions(spark)
    ranged = tracked_persist(
        per.repartitionByRange(p, *order).withColumn(
            "__pid", F.spark_partition_id()
        )
    )
    slices = ranged.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("__x").alias("sx")
    ).collect()
    sizes = {r["__pid"]: (r["cnt"], r["sx"]) for r in slices}
    cnt_off, sum_off, acc_c, acc_s = {}, {}, 0, 0
    for pid in sorted(sizes):
        cnt_off[pid], sum_off[pid] = acc_c, acc_s
        acc_c += sizes[pid][0]
        acc_s += sizes[pid][1]
    if acc_c == 0:
        return spark.createDataFrame(
            [],
            "threshold double, n_keys_needed bigint, n_keys_total bigint, "
            "key_fraction double",
        )
    co = F.create_map(
        *[F.lit(x) for pid in sorted(cnt_off) for x in (pid, cnt_off[pid])]
    )[F.col("__pid")]
    so = F.create_map(
        *[F.lit(x) for pid in sorted(sum_off) for x in (pid, sum_off[pid])]
    )[F.col("__pid")]
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wr = Window.partitionBy("__pid").orderBy(*order)
    cum = ranged.select(
        (F.row_number().over(wr) + co).cast("bigint").alias("__rank"),
        (F.sum("__x").over(w) + so).cast("bigint").alias("__cum"),
    )
    th = spark.createDataFrame(
        [(float(t),) for t in thresholds], "threshold double"
    )
    return (
        cum.crossJoin(F.broadcast(th))
        .filter(
            F.col("__cum").cast("double")
            >= F.col("threshold") * F.lit(float(acc_s))
        )
        .groupBy("threshold")
        .agg(
            F.min("__rank").alias("n_keys_needed"),
            F.max(F.lit(acc_c)).cast("bigint").alias("n_keys_total"),
            F.round(
                F.min("__rank").cast("double") / F.lit(float(acc_c)), 6
            ).alias("key_fraction"),
        )
    )


def grouped_quantile_table(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    qs: tuple[float, ...] = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
) -> DataFrame:
    """ALL the exact lower q-quantiles of every group in ONE
    distributed running-sum pass — the mapping-table primitive behind
    quantile normalization and per-group ECDF reports. Calling
    :func:`grouped_weighted_quantile` once per q would repeat the
    distinct-value collapse and range shuffle |qs| times; here the
    cumulative frame is built once and each row fans out to the |qs|
    pick conditions (a bounded explode over the distinct-value
    aggregate, never over corpus rows).

    Same exactness contract as the median family: values quantize to
    decimal(12,2), every pick condition is integer/decimal arithmetic
    (cum·den >= tot·num with q as an exact Fraction), no float
    threshold anywhere. Output: one row per (group, q) — q (double
    literal), value, n_rows.
    """
    from fractions import Fraction

    fracs = [Fraction(str(q)) for q in qs]
    if not fracs:
        raise ValueError("grouped_quantile_table: need at least one q")
    if any(not 0 < f <= 1 for f in fracs):
        raise ValueError("grouped_quantile_table: every q must be in (0, 1]")
    v = F.col(value_col).cast("decimal(12,2)")
    per_value = (
        df.filter(v.isNotNull())
        .select(*group_cols, v.alias("__v"))
        .groupBy(*group_cols, "__v")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    spark = df.sparkSession
    p = shuffle_partitions(spark)
    ranged = tracked_persist(
        per_value.repartitionByRange(
            p, *[F.col(c) for c in group_cols], F.col("__v")
        ).withColumn("__pid", F.spark_partition_id())
    )
    psums = ranged.groupBy("__pid", *group_cols).agg(
        F.sum("__n").alias("__s")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # totals ride the offsets window over the tiny psums frame (r10,
    # guide §2.4) — same fold as grouped_weighted_quantile: no third
    # scan of the cached distinct-value frame, no second broadcast join
    w_tot = Window.partitionBy(*group_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = psums.select(
        "__pid",
        *group_cols,
        F.coalesce(F.sum("__s").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__s").over(w_tot).alias("__tot"),
    )
    w_run = (
        Window.partitionBy("__pid", *group_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        ranged.withColumn("__run", F.sum("__n").over(w_run))
        .join(F.broadcast(offs), ["__pid", *group_cols])
        .withColumn("__cum", F.col("__off") + F.col("__run"))
    )
    qarr = F.array(
        *[
            F.struct(
                F.lit(float(f)).alias("q"),
                F.lit(f.numerator).alias("__num"),
                F.lit(f.denominator).alias("__den"),
            )
            for f in fracs
        ]
    )
    exploded = (
        cum.select(*group_cols, "__v", "__cum", "__tot", F.explode(qarr).alias("__q"))
        .filter(
            F.col("__cum").cast("decimal(38,0)") * F.col("__q.__den")
            >= F.col("__tot").cast("decimal(38,0)") * F.col("__q.__num")
        )
    )
    return (
        exploded.groupBy(*group_cols, F.col("__q.q").alias("q"))
        .agg(
            F.min("__v").cast("double").alias("value"),
            F.first(F.col("__tot")).cast("long").alias("n_rows"),
        )
        .orderBy(*group_cols, "q")
    )
