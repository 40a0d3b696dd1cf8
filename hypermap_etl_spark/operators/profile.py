"""Single-pass table profiling — the data-quality screen a pipeline
runs before training on a new drop: per-column null counts, exact (or
sketched) distinct counts, and numeric min/max, in long format.

Beyond-reference (the reference indexes one known schema; a corpus
pipeline meets arbitrary drops), but the serving shape mirrors its
status reporting: one row per column, stable names.

Scale shape: ONE scan. All per-column aggregates land in a single
``agg`` — Spark plans the multiple COUNT(DISTINCT)s as one Expand +
two-stage hash aggregate, so the input is read once and partials
combine map-side. The Expand multiplies intermediate rows by the
number of distinct-aggregates; at 100 TB either profile a hash sample
or set ``exact=False`` to use HLL++ (approx_count_distinct, no Expand)
— the gate uses the exact path at test scale, the approx path is
unit-tested against loose bounds. The final unpivot (stack) runs on
the one aggregated row, driver-light.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType



def _hash_arm(unit_col: str, salt: str):
    """THE A/B assignment: md5(salt:unit) first-8-hex parity — one
    definition shared by welch_ab_test, mann_whitney_u, ks_two_sample,
    did_estimate, cuped_adjust, and srm_check (whose whole purpose is
    certifying this very split; a divergent copy at any site would
    silently break that certification). Oracles reproduce it as
    CAST('0x' || substr(md5(salt || ':' || unit), 1, 8) AS BIGINT) % 2.
    """
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt),
                        F.lit(":"),
                        F.col(unit_col).cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(2),
    )


def _null_d():
    # Built lazily: F.lit at module scope would require an active
    # SparkContext at import time (breaks pytest collection).
    return F.lit(None).cast("double")


def profile_table(
    df: DataFrame, columns: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """Profile ``columns`` (default: all) in one pass.

    Output: (col_name, n_nulls, n_distinct, min_num, max_num) — one
    row per column, min/max as DOUBLE for numeric columns and NULL
    otherwise (string formatting of floats/timestamps is
    engine-specific, so the profiler never round-trips values through
    strings). NULLs are excluded from n_distinct, like
    COUNT(DISTINCT x).
    """
    columns = columns or df.columns
    aggs = []
    # positional internal aliases + backtick-quoted references: a drop
    # with a column named "user id" or "it's" must profile, not raise
    # an AnalysisException out of hand-built SQL text
    for i, c in enumerate(columns):
        col = df[c]
        aggs.append(
            F.sum(F.when(col.isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__nn_{i}")
        )
        if exact:
            aggs.append(F.count_distinct(col).cast("long").alias(f"__nd_{i}"))
        else:
            aggs.append(
                F.approx_count_distinct(col).cast("long").alias(f"__nd_{i}")
            )
        numeric = isinstance(df.schema[c].dataType, NumericType)
        aggs.append(
            (F.min(col).cast("double") if numeric else _null_d()).alias(f"__mn_{i}")
        )
        aggs.append(
            (F.max(col).cast("double") if numeric else _null_d()).alias(f"__mx_{i}")
        )
    one = df.agg(*aggs)
    stacked = ", ".join(
        "'{name}', __nn_{i}, __nd_{i}, __mn_{i}, __mx_{i}".format(
            name=c.replace("\\", "\\\\").replace("'", "\\'"), i=i
        )
        for i, c in enumerate(columns)
    )
    return one.select(
        F.expr(
            f"stack({len(columns)}, {stacked}) AS "
            "(col_name, n_nulls, n_distinct, min_num, max_num)"
        )
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two table snapshots keyed by ``key_cols``:
    the keys plus a ``status`` column in {'added', 'removed',
    'changed', 'unchanged'} — the dataset-versioning screen run
    between corpus drops ("what did this recrawl/refilter actually
    change?") before committing a training mix to it.

    ``compare_cols`` defaults to every non-key column the snapshots
    share; columns present in only one snapshot are ignored (a schema
    change shows up as all-changed only if you name the column
    explicitly, which then raises on the side missing it).

    Scale shape: ONE full outer join keyed by ``key_cols``. Row
    contents are collapsed map-side to a single md5 fingerprint
    (nulls sentinel-tagged so NULL ≠ 'null' ≠ ''), so the shuffle
    carries (keys, 128-bit hash) per row — never the payload — and
    comparing a 100 TB snapshot pair moves only its key space. md5
    equality stands in for value equality (collision odds ~n²/2^128);
    the driver gate's oracle compares the underlying VALUES with
    IS DISTINCT FROM, so the fingerprint shortcut is itself under
    test. Duplicate keys within a snapshot are the caller's bug:
    the join would fan out — profile first.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    missing = [
        c for c in compare_cols if c not in old.columns or c not in new.columns
    ]
    if missing:
        raise ValueError(f"compare columns missing from a snapshot: {missing}")

    def fp(df: DataFrame, side: str) -> DataFrame:
        # injection-safe fingerprint: hash each part FIRST (md5 output
        # is fixed-width hex, so no value can smuggle a separator) and
        # tag NULL outside the hash ('n' vs 'v<md5>' can never collide
        # with any real value, including one spelling a sentinel)
        parts = [
            F.coalesce(
                F.concat(F.lit("v"), F.md5(F.col(c).cast("string"))),
                F.lit("n"),
            )
            for c in compare_cols
        ]
        mark = (
            F.md5(F.concat_ws("", *parts))
            if compare_cols
            else F.lit("")
        )
        return df.select(
            *key_cols, mark.alias(f"__{side}_fp"), F.lit(1).alias(f"__in_{side}")
        )

    joined = fp(old, "old").join(fp(new, "new"), key_cols, "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.col("__old_fp") == F.col("__new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*key_cols, status.alias("status"))


def diff_summary(diff: DataFrame) -> DataFrame:
    """Collapse a :func:`table_diff` result to (status, n) counts —
    the one-line drop report."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n"))


def psi_drift(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index screen between two snapshots of a
    numeric column — the distribution-drift complement of
    :func:`table_diff` (which sees identity, not shape): did the VALUE
    DISTRIBUTION move between corpus drops, even where keys differ?
    Industry rule of thumb: Σ terms < 0.1 stable, 0.1–0.25 drifting,
    > 0.25 shifted.

    Domain: |value| must fit in long cents (~9.2e16) — the
    decimal(38,2) cast is exact for anything near that range; rows
    with NULL value are excluded on both sides.

    Bins are equal-width over the COMBINED extent, computed in exact
    integer cents (the lineitem_price_histogram discipline — bin
    membership is integer math, bit-identical in any engine; quantile
    edges would hang engine-parity on interpolation ulps). Zero
    fractions floor at ``eps`` so empty bins contribute a finite
    term, the standard PSI convention.

    Output: one row per bin — (bin, n_old, n_new, psi_term), with
    psi_term = (p_new − p_old)·ln(p_new/p_old) rounded to 6;
    Σ psi_term is the PSI. Per-bin terms (not the pre-summed total)
    keep every float rounding a per-row operation.

    Scale shape: two map-combined bin-count aggregates (the shuffle
    carries n_bins rows per side), extents from two tiny aggregates;
    the bin grid is a broadcast literal. Two full scans — one per
    snapshot — is the floor for any two-population comparison.
    """
    if n_bins < 2:
        raise ValueError("psi_drift: need n_bins >= 2")

    def cents(df: DataFrame):
        # decimal(38,2): any |value| < ~9.2e16 survives (the long-cents
        # cast is then the binding limit, stated below). decimal(12,2)
        # made |value| >= 1e10 an ANSI cast ERROR — an undocumented
        # domain restriction, and silent row-drop with ANSI off.
        return df.select(
            (F.col(value_col).cast("decimal(38,2)") * 100)
            .cast("long")
            .alias("__c")
        ).filter(F.col("__c").isNotNull())

    o, n = cents(old), cents(new)
    ext = (
        o.unionByName(n)
        .agg(F.min("__c").alias("lo"), F.max("__c").alias("hi"))
        .collect()[0]
    )
    if ext["lo"] is None:
        raise ValueError("psi_drift: no non-null values in either snapshot")
    lo, hi = int(ext["lo"]), int(ext["hi"])
    span = hi - lo + 1  # integer width: bin = (c-lo)·n_bins div span, exact

    def binned(df: DataFrame, name: str):
        # integer `div`, never a double divide + cast: Spark truncates
        # double→long while DuckDB rounds, so only pure integer math
        # keeps bin membership engine-identical. The arithmetic runs
        # in decimal(38,0): (c - lo)·n_bins overflows int64 once the
        # cent span passes ~9.2e17, and a span literal itself can
        # exceed the int64 literal grammar — decimals cover the whole
        # documented value domain
        b = F.expr(
            f"cast((cast(__c as decimal(38,0)) - {lo}) * {n_bins}"
            f" as decimal(38,0)) div cast({span} as decimal(38,0))"
        )
        return df.select(b.alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias(name)
        )

    spark = old.sparkSession
    grid = spark.range(n_bins).select(F.col("id").alias("bin"))
    counts = (
        grid.join(binned(o, "n_old"), "bin", "left")
        .join(binned(n, "n_new"), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
    )
    t_old = o.count() or 1
    t_new = n.count() or 1
    p_old = F.greatest(F.col("n_old") / F.lit(float(t_old)), F.lit(eps))
    p_new = F.greatest(F.col("n_new") / F.lit(float(t_new)), F.lit(eps))
    return counts.select(
        "bin",
        "n_old",
        "n_new",
        F.round((p_new - p_old) * F.log(p_new / p_old), 6).alias("psi_term"),
    ).orderBy("bin")


def cusum_drift(
    df: DataFrame,
    day_col: str,
    group_cols: list[str] | None = None,
    threshold: float = 3.0,
    count_col: str | None = None,
) -> DataFrame:
    """CUSUM changepoint screen over a daily count series — the
    ingestion-drift monitor PSI can't be (psi_drift compares two
    snapshots; this watches ONE series for a level shift in time):
    standardize the per-day counts, accumulate S_d = Σ z_i in day
    order, and flag when max|S_d| exceeds threshold·√n_days (under
    H0 the path is a random walk, max|S| ~ √n; a level shift makes
    it ramp linearly).

    Input is pre-bucketed (day_col a date string) so the caller
    controls the grain. Output per group: n_days, mean/std of daily
    counts, max_cusum (6 dp), and the drift verdict.

    Scale shape: ONE corpus-sized hash aggregate to daily counts
    (map-combined); everything after runs on the (groups × days)
    aggregate — the broadcast moments join and the ordered cumulative
    window are bounded by days, not rows. Moments use the explicit
    SUM/SUM-of-squares formula (identical in any engine, exact-int
    inputs), not stddev_pop (engines disagree on the update
    algorithm's rounding).

    ``count_col`` sums pre-aggregated partial counts instead of
    counting rows — the streaming path (streaming/drift.py) stores
    per-batch daily partials and re-derives the verdict here.
    """
    group_cols = group_cols or []
    daily = df.groupBy(*group_cols, day_col).agg(
        (
            F.sum(count_col) if count_col else F.count(F.lit(1))
        ).alias("c")
    )
    stats = daily.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("scc"),
    )
    from pyspark.sql.window import Window

    j = daily.join(F.broadcast(stats), group_cols) if group_cols else (
        daily.crossJoin(F.broadcast(stats))
    )
    m = F.col("sc") / F.col("n_days")
    # catastrophic cancellation on large near-constant counts can make
    # the moment difference fractionally NEGATIVE; sqrt would be NaN,
    # and Spark sorts NaN above every double — a spurious drift alarm.
    # Clamp to 0 so the zero-variance path (try_divide -> NULL) wins.
    var = F.greatest(
        F.col("scc") / F.col("n_days") - m * m, F.lit(0.0)
    )
    z = F.try_divide(F.col("c") - m, F.sqrt(var))
    w = Window.partitionBy(*group_cols).orderBy(day_col)
    s = F.sum(z).over(w)
    cus = j.select(*group_cols, "n_days", "sc", "scc", F.abs(s).alias("abs_s"))
    return (
        cus.groupBy(*group_cols)
        .agg(
            F.first("n_days").alias("n_days"),
            F.round(F.first(F.col("sc") / F.col("n_days")), 6).alias(
                "mean_daily"
            ),
            F.round(
                F.sqrt(
                    F.greatest(
                        F.first(
                            F.col("scc") / F.col("n_days")
                            - (F.col("sc") / F.col("n_days"))
                            * (F.col("sc") / F.col("n_days"))
                        ),
                        F.lit(0.0),
                    )
                ),
                6,
            ).alias("std_daily"),
            F.round(F.max("abs_s"), 6).alias("max_cusum"),
            F.coalesce(
                F.max("abs_s")
                > F.lit(threshold) * F.sqrt(F.first("n_days").cast("double")),
                F.lit(False),
            ).alias("drifted"),
        )
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier screen via Median Absolute Deviation —
    the heavy-tail-safe twin of the mean/std z-score (one giant value
    inflates a std enough to hide its peers; the median and MAD don't
    move). robust_z = |x − median| / (1.4826·MAD), the usual
    normal-consistency constant; flag at robust_z > k.

    Adds med / mad / robust_z (6 dp) / is_outlier to every input row.

    Scale shape: two exact-percentile aggregates (median, then MAD —
    two corpus passes are inherent to exact MAD since the deviations
    need the median first), each producing a |groups|-row frame that
    BROADCASTS back; the flagging pass is map-side. Swap F.percentile
    for approx_percentile when a per-group sort is unaffordable — the
    operator's contract (and its oracle) is the exact form.
    try_divide: a constant group (MAD 0) yields NULL z, not an ANSI
    error."""
    g = group_cols or []
    v = F.col(value_col)
    med = df.groupBy(*g).agg(F.percentile(v, 0.5).alias("med"))
    with_med = (
        df.join(F.broadcast(med), g) if g else df.crossJoin(F.broadcast(med))
    )
    mad = with_med.groupBy(*g).agg(
        F.percentile(F.abs(v - F.col("med")), 0.5).alias("mad")
    )
    scored = (
        with_med.join(F.broadcast(mad), g)
        if g
        else with_med.crossJoin(F.broadcast(mad))
    )
    z = F.try_divide(F.abs(v - F.col("med")), F.lit(1.4826) * F.col("mad"))
    return scored.select(
        *df.columns,
        F.round(F.col("med"), 6).alias("med"),
        F.round(F.col("mad"), 6).alias("mad"),
        F.round(z, 6).alias("robust_z"),
        F.coalesce(z > F.lit(k), F.lit(False)).alias("is_outlier"),
    )


def fd_histogram(df: DataFrame, value_col: str) -> DataFrame:
    """Auto-binned histogram with the Freedman-Diaconis rule — the
    profiling histogram that needs NO bin-count knob: width =
    2·IQR/n^(1/3) is robust to outliers (vs Sturges/sqrt rules that
    explode on heavy tails). Output per non-empty bin: (bin, lo, hi,
    cnt), lo/hi rounded 6.

    Scale shape: one exact-percentile aggregate (q1/q3/min/max/n — a
    single row, broadcast), then one map-side bin projection + one
    hash aggregate keyed by the bin id. Degenerate inputs (IQR 0,
    constant column) collapse to one bin covering the extent.
    Bin membership is floor((v−min)/w) evaluated in double — identical
    IEEE expression in any engine.
    """
    v = F.col(value_col)
    # NULLs out before binning: floor((NULL-lo)/w) is NULL and
    # F.least/greatest SKIP nulls, which would silently park every
    # NULL row in the last bin
    df = df.filter(v.isNotNull())
    stats = df.agg(
        F.percentile(v, 0.25).alias("q1"),
        F.percentile(v, 0.75).alias("q3"),
        F.min(v).cast("double").alias("lo_all"),
        F.max(v).cast("double").alias("hi_all"),
        F.count(v).alias("n"),
    )
    w = (
        2.0
        * (F.col("q3") - F.col("q1"))
        / F.pow(F.col("n").cast("double"), F.lit(1.0 / 3.0))
    )
    # degenerate guard: IQR 0 (or a single row) → one bin over the span
    width = F.when(w > 0, w).otherwise(
        F.when(
            F.col("hi_all") > F.col("lo_all"),
            F.col("hi_all") - F.col("lo_all"),
        ).otherwise(F.lit(1.0))
    )
    joined = df.select(v.cast("double").alias("__v")).crossJoin(
        F.broadcast(stats.withColumn("w", width))
    )
    bin_id = F.least(
        F.floor((F.col("__v") - F.col("lo_all")) / F.col("w")).cast("bigint"),
        # the max value lands exactly on the upper edge — clamp into
        # the last bin instead of opening a one-value overflow bin
        (
            F.ceil((F.col("hi_all") - F.col("lo_all")) / F.col("w")).cast("bigint")
            - 1
        ),
    )
    binned = joined.select(
        F.greatest(bin_id, F.lit(0)).alias("bin"), "lo_all", "w"
    )
    return (
        binned.groupBy("bin", "lo_all", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "bin",
            F.round(F.col("lo_all") + F.col("bin") * F.col("w"), 6).alias("lo"),
            F.round(F.col("lo_all") + (F.col("bin") + 1) * F.col("w"), 6).alias("hi"),
            "cnt",
        )
        .orderBy("bin")
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    lo_p: float = 0.01,
    hi_p: float = 0.99,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Percentile clamping — the REPAIR counterpart of the outlier
    screens (mad_outliers flags rows; winsorize caps the value so
    downstream means/regressions stop being hostage to the tail).
    Adds ``<value_col>_w`` (clamped, 6 dp) and ``was_clamped``.

    Scale shape: one exact-percentile aggregate per group (a
    |groups|-row frame, broadcast back), then a map-side clamp. The
    exact percentile is the contract (and the oracle); swap in
    approx_percentile when a per-group sort is unaffordable.
    """
    if not (0.0 <= lo_p < hi_p <= 1.0):
        raise ValueError(f"need 0 <= lo_p < hi_p <= 1, got {lo_p}, {hi_p}")
    g = group_cols or []
    v = F.col(value_col)
    bounds = df.groupBy(*g).agg(
        F.percentile(v, lo_p).alias("__lo"),
        F.percentile(v, hi_p).alias("__hi"),
    )
    j = df.join(F.broadcast(bounds), g) if g else df.crossJoin(
        F.broadcast(bounds)
    )
    # least/greatest SKIP NULLs (the fd_histogram lesson) — an
    # unguarded clamp would rewrite NULL values to the lower bound
    clamped = F.when(
        v.isNotNull(),
        F.least(F.greatest(v.cast("double"), F.col("__lo")), F.col("__hi")),
    )
    return j.select(
        *df.columns,
        F.round(clamped, 6).alias(f"{value_col}_w"),
        (
            v.isNotNull()
            & ((v < F.col("__lo")) | (v > F.col("__hi")))
        ).alias("was_clamped"),
    )


def benford_profile(df: DataFrame, value_col: str) -> DataFrame:
    """Benford first-significant-digit audit — the data-forensics
    screen for fabricated or unit-mangled numeric feeds (organic
    multi-scale data follows P(d) = log10(1 + 1/d); a constant-scale
    or synthetic feed does not, which is itself diagnostic). Emits one
    row per digit 1-9: observed count, observed/expected shares, and
    the digit's chi-square term (Σ terms = the test statistic).

    The first digit comes from a bounded CASE ladder over powers of
    ten (values 1e-9..1e18), NOT log10/pow — comparisons and one
    division are bit-identical in any engine, where a log10 at a
    power-of-ten knife edge need not be. Zero/NULL values are
    excluded (they have no first significant digit); negatives use
    |v|. One map-side projection + one 9-row aggregate.
    """
    v = F.abs(F.col(value_col).cast("double"))
    scaled = F.lit(None).cast("double")
    # build INSIDE-out: each F.when wraps the previous expression as
    # its otherwise, so the LAST-constructed branch is checked FIRST —
    # ascending construction puts the largest magnitude outermost
    # (descending construction would scale every value by 1e-9)
    for e in range(-9, 19):
        lo = float(10.0 ** e)
        scaled = F.when(v >= lo, v / F.lit(lo)).otherwise(scaled)
    digit = F.floor(scaled).cast("int")
    digits = (
        df.filter(F.col(value_col).isNotNull() & (v > 0))
        .select(digit.alias("digit"))
        .filter(F.col("digit").between(1, 9))
    )
    counts = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs")
    )
    base = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    total = counts.agg(F.sum("n_obs").alias("n"))
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        base.join(counts, "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
            F.round(F.coalesce("n_obs", F.lit(0)) / F.col("n"), 6).alias(
                "obs_share"
            ),
            F.round(expected, 6).alias("exp_share"),
            F.round(
                F.pow(
                    F.coalesce("n_obs", F.lit(0)) - F.col("n") * expected,
                    F.lit(2.0),
                )
                / (F.col("n") * expected),
                6,
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


def autocorr_daily(
    df: DataFrame,
    day_col: str,
    group_cols: list[str] | None = None,
    lags: list[int] | None = None,
    count_col: str | None = None,
) -> DataFrame:
    """Autocorrelation of a daily count series at the given lags —
    the seasonality screen next to cusum_drift (lag-7 near 1 says
    weekly cycle; lag-1 near 0 on a feed that should be smooth says
    noise or batching artifacts). Pearson r per (group, lag) over
    (c_d, c_{d−lag}) pairs matched by CALENDAR date (missing days
    break pairs rather than silently shifting the series, which a
    row-number lag would do).

    Scale shape: one corpus-sized map-combined daily aggregate;
    everything else — the lag self-join and the moment sums — runs on
    the (groups × days) frame. Counts are exact integers, so every
    moment is exact and r is bit-deterministic; try_divide yields NULL
    for constant series. ``count_col`` consumes pre-aggregated
    partials (the drift-store path)."""
    group_cols = group_cols or []
    lags = lags or [1, 7]
    if any(lag <= 0 for lag in lags):
        raise ValueError(f"lags must be positive: {lags}")
    daily = df.groupBy(*group_cols, day_col).agg(
        (F.sum(count_col) if count_col else F.count(F.lit(1)))
        .cast("long")
        .alias("c")
    )
    d = daily.withColumn("__d", F.to_date(F.col(day_col)))
    lag_lit = F.explode(F.array(*[F.lit(int(x)) for x in sorted(lags)]))
    a = d.select(
        *[F.col(c).alias(f"__ga_{c}") for c in group_cols],
        "__d",
        F.col("c").alias("x"),
        lag_lit.alias("lag"),
    )
    b = d.select(
        *[F.col(c).alias(f"__gb_{c}") for c in group_cols],
        F.col("__d").alias("__d2"),
        F.col("c").alias("y"),
    )
    cond = F.col("__d") == F.date_add(F.col("__d2"), F.col("lag"))
    for c in group_cols:
        cond = cond & (F.col(f"__ga_{c}") == F.col(f"__gb_{c}"))
    pairs = a.join(b, cond)
    m = pairs.groupBy(
        *[F.col(f"__ga_{c}").alias(c) for c in group_cols], "lag"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        *group_cols,
        "lag",
        "n_pairs",
        F.round(F.try_divide(num, den), 6).alias("autocorr"),
    )


# Poisson(1) inverse-CDF thresholds: cumulative pmf e^-1 * sum(1/j!).
# Literal doubles so the construction is bit-reproducible in any SQL
# engine (the oracle CASTs the same decimal strings to DOUBLE).
_POISSON1_CDF = [
    0.36787944117144233,  # P(X <= 0)
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,   # P(X <= 6); tail mass goes to w = 7
]


def bootstrap_ci(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    id_col: str,
    n_replicates: int = 50,
    alpha: float = 0.05,
) -> DataFrame:
    """Distributed Poisson bootstrap confidence interval for the
    per-group mean (the resampling scheme of Kleiner et al.'s scalable
    bootstrap line of work: with n large, multinomial(n, 1/n) row
    counts are ~ iid Poisson(1), so each replicate draws a per-row
    weight w ~ Poisson(1) instead of materializing a resample — no
    shuffle of the data, no driver-side loop).

    Determinism: w is the Poisson(1) inverse CDF applied to the md5
    fraction of (id_col ':' replicate) — bit-reproducible anywhere,
    layout-independent. Weighted sums accumulate in decimal(12,2)·w
    (exact, order-independent); division happens once, in double.

    Output per group: n (rows), mean_value, ci_lo, ci_hi (percentile
    bootstrap at alpha/2 and 1-alpha/2 over replicate means, round 6),
    n_reps (replicates with non-zero total weight).

    Scale shape: the ×R row expansion happens map-side and is folded
    by the partial aggregate before the shuffle — the exchange carries
    |groups|·R rows, not |corpus|·R. The percentile runs over R values
    per group. One corpus scan.
    """
    if n_replicates < 2:
        raise ValueError("bootstrap_ci: need n_replicates >= 2")
    base = df.select(
        *group_cols,
        F.col(id_col).cast("string").alias("__id"),
        F.col(value_col).cast("decimal(12,2)").alias("__v"),
    ).filter(F.col("__v").isNotNull())

    rep = base.select(
        *group_cols,
        "__id",
        "__v",
        F.explode(F.sequence(F.lit(0), F.lit(n_replicates - 1))).alias("__r"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("__id"), F.lit(":"), F.col("__r").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 32))
    )
    w = F.lit(len(_POISSON1_CDF))
    for j in range(len(_POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POISSON1_CDF[j]), F.lit(j)).otherwise(w)

    means = (
        rep.select(*group_cols, "__r", w.alias("__w"), F.col("__v"))
        .groupBy(*group_cols, "__r")
        .agg(
            F.sum(F.col("__w") * F.col("__v")).alias("__sw_v"),
            F.sum("__w").cast("long").alias("__sw"),
        )
        .filter(F.col("__sw") > 0)
        .select(
            *group_cols,
            (F.col("__sw_v").cast("double") / F.col("__sw").cast("double")).alias(
                "__m"
            ),
        )
    )
    ci = means.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_reps"),
        F.round(F.expr(f"percentile(__m, {alpha / 2!r})"), 6).alias("ci_lo"),
        F.round(F.expr(f"percentile(__m, {1 - alpha / 2!r})"), 6).alias("ci_hi"),
    )
    point = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum("__v").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("mean_value"),
    )
    return point.join(ci, list(group_cols)).select(
        *group_cols, "n", "mean_value", "ci_lo", "ci_hi", "n_reps"
    )


def ewma_anomaly(
    df: DataFrame,
    day_col: str,
    group_cols: list[str] | None = None,
    alpha: float = 0.3,
    lookback: int = 7,
    rel_threshold: float = 0.5,
    count_col: str | None = None,
) -> DataFrame:
    """EWMA anomaly screen over a daily count series — the per-DAY
    complement of :func:`cusum_drift` (CUSUM answers "did the LEVEL
    shift somewhere"; this answers "which individual days are off"):
    each day's count is compared to the exponentially weighted mean of
    its previous ``lookback`` days, and flagged when the relative
    deviation exceeds ``rel_threshold``.

    The EWMA is the FINITE lag form — Σ_j (1-α)^(j-1)·x_{t-j} over the
    available prior days, normalized by the matching weight sum — not
    the infinite recursion: a lag chain is a per-row closed form both
    engines evaluate bit-identically (the recursive form needs either
    an unbounded running product, which underflows/diverges on long
    series, or sequential state). Missing leading lags renormalize
    automatically (day 2 is judged against 1 prior day); day 1 has no
    baseline and is never flagged.

    Output per (group, day): cnt, ewma_prior (6 dp), rel_dev (6 dp),
    is_anomaly. Relative deviation uses max(ewma, 1.0) as the floor so
    near-zero baselines don't flag on noise of a few events.

    Scale shape: ONE corpus-sized hash aggregate (map-combined) to
    daily counts; the lag window runs over groups × days rows. Counts
    are exact longs; the EWMA is one fused double expression with
    literal weights — layout-independent, engine-identical.
    """
    if not 0 < alpha < 1:
        raise ValueError("ewma_anomaly: alpha must be in (0, 1)")
    if lookback < 1:
        raise ValueError("ewma_anomaly: lookback must be >= 1")
    from pyspark.sql.window import Window

    group_cols = group_cols or []
    daily = df.groupBy(*group_cols, day_col).agg(
        (F.sum(count_col) if count_col else F.count(F.lit(1)))
        .cast("long")
        .alias("cnt")
    )
    w = Window.partitionBy(*group_cols).orderBy(day_col)
    lags = [F.lag("cnt", j).over(w) for j in range(1, lookback + 1)]
    weights = [(1.0 - alpha) ** (j - 1) for j in range(1, lookback + 1)]
    num = sum(
        (F.coalesce(lg.cast("double"), F.lit(0.0)) * F.lit(wt)
         for lg, wt in zip(lags, weights)),
        F.lit(0.0),
    )
    den = sum(
        (F.when(lg.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
         for lg, wt in zip(lags, weights)),
        F.lit(0.0),
    )
    ewma = F.try_divide(num, den)  # NULL on day 1 (no priors)
    rel = F.abs(F.col("cnt").cast("double") - ewma) / F.greatest(
        ewma, F.lit(1.0)
    )
    return daily.select(
        *group_cols,
        day_col,
        "cnt",
        F.round(ewma, 6).alias("ewma_prior"),
        F.round(rel, 6).alias("rel_dev"),
        F.coalesce(rel > F.lit(rel_threshold), F.lit(False)).alias(
            "is_anomaly"
        ),
    )


def categorical_mi(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Mutual information between two categorical columns, decomposed
    into per-cell terms — the dependence screen a feature audit runs
    ("does event type carry information about the value band?"):
    MI = Σ_cells p(x,y)·ln(p(x,y)/(p(x)p(y))). Zero iff independent;
    each cell's term shows WHERE the dependence lives (positive =
    over-represented pair, negative = under-represented).

    Output per observed (x, y) cell: n_xy and mi_term (6 dp);
    Σ mi_term is the MI in nats. NULLs in either column are excluded
    (a NULL is missingness, not a category).

    Numerics: the log ratio is computed as ln(n_xy)+ln(n)−ln(n_x)
    −ln(n_y) — never the n_xy·n product, which exceeds int64 once
    corpus×cell counts pass ~9.2e18. Exact-long inputs, one fixed
    expression order: engine-identical doubles before the final round.

    Scale shape: ONE corpus-sized hash aggregate to joint counts
    (map-combined); marginals and the total derive from the joint
    frame (|X|·|Y| rows) and come back as broadcasts. No second scan.
    """
    x, y = F.col(x_col), F.col(y_col)
    joint = (
        df.filter(x.isNotNull() & y.isNotNull())
        .groupBy(x_col, y_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
    )
    jx = joint.groupBy(x_col).agg(F.sum("n_xy").cast("long").alias("__n_x"))
    jy = joint.groupBy(y_col).agg(F.sum("n_xy").cast("long").alias("__n_y"))
    tot = joint.agg(F.sum("n_xy").cast("long").alias("__n"))
    term = (
        F.col("n_xy").cast("double") / F.col("__n").cast("double")
    ) * (
        F.log(F.col("n_xy").cast("double"))
        + F.log(F.col("__n").cast("double"))
        - F.log(F.col("__n_x").cast("double"))
        - F.log(F.col("__n_y").cast("double"))
    )
    return (
        joint.join(F.broadcast(jx), x_col)
        .join(F.broadcast(jy), y_col)
        .crossJoin(F.broadcast(tot))
        .select(
            x_col,
            y_col,
            "n_xy",
            F.round(term, 6).alias("mi_term"),
        )
    )


def chi2_independence(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Pearson chi-squared test of independence between two
    categorical columns — the significance companion to
    :func:`categorical_mi` (MI says HOW MUCH dependence; chi² says
    whether the dependence clears sampling noise): χ² = Σ_cells
    (o − e)²/e with e = n_x·n_y/n, df = (R−1)(C−1), plus Cramér's V
    = sqrt(χ² / (n·min(R−1, C−1))) as the [0, 1] effect size.

    Numerics: counts are exact longs; each cell's term is one
    fixed-order double expression (n_x·n_y stays in doubles — never
    an int64 product, the categorical_mi discipline), rounded to 6 dp
    PER CELL and accumulated in decimal(18,6) so the cross-cell sum
    is exact and summation-order-free — a double Σ over cells would
    be engine-order-dependent. V and the final χ² cast back to double
    at the output.

    Scale shape: ONE corpus-sized hash aggregate to the joint
    contingency; marginals, the total, and the category counts all
    derive from that |X|·|Y|-row frame and come back as broadcasts.
    Output: one row (n, n_x_cats, n_y_cats, dof, chi2, cramers_v);
    dof = 0 (single row or column) yields chi2 = 0 (expected equals
    observed everywhere) and NULL V (0/0 via try_divide, not a crash).
    """
    x, y = F.col(x_col), F.col(y_col)
    joint = (
        df.filter(x.isNotNull() & y.isNotNull())
        .groupBy(x_col, y_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
    )
    jx = joint.groupBy(x_col).agg(F.sum("n_xy").cast("long").alias("__n_x"))
    jy = joint.groupBy(y_col).agg(F.sum("n_xy").cast("long").alias("__n_y"))
    tot = joint.agg(
        F.sum("n_xy").cast("long").alias("__n"),
        F.count_distinct(x).cast("long").alias("__r"),
        F.count_distinct(y).cast("long").alias("__c"),
    )
    # Full R x C grid: zero-observed cells still carry (0 - e)^2/e
    # mass — omitting them understates chi2 (a perfect 2x2 association
    # would read n/2, not n). The grid is category-product-sized.
    grid = jx.crossJoin(jy).join(joint, [x_col, y_col], "left")
    o = F.coalesce(F.col("n_xy"), F.lit(0)).cast("double")
    e = (
        F.col("__n_x").cast("double")
        * F.col("__n_y").cast("double")
        / F.col("__n").cast("double")
    )
    term = F.round((o - e) * (o - e) / e, 6).cast("decimal(18,6)")
    cells = grid.crossJoin(F.broadcast(tot)).select(
        term.alias("__term"), "__n", "__r", "__c"
    )
    agg = cells.groupBy("__n", "__r", "__c").agg(
        F.sum("__term").alias("__chi2")
    )
    chi2 = F.col("__chi2").cast("double")
    dof = (F.col("__r") - 1) * (F.col("__c") - 1)
    v = F.sqrt(
        F.try_divide(
            chi2,
            F.col("__n").cast("double")
            * F.least(F.col("__r") - 1, F.col("__c") - 1).cast("double"),
        )
    )
    return agg.select(
        F.col("__n").alias("n"),
        F.col("__r").alias("n_x_cats"),
        F.col("__c").alias("n_y_cats"),
        dof.cast("long").alias("dof"),
        F.round(chi2, 6).alias("chi2"),
        F.round(v, 6).alias("cramers_v"),
    )


def fd_confidence(
    df: DataFrame,
    deps: list[tuple[str, str]],
) -> DataFrame:
    """Approximate functional-dependency profiling: for each candidate
    X → Y, the g3 confidence — the fraction of rows that survive if
    every X keeps only its MAJORITY Y (Kivinen & Mannila's g3, the
    measure TANE-style profilers report). Confidence 1 means the FD
    holds exactly; the violation count is the minimum number of rows
    you'd have to delete to make it hold — the schema-discovery /
    data-quality screen beside :func:`~hypermap_etl_spark.operators.
    constraints.check_constraints` (which VERIFIES declared rules,
    where this DISCOVERS candidate ones).

    Per pair: ONE hash aggregate to (X, Y) counts, a second to per-X
    (max, total) — both map-combined, both bounded by value
    cardinality after the first — then a three-scalar reduction. All
    counts exact longs; confidence is one final ratio. NULL X or Y
    rows are excluded (missingness is not a dependency violation).

    Output per pair: (det_col, dep_col, n_rows, n_det_keys,
    n_violations, confidence). Pairs evaluate independently and
    union; an empty input yields confidence NULL (0/0 via
    try_divide).
    """
    if not deps:
        raise ValueError("deps must name at least one (det, dep) pair")
    outs = []
    for det, dep in deps:
        cxy = (
            df.filter(F.col(det).isNotNull() & F.col(dep).isNotNull())
            .groupBy(det, dep)
            .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        )
        cx = cxy.groupBy(det).agg(
            F.max("__c").alias("__mx"), F.sum("__c").alias("__tot")
        )
        agg = cx.agg(
            F.count(F.lit(1)).cast("long").alias("n_det_keys"),
            F.sum("__tot").cast("long").alias("n_rows"),
            F.sum("__mx").cast("long").alias("__kept"),
        )
        outs.append(
            agg.select(
                F.lit(det).alias("det_col"),
                F.lit(dep).alias("dep_col"),
                "n_rows",
                "n_det_keys",
                (F.col("n_rows") - F.col("__kept")).alias("n_violations"),
                F.round(
                    F.try_divide(
                        F.col("__kept").cast("double"),
                        F.col("n_rows").cast("double"),
                    ),
                    6,
                ).alias("confidence"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def basket_rules(
    df: DataFrame,
    basket_cols: list[str],
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Pairwise association rules (the 2-itemset level of Apriori,
    Agrawal & Srikant 1994) over baskets: for every unordered item
    pair co-occurring in ≥ ``min_support`` baskets, the support,
    both directed confidences, and the lift — "users who do A in a
    session also do B", the market-basket screen the co-purchase
    graph family (triangles/k-core) looks at structurally and this
    reads probabilistically.

    Construction: baskets collapse to DISTINCT (basket, item) rows
    (presence, not multiplicity — the standard basket semantics);
    pair counts come from the within-basket self-join a < b (bounded
    by basket sizes, the same shape as the co-purchase edge builder);
    item marginals and the basket total broadcast back. Every metric
    is a ratio of exact longs, rounded at the output; lift uses the
    log-free n_ab·N/(n_a·n_b) form in doubles (fixed order).

    Output per pair: (item_a, item_b, n_baskets_pair, support,
    conf_a_to_b, conf_b_to_a, lift). support = n_pair / N baskets.
    """
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    b_keys = [F.col(c) for c in basket_cols]
    items = (
        df.filter(
            F.col(item_col).isNotNull()
            & F.expr(" AND ".join(f"{c} IS NOT NULL" for c in basket_cols))
        )
        .select(*basket_cols, F.col(item_col).alias("__i"))
        .distinct()
    )
    from hypermap_etl_spark.util import tracked_persist

    items = tracked_persist(items)
    n_baskets = items.select(*basket_cols).distinct().count()
    marg = items.groupBy("__i").agg(F.count(F.lit(1)).cast("long").alias("__m"))
    a = items.select(*basket_cols, F.col("__i").alias("item_a"))
    b = items.select(*basket_cols, F.col("__i").alias("item_b"))
    pairs = (
        a.join(b, basket_cols)
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_baskets_pair"))
        .filter(F.col("n_baskets_pair") >= min_support)
    )
    out = (
        pairs.join(
            marg.select(F.col("__i").alias("item_a"), F.col("__m").alias("__ma")),
            "item_a",
        )
        .join(
            marg.select(F.col("__i").alias("item_b"), F.col("__m").alias("__mb")),
            "item_b",
        )
    )
    np_, ma, mb = (
        F.col("n_baskets_pair").cast("double"),
        F.col("__ma").cast("double"),
        F.col("__mb").cast("double"),
    )
    return out.select(
        "item_a",
        "item_b",
        "n_baskets_pair",
        F.round(np_ / F.lit(float(n_baskets)), 6).alias("support"),
        F.round(np_ / ma, 6).alias("conf_a_to_b"),
        F.round(np_ / mb, 6).alias("conf_b_to_a"),
        F.round(np_ * F.lit(float(n_baskets)) / (ma * mb), 6).alias("lift"),
    )


def did_estimate(
    df: DataFrame,
    value_col: str,
    unit_col: str,
    period_col: str,
    salt: str = "ab",
    crit: float = 1.96,
) -> DataFrame:
    """Difference-in-differences on the deterministic hash split —
    the parallel-trends member of the experimentation family beside
    :func:`welch_ab_test` (post-only comparison) and the drift
    screens: effect = (B̄_post − B̄_pre) − (Ā_post − Ā_pre), removing
    any shared time shock the A/B launch coincided with. ``period_col``
    is a caller-supplied 0/1 pre/post flag (a fixed cutoff expression,
    so both engines bucket identically).

    Numerics: the four (arm, period) cells aggregate exact
    decimal(12,2) sums and sums of squares (the welch_ab_test
    discipline); the estimate and its pooled-variance z are one
    fixed-order double tail, SE² = Σ s²_i/n_i over the four cells.
    Output one row: (n_pre_a, n_post_a, n_pre_b, n_post_b, did,
    z_stat, significant); NULL z when any cell has < 2 rows.
    """
    v = F.col(value_col).cast("decimal(12,2)")
    arm = _hash_arm(unit_col, salt)
    base = df.filter(
        v.isNotNull()
        & F.col(unit_col).isNotNull()
        & F.col(period_col).isNotNull()
    ).select(
        arm.alias("__arm"),
        F.col(period_col).cast("int").alias("__post"),
        v.alias("__v"),
    )
    cells = base.groupBy("__arm", "__post").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__v").alias("__s"),
        F.sum(F.col("__v") * F.col("__v")).alias("__ss"),
    )
    # pivot the 4 cells into one row via conditional aggregation
    def cell(a: int, p: int, col: str):
        return F.sum(
            F.when(
                (F.col("__arm") == a) & (F.col("__post") == p), F.col(col)
            )
        )

    g = cells.agg(
        *[
            cell(a, p, "__n").cast("long").alias(f"__n{a}{p}")
            for a in (0, 1)
            for p in (0, 1)
        ],
        *[
            cell(a, p, "__s").alias(f"__s{a}{p}")
            for a in (0, 1)
            for p in (0, 1)
        ],
        *[
            cell(a, p, "__ss").alias(f"__q{a}{p}")
            for a in (0, 1)
            for p in (0, 1)
        ],
    )

    def mean(a: int, p: int):
        return F.col(f"__s{a}{p}").cast("double") / F.col(
            f"__n{a}{p}"
        ).cast("double")

    def var_over_n(a: int, p: int):
        n = F.col(f"__n{a}{p}").cast("double")
        s = F.col(f"__s{a}{p}").cast("double")
        q = F.col(f"__q{a}{p}").cast("double")
        # sample variance / n, guarded below by the n >= 2 filter
        return (q - s * s / n) / (n - F.lit(1.0)) / n

    did = (mean(1, 1) - mean(1, 0)) - (mean(0, 1) - mean(0, 0))
    se = F.sqrt(
        var_over_n(0, 0) + var_over_n(0, 1)
        + var_over_n(1, 0) + var_over_n(1, 1)
    )
    ok = None
    for a in (0, 1):
        for p in (0, 1):
            c = F.col(f"__n{a}{p}") >= 2
            ok = c if ok is None else (ok & c)
    z = F.when(ok, F.try_divide(did, se))
    return g.select(
        F.col("__n00").alias("n_pre_a"),
        F.col("__n01").alias("n_post_a"),
        F.col("__n10").alias("n_pre_b"),
        F.col("__n11").alias("n_post_b"),
        F.round(did, 6).alias("did"),
        F.round(z, 6).alias("z_stat"),
        F.coalesce(F.abs(z) > F.lit(crit), F.lit(False)).alias("significant"),
    )


def km_survival(
    lifetimes: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier survival curve — the censoring-correct retention
    view (a plain "% still active after t" treats still-active users
    as churned-at-now; KM doesn't): at each observed event time t,
    S(t) ← S(t⁻)·(1 − d_t/n_t) with d_t the events at t and n_t the
    at-risk count (duration ≥ t). Input: one row per subject with an
    integer ``duration_col`` and 0/1 ``event_col`` (1 = event
    observed, 0 = right-censored).

    Engine-exact construction: d_t and the censored count collapse to
    ONE duration-keyed aggregate; n_t is the total minus the running
    count of shorter durations (exact longs from a duration-ordered
    window over the DISTINCT-duration frame); the survival product
    runs as exp(Σ ln(1 − d/n)) with each ln term rounded to 9 dp and
    accumulated in a decimal(38,9) ORDERED running sum — decimal
    window sums are exact, so the curve is bit-identical in any
    engine (the product-as-log-cumsum dodge for float products).
    Durations where d_t = n_t end the curve at exactly 0 (the ln
    would be -inf; the term is replaced by NULL and surfaced via
    s_zero, keeping the frame total).

    Output per observed-event duration: (t, n_at_risk, n_events,
    n_censored_at_t, survival).
    """
    from pyspark.sql.window import Window

    d = F.col(duration_col).cast("long")
    e = F.col(event_col).cast("int")
    per_t = (
        lifetimes.filter(d.isNotNull() & e.isNotNull())
        .groupBy(d.alias("t"))
        .agg(
            F.sum(e).cast("long").alias("__d"),
            F.sum(F.lit(1) - e).cast("long").alias("__c"),
        )
    )
    w_prior = (
        Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    )
    tot = per_t.agg(
        F.sum(F.col("__d") + F.col("__c")).cast("long").alias("__n")
    )
    risk = per_t.crossJoin(F.broadcast(tot)).withColumn(
        "__at_risk",
        F.col("__n")
        - F.coalesce(F.sum(F.col("__d") + F.col("__c")).over(w_prior), F.lit(0)),
    )
    term = F.when(
        F.col("__d") < F.col("__at_risk"),
        F.round(
            F.log(
                F.lit(1.0)
                - F.col("__d").cast("double") / F.col("__at_risk").cast("double")
            ),
            9,
        ).cast("decimal(38,9)"),
    )
    w_run = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = risk.withColumn("__lt", term).withColumn(
        "__ls", F.sum("__lt").over(w_run)
    ).withColumn(
        # once any prior duration had d == n_at_risk the curve is 0
        "__dead",
        F.max(F.when(F.col("__lt").isNull(), 1).otherwise(0)).over(w_run),
    )
    surv = F.when(F.col("__dead") == 1, F.lit(0.0)).otherwise(
        F.exp(F.col("__ls").cast("double"))
    )
    return (
        cum.filter(F.col("__d") > 0)
        .select(
            "t",
            F.col("__at_risk").alias("n_at_risk"),
            F.col("__d").alias("n_events"),
            F.col("__c").alias("n_censored_at_t"),
            F.round(surv, 6).alias("survival"),
        )
        .orderBy("t")
    )


def logrank_test(
    lifetimes: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
    crit: float = 1.96,
) -> DataFrame:
    """Two-group log-rank test — does retention DIFFER between the
    arms (the inference companion to :func:`km_survival`'s curves)?
    At each event time, compare arm A's observed events against the
    hypergeometric expectation d_t·n_At/n_t; the standardized sum is
    the log-rank z (Mantel 1966). ``group_col`` is a 0/1 arm flag
    (callers usually derive it from the shared md5 split).

    Engine-exact: per-time at-risk and event counts are exact longs
    from prior-duration running sums over the distinct-duration
    frame; each time's expectation and hypergeometric variance terms
    round to 9 dp and accumulate in decimal(38,9) — order-free cross-
    time sums — with one double tail. NULL z when the variance
    degenerates (no time with both arms at risk). Output one row:
    (n_groups_0, n_groups_1, observed_1, expected_1, z_stat,
    significant).
    """
    from pyspark.sql.window import Window

    d = F.col(duration_col).cast("long")
    e = F.col(event_col).cast("int")
    g = F.col(group_col).cast("int")
    per_t = (
        lifetimes.filter(d.isNotNull() & e.isNotNull() & g.isNotNull())
        .groupBy(d.alias("t"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("__m"),
            F.sum(e).cast("long").alias("__d"),
            F.sum(g).cast("long").alias("__m1"),
            F.sum(e * g).cast("long").alias("__d1"),
        )
    )
    w_prior = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    tot = per_t.agg(
        F.sum("__m").cast("long").alias("__n"),
        F.sum("__m1").cast("long").alias("__n1g"),
    )
    risk = (
        per_t.crossJoin(F.broadcast(tot))
        .withColumn(
            "__nt",
            F.col("__n") - F.coalesce(F.sum("__m").over(w_prior), F.lit(0)),
        )
        .withColumn(
            "__nt1",
            F.col("__n1g")
            - F.coalesce(F.sum("__m1").over(w_prior), F.lit(0)),
        )
        .filter(F.col("__d") > 0)
    )
    nt, nt1 = F.col("__nt").cast("double"), F.col("__nt1").cast("double")
    dt = F.col("__d").cast("double")
    exp_term = F.round(dt * nt1 / nt, 9).cast("decimal(38,9)")
    var_term = F.when(
        F.col("__nt") > 1,
        F.round(
            dt
            * (nt1 / nt)
            * (F.lit(1.0) - nt1 / nt)
            * (nt - dt)
            / (nt - F.lit(1.0)),
            9,
        ).cast("decimal(38,9)"),
    ).otherwise(F.lit(0).cast("decimal(38,9)"))
    agg = risk.agg(
        F.sum("__d1").cast("long").alias("observed_1"),
        F.sum(exp_term).alias("__e1"),
        F.sum(var_term).alias("__v"),
    )
    counts = tot.select(
        (F.col("__n") - F.col("__n1g")).alias("n_group_0"),
        F.col("__n1g").alias("n_group_1"),
    )
    e1 = F.col("__e1").cast("double")
    v = F.col("__v").cast("double")
    z = F.when(
        v > 0, (F.col("observed_1").cast("double") - e1) / F.sqrt(v)
    )
    return agg.crossJoin(F.broadcast(counts)).select(
        "n_group_0",
        "n_group_1",
        "observed_1",
        F.round(e1, 6).alias("expected_1"),
        F.round(z, 6).alias("z_stat"),
        F.coalesce(F.abs(z) > F.lit(crit), F.lit(False)).alias("significant"),
    )


def poststrat_ab(
    df: DataFrame,
    value_col: str,
    unit_col: str,
    stratum_col: str,
    salt: str = "ab",
    crit: float = 1.96,
) -> DataFrame:
    """Post-stratified A/B estimate — the covariate-free variance
    reducer beside :func:`cuped_adjust` (which needs a pre-period
    metric; this needs only a categorical): effect =
    Σ_s w_s (ȳ_Bs − ȳ_As) with w_s each stratum's share of ALL rows,
    removing the noise from arms landing unevenly across strata.
    Strata where either arm is empty are EXCLUDED and surfaced via
    n_strata_used / n_strata_total (the standard estimand caveat,
    reported rather than silently absorbed).

    Numerics: per-(stratum, arm) cells aggregate exact decimal(12,2)
    sums and squares (the welch discipline); stratum weights are
    exact-long ratios; the estimate and its variance
    Σ_s w_s² (s²_As/n_As + s²_Bs/n_Bs) accumulate as 9-dp-rounded
    decimal(38,9) terms (order-free across strata) with one double
    tail. NULL z when any used cell has < 2 rows or the variance
    degenerates. Output one row: (n_strata_total, n_strata_used,
    n_a, n_b, effect_raw, effect_strat, z_strat, significant).
    """
    v = F.col(value_col).cast("decimal(12,2)")
    arm = _hash_arm(unit_col, salt)
    base = df.filter(
        v.isNotNull()
        & F.col(unit_col).isNotNull()
        & F.col(stratum_col).isNotNull()
    ).select(
        F.col(stratum_col).alias("__s"), arm.alias("__arm"), v.alias("__v")
    )
    cells = base.groupBy("__s", "__arm").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__v").alias("__sum"),
        F.sum(F.col("__v") * F.col("__v")).alias("__ss"),
    )
    strat = cells.groupBy("__s").agg(
        F.sum("__n").cast("long").alias("__w"),
        F.min("__n").cast("long").alias("__minn"),
        F.count(F.lit(1)).cast("long").alias("__arms"),
        F.sum(F.when(F.col("__arm") == 0, F.col("__n"))).cast("long").alias("__na"),
        F.sum(F.when(F.col("__arm") == 1, F.col("__n"))).cast("long").alias("__nb"),
        F.sum(F.when(F.col("__arm") == 0, F.col("__sum"))).alias("__sa"),
        F.sum(F.when(F.col("__arm") == 1, F.col("__sum"))).alias("__sb"),
        F.sum(F.when(F.col("__arm") == 0, F.col("__ss"))).alias("__qa"),
        F.sum(F.when(F.col("__arm") == 1, F.col("__ss"))).alias("__qb"),
    )
    tot = strat.agg(F.sum("__w").cast("long").alias("__t"))
    used = strat.filter(F.col("__arms") == 2).crossJoin(F.broadcast(tot))
    wna, wnb = F.col("__na").cast("double"), F.col("__nb").cast("double")
    ws = F.col("__w").cast("double") / F.col("__t").cast("double")
    diff = (
        F.col("__sb").cast("double") / wnb
        - F.col("__sa").cast("double") / wna
    )
    var_a = (
        F.col("__qa").cast("double")
        - F.col("__sa").cast("double") * F.col("__sa").cast("double") / wna
    ) / (wna - F.lit(1.0))
    var_b = (
        F.col("__qb").cast("double")
        - F.col("__sb").cast("double") * F.col("__sb").cast("double") / wnb
    ) / (wnb - F.lit(1.0))
    eff_term = F.round(ws * diff, 9).cast("decimal(38,9)")
    var_term = F.when(
        F.col("__minn") >= 2,
        F.round(ws * ws * (var_a / wna + var_b / wnb), 9),
    ).cast("decimal(38,9)")
    g = used.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata_used"),
        F.sum("__na").cast("long").alias("n_a"),
        F.sum("__nb").cast("long").alias("n_b"),
        F.sum("__sa").alias("__tsa"),
        F.sum("__sb").alias("__tsb"),
        F.sum(eff_term).alias("__eff"),
        F.sum(var_term).alias("__var"),
        F.min("__minn").cast("long").alias("__cellmin"),
    )
    n_tot = strat.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata_total")
    )
    eff = F.col("__eff").cast("double")
    var = F.col("__var").cast("double")
    raw = (
        F.col("__tsb").cast("double") / F.col("n_b").cast("double")
        - F.col("__tsa").cast("double") / F.col("n_a").cast("double")
    )
    z = F.when(
        (F.col("__cellmin") >= 2) & (var > 0), eff / F.sqrt(var)
    )
    return g.crossJoin(F.broadcast(n_tot)).select(
        "n_strata_total",
        "n_strata_used",
        "n_a",
        "n_b",
        F.round(raw, 6).alias("effect_raw"),
        F.round(eff, 6).alias("effect_strat"),
        F.round(z, 6).alias("z_strat"),
        F.coalesce(F.abs(z) > F.lit(crit), F.lit(False)).alias("significant"),
    )


def srm_check(
    df: DataFrame,
    unit_col: str,
    salt: str = "ab",
    crit: float = 3.0,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Sample-ratio-mismatch check — the first thing a healthy
    experimentation pipeline verifies before reading ANY metric: do
    the arms hold the expected 50/50 share of UNITS (not rows)? A
    mismatch means broken assignment or differential logging loss,
    and every downstream stat is suspect. z = (n_a − n/2)/sqrt(n/4),
    flagged at |z| > ``crit`` (3.0 ≈ the α=0.0027 bar SRM checks
    conventionally use — stricter than metric tests because the null
    REALLY should hold).

    One distinct-unit aggregate; arm by the md5(salt:unit) parity
    shared with the whole A/B family, so this certifies the very
    split welch/MW/KS/DiD/CUPED read. Exact longs, one double tail.
    Output: (group..., n_units, n_a, n_b, z_stat, srm_suspected).

    With ``group_cols`` the check runs per SEGMENT over distinct
    (group, unit) pairs — the global 50/50 can hold while one surface
    silently drops an arm's logs (differential loss), which only the
    segmented view catches. A unit active in k segments counts once
    per segment, by design.
    """
    group_cols = group_cols or []
    arm = _hash_arm("__u", salt)
    units = (
        df.filter(F.col(unit_col).isNotNull())
        .select(*group_cols, F.col(unit_col).alias("__u"))
        .distinct()
        .select(*group_cols, arm.alias("__arm"))
    )
    g = units.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum(F.when(F.col("__arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
    )
    n = F.col("n_units").cast("double")
    z = F.try_divide(
        F.col("n_a").cast("double") - n / F.lit(2.0),
        F.sqrt(n / F.lit(4.0)),
    )
    return g.select(
        *group_cols,
        "n_units",
        "n_a",
        (F.col("n_units") - F.col("n_a")).alias("n_b"),
        F.round(z, 6).alias("z_stat"),
        F.coalesce(F.abs(z) > F.lit(crit), F.lit(False)).alias(
            "srm_suspected"
        ),
    )


def cuped_adjust(
    units: DataFrame,
    x_col: str,
    y_col: str,
    unit_col: str,
    salt: str = "ab",
    crit: float = 1.96,
) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013 — the industry-
    standard experiment adjuster): regress the experiment metric y on
    a pre-experiment covariate x, analyze ỹ = y − θ(x − x̄) instead;
    same expectation (x predates assignment), variance shrunk by the
    squared correlation. Input: ONE ROW PER UNIT carrying exact
    pre/post aggregates (e.g. per-user pre-period and post-period
    spend sums — the caller builds them with exact decimal sums, zero-
    filled for inactive periods so the unit set is assignment-
    complete).

    Construction: arms by the md5(salt:unit) parity (the welch
    discipline); θ = pooled cov(x, y)/var(x). Every moment (Σx, Σy,
    Σxy, Σx², Σy², per arm) accumulates in decimal — unit aggregates
    cap at decimal(18,2) so cross-moments fit decimal(38,4), a
    documented per-unit-total bound of 10^16 cents — and the θ /
    adjusted-effect / z tail is one fixed-order double expression.
    Output one row: (n_a, n_b, theta, effect_raw, effect_adj, z_adj,
    var_reduction, significant); NULL z when either arm has < 2
    units or the adjusted variance degenerates.
    """
    x = F.col(x_col).cast("decimal(18,2)")
    y = F.col(y_col).cast("decimal(18,2)")
    arm = _hash_arm(unit_col, salt)
    base = units.filter(
        F.col(unit_col).isNotNull() & x.isNotNull() & y.isNotNull()
    ).select(arm.alias("__arm"), x.alias("__x"), y.alias("__y"))
    d38 = "decimal(38,4)"
    per_arm = base.groupBy("__arm").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum((F.col("__x") * F.col("__y")).cast(d38)).cast(d38).alias("__sxy"),
        F.sum((F.col("__x") * F.col("__x")).cast(d38)).cast(d38).alias("__sxx"),
        F.sum((F.col("__y") * F.col("__y")).cast(d38)).cast(d38).alias("__syy"),
    )

    def side(a: int, col: str, alias: str):
        return F.sum(F.when(F.col("__arm") == a, F.col(col))).alias(alias)

    g = per_arm.agg(
        *[side(a, "__n", f"n_{s}") for a, s in ((0, "a"), (1, "b"))],
        *[side(a, c, f"__{c[2:]}{s}")
          for a, s in ((0, "a"), (1, "b"))
          for c in ("__sx", "__sy", "__sxy", "__sxx", "__syy")],
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    n = na + nb

    def d(name: str):
        return F.col(name).cast("double")

    sx = d("__sxa") + d("__sxb")
    sy = d("__sya") + d("__syb")
    sxy = d("__sxya") + d("__sxyb")
    sxx = d("__sxxa") + d("__sxxb")
    theta = F.try_divide(sxy - sx * sy / n, sxx - sx * sx / n)
    mxa, mxb = d("__sxa") / na, d("__sxb") / nb
    mya, myb = d("__sya") / na, d("__syb") / nb
    mx = sx / n
    adj_a = mya - theta * (mxa - mx)
    adj_b = myb - theta * (mxb - mx)

    def var_adj(s: str, cnt):
        # var(y - theta x) = var_y - 2 theta cov + theta^2 var_x (sample)
        return (
            (d(f"__syy{s}") - d(f"__sy{s}") * d(f"__sy{s}") / cnt)
            - F.lit(2.0) * theta
            * (d(f"__sxy{s}") - d(f"__sx{s}") * d(f"__sy{s}") / cnt)
            + theta * theta
            * (d(f"__sxx{s}") - d(f"__sx{s}") * d(f"__sx{s}") / cnt)
        ) / (cnt - F.lit(1.0))

    va, vb = var_adj("a", na), var_adj("b", nb)
    vy_pool = (
        (d("__syya") + d("__syyb")) - sy * sy / n
    ) / (n - F.lit(1.0))
    vadj_pool = (
        (d("__syya") + d("__syyb"))
        - F.lit(2.0) * theta * sxy
        + theta * theta * sxx
        - (sy - theta * sx) * (sy - theta * sx) / n
    ) / (n - F.lit(1.0))
    effect_raw = myb - mya
    effect_adj = adj_b - adj_a
    se = F.sqrt(va / na + vb / nb)
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2)
    z = F.when(ok, F.try_divide(effect_adj, se))
    return g.select(
        "n_a",
        "n_b",
        F.round(theta, 6).alias("theta"),
        F.round(effect_raw, 6).alias("effect_raw"),
        F.round(effect_adj, 6).alias("effect_adj"),
        F.round(z, 6).alias("z_adj"),
        F.round(F.lit(1.0) - F.try_divide(vadj_pool, vy_pool), 6).alias(
            "var_reduction"
        ),
        F.coalesce(F.abs(z) > F.lit(crit), F.lit(False)).alias("significant"),
    )


def fano_factor(
    df: DataFrame,
    day_col: str,
    group_cols: list[str] | None = None,
    count_col: str | None = None,
) -> DataFrame:
    """Fano factor (variance-to-mean ratio) of a daily count series —
    the dispersion screen beside :func:`bot_regularity_screen` (which
    reads gap CV; this reads COUNT burstiness): a Poisson-like steady
    process sits near 1, bursty organic traffic far above, and a
    metronomic bot well below. F = Var(c)/E[c] over the per-(group,
    day) counts, population variance.

    Numerics — exact: daily counts are integers, so Σc and Σc²
    accumulate in decimal(19,0)-product/(38,0)-sum arithmetic and
    F = (n·Σc² − (Σc)²)/(n·Σc) is one fixed-order double expression
    over exact aggregates (the common 1/n cancels). NULL F when the
    mean is zero (try_divide). ``count_col`` sums pre-aggregated
    partials (the drift-store path) instead of counting rows.

    Scale shape: one corpus hash aggregate to (group, day) counts,
    one groups-sized rollup. Days with zero events contribute nothing
    — the statistic is over OBSERVED days, stated (mirroring the
    autocorr/theil_sen convention for this table).
    """
    group_cols = group_cols or []
    c = (
        F.sum(count_col).cast("long")
        if count_col
        else F.count(F.lit(1)).cast("long")
    )
    daily = df.groupBy(*group_cols, day_col).agg(c.alias("__c"))
    d19 = "decimal(19,0)"
    g = daily.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.col("__c").cast(d19)).cast("decimal(38,0)").alias("__s"),
        F.sum(F.col("__c").cast(d19) * F.col("__c").cast(d19))
        .cast("decimal(38,0)")
        .alias("__ss"),
    )
    n = F.col("n_days").cast("double")
    s = F.col("__s").cast("double")
    ss = F.col("__ss").cast("double")
    fano = F.try_divide(n * ss - s * s, n * s)
    return g.select(
        *group_cols,
        "n_days",
        F.col("__s").cast("long").alias("total"),
        F.round(fano, 6).alias("fano"),
    )


def markov_entropy_rate(
    df: DataFrame,
    key_col: str,
    state_col: str,
    order_cols: list[str],
) -> DataFrame:
    """First-order Markov entropy rate of per-key state sequences —
    behavioral predictability (Song et al. 2010's limit-of-
    predictability ingredient): order each key's events, form
    (prev → next) transitions, and compute H(next | prev) =
    −Σ p(prev, next)·ln p(next | prev). Zero means the next state is
    determined by the current one (a scripted client); ln(#states)
    means memoryless uniform hopping. Output also normalizes by the
    unconditional state entropy H(next) — the ratio 1 − H_rate/H(next)
    is the share of next-state uncertainty the current state removes
    (the sequence-grained Theil's U).

    Scale shape: the lag runs in a window PARTITIONED by the key
    (bounded by per-key activity, never a global sort); transitions
    collapse to ONE (prev, next) aggregate and everything after is
    states²-sized. Per-term 9-dp rounding into decimal sums keeps the
    cross-cell accumulation order-free (the theils_u discipline).

    Output one row: (n_transitions, n_states, h_rate, h_next,
    predictability).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    base = df.filter(
        F.col(key_col).isNotNull() & F.col(state_col).isNotNull()
    )
    trans = (
        base.withColumn("__prev", F.lag(state_col).over(w))
        .filter(F.col("__prev").isNotNull())
        .groupBy(F.col("__prev"), F.col(state_col).alias("__next"))
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    from hypermap_etl_spark.util import tracked_persist

    trans = tracked_persist(trans)
    prev_m = trans.groupBy("__prev").agg(
        F.sum("__n").cast("long").alias("__np")
    )
    next_m = trans.groupBy("__next").agg(
        F.sum("__n").cast("long").alias("__nn")
    )
    tot = trans.agg(
        F.sum("__n").cast("long").alias("__t"),
        F.count_distinct(F.col("__next")).cast("long").alias("__states"),
    )
    rate_term = F.round(
        -(F.col("__n").cast("double") / F.col("__t").cast("double"))
        * (
            F.log(F.col("__n").cast("double"))
            - F.log(F.col("__np").cast("double"))
        ),
        9,
    ).cast("decimal(28,9)")
    h_rate = (
        trans.join(F.broadcast(prev_m), "__prev")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(rate_term).alias("__hr"),
            F.first("__t").alias("n_transitions"),
            F.first("__states").alias("n_states"),
        )
    )
    next_term = F.round(
        -(F.col("__nn").cast("double") / F.col("__t").cast("double"))
        * (
            F.log(F.col("__nn").cast("double"))
            - F.log(F.col("__t").cast("double"))
        ),
        9,
    ).cast("decimal(28,9)")
    h_next = next_m.crossJoin(F.broadcast(tot)).agg(
        F.sum(next_term).alias("__hn")
    )
    hr = F.col("__hr").cast("double")
    hn = F.col("__hn").cast("double")
    return h_rate.crossJoin(F.broadcast(h_next)).select(
        F.col("n_transitions").cast("long").alias("n_transitions"),
        F.col("n_states").cast("long").alias("n_states"),
        F.round(hr, 6).alias("h_rate"),
        F.round(hn, 6).alias("h_next"),
        F.round(F.lit(1.0) - F.try_divide(hr, hn), 6).alias("predictability"),
    )


def kendall_tau_b(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Kendall's τ-b between two ORDINAL columns (bands, grades,
    ratings) — the concordance view of monotone association beside
    :func:`spearman_corr` (Spearman correlates ranks; τ counts
    agreeing pair ORDERINGS, more robust on heavily tied scales):
    τ_b = (C − D) / sqrt((n₀ − t_x)(n₀ − t_y)) with C/D the
    concordant/discordant pair counts and the tie corrections.

    Scale shape: the corpus collapses to ONE (x, y) contingency;
    C and D come from the CELLS² self-join (cells are bounded by the
    band product — the point of the ordinal restriction; corpus rows
    never pair). With real-valued inputs, band them first (the MI /
    chi2 gate convention) — τ-b on the banded scale is the banded
    statistic, stated, not an approximation of the unbanded one.

    Numerics — exact: every pair count is an integer accumulated in
    decimal(38,0) (n_ij·n_kl products in decimal(19,0)²); τ's tail is
    one fixed-order double expression over exact aggregates; NULL τ
    when either margin is all-ties (zero variance) via try_divide.

    Output one row: (n, n_pairs, concordant, discordant, tau_b).
    """
    x, y = F.col(x_col), F.col(y_col)
    cells = (
        df.filter(x.isNotNull() & y.isNotNull())
        .groupBy(x.alias("__x"), y.alias("__y"))
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    from hypermap_etl_spark.util import tracked_persist

    cells = tracked_persist(cells)
    d19 = "decimal(19,0)"
    a = cells.select(
        F.col("__x").alias("__xa"), F.col("__y").alias("__ya"),
        F.col("__n").cast(d19).alias("__na"),
    )
    b = cells.select(
        F.col("__x").alias("__xb"), F.col("__y").alias("__yb"),
        F.col("__n").cast(d19).alias("__nb"),
    )
    pairs = a.crossJoin(b)
    conc = (
        (F.col("__xa") < F.col("__xb")) & (F.col("__ya") < F.col("__yb"))
    )
    disc = (
        (F.col("__xa") < F.col("__xb")) & (F.col("__ya") > F.col("__yb"))
    )
    cd = pairs.agg(
        F.sum(F.when(conc, F.col("__na") * F.col("__nb")).otherwise(F.lit(0)))
        .cast("decimal(38,0)")
        .alias("__c"),
        F.sum(F.when(disc, F.col("__na") * F.col("__nb")).otherwise(F.lit(0)))
        .cast("decimal(38,0)")
        .alias("__d"),
    )
    mx = cells.groupBy("__x").agg(F.sum("__n").cast("long").alias("__m"))
    my = cells.groupBy("__y").agg(F.sum("__n").cast("long").alias("__m"))

    def _tie_sum(m: DataFrame) -> DataFrame:
        return m.agg(
            F.sum(
                F.col("__m").cast(d19) * (F.col("__m") - 1).cast(d19)
            )
            .cast("decimal(38,0)")
            .alias("__t2"),
            F.sum("__m").cast("long").alias("__n"),
        )

    tx, ty = _tie_sum(mx), _tie_sum(my)
    n = F.col("__n").cast("double")
    n0 = n * (n - F.lit(1.0)) / F.lit(2.0)
    txd = F.col("__tx2").cast("double") / F.lit(2.0)
    tyd = F.col("__ty2").cast("double") / F.lit(2.0)
    c, d = F.col("__c").cast("double"), F.col("__d").cast("double")
    tau = F.try_divide(c - d, F.sqrt(n0 - txd) * F.sqrt(n0 - tyd))
    return (
        cd.crossJoin(F.broadcast(tx.select(F.col("__t2").alias("__tx2"),
                                           "__n")))
        .crossJoin(F.broadcast(ty.select(F.col("__t2").alias("__ty2"))))
        .select(
            F.col("__n").alias("n"),
            (
                F.col("__n").cast(d19)
                * (F.col("__n") - 1).cast(d19)
                / F.lit(2)
            ).cast("long").alias("n_pairs"),
            F.col("__c").cast("long").alias("concordant"),
            F.col("__d").cast("long").alias("discordant"),
            F.round(tau, 6).alias("tau_b"),
        )
    )


def theils_u(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Theil's uncertainty coefficient U(Y|X) — the DIRECTIONAL member
    of the association family (:func:`categorical_mi` gives per-cell
    magnitude, :func:`chi2_independence` significance and symmetric
    effect size; U answers "how much of Y's uncertainty does knowing X
    remove?", and U(Y|X) ≠ U(X|Y)): U = I(X;Y)/H(Y) ∈ [0, 1], 0 iff
    independent, 1 iff X determines Y. The feature-audit companion to
    :func:`fd_confidence` (g3 counts surviving ROWS; U measures
    removed ENTROPY, so it rewards a clean many-to-one mapping even
    when no single majority dominates).

    Numerics: exact long counts; each MI and entropy term computes in
    the log-sum form (no int64 products), rounds to 9 dp, and
    accumulates in decimal(28,9) — cross-cell sums are exact and
    order-free (the chi2 discipline; the 1e-9 per-term quantization
    is far below the 6 dp output). Degenerate H(Y) = 0 (single Y
    value) yields NULL U via try_divide.

    Scale shape: one corpus hash aggregate to the joint contingency;
    marginals and the total derive from the |X|·|Y| frame. Output one
    row: (n, mi_nats, h_y, u_y_given_x).
    """
    x, y = F.col(x_col), F.col(y_col)
    joint = (
        df.filter(x.isNotNull() & y.isNotNull())
        .groupBy(x_col, y_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
    )
    jx = joint.groupBy(x_col).agg(F.sum("n_xy").cast("long").alias("__n_x"))
    jy = joint.groupBy(y_col).agg(F.sum("n_xy").cast("long").alias("__n_y"))
    tot = joint.agg(F.sum("n_xy").cast("long").alias("__n"))
    mi_term = F.round(
        (F.col("n_xy").cast("double") / F.col("__n").cast("double"))
        * (
            F.log(F.col("n_xy").cast("double"))
            + F.log(F.col("__n").cast("double"))
            - F.log(F.col("__n_x").cast("double"))
            - F.log(F.col("__n_y").cast("double"))
        ),
        9,
    ).cast("decimal(28,9)")
    mi = (
        joint.join(F.broadcast(jx), x_col)
        .join(F.broadcast(jy), y_col)
        .crossJoin(F.broadcast(tot))
        .agg(F.sum(mi_term).alias("__mi"), F.first("__n").alias("n"))
    )
    hy_term = F.round(
        -(F.col("__n_y").cast("double") / F.col("__n").cast("double"))
        * (
            F.log(F.col("__n_y").cast("double"))
            - F.log(F.col("__n").cast("double"))
        ),
        9,
    ).cast("decimal(28,9)")
    hy = jy.crossJoin(F.broadcast(tot)).agg(F.sum(hy_term).alias("__hy"))
    mid, hyd = F.col("__mi").cast("double"), F.col("__hy").cast("double")
    return mi.crossJoin(F.broadcast(hy)).select(
        F.col("n").cast("long").alias("n"),
        F.round(mid, 6).alias("mi_nats"),
        F.round(hyd, 6).alias("h_y"),
        F.round(F.try_divide(mid, hyd), 6).alias("u_y_given_x"),
    )


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Spearman rank correlation between two numeric columns — the
    monotone-association screen that survives the outliers and
    nonlinearity a Pearson r chases (a feature audit's "does quantity
    track price AT ALL?"): ρ = Pearson correlation of the AVERAGE
    ranks, which is exactly the tie-corrected Spearman.

    Construction (no corpus-wide ranking window): each column's
    average ranks come from a running sum over that column's DISTINCT
    values per group (the mann_whitney_u machinery, windows bounded
    by value cardinality), joined back to rows by (group, value) —
    two corpus-sized equi hash joins, partition-count independent.
    Values compare at decimal(12,2) exactness so tie groups coincide
    across engines.

    Numerics: 2·avgrank is an exact integer; every moment (Σr_x,
    Σr_y, Σr_x², Σr_y², Σr_x·r_y on the DOUBLED ranks) accumulates in
    decimal(19,0)-product / decimal(38,0)-sum arithmetic — exact and
    summation-order-free. ρ is one fixed-order double expression over
    those exact aggregates (the common 2× factors cancel), rounded at
    the output only.

    Output per group: (group_cols, n, rho); rho is NULL when either
    column is constant (zero rank variance — try_divide, not a crash).
    """
    from pyspark.sql.window import Window

    group_cols = group_cols or []
    xv = F.col(x_col).cast("decimal(12,2)")
    yv = F.col(y_col).cast("decimal(12,2)")
    base = df.filter(xv.isNotNull() & yv.isNotNull()).select(
        *group_cols, xv.alias("__x"), yv.alias("__y")
    )

    def rank2(col: str, out: str) -> DataFrame:
        per = base.groupBy(*group_cols, col).agg(
            F.count(F.lit(1)).cast("long").alias("__t")
        )
        w = (
            Window.partitionBy(*group_cols)
            .orderBy(F.col(col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return per.withColumn("__cum", F.sum("__t").over(w)).select(
            *group_cols,
            col,
            (F.lit(2) * F.col("__cum") - (F.col("__t") - F.lit(1))).alias(out),
        )

    rx = rank2("__x", "__rx2")
    ry = rank2("__y", "__ry2")
    joined = base.join(rx, [*group_cols, "__x"]).join(ry, [*group_cols, "__y"])
    d19 = "decimal(19,0)"
    rx2, ry2 = F.col("__rx2").cast(d19), F.col("__ry2").cast(d19)
    g = joined.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(rx2).cast("decimal(38,0)").alias("__sx"),
        F.sum(ry2).cast("decimal(38,0)").alias("__sy"),
        F.sum(rx2 * rx2).cast("decimal(38,0)").alias("__sxx"),
        F.sum(ry2 * ry2).cast("decimal(38,0)").alias("__syy"),
        F.sum(rx2 * ry2).cast("decimal(38,0)").alias("__sxy"),
    )
    nn = F.col("n").cast("double")
    sx, sy = F.col("__sx").cast("double"), F.col("__sy").cast("double")
    sxx, syy = F.col("__sxx").cast("double"), F.col("__syy").cast("double")
    sxy = F.col("__sxy").cast("double")
    rho = F.try_divide(
        nn * sxy - sx * sy,
        F.sqrt(nn * sxx - sx * sx) * F.sqrt(nn * syy - sy * sy),
    )
    return g.select(*group_cols, "n", F.round(rho, 6).alias("rho"))


def welch_ab_test(
    df: DataFrame,
    value_col: str,
    unit_col: str,
    group_cols: list[str] | None = None,
    salt: str = "ab",
    crit: float = 1.96,
) -> DataFrame:
    """Deterministic hash-split A/B comparison with Welch's unequal-
    variance t statistic — the experimentation primitive (and, run on
    a hash split of ONE population, an A/A sanity check: significant
    results at ~5% false-positive rate mean the pipeline's stats are
    healthy).

    Units (e.g. users) are assigned to arms by md5(salt:unit) parity —
    reproducible anywhere, stable across reruns, balanced in
    expectation. Per group: n/mean per arm, Welch t, Welch–
    Satterthwaite df, and the |t| > crit verdict.

    Numerics: sums and sums-of-squares accumulate as exact decimals
    (value at scale 2, its square at scale 4 — order-independent),
    then ONE fixed-order double expression computes mean/variance/t —
    engine-identical, pinned by the oracle. Sample variance uses the
    (Σv² − (Σv)²/n)/(n−1) form on those exact sums.

    Scale shape: a single map-combined hash aggregate keyed by
    (group, arm); everything after runs on groups×2 rows via a self-
    join on the group key. One corpus scan, no windows.
    """
    group_cols = group_cols or []
    v = F.col(value_col).cast("decimal(12,2)")
    arm = _hash_arm(unit_col, salt)
    base = df.filter(
        v.isNotNull() & F.col(unit_col).isNotNull()
    ).select(*group_cols, arm.alias("__arm"), v.alias("__v"))
    agg = base.groupBy(*group_cols, "__arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__v").alias("s"),
        F.sum(F.col("__v") * F.col("__v")).alias("ss"),
    )
    return welch_from_moments(agg, group_cols, crit=crit)


def welch_from_moments(
    agg: DataFrame,
    group_cols: list[str] | None = None,
    crit: float = 1.96,
) -> DataFrame:
    """The Welch epilogue over PRE-AGGREGATED arm moments — a frame
    keyed (group..., __arm) carrying exact (n, s, ss). Factored out of
    :func:`welch_ab_test` so the streaming A/B monitor's moment STORE
    (additive partials summed across micro-batches) feeds the
    IDENTICAL fixed-order expression — streaming and batch can never
    disagree on a verdict. Moments must be exact types (long n,
    decimal s/ss); the numerics contract lives in welch_ab_test's
    docstring."""
    group_cols = group_cols or []
    a = agg.filter(F.col("__arm") == 0).select(
        *group_cols,
        F.col("n").alias("n_a"),
        F.col("s").alias("__s_a"),
        F.col("ss").alias("__ss_a"),
    )
    b = agg.filter(F.col("__arm") == 1).select(
        *group_cols,
        F.col("n").alias("n_b"),
        F.col("s").alias("__s_b"),
        F.col("ss").alias("__ss_b"),
    )
    j = (
        a.join(b, list(group_cols)) if group_cols else a.crossJoin(b)
    ).filter((F.col("n_a") > 1) & (F.col("n_b") > 1))

    def stats(side: str):
        n = F.col(f"n_{side}").cast("double")
        s = F.col(f"__s_{side}").cast("double")
        ss = F.col(f"__ss_{side}").cast("double")
        mean = s / n
        var = (ss - s * s / n) / (n - F.lit(1.0))
        # cancellation on near-constant data can go fractionally
        # negative; NaN would sort above every double downstream
        return mean, F.greatest(var, F.lit(0.0))

    m_a, v_a = stats("a")
    m_b, v_b = stats("b")
    se2_a = v_a / F.col("n_a").cast("double")
    se2_b = v_b / F.col("n_b").cast("double")
    t = F.try_divide(m_a - m_b, F.sqrt(se2_a + se2_b))
    dof = F.try_divide(
        (se2_a + se2_b) * (se2_a + se2_b),
        se2_a * se2_a / (F.col("n_a").cast("double") - F.lit(1.0))
        + se2_b * se2_b / (F.col("n_b").cast("double") - F.lit(1.0)),
    )
    return j.select(
        *group_cols,
        "n_a",
        "n_b",
        F.round(m_a, 6).alias("mean_a"),
        F.round(m_b, 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 6).alias("welch_df"),
        F.coalesce(F.abs(t) > F.lit(crit), F.lit(False)).alias("significant"),
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    unit_col: str,
    group_cols: list[str] | None = None,
    salt: str = "ab",
    crit: float = 1.96,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) over the deterministic hash
    split — the nonparametric sibling of :func:`welch_ab_test` for
    value distributions where means mislead (heavy tails, outliers):
    compares the RANKS of arm A's values against arm B's, with the
    normal approximation and the standard tie correction.

    Construction (no corpus-wide ranking window): values collapse to
    ONE hash aggregate keyed (group, value) carrying (rows, rows in
    arm A); average ranks come from a running sum over each group's
    DISTINCT values (window over the aggregate, bounded by value
    cardinality, never corpus rows); R_A = Σ n_A(v)·avgrank(v). Then
    U_A = R_A − n_A(n_A+1)/2,  z = (U_A − n_A·n_B/2) / σ with
    σ² = n_A·n_B/12 · ((N+1) − Σ(t³−t)/(N(N−1))).

    Numerics: counts and rank sums are exact integers / half-integers
    (exact in binary doubles to 2^52); the z expression is one fixed-
    order double formula — engine-identical, so a SQL oracle
    reproduces it bit-for-bit. Values are compared at decimal(12,2)
    exactness like welch_ab_test.

    Scale shape: one map-combined corpus aggregate; the rank window
    runs over groups × distinct-values rows. No corpus window, no
    collect.
    """
    from pyspark.sql.window import Window

    group_cols = group_cols or []
    v = F.col(value_col).cast("decimal(12,2)")
    arm = _hash_arm(unit_col, salt)
    base = df.filter(v.isNotNull() & F.col(unit_col).isNotNull()).select(
        *group_cols, arm.alias("__arm"), v.alias("__v")
    )
    per_val = base.groupBy(*group_cols, "__v").agg(
        F.count(F.lit(1)).cast("long").alias("__t"),
        F.sum(F.when(F.col("__arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("__ta"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = per_val.withColumn("__cum", F.sum("__t").over(w)).withColumn(
        "__avgrank",
        F.col("__cum").cast("double")
        - (F.col("__t").cast("double") - F.lit(1.0)) / F.lit(2.0),
    )
    g = ranked.groupBy(*group_cols).agg(
        F.sum("__ta").cast("long").alias("n_a"),
        F.sum(F.col("__t") - F.col("__ta")).cast("long").alias("n_b"),
        F.sum(F.col("__ta").cast("double") * F.col("__avgrank")).alias("__ra"),
        F.sum(
            F.col("__t").cast("double") * F.col("__t") * F.col("__t")
            - F.col("__t").cast("double")
        ).alias("__ties"),
    ).filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    nn = na + nb
    u_a = F.col("__ra") - na * (na + F.lit(1.0)) / F.lit(2.0)
    sigma2 = (
        na
        * nb
        / F.lit(12.0)
        * ((nn + F.lit(1.0)) - F.col("__ties") / (nn * (nn - F.lit(1.0))))
    )
    z = F.try_divide(u_a - na * nb / F.lit(2.0), F.sqrt(sigma2))
    return g.select(
        *group_cols,
        "n_a",
        "n_b",
        F.round(u_a, 6).alias("u_stat"),
        F.round(z, 6).alias("z_stat"),
        F.coalesce(F.abs(z) > F.lit(crit), F.lit(False)).alias("significant"),
    )


def theil_sen_trend(
    df: DataFrame,
    day_col: str,
    group_cols: list[str] | None = None,
    count_col: str | None = None,
) -> DataFrame:
    """Theil-Sen robust trend of a daily count series: the MEDIAN of
    all pairwise slopes (c_j − c_i)/(j − i) over day indices — the
    estimator that shrugs off the outlier days a least-squares slope
    (events_user_trend's OLS) chases (~29% breakdown point, Sen 1968).

    Scale shape: the corpus collapses to per-(group, day) counts in
    one hash aggregate; the O(days²) pairwise self-join runs on THAT
    aggregate (bounded by the calendar, e.g. 3 years ≈ 1000 days →
    500k slope rows per group), partitioned by group — never on
    corpus rows. Slopes are integer-difference ratios (exact,
    engine-identical doubles); the median interpolates the middle pair
    the same way in Spark and DuckDB.

    ``count_col`` sums pre-aggregated partials instead of counting
    rows (the drift-store path).
    """
    from pyspark.sql.window import Window

    group_cols = group_cols or []
    c = (
        F.sum(count_col).cast("long")
        if count_col
        else F.count(F.lit(1)).cast("long")
    )
    daily = df.groupBy(*group_cols, day_col).agg(c.alias("__c"))
    idx = daily.withColumn(
        "__i",
        F.row_number().over(
            Window.partitionBy(*group_cols).orderBy(F.col(day_col).asc())
        ),
    ).select(*group_cols, "__i", "__c")
    a = idx.select(
        *group_cols, F.col("__i").alias("__ia"), F.col("__c").alias("__ca")
    )
    b = idx.select(
        *group_cols, F.col("__i").alias("__ib"), F.col("__c").alias("__cb")
    )
    on = [F.col(f"a.{g}") == F.col(f"b.{g}") for g in group_cols] + [
        F.col("a.__ia") < F.col("b.__ib")
    ]
    pairs = a.alias("a").join(b.alias("b"), on)
    slope = (F.col("b.__cb") - F.col("a.__ca")).cast("double") / (
        F.col("b.__ib") - F.col("a.__ia")
    ).cast("double")
    gsel = [F.col(f"a.{g}").alias(g) for g in group_cols]
    return (
        pairs.select(*gsel, slope.alias("__slope"))
        .groupBy(*group_cols)
        .agg(
            F.round(F.median("__slope"), 6).alias("ts_slope"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
        )
    )


def changepoint_screen(
    df: DataFrame,
    day_col: str,
    group_cols: list[str] | None = None,
    crit: float = 3.0,
    count_col: str | None = None,
) -> DataFrame:
    """Single-changepoint LOCALIZATION for a daily count series — the
    "where" to cusum_drift's "whether": for every split point k the
    standardized two-sample statistic
    |S_k − (k/n)·S_n| / (σ̂·√(k(n−k)/n)) (the likelihood-ratio scan
    for a mean shift at k under equal variance), reported at its
    argmax — the boundary day of the best split.

    Cross-engine determinism: S_k is an exact integer cumulative sum,
    so the scan statistic is built ONLY from integer-valued doubles
    via correctly-rounded ops (×, −, /, √, abs) — bit-identical in any
    IEEE engine, making the argmax (tie-broken by earliest day) safe
    for a value-hash oracle. (log/exp never appear; those are the
    libm-wobble ops.)

    Scale shape: one corpus hash aggregate to (group, day) counts;
    cumulative and argmax windows run over the aggregate only.
    """
    from pyspark.sql.window import Window

    group_cols = group_cols or []
    c = (
        F.sum(count_col).cast("long")
        if count_col
        else F.count(F.lit(1)).cast("long")
    )
    daily = df.groupBy(*group_cols, day_col).agg(c.alias("__c"))
    wday = Window.partitionBy(*group_cols).orderBy(F.col(day_col).asc())
    wall = Window.partitionBy(*group_cols)
    cum = (
        daily.withColumn("__k", F.row_number().over(wday))
        .withColumn(
            "__sk",
            F.sum("__c").over(
                wday.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("__n", F.count(F.lit(1)).over(wall))
        .withColumn("__sn", F.sum("__c").over(wall))
        .withColumn("__ssn", F.sum(F.col("__c") * F.col("__c")).over(wall))
    )
    n = F.col("__n").cast("double")
    k = F.col("__k").cast("double")
    sk = F.col("__sk").cast("double")
    sn = F.col("__sn").cast("double")
    var = F.greatest(
        F.col("__ssn").cast("double") / n - (sn / n) * (sn / n), F.lit(0.0)
    )
    stat = F.try_divide(
        F.abs(n * sk - k * sn) / n,
        F.sqrt(var) * F.sqrt(k * (n - k) / n),
    )
    scored = cum.filter(F.col("__k") < F.col("__n")).select(
        *group_cols,
        F.col(day_col).alias("change_day"),
        F.col("__n").cast("long").alias("n_days"),
        stat.alias("__stat"),
    )
    pick = Window.partitionBy(*group_cols).orderBy(
        F.col("__stat").desc_nulls_last(), F.col("change_day").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(pick))
        .filter(F.col("__rn") == 1)
        .select(
            *group_cols,
            "n_days",
            "change_day",
            F.round(F.col("__stat"), 6).alias("cp_stat"),
            F.coalesce(F.col("__stat") > F.lit(crit), F.lit(False)).alias(
                "shifted"
            ),
        )
    )


def seasonal_naive_backtest(
    df: DataFrame,
    period_col: str,
    group_cols: list[str] | None = None,
    season: int = 12,
    period_index_col: str | None = None,
) -> DataFrame:
    """Seasonal-naive forecast backtest over a periodic count series:
    forecast(period) = count(period − season), error = absolute
    percentage — the forecasting floor every fancier model must beat
    (and the standard denominator of relative metrics like MASE).
    Output: one row per period with n, forecast (null for the first
    ``season`` periods) and ape (round 6).

    Season alignment: with ``period_index_col`` (an integer period
    index the caller derives from the calendar, e.g. year·12+month)
    the forecast joins on index − season — CALENDAR-exact even when
    periods are missing from the data. Without it, a row-offset lag
    over the observed periods is used, which is only correct when the
    series is gap-free — the row-number-lag trap autocorr_daily's
    calendar join avoids; prefer the index.

    Scale shape: corpus → one hash aggregate to (group, period
    [, index]) counts; the join/lag runs over the aggregate
    (calendar-bounded).
    """
    from pyspark.sql.window import Window

    group_cols = group_cols or []
    if period_index_col is not None:
        daily = df.groupBy(
            *group_cols, period_col, period_index_col
        ).agg(F.count(F.lit(1)).cast("long").alias("n"))
        shifted = daily.select(
            *group_cols,
            (F.col(period_index_col) + season).alias(period_index_col),
            F.col("n").alias("forecast"),
        )
        out = daily.join(
            shifted, [*group_cols, period_index_col], "left"
        ).drop(period_index_col)
    else:
        daily = df.groupBy(*group_cols, period_col).agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        w = Window.partitionBy(*group_cols).orderBy(F.col(period_col).asc())
        out = daily.withColumn("forecast", F.lag("n", season).over(w))
    ape = F.round(
        F.abs(F.col("n") - F.col("forecast")).cast("double")
        / F.col("n").cast("double"),
        6,
    )
    return out.select(
        *group_cols,
        period_col,
        "n",
        "forecast",
        F.when(F.col("forecast").isNotNull(), ape).alias("ape"),
    )


def seasonal_index_outliers(
    df: DataFrame,
    day_col: str,
    season_col: str,
    group_cols: list[str] | None = None,
    rel_threshold: float = 0.5,
    count_col: str | None = None,
) -> DataFrame:
    """Seasonality-adjusted daily outliers — the screen EWMA/CUSUM
    mis-fire on when the series has a strong cycle (weekend dips read
    as anomalies): a multiplicative seasonal index per ``season_col``
    value (mean of that season's days / overall daily mean, the
    classical ratio-to-moving-average decomposition at fixed seasons),
    each day deseasonalized by its index, and flagged when the
    deseasonalized count deviates from the overall mean by more than
    ``rel_threshold`` relatively.

    Numerics: indexes and deviations are single fixed-order double
    expressions over exact integer day sums — engine-identical, so the
    oracle reproduces flags bit-for-bit (no libm beyond divide).

    Scale shape: one corpus aggregate to (group, day, season) counts;
    the index join and flagging run on calendar-bounded frames
    (windows partitioned by group / group+season only).
    """
    from pyspark.sql.window import Window

    group_cols = group_cols or []
    c = (
        F.sum(count_col).cast("long")
        if count_col
        else F.count(F.lit(1)).cast("long")
    )
    daily = df.groupBy(*group_cols, day_col, season_col).agg(c.alias("__c"))
    w_season = Window.partitionBy(*group_cols, season_col)
    w_all = Window.partitionBy(*group_cols)
    e = (
        daily.withColumn("__s_sum", F.sum("__c").over(w_season))
        .withColumn("__s_n", F.count(F.lit(1)).over(w_season))
        .withColumn("__t_sum", F.sum("__c").over(w_all))
        .withColumn("__t_n", F.count(F.lit(1)).over(w_all))
    )
    season_mean = F.col("__s_sum").cast("double") / F.col("__s_n").cast("double")
    total_mean = F.col("__t_sum").cast("double") / F.col("__t_n").cast("double")
    idx = season_mean / total_mean
    deseason = F.col("__c").cast("double") / idx
    rel = F.abs(deseason - total_mean) / total_mean
    return e.select(
        *group_cols,
        day_col,
        season_col,
        F.col("__c").alias("n"),
        F.round(idx, 6).alias("seasonal_index"),
        F.round(deseason, 6).alias("deseasonalized"),
        F.round(rel, 6).alias("rel_dev"),
        F.coalesce(rel > F.lit(rel_threshold), F.lit(False)).alias(
            "is_outlier"
        ),
    )


def bot_regularity_screen(
    df: DataFrame,
    unit_col: str,
    ts_col: str = "ts",
    min_events: int = 20,
    cv_threshold: float = 0.3,
) -> DataFrame:
    """Automation screen on inter-arrival regularity: humans are
    bursty (coefficient of variation of gaps near or above 1, the
    exponential-arrival baseline); schedulers and scrapers tick at
    near-constant intervals (CV ≪ 1). Keys with ≥ ``min_events``
    events and gap CV below ``cv_threshold`` are flagged — the
    traffic-hygiene filter a behavioral corpus runs before events
    become training signal.

    Numerics: gaps in exact integer microseconds via a per-key lag
    window; mean/variance from Σg and Σg² (exact integer sums into one
    fixed-order double expression — engine-identical, variance clamped
    at 0 against cancellation). CV = √var / mean; a key with mean gap
    0 (all events at one instant) gets NULL cv and no flag.

    Scale shape: one window keyed by the unit column (no global
    ordering), then one hash aggregate per key; flags are arithmetic
    on the per-key aggregate.
    """
    from pyspark.sql.window import Window

    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(unit_col).orderBy(F.col("__us").asc())
    gaps = (
        df.filter(F.col(unit_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(unit_col, us.alias("__us"))
        .withColumn("__gap", F.col("__us") - F.lag("__us").over(w))
        .filter(F.col("__gap").isNotNull())
    )
    # gap² in microseconds reaches ~1e22 — far past int64; accumulate
    # the squares as exact decimal(38,0) (gini_concentration precedent)
    gd = F.col("__gap").cast("decimal(19,0)")
    agg = gaps.groupBy(unit_col).agg(
        F.count(F.lit(1)).cast("long").alias("__n_gaps"),
        F.sum("__gap").cast("long").alias("__sg"),
        F.sum(gd * gd).alias("__sgg"),
    )
    n = F.col("__n_gaps").cast("double")
    mean = F.col("__sg").cast("double") / n
    var = F.greatest(
        F.col("__sgg").cast("double") / n - mean * mean, F.lit(0.0)
    )
    cv = F.try_divide(F.sqrt(var), mean)
    return (
        agg.filter(F.col("__n_gaps") >= min_events - 1)
        .select(
            unit_col,
            (F.col("__n_gaps") + 1).cast("long").alias("n_events"),
            F.round(mean / F.lit(1_000_000.0), 6).alias("mean_gap_s"),
            F.round(cv, 6).alias("gap_cv"),
            F.coalesce(cv < F.lit(cv_threshold), F.lit(False)).alias(
                "is_regular"
            ),
        )
    )


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    unit_col: str,
    group_cols: list[str] | None = None,
    salt: str = "ab",
    crit_coeff: float = 1.36,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov over the deterministic hash
    split — the binless companion to psi_drift (PSI needs bin edges;
    KS compares whole ECDFs) and the distribution-shape sibling of
    mann_whitney_u (which only sees location): D = max |F_A − F_B|,
    flagged at the asymptotic 5% critical value
    1.36·√((n_A+n_B)/(n_A·n_B)).

    Exactness: the ECDF difference maximum is computed in PURE INTEGER
    arithmetic — D_num = max over values of |ca·n_B − cb·n_A| with ca,
    cb the cumulative per-arm counts (window over each group's
    DISTINCT values, the mann_whitney_u construction) — so the max is
    engine-exact; the single division and the √ in the critical value
    are correctly-rounded. No libm, no knife edges.

    Scale shape: one corpus hash aggregate keyed (group, value); the
    cumulative window and the max run over distinct-value rows.
    """
    from pyspark.sql.window import Window

    group_cols = group_cols or []
    v = F.col(value_col).cast("decimal(12,2)")
    arm = _hash_arm(unit_col, salt)
    base = df.filter(v.isNotNull() & F.col(unit_col).isNotNull()).select(
        *group_cols, arm.alias("__arm"), v.alias("__v")
    )
    per_val = base.groupBy(*group_cols, "__v").agg(
        F.sum(F.when(F.col("__arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("__ta"),
        F.sum(F.when(F.col("__arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("__tb"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*group_cols)
    cum = (
        per_val.withColumn("__ca", F.sum("__ta").over(w))
        .withColumn("__cb", F.sum("__tb").over(w))
        .withColumn("__na", F.sum("__ta").over(wall))
        .withColumn("__nb", F.sum("__tb").over(wall))
    )
    # decimal(19,0) products: ca*nb overflows int64 once arms pass
    # ~3e9 rows — the same discipline as kendall_tau_b's pair counts
    dnum = F.abs(
        F.col("__ca").cast("decimal(19,0)")
        * F.col("__nb").cast("decimal(19,0)")
        - F.col("__cb").cast("decimal(19,0)")
        * F.col("__na").cast("decimal(19,0)")
    )
    g = (
        cum.select(*group_cols, "__na", "__nb", dnum.alias("__dnum"))
        .groupBy(*group_cols)
        .agg(
            F.max(F.col("__na")).cast("long").alias("n_a"),
            F.max(F.col("__nb")).cast("long").alias("n_b"),
            F.max("__dnum").alias("__dmax"),
        )
        .filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    d = F.col("__dmax").cast("double") / (na * nb)
    crit = F.lit(crit_coeff) * F.sqrt((na + nb) / (na * nb))
    return g.select(
        *group_cols,
        "n_a",
        "n_b",
        F.round(d, 6).alias("ks_d"),
        F.round(crit, 6).alias("ks_crit"),
        (d > crit).alias("distributions_differ"),
    )


def permutation_test(
    df: DataFrame,
    value_col: str,
    unit_col: str,
    group_cols: list[str] | None = None,
    n_permutations: int = 199,
    salt: str = "ab",
) -> DataFrame:
    """Fisher-style permutation test of the hash-split mean difference —
    the assumption-free sibling of :func:`welch_ab_test` (no normality,
    no variance formula): the observed |mean_A − mean_B| is compared
    against the null distribution generated by re-randomizing every
    unit's arm, and the p-value is the exact COUNT of replicates at
    least as extreme, (cnt_ge + 1) / (n_perms + 1) — the add-one form
    of Phipson & Smyth that never reports p = 0.

    Determinism: replicate r reassigns a unit by md5('perm:r:unit')
    parity (replicate 0 IS the observed md5(salt:unit) split) —
    bit-reproducible in any engine, layout-independent. Sums accumulate
    in decimal(12,2) (exact); each replicate's mean difference is two
    correctly-rounded double divisions and one subtraction, so the
    >= comparison against the observed difference is engine-identical.

    Replicates where either arm is empty carry no information about
    the mean difference and are excluded (n_perms counts survivors);
    a group whose OBSERVED split is degenerate is dropped entirely.

    Scale shape: a replicate's arm depends on the UNIT, not the row,
    so the corpus collapses FIRST to one exact (group, unit) total —
    one map-combined hash aggregate — and the ×(R+1) expansion (and
    its two md5 evaluations per row) runs over that unit aggregate,
    |group-units|·(R+1) rows instead of |corpus|·(R+1). Decimal sums
    associate exactly, so the two-stage fold equals the row-level
    definition bit-for-bit (the oracle states the row-level form).
    The per-replicate partial aggregate folds again before the final
    exchange, which carries |groups|·(R+1) rows.
    """
    if n_permutations < 1:
        raise ValueError("permutation_test: need n_permutations >= 1")
    group_cols = group_cols or []
    v = F.col(value_col).cast("decimal(12,2)")
    base = (
        df.filter(v.isNotNull() & F.col(unit_col).isNotNull())
        .select(
            *group_cols,
            F.col(unit_col).cast("string").alias("__u"),
            v.alias("__v"),
        )
        .groupBy(*group_cols, "__u")
        .agg(
            F.sum("__v").alias("__sv"),
            F.count(F.lit(1)).cast("long").alias("__c"),
        )
    )
    rep = base.select(
        *group_cols,
        "__u",
        "__sv",
        "__c",
        F.explode(F.sequence(F.lit(0), F.lit(n_permutations))).alias("__r"),
    )
    perm_arm = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("perm:"),
                        F.col("__r").cast("string"),
                        F.lit(":"),
                        F.col("__u"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(2),
    )
    arm = F.when(F.col("__r") == 0, _hash_arm("__u", salt)).otherwise(perm_arm)
    g = (
        rep.select(*group_cols, "__r", arm.alias("__arm"), "__sv", "__c")
        .groupBy(*group_cols, "__r")
        .agg(
            F.sum(F.when(F.col("__arm") == 0, F.col("__c"))).alias("__n_a"),
            F.sum(F.when(F.col("__arm") == 1, F.col("__c"))).alias("__n_b"),
            F.sum(F.when(F.col("__arm") == 0, F.col("__sv"))).alias("__s_a"),
            F.sum(F.when(F.col("__arm") == 1, F.col("__sv"))).alias("__s_b"),
        )
        .filter(
            F.col("__n_a").isNotNull()
            & F.col("__n_b").isNotNull()
            & (F.col("__n_a") > 0)
            & (F.col("__n_b") > 0)
        )
    )
    diff = (
        F.col("__s_a").cast("double") / F.col("__n_a").cast("double")
        - F.col("__s_b").cast("double") / F.col("__n_b").cast("double")
    )
    d = g.select(*group_cols, "__r", "__n_a", "__n_b", diff.alias("__diff"))
    # one lineage, one scan: instead of splitting observed vs
    # replicates into two branches (which recomputes the whole
    # expansion), attach the r=0 row's stats to every row of its
    # group with a window over the (R+1)-rows-per-group aggregate
    from pyspark.sql.window import Window

    wg = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy(F.lit(1))
    is_obs = F.col("__r") == 0
    d2 = (
        d.withColumn("__d_obs", F.max(F.when(is_obs, F.col("__diff"))).over(wg))
        .withColumn("__na0", F.max(F.when(is_obs, F.col("__n_a"))).over(wg))
        .withColumn("__nb0", F.max(F.when(is_obs, F.col("__n_b"))).over(wg))
        # a group whose OBSERVED split is degenerate never got an r=0
        # row past the both-arms filter: drop the whole group
        .filter(F.col("__d_obs").isNotNull())
    )
    ge = F.when(
        (F.col("__r") > 0)
        & (F.abs(F.col("__diff")) >= F.abs(F.col("__d_obs"))),
        F.lit(1),
    ).otherwise(F.lit(0))
    out = (
        d2.groupBy(
            *group_cols,
            F.col("__na0").cast("long").alias("n_a"),
            F.col("__nb0").cast("long").alias("n_b"),
            "__d_obs",
        )
        .agg(
            F.count(F.when(F.col("__r") > 0, F.lit(1)))
            .cast("long")
            .alias("n_perms"),
            F.sum(ge).cast("long").alias("cnt_ge"),
        )
    )
    p = (F.col("cnt_ge").cast("double") + F.lit(1.0)) / (
        F.col("n_perms").cast("double") + F.lit(1.0)
    )
    return out.select(
        *group_cols,
        "n_a",
        "n_b",
        F.round(F.col("__d_obs"), 6).alias("diff_obs"),
        "n_perms",
        "cnt_ge",
        F.round(p, 6).alias("p_value"),
    )


def bh_fdr(
    tests: DataFrame,
    key_cols: list[str],
    count_col: str = "cnt_ge",
    trials_col: str = "n_perms",
    q_num: int = 1,
    q_den: int = 10,
) -> DataFrame:
    """Benjamini–Hochberg FDR control over permutation p-values —
    INTEGER-exact end to end. The input is one row per hypothesis
    (e.g. :func:`permutation_test` output) carrying the exact rational
    p = (count + 1) / (trials + 1); the BH step-up rule
    p_(i) <= i·q/m is evaluated as

        (count_i + 1) · q_den · m  <=  i · q_num · (trials_i + 1)

    — pure int64 arithmetic, no float ever enters the reject decision
    (cross-engine float comparison at a threshold is exactly the bug
    class this avoids). Ranking uses the correctly-rounded double of
    the rational (identical in any IEEE engine) with the key as the
    total tie-break. Every hypothesis at rank <= the largest passing
    rank is rejected (the step-up rule rejects non-monotone passers'
    prefixes too).

    Scale shape: the input is an aggregate — one row per hypothesis
    family member — so the unpartitioned rank window is bounded by the
    number of hypotheses, never corpus rows. Run the corpus-sized
    work (the permutation test) first; this is a driver-scale epilogue
    that stays in the engine.
    """
    if q_num <= 0 or q_den <= 0:
        raise ValueError("bh_fdr: q must be a positive rational")
    from pyspark.sql.window import Window

    cnt = F.col(count_col).cast("long")
    tri = F.col(trials_col).cast("long")
    p_dbl = (cnt.cast("double") + F.lit(1.0)) / (tri.cast("double") + F.lit(1.0))
    w = Window.orderBy(p_dbl.asc(), *[F.col(c).asc() for c in key_cols])
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = tests.select(
        *key_cols,
        cnt.alias("__cnt"),
        tri.alias("__tri"),
        F.round(p_dbl, 6).alias("p_value"),
        F.row_number().over(w).cast("long").alias("rank"),
    ).withColumn("__m", F.count(F.lit(1)).over(wall).cast("long"))
    passed = (F.col("__cnt") + F.lit(1)) * F.lit(q_den) * F.col("__m") <= (
        F.col("rank") * F.lit(q_num) * (F.col("__tri") + F.lit(1))
    )
    k = F.max(F.when(passed, F.col("rank"))).over(wall)
    cutoff = (
        F.col("rank").cast("double")
        * F.lit(float(q_num))
        / (F.lit(float(q_den)) * F.col("__m").cast("double"))
    )
    return (
        ranked.withColumn("__k", k)
        .select(
            *key_cols,
            "p_value",
            "rank",
            F.round(cutoff, 6).alias("bh_cutoff"),
            (F.col("rank") <= F.coalesce(F.col("__k"), F.lit(0))).alias(
                "reject"
            ),
        )
        .orderBy("rank")
    )


def ratio_metric_ab(
    df: DataFrame,
    num_col: str,
    unit_col: str,
    group_cols: list[str] | None = None,
    salt: str = "ab",
    crit: float = 1.96,
) -> DataFrame:
    """Delta-method z-test for a RATIO metric on the hash split — the
    per-unit-clustered estimator for metrics like value-per-event,
    where the naive row-level Welch test is wrong twice over: rows of
    one unit are correlated, and the metric is a ratio of two random
    totals (Σ value / Σ events), not a mean of iid rows.

    Per arm, with per-unit totals x_i (numerator) and y_i (row count):
    R = Σx/Σy and, by the delta method (Deng et al.'s large-scale A/B
    formulation), Var(R) ≈ (σ²_x − 2·R·σ_xy + R²·σ²_y) / (n·ȳ²) over
    the n units. z = (R_A − R_B) / sqrt(Var_A + Var_B).

    Numerics: both aggregation stages accumulate exact decimals /
    longs (per-unit totals, then Σx, Σy, Σx², Σy², Σxy), so the only
    floats are ONE fixed-order double expression per arm — correctly
    rounded, engine-identical, pinned by the oracle.

    Scale shape: two map-combined hash aggregates — corpus →
    (group, arm, unit), then → (group, arm) — and a groups-sized
    self-join. No windows, no corpus-wide sort.
    """
    group_cols = group_cols or []
    v = F.col(num_col).cast("decimal(12,2)")
    per_unit = (
        df.filter(v.isNotNull() & F.col(unit_col).isNotNull())
        .select(
            *group_cols,
            _hash_arm(unit_col, salt).alias("__arm"),
            F.col(unit_col).cast("string").alias("__u"),
            v.alias("__v"),
        )
        .groupBy(*group_cols, "__arm", "__u")
        .agg(
            F.sum("__v").cast("decimal(18,2)").alias("__x"),
            F.count(F.lit(1)).cast("decimal(18,0)").alias("__y"),
        )
    )
    x, y = F.col("__x"), F.col("__y")
    agg = per_unit.groupBy(*group_cols, "__arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("decimal(38,2)").alias("sx"),
        F.sum(y).cast("decimal(38,0)").alias("sy"),
        F.sum(x * x).cast("decimal(38,4)").alias("sxx"),
        F.sum(y * y).cast("decimal(38,0)").alias("syy"),
        F.sum(x * y).cast("decimal(38,2)").alias("sxy"),
    )

    def side(tag: str, arm: int) -> DataFrame:
        cols = ["n", "sx", "sy", "sxx", "syy", "sxy"]
        return agg.filter(F.col("__arm") == arm).select(
            *group_cols, *[F.col(c).alias(f"{c}_{tag}") for c in cols]
        )

    a, b = side("a", 0), side("b", 1)
    j = (
        a.join(b, list(group_cols)) if group_cols else a.crossJoin(b)
    ).filter(
        (F.col("n_a") > 1)
        & (F.col("n_b") > 1)
        & (F.col("sy_a") > 0)
        & (F.col("sy_b") > 0)
    )

    def stats(tag: str):
        n = F.col(f"n_{tag}").cast("double")
        sx = F.col(f"sx_{tag}").cast("double")
        sy = F.col(f"sy_{tag}").cast("double")
        sxx = F.col(f"sxx_{tag}").cast("double")
        syy = F.col(f"syy_{tag}").cast("double")
        sxy = F.col(f"sxy_{tag}").cast("double")
        r = sx / sy
        ybar = sy / n
        vx = F.greatest((sxx - sx * sx / n) / (n - F.lit(1.0)), F.lit(0.0))
        vy = F.greatest((syy - sy * sy / n) / (n - F.lit(1.0)), F.lit(0.0))
        cxy = (sxy - sx * sy / n) / (n - F.lit(1.0))
        var = F.greatest(
            (vx - F.lit(2.0) * r * cxy + r * r * vy) / (n * ybar * ybar),
            F.lit(0.0),
        )
        return r, var

    r_a, var_a = stats("a")
    r_b, var_b = stats("b")
    z = F.try_divide(r_a - r_b, F.sqrt(var_a + var_b))
    return j.select(
        *group_cols,
        "n_a",
        "n_b",
        F.round(r_a, 6).alias("ratio_a"),
        F.round(r_b, 6).alias("ratio_b"),
        F.round(F.sqrt(var_a + var_b), 6).alias("se"),
        F.round(z, 6).alias("z_stat"),
        F.coalesce(F.abs(z) > F.lit(crit), F.lit(False)).alias("significant"),
    )


def power_mde(
    df: DataFrame,
    value_col: str,
    unit_col: str,
    group_cols: list[str] | None = None,
    salt: str = "ab",
    alpha_z: float = 1.959964,
    power_z: float = 0.841621,
) -> DataFrame:
    """Minimum detectable effect of the CURRENT experiment design —
    the pre-registration question ("how small a lift could this split
    even see?") answered from the split's own moments: with per-arm
    standard errors se²_A, se²_B from the hash split,

        MDE = (z_{1−α/2} + z_{power}) · sqrt(se²_A + se²_B)

    at the conventional α = 5% two-sided / 80% power (z constants are
    caller-overridable literals — quantile functions never enter the
    engine, so there is nothing to diverge). mde_rel scales by the
    pooled mean, the lift language product teams actually use.

    Numerics and scale shape are exactly :func:`welch_ab_test`: one
    map-combined hash aggregate keyed (group, arm) over exact decimal
    sums, then a groups-sized join and one fixed-order double
    expression.
    """
    group_cols = group_cols or []
    v = F.col(value_col).cast("decimal(12,2)")
    base = df.filter(
        v.isNotNull() & F.col(unit_col).isNotNull()
    ).select(*group_cols, _hash_arm(unit_col, salt).alias("__arm"), v.alias("__v"))
    agg = base.groupBy(*group_cols, "__arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__v").alias("s"),
        F.sum(F.col("__v") * F.col("__v")).alias("ss"),
    )

    def side(tag: str, arm: int) -> DataFrame:
        return agg.filter(F.col("__arm") == arm).select(
            *group_cols,
            F.col("n").alias(f"n_{tag}"),
            F.col("s").alias(f"__s_{tag}"),
            F.col("ss").alias(f"__ss_{tag}"),
        )

    a, b = side("a", 0), side("b", 1)
    j = (
        a.join(b, list(group_cols)) if group_cols else a.crossJoin(b)
    ).filter((F.col("n_a") > 1) & (F.col("n_b") > 1))

    def se2(tag: str):
        n = F.col(f"n_{tag}").cast("double")
        s = F.col(f"__s_{tag}").cast("double")
        ss = F.col(f"__ss_{tag}").cast("double")
        var = F.greatest((ss - s * s / n) / (n - F.lit(1.0)), F.lit(0.0))
        return var / n

    mde = (F.lit(alpha_z) + F.lit(power_z)) * F.sqrt(se2("a") + se2("b"))
    mean_all = (
        (F.col("__s_a") + F.col("__s_b")).cast("double")
        / (F.col("n_a") + F.col("n_b")).cast("double")
    )
    return j.select(
        *group_cols,
        "n_a",
        "n_b",
        F.round(mean_all, 6).alias("mean_all"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(F.try_divide(mde, mean_all), 6).alias("mde_rel"),
    )


def holt_linear_forecast(
    df: DataFrame,
    period_col: str,
    group_cols: list[str],
    alpha: float = 0.5,
    beta: float = 0.5,
) -> DataFrame:
    """Holt's linear-trend exponential smoothing over a periodic count
    series — the first model that beats the seasonal-naive floor on
    trending series: level and trend update recursively,
    l_t = α·y_t + (1−α)·(l+b), b_t = β·(l_t − l) + (1−β)·b, with the
    standard init l=y_2, b=y_2−y_1 (which makes the t=2 one-step
    forecast exact, so backtest errors accumulate from t=3).

    Output per group: n_periods, level, trend, forecast_next (the
    h=1 forecast), mae (one-step-ahead backtest, null under 3
    periods). Groups with fewer than 2 periods are dropped (the
    recursion cannot initialize).

    The recursion is inherently sequential, so this is the documented
    Pandas-UDF case: the corpus collapses FIRST to a (group, period)
    count aggregate — calendar-bounded, thousands of rows at any data
    scale — and applyInPandas runs the recursion per group over that
    tiny frame. Determinism: every step is the same fixed sequence of
    correctly-rounded float64 ops a SQL engine's recursive CTE
    evaluates, so results match ANY IEEE engine bit-for-bit; rounding
    to 6 dp happens Spark-side (F.round), never in Python (whose
    round() is banker's, unlike SQL).
    """
    if not group_cols:
        raise ValueError("holt_linear_forecast: need at least one group col")
    if not (0.0 < alpha <= 1.0 and 0.0 <= beta <= 1.0):
        raise ValueError("holt_linear_forecast: alpha in (0,1], beta in [0,1]")
    import pandas as pd

    daily = df.groupBy(*group_cols, period_col).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    gfields = [
        daily.schema[c].dataType.simpleString() for c in group_cols
    ]
    out_schema = (
        ", ".join(f"{c} {t}" for c, t in zip(group_cols, gfields))
        + ", n_periods long, level double, trend double,"
        + " forecast_next double, mae double"
    )
    a, b_ = float(alpha), float(beta)

    def fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(period_col)
        y = pdf["n"].to_numpy(dtype="float64")
        if len(y) < 2:
            return pd.DataFrame(
                columns=[*group_cols, "n_periods", "level", "trend",
                         "forecast_next", "mae"]
            ).astype({"n_periods": "int64"}, errors="ignore")
        lev = y[1]
        tr = y[1] - y[0]
        es = 0.0
        k = 0
        for t in range(2, len(y)):
            pred = lev + tr
            es += abs(y[t] - pred)
            k += 1
            lev_new = a * y[t] + (1.0 - a) * pred
            tr = b_ * (lev_new - lev) + (1.0 - b_) * tr
            lev = lev_new
        head = {c: [pdf[c].iloc[0]] for c in group_cols}
        return pd.DataFrame(
            {
                **head,
                "n_periods": [len(y)],
                "level": [lev],
                "trend": [tr],
                "forecast_next": [lev + tr],
                "mae": [es / k if k > 0 else None],
            }
        )

    out = daily.groupBy(*group_cols).applyInPandas(fit, out_schema)
    return out.select(
        *group_cols,
        "n_periods",
        F.round("level", 6).alias("level"),
        F.round("trend", 6).alias("trend"),
        F.round("forecast_next", 6).alias("forecast_next"),
        F.round("mae", 6).alias("mae"),
    )


def wilson_ci(
    df: DataFrame,
    k_col: str,
    n_col: str,
    z: float = 1.959964,
) -> DataFrame:
    """Wilson score interval for a binomial proportion, row-wise —
    the CI that behaves at the edges Wald blows up on (k=0, k=n,
    small n), which is exactly where funnel steps live.

    With p̂ = k/n:  center = (p̂ + z²/2n) / (1 + z²/n),
    half-width = z·sqrt(p̂(1−p̂)/n + z²/4n²) / (1 + z²/n), clamped to
    [0, 1]. The z constant is a caller-overridable literal (no
    quantile function in the engine); k and n are exact integers, so
    the interval is ONE fixed-order double expression per row —
    engine-identical, oracle-pinned.

    Adds p_hat, ci_lo, ci_hi (round 6) to the input frame; rows with
    n = 0 get NULLs. Pure projection — no shuffle, applies to
    aggregate frames of any size.
    """
    k = F.col(k_col).cast("double")
    n = F.col(n_col).cast("double")
    zz = F.lit(float(z))
    phat = k / n
    denom = F.lit(1.0) + (zz * zz) / n
    center = (phat + (zz * zz) / (F.lit(2.0) * n)) / denom
    half = (
        zz
        * F.sqrt(
            phat * (F.lit(1.0) - phat) / n
            + (zz * zz) / ((F.lit(4.0) * n) * n)
        )
        / denom
    )
    ok = F.col(n_col).isNotNull() & (F.col(n_col) > 0)
    return df.select(
        "*",
        F.round(F.when(ok, phat), 6).alias("p_hat"),
        F.round(F.when(ok, F.greatest(center - half, F.lit(0.0))), 6).alias(
            "ci_lo"
        ),
        F.round(F.when(ok, F.least(center + half, F.lit(1.0))), 6).alias(
            "ci_hi"
        ),
    )


def eb_shrink_means(
    df: DataFrame,
    value_col: str,
    unit_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Empirical-Bayes (James–Stein-style) shrinkage diagnostics for
    per-unit means — the de-noising discipline for leaderboards and
    per-user metrics: a unit's raw mean is pulled toward the group
    mean by B_u = τ²/(τ² + σ²_w/n_u), where τ² (between-unit) and σ²_w
    (within-unit) come from the one-way random-effects method of
    moments:

        σ²_w = Σ_u SS_u / Σ_u (n_u − 1)
        τ²   = max(0, Var(unit means) − σ²_w · mean(1/n_u))

    Output per group: n_units, n_rows, grand_mean, s2_within, tau2,
    avg_shrink (mean of B_u; 1 = trust raw means, →0 = pool hard).

    Determinism discipline: cross-unit reductions never accumulate
    raw doubles (order-dependent). Each unit's mean, within-SS and
    1/n are computed in ONE fixed-order double expression, ROUNDed,
    and quantized to decimals; the unit→group aggregate then sums
    exactly. The oracle mirrors both the quantization points and the
    final double expressions.

    Scale shape: corpus → (group, unit) hash aggregate → group
    aggregate; the shrink-factor pass re-joins group scalars to the
    unit aggregate broadcast-style. Units with one row contribute a
    mean but no within-variance; groups need ≥ 2 units.
    """
    group_cols = group_cols or []
    v = F.col(value_col).cast("decimal(12,2)")
    per_unit = (
        df.filter(v.isNotNull() & F.col(unit_col).isNotNull())
        .select(*group_cols, F.col(unit_col).alias("__u"), v.alias("__v"))
        .groupBy(*group_cols, "__u")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum("__v").alias("__s"),
            F.sum(F.col("__v") * F.col("__v")).alias("__ss"),
        )
    )
    from hypermap_etl_spark.util import tracked_persist

    per_unit = tracked_persist(per_unit)
    n = F.col("__n").cast("double")
    s = F.col("__s").cast("double")
    ss = F.col("__ss").cast("double")
    unit = per_unit.select(
        *group_cols,
        "__n",
        F.round(s / n, 6).cast("decimal(18,6)").alias("__mq"),
        F.when(
            F.col("__n") > 1,
            F.round(F.greatest(ss - s * s / n, F.lit(0.0)), 6),
        )
        .otherwise(F.lit(0.0))
        .cast("decimal(18,6)")
        .alias("__wq"),
        F.round(F.lit(1.0) / n, 9).cast("decimal(18,9)").alias("__iq"),
    )
    g = unit.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("__n").cast("long").alias("n_rows"),
        F.sum("__mq").cast("decimal(38,6)").alias("__sm"),
        F.sum(F.col("__mq") * F.col("__mq")).cast("decimal(38,12)").alias("__smm"),
        F.sum("__wq").cast("decimal(38,6)").alias("__sw"),
        F.sum(F.col("__n") - F.lit(1)).cast("long").alias("__sdf"),
        F.sum("__iq").cast("decimal(38,9)").alias("__sinv"),
    ).filter(F.col("n_units") > 1)
    u = F.col("n_units").cast("double")
    sm = F.col("__sm").cast("double")
    smm = F.col("__smm").cast("double")
    grand = sm / u
    var_means = (smm - sm * sm / u) / (u - F.lit(1.0))
    s2w = F.when(
        F.col("__sdf") > 0,
        F.col("__sw").cast("double") / F.col("__sdf").cast("double"),
    ).otherwise(F.lit(0.0))
    tau2 = F.greatest(
        var_means - s2w * (F.col("__sinv").cast("double") / u), F.lit(0.0)
    )
    stats = g.select(
        *group_cols,
        "n_units",
        "n_rows",
        F.round(grand, 6).alias("grand_mean"),
        F.round(s2w, 6).alias("__s2w_r"),
        s2w.alias("__s2w"),
        F.round(tau2, 6).alias("__tau2_r"),
        tau2.alias("__tau2"),
    )
    shr = unit.join(
        F.broadcast(stats.select(*group_cols, "__s2w", "__tau2")),
        list(group_cols),
    ) if group_cols else unit.crossJoin(
        F.broadcast(stats.select("__s2w", "__tau2"))
    )
    bden = F.col("__tau2") + F.col("__s2w") / F.col("__n").cast("double")
    b = (
        F.when(bden > 0, F.col("__tau2") / bden).otherwise(F.lit(1.0))
    )
    bq = shr.select(
        *group_cols, F.round(b, 9).cast("decimal(18,9)").alias("__bq")
    )
    avg = bq.groupBy(*group_cols).agg(
        (
            F.sum("__bq").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("__avg_b")
    )
    out = (
        stats.join(avg, list(group_cols))
        if group_cols
        else stats.crossJoin(avg)
    )
    return out.select(
        *group_cols,
        "n_units",
        "n_rows",
        "grand_mean",
        F.col("__s2w_r").alias("s2_within"),
        F.col("__tau2_r").alias("tau2"),
        F.round(F.col("__avg_b"), 6).alias("avg_shrink"),
    )


def weighted_ess(
    df: DataFrame,
    weight_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Kish effective sample size of a weighted sample,
    ESS = (Σw)² / Σw², with the design effect n/ESS — the one number
    that says how much information importance/survey weights actually
    leave (ESS ≈ n: weights are benign; ESS ≪ n: a few heavy rows
    dominate and downstream estimates are noisier than n suggests).

    Weights quantize to decimal(12,2) and both moments accumulate as
    exact decimals (order-independent); ESS is one fixed-order double
    expression. Non-positive and NULL weights are excluded (they are
    not samples). One map-combined hash aggregate; groups-sized
    output.
    """
    group_cols = group_cols or []
    w = F.col(weight_col).cast("decimal(12,2)")
    base = df.filter(w.isNotNull() & (w > 0)).select(
        *group_cols, w.alias("__w")
    )
    g = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__w").alias("__sw"),
        F.sum(F.col("__w") * F.col("__w")).alias("__sww"),
    )
    sw = F.col("__sw").cast("double")
    sww = F.col("__sww").cast("double")
    ess = F.try_divide(sw * sw, sww)
    return g.select(
        *group_cols,
        "n",
        F.round(ess, 6).alias("ess"),
        F.round(F.try_divide(F.col("n").cast("double"), ess), 6).alias(
            "design_effect"
        ),
    )


# O'Brien-Fleming two-sided z boundaries for K=5 equally-spaced looks
# at overall alpha=5% (standard group-sequential table values —
# literals, like every quantile constant in this module)
_OBF_5 = [4.877, 3.357, 2.680, 2.290, 2.031]


def sequential_welch(
    df: DataFrame,
    value_col: str,
    unit_col: str,
    day_col: str,
    group_cols: list[str] | None = None,
    boundaries: list[float] | None = None,
    salt: str = "ab",
) -> DataFrame:
    """Group-sequential A/B monitoring — the peeking correction: an
    experimenter who checks the dashboard K times must compare each
    interim z against an ESCALATED boundary (O'Brien-Fleming here),
    not 1.96, or the false-positive rate multiplies. This operator
    replays the K equally-spaced calendar looks and reports, per
    look, the cumulative Welch z and whether it crossed.

    Look assignment is pure int64 — (day_index·K) div n_days over the
    observed calendar span (broadcast single-row min/max) — and each
    look's statistics come from CUMULATIVE exact decimal moments (a
    window over the (group, arm, look) aggregate, bounded by K), so
    the interim z at look i uses exactly the data a live dashboard
    would have had. Boundaries are caller-overridable literals.

    Output per (group, look): n_a, n_b, z_stat, boundary, crossed —
    ordered, so "would we have stopped early, and when" reads off
    directly.

    Scale shape: ONE corpus hash aggregate to (group, arm, day)
    moments; the span, look re-bucketing, and cumulative windows all
    run over that calendar-bounded aggregate. Same
    exact-moments-then-one-double-expression numerics as
    :func:`welch_ab_test`.
    """
    from pyspark.sql.window import Window

    group_cols = group_cols or []
    bounds = [float(b) for b in (_OBF_5 if boundaries is None else boundaries)]
    k = len(bounds)
    if k < 1:
        raise ValueError("sequential_welch: need at least one look")
    v = F.col(value_col).cast("decimal(12,2)")
    day = F.date_trunc("day", F.col(day_col))
    base = df.filter(
        v.isNotNull() & F.col(unit_col).isNotNull() & F.col(day_col).isNotNull()
    ).select(
        *group_cols,
        _hash_arm(unit_col, salt).alias("__arm"),
        day.alias("__day"),
        v.alias("__v"),
    )
    # ONE corpus scan: collapse to the calendar-bounded
    # (group, arm, day) moment aggregate first; the span and the look
    # re-bucketing then run over that aggregate (decimal partials
    # associate exactly, so re-summing by look equals bucketing rows
    # directly)
    daily = base.groupBy(*group_cols, "__arm", "__day").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__v").alias("__s"),
        F.sum(F.col("__v") * F.col("__v")).alias("__ss"),
    )
    span = daily.agg(
        F.min("__day").alias("__d0"),
        (F.datediff(F.max("__day"), F.min("__day")) + F.lit(1))
        .cast("long")
        .alias("__nd"),
    )
    dd = F.datediff(F.col("__day"), F.col("__d0")).cast("long")
    num = dd * F.lit(k)
    look = (
        (num - F.pmod(num, F.col("__nd"))) / F.col("__nd")
    ).cast("int")
    per = (
        daily.crossJoin(F.broadcast(span))
        .select(
            *group_cols,
            "__arm",
            F.least(look, F.lit(k - 1)).alias("look"),
            "__n",
            "__s",
            "__ss",
        )
        .groupBy(*group_cols, "__arm", "look")
        .agg(
            F.sum("__n").cast("long").alias("__n"),
            F.sum("__s").alias("__s"),
            F.sum("__ss").alias("__ss"),
        )
    )
    w = (
        Window.partitionBy(*group_cols, "__arm")
        .orderBy("look")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per.select(
        *group_cols,
        "__arm",
        "look",
        F.sum("__n").over(w).cast("long").alias("__cn"),
        F.sum("__s").over(w).alias("__cs"),
        F.sum("__ss").over(w).alias("__css"),
    )

    def side(tag: str, arm: int) -> DataFrame:
        return cum.filter(F.col("__arm") == arm).select(
            *group_cols,
            "look",
            F.col("__cn").alias(f"n_{tag}"),
            F.col("__cs").alias(f"__s_{tag}"),
            F.col("__css").alias(f"__ss_{tag}"),
        )

    a, b = side("a", 0), side("b", 1)
    j = a.join(b, [*group_cols, "look"]).filter(
        (F.col("n_a") > 1) & (F.col("n_b") > 1)
    )

    def se2(tag: str):
        n = F.col(f"n_{tag}").cast("double")
        s = F.col(f"__s_{tag}").cast("double")
        ss = F.col(f"__ss_{tag}").cast("double")
        var = F.greatest((ss - s * s / n) / (n - F.lit(1.0)), F.lit(0.0))
        return var / n, s / n

    se2_a, m_a = se2("a")
    se2_b, m_b = se2("b")
    z = F.try_divide(m_a - m_b, F.sqrt(se2_a + se2_b))
    boundary = F.element_at(
        F.array(*[F.lit(bv) for bv in bounds]), F.col("look") + 1
    )
    return j.select(
        *group_cols,
        F.col("look").cast("bigint").alias("look"),
        "n_a",
        "n_b",
        F.round(z, 6).alias("z_stat"),
        F.round(boundary, 6).alias("boundary"),
        F.coalesce(F.abs(z) > boundary, F.lit(False)).alias("crossed"),
    ).orderBy(*group_cols, "look")


def layer_orthogonality(
    df: DataFrame,
    unit_col: str,
    salt_a: str = "ab",
    salt_b: str = "layer2",
    crit: float = 3.841,
) -> DataFrame:
    """Orthogonality certification for LAYERED experiments — two
    concurrent experiments hash the same units with different salts,
    and the whole design is valid only if the assignments are
    independent (a correlated pair contaminates both readouts). This
    computes the joint 2×2 assignment table over distinct units and
    the chi-squared independence statistic in its closed 2×2 form,

        χ² = N·(n00·n11 − n01·n10)² / ((n00+n01)(n10+n11)(n00+n10)(n01+n11)),

    where every term is an exact integer (decimal(38,0) products — a
    billion units squared overflows int64) and the only float
    operation is the final division. Verdict: χ² < crit (3.841 = the
    95% chi-squared(1) quantile, a literal).

    Scale shape: one distinct-unit aggregate (the two md5 arms are
    map-side projections), then a 4-row fold to one row. Output:
    n_units, n00, n01, n10, n11, chi2, orthogonal.
    """
    units = df.filter(F.col(unit_col).isNotNull()).select(
        F.col(unit_col).cast("string").alias("__u")
    ).distinct()
    both = units.select(
        _hash_arm("__u", salt_a).alias("__a"),
        _hash_arm("__u", salt_b).alias("__b"),
    )
    cells = both.groupBy("__a", "__b").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )

    def cell(a: int, b: int):
        return F.coalesce(
            F.sum(
                F.when((F.col("__a") == a) & (F.col("__b") == b), F.col("__n"))
            ),
            F.lit(0),
        ).cast("long")

    g = cells.agg(
        cell(0, 0).alias("n00"),
        cell(0, 1).alias("n01"),
        cell(1, 0).alias("n10"),
        cell(1, 1).alias("n11"),
    )
    d = "decimal(38,0)"
    n00, n01 = F.col("n00").cast(d), F.col("n01").cast(d)
    n10, n11 = F.col("n10").cast(d), F.col("n11").cast(d)
    ntot = (n00 + n01 + n10 + n11).cast(d)
    det = (n00 * n11 - n01 * n10).cast(d)
    num = (ntot.cast("double")) * (det.cast("double") * det.cast("double"))
    den = (
        (n00 + n01).cast("double")
        * (n10 + n11).cast("double")
        * (n00 + n10).cast("double")
        * (n01 + n11).cast("double")
    )
    chi2 = F.try_divide(num, den)
    return g.select(
        ntot.cast("long").alias("n_units"),
        "n00",
        "n01",
        "n10",
        "n11",
        F.round(chi2, 6).alias("chi2"),
        F.coalesce(chi2 < F.lit(crit), F.lit(False)).alias("orthogonal"),
    )


def powerlaw_alpha(
    df: DataFrame,
    unit_col: str,
    group_cols: list[str] | None = None,
    x_min: int = 1,
) -> DataFrame:
    """Power-law exponent of the per-unit activity distribution — the
    Clauset-Shalizi-Newman continuous-MLE estimate

        α̂ = 1 + n / Σ ln(x_i / x_min),   over units with x_i >= x_min

    applied to per-unit event counts: the one-number answer to "how
    heavy is this platform's activity tail" (α near 2: extreme
    whales; α > 3: tail thin enough that means behave).

    Determinism: counts are exact longs; each ln(x/xmin) term is
    rounded to 12 dp and quantized to decimal before the cross-unit
    sum (the quantize-then-exact-sum discipline), so the estimate
    cannot drift with aggregation order. Output per group: n_units,
    n_tail (units at or above x_min), alpha (round 6), plus the tail
    mean count — the sanity companion.

    Scale shape: one corpus hash aggregate to (group, unit) counts,
    one fold to groups. x_min < 1 is rejected (the MLE needs a
    positive floor).
    """
    if x_min < 1:
        raise ValueError("powerlaw_alpha: need x_min >= 1")
    group_cols = group_cols or []
    per = (
        df.filter(F.col(unit_col).isNotNull())
        .groupBy(*group_cols, F.col(unit_col).alias("__u"))
        .agg(F.count(F.lit(1)).cast("long").alias("__x"))
    )
    tail = F.col("__x") >= F.lit(x_min)
    lnterm = F.round(
        F.log(F.col("__x").cast("double") / F.lit(float(x_min))), 12
    ).cast("decimal(18,12)")
    g = per.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum(F.when(tail, 1).otherwise(0)).cast("long").alias("n_tail"),
        F.sum(F.when(tail, lnterm)).cast("decimal(38,12)").alias("__sl"),
        F.sum(F.when(tail, F.col("__x"))).cast("long").alias("__sx"),
    )
    nt = F.col("n_tail").cast("double")
    alpha = F.lit(1.0) + F.try_divide(nt, F.col("__sl").cast("double"))
    return g.select(
        *group_cols,
        "n_units",
        "n_tail",
        F.round(alpha, 6).alias("alpha"),
        F.round(
            F.try_divide(F.col("__sx").cast("double"), nt), 6
        ).alias("tail_mean"),
    )


def uplift_deciles(
    df: DataFrame,
    value_col: str,
    unit_col: str,
    score_col: str,
    n_bands: int = 10,
    salt: str = "ab",
) -> DataFrame:
    """Uplift decile table — the targeting × experimentation bridge:
    rank UNITS by a model score, split each band by the hash-assigned
    arm, and report the per-band treatment-minus-control mean — the
    readout behind "who should get the promotion" (a real uplift
    model shows effect concentrated in top bands; on an A/A split the
    column reads ~0, the built-in sanity check).

    Units first (per-unit exact value totals and the caller's score),
    then band assignment by pure int64 arithmetic over the
    distributed global rank on (score desc, unit) — the lift_table
    construction — then one (band, arm) moment aggregate and the
    fixed-order double epilogue per band.

    Output per band: n_t, n_c, mean_t, mean_c, uplift (round 6).
    """
    if n_bands < 2:
        raise ValueError("uplift_deciles: need n_bands >= 2")
    from hypermap_etl_spark.operators.scale import _global_rank_with_total

    v = F.col(value_col).cast("decimal(12,2)")
    units = (
        df.filter(v.isNotNull() & F.col(unit_col).isNotNull())
        .groupBy(F.col(unit_col).cast("string").alias("__u"))
        .agg(
            F.sum(v).cast("decimal(18,2)").alias("__x"),
            F.max(F.col(score_col).cast("double")).alias("__score"),
        )
    )
    ranked, total = _global_rank_with_total(
        units,
        [F.col("__score").desc(), F.col("__u").asc()],
        rank_col="__grank",
    )
    if total == 0:
        return ranked.select(
            F.lit(0).cast("int").alias("band"),
            F.lit(0).cast("long").alias("n_t"),
            F.lit(0).cast("long").alias("n_c"),
            F.lit(0.0).alias("mean_t"),
            F.lit(0.0).alias("mean_c"),
            F.lit(0.0).alias("uplift"),
        ).limit(0)
    band = (
        (F.col("__grank") - F.lit(1)) * F.lit(n_bands)
        - F.pmod((F.col("__grank") - F.lit(1)) * F.lit(n_bands), F.lit(total))
    ) / F.lit(total)
    per = (
        ranked.select(
            band.cast("int").alias("band"),
            _hash_arm("__u", salt).alias("__arm"),
            "__x",
        )
        .groupBy("band", "__arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum("__x").cast("decimal(38,2)").alias("__s"),
        )
    )
    t = per.filter(F.col("__arm") == 1).select(
        "band",
        F.col("__n").alias("n_t"),
        F.col("__s").alias("__s_t"),
    )
    c = per.filter(F.col("__arm") == 0).select(
        "band",
        F.col("__n").alias("n_c"),
        F.col("__s").alias("__s_c"),
    )
    j = t.join(c, "band").filter((F.col("n_t") > 0) & (F.col("n_c") > 0))
    m_t = F.col("__s_t").cast("double") / F.col("n_t").cast("double")
    m_c = F.col("__s_c").cast("double") / F.col("n_c").cast("double")
    return j.select(
        "band",
        "n_t",
        "n_c",
        F.round(m_t, 6).alias("mean_t"),
        F.round(m_c, 6).alias("mean_c"),
        F.round(m_t - m_c, 6).alias("uplift"),
    ).orderBy("band")
