"""As-of (most-recent-match) join — an operator Spark lacks natively.

Implemented as the scalable union-sort-window composition, NOT a range
cross-join: tag both sides, union, and in one window pass per key carry
the latest right-side values forward onto left rows. Cost = one shuffle
on the join keys + a sort within each key partition — linear, no
candidate-pair explosion, skew-bounded by the keys themselves.

    left  (k, t_l, ...)   ⟕asof  right (k, t_r, cols)
  = for each left row: the right row with the greatest t_r ≤ t_l

Ties: a right row at exactly t_l is visible (≤, matching DuckDB's
ASOF JOIN ON l.t >= r.t, which the oracle uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join; right_cols arrive as <name><suffix> (null when no
    right row precedes the left row).

    All right columns travel in ONE struct carried by a single
    last(ignorenulls=True): per-column fills would each skip their own
    NULLs independently and could stitch an output row from DIFFERENT
    right rows (a matched row's legitimate NULL field replaced by an
    older row's value) — diverging from DuckDB ASOF JOIN semantics.
    With the struct, the whole matched row wins and its NULL fields
    stay NULL.
    """
    from pyspark.sql.types import StructField, StructType

    lcols = left.columns
    rstruct_type = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in right_cols]
    )
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rstruct_type).alias("__r"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys],
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in right_cols]).alias("__r"),
    ).select(*lcols, "__ts", "__side", "__r")

    unioned = l.unionByName(r)
    # right rows sort before left rows at equal __ts (__side 0 < 1) so a
    # tie is visible to the left row
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lcols,
        "__side",
        F.last(F.col("__r"), ignorenulls=True).over(w).alias("__rm"),
    )
    return filled.filter(F.col("__side") == 1).select(
        *lcols,
        *[F.col("__rm").getField(c).alias(f"{c}{suffix}") for c in right_cols],
    )


def resample_ffill(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_cols: list[str],
    step: int,
    start: int | None = None,
    end: int | None = None,
) -> DataFrame:
    """Gap-fill a per-key time series onto a regular grid with forward
    fill — the resample step before any fixed-cadence analytics
    (dashboards, rate calculations, drift windows) over
    irregularly-sampled events. For every key and every grid instant
    t in [start, end] stepping ``step``, carries the latest
    observation at or before t (:func:`asof_join` semantics — ties
    visible); instants before a key's first observation report NULLs.

    ``ts_col`` must be integer-like (the repo's epoch-micros BIGINT
    convention); ``start``/``end`` default to the GLOBAL min/max so
    every key shares one grid (comparable rows — per-key extents
    would misalign the grid across keys).

    Scale shape: the grid is distinct-keys x explode(sequence(...)) —
    built map-side on the key frame, never a cartesian shuffle — and
    the fill is asof_join's one union-sort-window pass keyed by
    ``keys``. Output size keys x grid-points is the contract, not a
    blow-up. The two-row extent collect is the only driver traffic.
    """
    if step <= 0:
        raise ValueError("resample_ffill: step must be positive")
    if start is None or end is None:
        ext = df.agg(
            F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
        ).collect()[0]
        if ext["lo"] is None:
            raise ValueError("resample_ffill: no observations")
        start = int(ext["lo"]) if start is None else start
        end = int(ext["hi"]) if end is None else end
    if end < start:
        raise ValueError("resample_ffill: end < start")
    grid = (
        df.select(*keys)
        .distinct()
        .select(
            *keys,
            F.explode(
                F.sequence(
                    F.lit(int(start)).cast("long"),
                    F.lit(int(end)).cast("long"),
                    F.lit(int(step)).cast("long"),
                )
            ).alias(ts_col),
        )
    )
    return asof_join(
        grid,
        df.select(*keys, ts_col, *value_cols),
        keys,
        ts_col,
        ts_col,
        value_cols,
        suffix="",
    )


def sliding_distinct_actives(
    df,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_days: int = 7,
):
    """Trailing-window distinct actives per day (the DAU/WAU/MAU
    family): for each calendar day, how many distinct keys were active
    in the last ``window_days`` days.

    The scale construction is CONTRIBUTION EXPLOSION, not a per-day
    distinct scan: collapse to distinct (key, day) pairs (one
    map-combined aggregate — the corpus-sized step), then explode each
    pair to the ``window_days`` report days it contributes to
    (map-side, a bounded ×W blowup of the already-tiny pair set) and
    count distinct keys per report day. A naive per-day COUNT(DISTINCT
    ... WHERE day BETWEEN) re-scans the corpus W times; a RANGE window
    with collect_set holds per-day sets in memory. Report days are
    clamped to the observed span (no phantom trailing days).

    Output: (day, n_active, window_days) ordered by day.
    """
    from pyspark.sql import functions as F

    day = F.date_trunc("DAY", F.col(ts_col)).cast("date")
    pairs = (
        df.select(F.col(key_col).alias("k"), day.alias("d"))
        .filter(F.col("k").isNotNull() & F.col("d").isNotNull())
        .distinct()
    )
    span = pairs.agg(F.max("d").alias("last_day"))
    contrib = (
        pairs.crossJoin(F.broadcast(span))
        .select(
            "k",
            F.explode(
                F.sequence(
                    F.col("d"),
                    F.least(
                        F.date_add(F.col("d"), window_days - 1),
                        F.col("last_day"),
                    ),
                )
            ).alias("day"),
        )
    )
    return (
        contrib.groupBy("day")
        .agg(F.count_distinct("k").cast("bigint").alias("n_active"))
        .select(
            F.col("day").cast("string").alias("day"),
            "n_active",
            F.lit(window_days).alias("window_days"),
        )
        .orderBy("day")
    )
