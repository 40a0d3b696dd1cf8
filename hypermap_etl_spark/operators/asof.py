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
