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
    for c in columns:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__nn_{c}")
        )
        if exact:
            aggs.append(F.count_distinct(F.col(c)).cast("long").alias(f"__nd_{c}"))
        else:
            aggs.append(
                F.approx_count_distinct(F.col(c)).cast("long").alias(f"__nd_{c}")
            )
        numeric = isinstance(df.schema[c].dataType, NumericType)
        aggs.append(
            (F.min(F.col(c)).cast("double") if numeric else _null_d()).alias(f"__mn_{c}")
        )
        aggs.append(
            (F.max(F.col(c)).cast("double") if numeric else _null_d()).alias(f"__mx_{c}")
        )
    one = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in columns
    )
    return one.select(
        F.expr(
            f"stack({len(columns)}, {stacked}) AS "
            "(col_name, n_nulls, n_distinct, min_num, max_num)"
        )
    )
