"""Declarative data-quality constraint suite — the Deequ-style
"unit tests for data" a pipeline runs before admitting a new corpus
drop: completeness, uniqueness, range/set/pattern membership, row
count, and referential integrity, evaluated together and reported as
one long-format verdict table.

Beyond-reference (the reference trusts its one indexer schema; a
training pipeline meets arbitrary third-party drops), modeled on the
public Deequ/Great-Expectations constraint vocabulary. Complements
:mod:`profile` (which *describes* a table; this *judges* it).

Scale shape: every row-level check folds into ONE ``agg`` over ONE
scan — conditional counts combine map-side, so a 100 TB fact pays a
single pass regardless of how many checks are declared (``unique``
adds a count-distinct, planned as Expand + two-stage hash agg like
:func:`profile.profile_table`). Each ``references`` check adds one
LEFT ANTI join against the *distinct keys* of its dimension — the dim
key set is dedup'd first (small → broadcast; Catalyst picks), and the
orphan count is all that survives. The final ``stack`` unpivot runs
on one aggregated row, driver-light. Output is scalar-only (driver
canonicalizer contract).

Determinism note: observed fractions are ratios of exact integer
counts — IEEE division of integers < 2^53 is correctly rounded and
engine-identical, so no rounding is applied. ``matches`` patterns
should stay in the RE2-safe subset (no lookaround/backrefs) so Java
regex (Spark) and RE2 (DuckDB oracles) agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------- builders ----
# Each builder returns a plain dict (no Spark objects — picklable,
# JSON-able for CLI specs). `column` is "" for table-level checks.


def not_null(column: str) -> dict:
    """Every row has a value: completeness == 1.0."""
    return {"kind": "not_null", "column": column, "threshold": 1.0}


def completeness(column: str, at_least: float) -> dict:
    """Non-null fraction >= ``at_least``."""
    if not 0.0 <= at_least <= 1.0:
        raise ValueError("completeness: at_least must be in [0, 1]")
    return {"kind": "completeness", "column": column, "threshold": float(at_least)}


def unique(column: str) -> dict:
    """No duplicate non-null values: distinct/non-null == 1.0 (the
    primary-key check; NULLs are completeness's business)."""
    return {"kind": "unique", "column": column, "threshold": 1.0}


def in_range(
    column: str,
    lo: float | int | None = None,
    hi: float | int | None = None,
    at_least: float = 1.0,
) -> dict:
    """Fraction of non-null values within [lo, hi] (either bound
    optional, inclusive) >= ``at_least``."""
    if lo is None and hi is None:
        raise ValueError("in_range: need at least one bound")
    return {
        "kind": "in_range",
        "column": column,
        "lo": lo,
        "hi": hi,
        "threshold": float(at_least),
    }


def non_negative(column: str, at_least: float = 1.0) -> dict:
    """Sugar for ``in_range(column, lo=0)``."""
    return in_range(column, lo=0, at_least=at_least)


def in_set(column: str, values: list, at_least: float = 1.0) -> dict:
    """Fraction of non-null values in ``values`` >= ``at_least``."""
    if not values:
        raise ValueError("in_set: values must be non-empty")
    return {
        "kind": "in_set",
        "column": column,
        "values": list(values),
        "threshold": float(at_least),
    }


def matches(column: str, pattern: str, at_least: float = 1.0) -> dict:
    """Fraction of non-null values rlike ``pattern`` >= ``at_least``.
    Keep patterns RE2-safe (no lookaround/backrefs) for cross-engine
    reproducibility."""
    return {
        "kind": "matches",
        "column": column,
        "pattern": pattern,
        "threshold": float(at_least),
    }


def row_count(at_least: int | None = None, at_most: int | None = None) -> dict:
    """Table row count within [at_least, at_most] (either optional)."""
    if at_least is None and at_most is None:
        raise ValueError("row_count: need at least one bound")
    return {
        "kind": "row_count",
        "column": "",
        "at_least": at_least,
        "at_most": at_most,
        "threshold": float(at_least) if at_least is not None else None,
    }


def references(column: str, ref_name: str, ref_column: str) -> dict:
    """Referential integrity: every non-null value of ``column``
    exists in ``ref_column`` of the dimension registered under
    ``ref_name`` (pass the frame via ``check_constraints(refs=...)``).
    Observed = orphan count; passes at 0."""
    return {
        "kind": "references",
        "column": column,
        "ref_name": ref_name,
        "ref_column": ref_column,
        "threshold": 0.0,
    }


def _check_id(c: dict) -> str:
    k = c["kind"]
    if k == "in_range":
        return f"in_range({c['column']},{c['lo']},{c['hi']})"
    if k == "in_set":
        return f"in_set({c['column']})"
    if k == "matches":
        return f"matches({c['column']})"
    if k == "row_count":
        return f"row_count({c['at_least']},{c['at_most']})"
    if k == "references":
        return f"references({c['column']}->{c['ref_name']}.{c['ref_column']})"
    return f"{k}({c['column']})"


# ------------------------------------------------------------ evaluation ----


def check_constraints(
    df: DataFrame, checks: list[dict], refs: dict[str, DataFrame] | None = None
) -> DataFrame:
    """Evaluate ``checks`` against ``df``; returns one row per check:
    (constraint, kind, column, observed, threshold, passed).

    ``observed`` is a fraction for membership-style checks (denominator
    = non-null values; vacuously 1.0 when there are none), a raw count
    for ``row_count`` / ``references``. ``threshold`` is the declared
    bound (NULL for un-bounded row_count sides).
    """
    if not checks:
        raise ValueError("check_constraints: no checks declared")
    refs = refs or {}
    seen: set[str] = set()
    for c in checks:
        cid = _check_id(c)
        if cid in seen:
            raise ValueError(f"duplicate constraint: {cid}")
        seen.add(cid)
        if c["kind"] != "row_count" and c["kind"] != "references":
            if c["column"] not in df.columns:
                raise ValueError(f"constraint column not in frame: {c['column']}")
        if c["kind"] == "references":
            if c["column"] not in df.columns:
                raise ValueError(f"constraint column not in frame: {c['column']}")
            if c["ref_name"] not in refs:
                raise ValueError(f"unregistered reference table: {c['ref_name']}")

    n_rows = F.count(F.lit(1)).cast("long")
    aggs: list[F.Column] = [n_rows.alias("__n")]
    row_level: list[tuple[int, dict]] = []
    ref_level: list[tuple[int, dict]] = []
    for i, c in enumerate(checks):
        k = c["kind"]
        if k == "references":
            ref_level.append((i, c))
            continue
        row_level.append((i, c))
        if k in ("not_null", "completeness"):
            aggs.append(F.count(F.col(c["column"])).cast("long").alias(f"__ok_{i}"))
        elif k == "unique":
            aggs.append(F.count(F.col(c["column"])).cast("long").alias(f"__nn_{i}"))
            aggs.append(
                F.count_distinct(F.col(c["column"])).cast("long").alias(f"__ok_{i}")
            )
        elif k in ("in_range", "in_set", "matches"):
            col = F.col(c["column"])
            if k == "in_range":
                cond = F.lit(True)
                if c["lo"] is not None:
                    cond = cond & (col >= F.lit(c["lo"]))
                if c["hi"] is not None:
                    cond = cond & (col <= F.lit(c["hi"]))
            elif k == "in_set":
                cond = col.isin(c["values"])
            else:
                cond = col.cast("string").rlike(c["pattern"])
            aggs.append(F.count(col).cast("long").alias(f"__nn_{i}"))
            aggs.append(
                F.sum(F.when(col.isNotNull() & cond, 1).otherwise(0))
                .cast("long")
                .alias(f"__ok_{i}")
            )
        elif k == "row_count":
            pass  # __n suffices
        else:
            raise ValueError(f"unknown constraint kind: {k}")

    one = df.agg(*aggs)

    def frac(i: int, nn: str) -> F.Column:
        # vacuously 1.0 on an empty denominator — a constraint about
        # values can't fail when there are no values
        return F.when(F.col(nn) == 0, F.lit(1.0)).otherwise(
            F.col(f"__ok_{i}") / F.col(nn).cast("double")
        )

    rows: list[F.Column] = []
    for i, c in row_level:
        k = c["kind"]
        thr = c.get("threshold")
        if k in ("not_null", "completeness"):
            obs = F.when(F.col("__n") == 0, F.lit(1.0)).otherwise(
                F.col(f"__ok_{i}") / F.col("__n").cast("double")
            )
            passed = obs >= F.lit(float(thr))
        elif k == "unique":
            obs = frac(i, f"__nn_{i}")
            passed = F.col(f"__ok_{i}") == F.col(f"__nn_{i}")
        elif k in ("in_range", "in_set", "matches"):
            obs = frac(i, f"__nn_{i}")
            passed = obs >= F.lit(float(thr))
        else:  # row_count
            obs = F.col("__n").cast("double")
            passed = F.lit(True)
            if c["at_least"] is not None:
                passed = passed & (F.col("__n") >= F.lit(int(c["at_least"])))
            if c["at_most"] is not None:
                passed = passed & (F.col("__n") <= F.lit(int(c["at_most"])))
        rows.append(
            F.struct(
                F.lit(_check_id(c)).alias("constraint"),
                F.lit(k).alias("kind"),
                F.lit(c["column"]).alias("column"),
                obs.cast("double").alias("observed"),
                (
                    F.lit(float(thr)).cast("double")
                    if thr is not None
                    else F.lit(None).cast("double")
                ).alias("threshold"),
                passed.alias("passed"),
            )
        )

    out: DataFrame | None = (
        one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
        if rows
        else None
    )

    for i, c in ref_level:
        dim = refs[c["ref_name"]].select(
            F.col(c["ref_column"]).alias("__k")
        ).where(F.col("__k").isNotNull()).distinct()
        orphans = (
            df.select(F.col(c["column"]).alias("__k"))
            .where(F.col("__k").isNotNull())
            .join(dim, "__k", "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("__orph"))
        )
        ref_row = orphans.select(
            F.lit(_check_id(c)).alias("constraint"),
            F.lit("references").alias("kind"),
            F.lit(c["column"]).alias("column"),
            F.col("__orph").cast("double").alias("observed"),
            F.lit(0.0).alias("threshold"),
            (F.col("__orph") == 0).alias("passed"),
        )
        out = ref_row if out is None else out.unionByName(ref_row)
    assert out is not None  # checks is non-empty, so one branch filled it
    return out


def suite_passed(report: DataFrame) -> bool:
    """True iff every constraint in a :func:`check_constraints` report
    passed — the admission verdict (one tiny action)."""
    return report.where(~F.col("passed")).limit(1).count() == 0
