"""Slowly-changing-dimension type 2 maintenance — versioned dimension
rows with validity intervals, the warehouse-side bookkeeping a corpus
pipeline needs for source/domain/license metadata that changes between
crawls (a document keeps pointing at the license text that was true
WHEN IT WAS CRAWLED, not today's).

Beyond-reference (the reference overwrites in place,
src/lib/services/mongodb.ts upserts); this is the standard Kimball
SCD2 construction expressed as one join + unions.

Schema contract: a dimension table carries its business keys, the
tracked attribute columns, and three bookkeeping columns —
``valid_from_us`` (BIGINT epoch micros), ``valid_to_us`` (BIGINT,
NULL while current) and ``is_current`` (BOOLEAN).

Scale shape: ONE equi-join of the CURRENT slice against the update
snapshot on the business keys (change detection compares md5
fingerprints computed map-side over sentinel-tagged tracked columns —
the :func:`profile.table_diff` discipline, so the comparison never
widens the shuffle beyond keys + hash + payload). History rows
(``is_current = false``) pass through as a filter, never shuffled.
The output is the full new dimension; pair with
:func:`merge.upsert`'s bucket-partitioned write to rewrite only
touched partitions at 100 TB dim scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BOOKKEEPING = ("valid_from_us", "valid_to_us", "is_current")


def _fingerprint(cols: list[str]) -> F.Column:
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")) for c in cols
    ]
    return F.md5(F.concat_ws("\x1f", *parts))


def scd2_init(
    snapshot: DataFrame,
    key_cols: list[str],
    ts_us: int,
) -> DataFrame:
    """Bless an initial snapshot as an SCD2 dimension: every row
    current, valid from ``ts_us``."""
    _validate(snapshot, key_cols)
    return snapshot.select(
        *snapshot.columns,
        F.lit(int(ts_us)).cast("long").alias("valid_from_us"),
        F.lit(None).cast("long").alias("valid_to_us"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    ts_us: int,
    close_missing: bool = False,
) -> DataFrame:
    """Fold an update snapshot (effective at ``ts_us``) into an SCD2
    dimension:

      changed key   → current row closed (valid_to_us = ts_us), new
                      current version appended
      unchanged key → untouched
      new key       → new current row
      missing key   → untouched, or closed when ``close_missing``
                      (the full-snapshot delete convention)

    Tracked attributes are every non-key, non-bookkeeping column;
    ``updates`` must carry exactly the keys + tracked columns.
    Duplicate keys within ``updates`` are the caller's bug (the join
    would fan out — run :func:`constraints.check_constraints` with
    ``unique`` first).
    """
    _validate(dim, key_cols, require_bookkeeping=True)
    tracked = [
        c for c in dim.columns if c not in key_cols and c not in _BOOKKEEPING
    ]
    want = set(key_cols) | set(tracked)
    have = set(updates.columns)
    if have != want:
        raise ValueError(
            f"scd2_apply: updates columns {sorted(have)} != expected "
            f"{sorted(want)}"
        )

    ts = F.lit(int(ts_us)).cast("long")
    history = dim.filter(~F.col("is_current"))
    current = dim.filter(F.col("is_current"))

    cur_fp = current.withColumn("__fp", _fingerprint(tracked))
    upd_fp = updates.withColumn("__fp_new", _fingerprint(tracked))

    # one join on the business keys; updates side renamed so tracked
    # payload survives for the new-version rows
    upd_sel = upd_fp.select(
        *key_cols,
        *[F.col(c).alias(f"__new_{c}") for c in tracked],
        "__fp_new",
    )
    joined = cur_fp.join(upd_sel, key_cols, "full_outer")

    in_cur = F.col("__fp").isNotNull()
    in_upd = F.col("__fp_new").isNotNull()
    changed = in_cur & in_upd & (F.col("__fp") != F.col("__fp_new"))

    untouched_cond = in_cur & in_upd & (F.col("__fp") == F.col("__fp_new"))
    if not close_missing:
        untouched_cond = untouched_cond | (in_cur & ~in_upd)
    untouched = joined.filter(untouched_cond).select(*dim.columns)

    close_cond = changed if not close_missing else (
        changed | (in_cur & ~in_upd)
    )
    closed = (
        joined.filter(close_cond)
        .select(*dim.columns)
        .withColumn("valid_to_us", ts)
        .withColumn("is_current", F.lit(False))
    )

    fresh = joined.filter(changed | (~in_cur & in_upd)).select(
        *key_cols,
        *[F.col(f"__new_{c}").alias(c) for c in tracked],
        ts.alias("valid_from_us"),
        F.lit(None).cast("long").alias("valid_to_us"),
        F.lit(True).alias("is_current"),
    ).select(*dim.columns)

    return history.unionByName(untouched).unionByName(closed).unionByName(fresh)


def scd2_at(dim: DataFrame, ts_us: int) -> DataFrame:
    """Time-travel read: the dimension as of ``ts_us`` — rows whose
    validity interval covers the instant (half-open [from, to))."""
    ts = F.lit(int(ts_us)).cast("long")
    return dim.filter(
        (F.col("valid_from_us") <= ts)
        & (F.col("valid_to_us").isNull() | (F.col("valid_to_us") > ts))
    ).drop(*_BOOKKEEPING)


def _validate(
    df: DataFrame, key_cols: list[str], require_bookkeeping: bool = False
) -> None:
    if not key_cols:
        raise ValueError("scd2: key_cols must be non-empty")
    missing = [c for c in key_cols if c not in df.columns]
    if missing:
        raise ValueError(f"scd2: key columns missing: {missing}")
    if require_bookkeeping:
        lost = [c for c in _BOOKKEEPING if c not in df.columns]
        if lost:
            raise ValueError(f"scd2: bookkeeping columns missing: {lost}")
    else:
        clash = [c for c in _BOOKKEEPING if c in df.columns]
        if clash:
            raise ValueError(f"scd2: snapshot already carries: {clash}")
