"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet
tables, then compare row count, column names, and order-insensitive
values. Catches engine-semantics drift before the driver does.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_SMOKE = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t)}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        return (0, "")
    if isinstance(v, float):
        if math.isnan(v):
            return (1, "NaN")
        return (1, str(round(v, 6)))
    if hasattr(v, "isoformat"):
        return (1, v.isoformat())
    return (1, str(v))


def _rows_to_set(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


# DuckDB output type → Spark dtypes the driver's typed value-hash
# accepts. The driver hashes TYPED values, so a DuckDB HUGEINT (the
# default for SUM over integers) against a Spark bigint is a red gate
# even when every value is equal — exactly the r3 q12/pivot/unpivot
# failure. This mirror compares stringified values (type-insensitive),
# so it needs an explicit type gate to catch that class locally
# (VERDICT r3 task 5). int-vs-BIGINT is allowed: proven hash-compatible
# by top3_customers_per_segment's green r3 row (rank int vs BIGINT).
_TYPE_COMPAT = {
    "BOOLEAN": {"boolean"},
    "TINYINT": {"tinyint", "smallint", "int", "bigint"},
    "SMALLINT": {"smallint", "int", "bigint"},
    "INTEGER": {"int", "bigint"},
    "BIGINT": {"bigint", "int"},
    "FLOAT": {"float", "double"},
    "DOUBLE": {"double"},
    "VARCHAR": {"string"},
    "DATE": {"date"},
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
    "TIMESTAMP WITH TIME ZONE": {"timestamp"},
}


def _assert_types_compatible(name: str, spark_dtypes: dict, duck_desc) -> None:
    """Fail when a DuckDB output type would hash differently from the
    Spark column under the driver's typed comparison. Unmapped DuckDB
    types (HUGEINT, DECIMAL, UHUGEINT, ...) always fail: the oracle must
    CAST its output to a mapped type (BIGINT / DOUBLE / ...)."""
    for col, dt in duck_desc.items():
        st = spark_dtypes.get(col)
        base, arr = dt, 0
        sbase = st
        while base.endswith("[]"):
            base, arr = base[:-2], arr + 1
        for _ in range(arr):
            assert sbase and sbase.startswith("array<") and sbase.endswith(">"), (
                f"{name}.{col}: oracle {dt} vs spark {st} (array depth mismatch)"
            )
            sbase = sbase[len("array<"):-1]
        allowed = _TYPE_COMPAT.get(base)
        assert allowed is not None, (
            f"{name}.{col}: oracle type {dt} has no driver-safe Spark mapping — "
            f"CAST the oracle output (e.g. AS BIGINT); spark side is {st}"
        )
        assert sbase in allowed, (
            f"{name}.{col}: oracle {dt} vs spark {st} would diverge under the "
            f"driver's typed value-hash"
        )


# gates whose outputs involve timestamps/windows/dates — the surface
# that would drift if any query leaned on the session timezone
_TZ_SENSITIVE = [
    "events_tumbling_window",
    "hm_enrich_format",
    "events_page2",
    "events_user_daily",
    "events_retention_cohorts",
    # this session: LTV cohort/age labels come from date_trunc(ts) and
    # datediff — the same day-boundary exposure as retention
    "events_cohort_ltv",
    # look assignment divides datediff day indexes — a session-zone
    # leak would move rows across looks and change every interim z
    "events_sequential_welch",
    # event-study day labels come from date_format(date_trunc(ts))
    "events_event_study",
    # gap days come from datediff over order dates
    "orders_repeat_cycle",
    # day labels and the calendar day index both ride date_trunc(ts)
    "events_topk_stability",
    "events_growth_accounting",
    "events_daily_quantiles",
    "events_mix_shift",
    "hm_last_event",
    # r4: OLS trend anchors x at a fixed UTC epoch via unix_micros — a
    # session-zone leak would shift every intercept by the zone offset
    "events_user_trend",
    # r5 continuation: GROUPING SETS day labels come from
    # date_format(ts) — a session-zone leak would shift day boundaries
    "events_grouping_sets",
    # r5 continuation: the resample grid is built from unix_micros(ts)
    "events_resample_ffill",
    # this session: CUSUM's daily buckets come from date_format(ts) —
    # a session-zone leak would move counts across day boundaries and
    # shift every cumulative statistic
    "events_cusum_daily",
    # sliding-actives days come from date_trunc(ts) and date_add
    # arithmetic — same day-boundary exposure
    "events_wau",
    # gap seconds anchor at unix_micros — zone-independent by
    # construction, pinned anyway
    "events_interarrival",
    # r6: native session_window gate outputs only shift-invariant
    # quantities (seq/count/duration/sum) — pinned against a
    # session-zone leak in the window assignment itself
    "events_session_windows",
    # r6: recency anchors at wall-clock DATES (to_date of the NTZ-cast
    # ts) — a session-zone leak would move order dates across midnight
    "customer_rfm",
]


@pytest.mark.parametrize("name", _TZ_SENSITIVE)
def test_timestamp_gates_are_timezone_independent(spark, duck, name):
    """The driver runs queries under ITS OWN session config, not ours —
    a query that only matches its oracle under UTC would be green
    locally and red at the driver. Run the timestamp-heavy gates under
    a non-UTC sibling session and compare to the oracle (conventions:
    epoch micros or formatted strings, never session-zone renderings)."""
    s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    sdf = fn(s2, SF_SMOKE)
    scols = sdf.columns
    srows = sdf.collect()
    ores = duck.execute(sql)
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()
    assert len(srows) == len(orows), f"{name}: rowcount under non-UTC session"
    sset = _rows_to_set(scols, [[r[c] for c in scols] for r in srows])
    oset = _rows_to_set(ocols, orows)
    assert sset == oset, f"{name}: values drift under a non-UTC session"


def _assert_scalar_schema(name: str, schema) -> None:
    """The driver's canonicalizer sorts result rows in pandas; an
    ArrayType/MapType/StructType cell is unhashable there and crashes
    the gate regardless of values (r4: emb_label_centroids,
    emb_quantize). Gates must flatten collections to scalar rows
    (emb_covariance pattern) or sorted strings (entries_flat)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    for f in schema.fields:
        assert not isinstance(f.dataType, (ArrayType, MapType, StructType)), (
            f"{name}.{f.name}: top-level {f.dataType.simpleString()} — the "
            f"driver canonicalizer cannot hash collection cells; flatten the "
            f"gate output to scalar columns"
        )


def test_no_gate_emits_collection_columns(spark):
    """Registry-wide: every queries() entry must emit only scalar
    top-level columns (VERDICT r4 task 2 — this shape class reached the
    driver unseen twice in a row)."""
    for name, fn in entrymod.queries().items():
        _assert_scalar_schema(name, fn(spark, SF_SMOKE).schema)


def test_no_gate_disables_driver_bound_caps():
    """Registry-wide (VERDICT r6 #3): gates must never .collect() a
    corpus-cardinality frame — every operator that feeds a driver
    collect has a deterministic top-k cap (word_frequencies' 1M
    (n DESC, word) cut is the convention), and no gate may switch a
    cap off. Static check over plans/ source: the only way this repo
    uncaps a collect-feeding frame is max_words=None."""
    import pathlib

    plans = pathlib.Path(entrymod.__file__).parent / "hypermap_etl_spark" / "plans"
    for py in sorted(plans.glob("*.py")):
        src = py.read_text()
        assert "max_words=None" not in src, (
            f"{py.name}: gate disables the driver-bound vocabulary cap — "
            f"an uncapped collect is a driver OOM at corpus scale; use the "
            f"deterministic default cap and mirror ORDER BY/LIMIT in the "
            f"oracle"
        )


def test_scalar_schema_check_rejects_array_gate(spark):
    """The checker itself must trip on an intentionally array-valued
    output, so a future array gate cannot pass the mirror."""
    from pyspark.sql import functions as F

    df = spark.range(1).select(F.array(F.lit(1), F.lit(2)).alias("a"))
    with pytest.raises(AssertionError, match="collection cells"):
        _assert_scalar_schema("selftest", df.schema)


def test_window_rotation_invariants():
    """The window is exactly the driver's 50 slots, duplicate-free, and
    every name registered; a typo'd name must fail at import time
    instead of silently falling through to the back of the dict-merge
    (VERDICT r4 task 7)."""
    import pathlib

    w = entrymod._WINDOW
    qs = entrymod.queries()
    assert len(w) == 50 and len(set(w)) == 50
    assert all(n in qs for n in w)

    src = pathlib.Path(entrymod.__file__).read_text()
    needle = f'"{w[0]}",'
    assert needle in src
    bad = src.replace(needle, f'"{w[0]}_TYPO",', 1)
    with pytest.raises(AssertionError, match="not registered"):
        exec(compile(bad, "<window-typo-selftest>", "exec"), {"__name__": "_t"})


def test_driver_window_runs_in_order(spark):
    """Execute the driver's 50-query window in ITS order in one session
    — the driver's exact pattern, which alphabetical parity runs don't
    replicate (cross-query state: shared plan-cache frames, tracked
    persists/checkpoints, hm derived-frame reuse). Every query must
    build and collect without error."""
    window = entrymod._WINDOW
    assert len(window) == 50
    qs = entrymod.queries()
    for name in window:
        rows = qs[name](spark, SF_SMOKE).collect()
        assert rows is not None, name


def test_type_gate_rejects_uncast_integer_sum(duck):
    """The checker itself must flag DuckDB's HUGEINT SUM default — the
    class that reached the driver in r3."""
    desc = {
        d[0]: d[1]
        for d in duck.execute(
            "DESCRIBE SELECT SUM(CASE WHEN TRUE THEN 1 ELSE 0 END) AS x"
        ).fetchall()
    }
    assert desc["x"] == "HUGEINT"
    with pytest.raises(AssertionError, match="no driver-safe Spark mapping"):
        _assert_types_compatible("selftest", {"x": "bigint"}, desc)


@pytest.fixture(scope="module")
def duck():
    con = _duck(SF_SMOKE)
    yield con
    con.close()


ALL = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = fn(spark, SF_SMOKE)
    srows = sdf.collect()
    scols = sdf.columns
    if sql is None:
        assert len(srows) >= 0  # rows-only check
        return
    duck_desc = {
        d[0]: d[1] for d in duck.execute("DESCRIBE " + sql).fetchall()
    }
    _assert_types_compatible(name, dict(sdf.dtypes), duck_desc)
    ores = duck.execute(sql)
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: columns {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: rowcount {len(srows)} vs {len(orows)}"
    sset = _rows_to_set(scols, [[r[c] for c in scols] for r in srows])
    oset = _rows_to_set(ocols, orows)
    mism = [i for i, (a, b) in enumerate(zip(sset, oset)) if a != b][:5]
    assert sset == oset, f"{name}: first mismatches {[(sset[i], oset[i]) for i in mism]}"
