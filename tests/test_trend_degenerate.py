"""events_user_trend degeneracy: a key whose events all share one
timestamp must yield NULL slope/intercept in BOTH engines. The naive
NULLIF(n·Σx²−(Σx)², 0) guard misses this for n >= 3 — float
cancellation leaves ~1e-13, not 0.0 — so the guard is min(x) < max(x).
"""

import datetime
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hypermap_etl_spark.plans.star_queries import TREND_ORACLE, events_user_trend


@pytest.fixture(scope="module")
def deg_dir(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("trenddeg"))
    ts0 = datetime.datetime(2024, 1, 5, 12, 0, 0)
    rows = {
        "event_id": [1, 2, 3, 4, 5, 6],
        "ts": pa.array(
            [ts0, ts0, ts0, ts0, ts0 + datetime.timedelta(hours=1),
             ts0 + datetime.timedelta(hours=2)],
            type=pa.timestamp("us"),
        ),
        "user_id": [7, 7, 7, 9, 9, 9],
        "event_type": ["click"] * 6,
        "value": [1.0, 2.0, 3.0, 1.0, 2.0, 3.0],
        "props": ["{}"] * 6,
    }
    pq.write_table(pa.table(rows), os.path.join(base, "events.parquet"))
    return base


def test_zero_spread_key_is_null_in_both_engines(spark, deg_dir):
    got = {
        r["user_id"]: (r["slope"], r["intercept"])
        for r in events_user_trend.__wrapped__(spark, deg_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{deg_dir}/events.parquet'"
    )
    oracle = {r[0]: (r[2], r[3]) for r in con.execute(TREND_ORACLE).fetchall()}
    assert got == oracle
    assert got[7] == (None, None)  # zero time spread -> undefined OLS
    assert got[9] == (1.0, -107.0)  # value climbs 1.0/hour exactly
