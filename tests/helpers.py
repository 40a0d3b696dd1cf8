from __future__ import annotations

from hypermap_etl_spark.schemas import EVENT_SCHEMA

BASE = {f.name: None for f in EVENT_SCHEMA.fields}

_seq = [0]


def ev(**kw):
    """Build one wide event row dict with defaults filled; the default
    transactionHash is unique per row so event_id stays a real key."""
    _seq[0] += 1
    d = dict(BASE)
    d.update(
        blockHash="0x" + "bb" * 32,
        transactionHash="0x" + format(_seq[0], "064x"),
        transactionIndex=0,
    )
    d.update(kw)
    if d.get("event_id") is None:
        d["event_id"] = f"{d['transactionHash']}_{d.get('logIndex', 0)}"
    return d


def events_df(spark, rows):
    return spark.createDataFrame([tuple(r[f.name] for f in EVENT_SCHEMA.fields) for r in rows], EVENT_SCHEMA)


def h(n: int) -> str:
    """Deterministic 32-byte-style hex handle."""
    return "0x" + format(n, "064x")


def addr(n: int) -> str:
    return "0x" + format(n, "040x")
