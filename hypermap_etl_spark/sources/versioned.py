"""Versioned table snapshots — poor-man's time travel for corpus drops.

A training-data pipeline republishes its corpus (new crawl, new filter
thresholds); downstream consumers need (a) a stable pointer to the
blessed version, (b) old versions kept for reproducibility ("model M
trained on corpus v12"), (c) a diff between versions
(:func:`~hypermap_etl_spark.operators.profile.table_diff`), and (d)
bounded retention. Table formats (Delta/Iceberg) solve this with
manifests; this module is the dependency-free construction on plain
parquet directories:

    table/
      v=1/ … v=N/       immutable snapshot directories
      _latest           one-line text file naming the current version

Writes are atomic-by-construction: a snapshot directory is fully
written BEFORE ``_latest`` flips to it (the staged-swap discipline of
operators/merge.py), so readers never observe a half-written "latest".
Old versions stay readable by explicit pin until ``vacuum`` removes
them. All metadata operations are driver-side file renames — nothing
scans data.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_LATEST = "_latest"


def _vdir(table: str, v: int) -> str:
    return os.path.join(table, f"v={v}")


def list_versions(table: str) -> list[int]:
    if not os.path.isdir(table):
        return []
    out = []
    for name in os.listdir(table):
        if name.startswith("v=") and name[2:].isdigit():
            out.append(int(name[2:]))
    return sorted(out)


def _complete(table: str, v: int) -> bool:
    """A snapshot is complete when Spark's _SUCCESS marker landed —
    the guard that keeps recovery paths off half-written directories."""
    return os.path.exists(os.path.join(_vdir(table, v), "_SUCCESS"))


def latest_version(table: str) -> int | None:
    """The blessed version: the ``_latest`` pointer if present, else
    the highest COMPLETE snapshot directory (pointer lost/never
    written). A directory without Spark's _SUCCESS marker is a
    half-written crash leftover — never blessed by the fallback, so
    'readers never observe a half-written latest' holds even when the
    very first write_version died mid-write."""
    ptr = os.path.join(table, _LATEST)
    if os.path.exists(ptr):
        with open(ptr) as fh:
            v = int(fh.read().strip())
        if os.path.isdir(_vdir(table, v)):
            return v
    done = [v for v in list_versions(table) if _complete(table, v)]
    return done[-1] if done else None


def write_version(df: DataFrame, table: str) -> int:
    """Write ``df`` as the next snapshot and flip ``_latest`` to it.
    The data lands in v=N fully before the pointer moves; a concurrent
    reader of 'latest' sees v=N-1 until the one-line pointer write."""
    os.makedirs(table, exist_ok=True)
    v = (latest_version(table) or 0) + 1
    while os.path.exists(_vdir(table, v)):  # orphaned higher snapshot
        v += 1
    df.write.mode("errorifexists").parquet(_vdir(table, v))
    tmp = os.path.join(table, f".{_LATEST}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(v))
    os.replace(tmp, os.path.join(table, _LATEST))  # atomic pointer flip
    return v


def read_version(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Read a pinned ``version``, or latest when omitted."""
    v = latest_version(table) if version is None else version
    if v is None or not os.path.isdir(_vdir(table, v)):
        raise FileNotFoundError(
            f"read_version: no version {'(latest)' if version is None else version} "
            f"under {table!r}"
        )
    return spark.read.parquet(_vdir(table, v))


def rollback(table: str, version: int) -> int:
    """Re-bless an older snapshot: flips ``_latest`` only — the bad
    version's data stays on disk for forensics until vacuumed."""
    if not os.path.isdir(_vdir(table, version)):
        raise FileNotFoundError(f"rollback: no snapshot v={version} under {table!r}")
    tmp = os.path.join(table, f".{_LATEST}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, os.path.join(table, _LATEST))
    return version


def vacuum(table: str, keep: int = 2) -> list[int]:
    """Drop all but the newest ``keep`` snapshots; the blessed version
    is always kept regardless of age. Returns the versions removed."""
    if keep < 1:
        raise ValueError("vacuum: need keep >= 1")
    blessed = latest_version(table)
    vs = list_versions(table)
    drop = [v for v in vs[:-keep] if v != blessed] if len(vs) > keep else []
    for v in drop:
        shutil.rmtree(_vdir(table, v))
    return drop
