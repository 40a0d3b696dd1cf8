"""Manifest-committed parquet tables — the object-store-safe commit
protocol the MERGE sink's docstring promises (operators/merge.py:32-40
documented the staged double-rename as local/HDFS-only and named this
as "the 100 TB answer and a drop-in swap"; this is that swap).

Why renames are the problem: S3-class object stores have no atomic
directory rename — the staged-swap MERGE (rename table away, rename
staging in) has a visible window with NO table, and dynamic partition
overwrite internally deletes+recreates partition paths. List-then-read
is also unsafe: a reader that lists a prefix mid-commit sees a torn
mix of old and new files.

The manifest construction (the Iceberg/Delta core idea, rebuilt
dependency-free the way sources/versioned.py rebuilds time travel):

    table/
      data/<token>/…part-*.parquet   immutable, uniquely-named file sets
      manifests/m-0000000N.json      full snapshot descriptions
      _latest                        one-line pointer: current N

- DATA FILES ARE NEVER RENAMED, MOVED, OR OVERWRITTEN. Every write
  lands in a fresh ``data/<uuid>`` prefix; a commit is (1) finish
  writing data, (2) PUT one complete manifest file, (3) flip the
  one-line ``_latest`` pointer. A crash before (3) leaves orphaned,
  unreferenced data — invisible to every reader, reclaimed by
  ``vacuum``. There is no torn state to recover.
- READERS NEVER LIST DATA. ``read_table`` resolves the manifest and
  reads exactly the file sets it names, so a reader racing a commit
  sees a complete OLD snapshot or a complete NEW one, never a mix —
  and old snapshots stay readable (time travel) until vacuumed.
- Partitioned tables map partition value → file sets in the manifest
  itself, so partition pruning is a manifest lookup (no directory
  discovery), and a MERGE commits touched partitions' new file sets
  while CARRYING FORWARD the untouched partitions' existing entries —
  the untouched data is not rewritten, not listed, not even opened.
- Single writer per table (same atomic-mkdir lock discipline as
  merge_into_parquet); multi-writer needs conditional PUT / a real
  table format. The pointer flip uses write-temp+rename locally —
  on a real object store the equivalent is one conditional PUT of a
  tiny object, which S3/GCS support natively.

Rollback/reorg: flipping ``_latest`` back to an older manifest is a
complete, already-consistent restore (the reorg story without any
data movement). ``vacuum`` keeps the last ``keep`` manifests' file
sets and deletes only data referenced by none of them.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from hypermap_etl_spark.operators.merge import _merge_lock, _obs_count, dedupe_new

_LATEST = "_latest"
_ALL = "__all__"  # partition key used for unpartitioned tables


# ------------------------------------------------------------ manifest io ---

def _mpath(table: str, version: int) -> str:
    return os.path.join(table, "manifests", f"m-{version:08d}.json")


def current_version(table: str) -> int | None:
    """Pointer if valid, else the highest manifest on disk (pointer
    lost); None for an empty/never-committed table."""
    ptr = os.path.join(table, _LATEST)
    try:
        with open(ptr) as fh:
            v = int(fh.read().strip())
        if os.path.exists(_mpath(table, v)):
            return v
    except (OSError, ValueError):
        pass
    mdir = os.path.join(table, "manifests")
    if not os.path.isdir(mdir):
        return None
    vs = [
        int(n[2:-5])
        for n in os.listdir(mdir)
        if n.startswith("m-") and n.endswith(".json")
    ]
    return max(vs, default=None)


def read_manifest(table: str, version: int | None = None) -> dict:
    """{"version", "partition_col", "partitions": {key: [rel dirs]}}.
    ``key`` is the JSON-encoded partition value (or ``__all__``)."""
    v = current_version(table) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no manifest in {table}")
    with open(_mpath(table, v)) as fh:
        return json.load(fh)


def _publish(table: str, manifest: dict) -> int:
    """Write the complete manifest, then flip the pointer. The ONLY
    rename is of the one-line pointer file — on an object store both
    writes become single small PUTs (the pointer via conditional PUT)."""
    os.makedirs(os.path.join(table, "manifests"), exist_ok=True)
    v = (current_version(table) or 0) + 1
    manifest = {**manifest, "version": v}
    mp = _mpath(table, v)
    with open(mp + ".tmp", "w") as fh:
        json.dump(manifest, fh, sort_keys=True)
    os.rename(mp + ".tmp", mp)
    ptr = os.path.join(table, _LATEST)
    with open(ptr + ".tmp", "w") as fh:
        fh.write(str(v))
    os.rename(ptr + ".tmp", ptr)
    return v


def _write_token(
    df: DataFrame, table: str, partition_col: str | None
) -> dict[str, list[str]]:
    """Write ``df`` into a fresh data/<token> prefix and return the
    manifest entries it produced: partition key → [relative dir]."""
    token = uuid.uuid4().hex[:12]
    rel = os.path.join("data", token)
    dest = os.path.join(table, rel)
    if partition_col is None:
        df.write.mode("errorifexists").parquet(dest)
        return {_ALL: [rel]}
    df.write.mode("errorifexists").partitionBy(partition_col).parquet(dest)
    # list OUR OWN just-written output (writer-side listing is safe:
    # the files are fully ours and complete once the write returned)
    out: dict[str, list[str]] = {}
    prefix = f"{partition_col}="
    for name in os.listdir(dest):
        if name.startswith(prefix):
            raw = name[len(prefix):]
            key = json.dumps(int(raw)) if raw.lstrip("-").isdigit() else json.dumps(raw)
            out[key] = [os.path.join(rel, name)]
    return out


# ------------------------------------------------------------ public api ----

def write_table(
    df: DataFrame, table: str, partition_col: str | None = None
) -> int:
    """Full-snapshot commit: write everything to a fresh prefix, then
    publish a manifest naming it. Returns the new version."""
    with _merge_lock(table):
        entries = _write_token(df, table, partition_col)
        return _publish(
            table,
            {"partition_col": partition_col, "partitions": entries},
        )


def read_table(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    partition_values: list | None = None,
) -> DataFrame:
    """Resolve the manifest and read EXACTLY the files it names — no
    directory listing, no rename dependence; a concurrent commit
    cannot tear this read. ``partition_values`` prunes to those
    partitions via manifest lookup alone."""
    m = read_manifest(table, version)
    pcol = m["partition_col"]
    parts = m["partitions"]
    if pcol is None:
        dirs = [os.path.join(table, d) for d in parts.get(_ALL, [])]
        return spark.read.parquet(*dirs)
    wanted = (
        {json.dumps(v) for v in partition_values}
        if partition_values is not None
        else set(parts)
    )
    pieces = []
    for key, rels in parts.items():
        if key not in wanted:
            continue
        val = json.loads(key)
        for rel in rels:
            pieces.append(
                spark.read.parquet(os.path.join(table, rel))
                .withColumn(pcol, F.lit(val))
            )
    if not pieces:
        raise ValueError(
            f"no partitions of {table} match {partition_values}"
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def merge_table(
    spark: SparkSession,
    table: str,
    new_df: DataFrame,
    key_cols: list[str],
    partition_col: str | None = None,
) -> dict[str, int]:
    """MERGE with a manifest commit — the same contract and count
    report as merge_into_parquet, zero data renames.

    Partitioned: ONE pre-write action (touched values + batch count),
    then existing-rows-in-touched ∪ batch rewritten into a fresh
    prefix; the new manifest carries forward every untouched
    partition's existing entries verbatim. Readers on the old manifest
    keep a consistent snapshot throughout."""
    with _merge_lock(table):
        new_df = dedupe_new(new_df, key_cols)
        if current_version(table) is None:
            entries = _write_token(new_df, table, partition_col)
            _publish(
                table,
                {"partition_col": partition_col, "partitions": entries},
            )
            return {"upsertedCount": new_df.count(), "modifiedCount": 0}

        m = read_manifest(table)
        if m["partition_col"] != partition_col:
            raise ValueError(
                f"table partitioned by {m['partition_col']!r}, "
                f"merge called with {partition_col!r}"
            )

        if partition_col is not None:
            per_part = (
                new_df.groupBy(partition_col)
                .agg(F.count(F.lit(1)).alias("__c"))
                .collect()
            )
            if not per_part:
                # empty batch: no data, no new manifest — and the
                # observed nodes below would be pruned away entirely
                return {"upsertedCount": 0, "modifiedCount": 0}
            touched = [r[0] for r in per_part]
            batch_total = sum(r["__c"] for r in per_part)
            touched_keys = {json.dumps(v) for v in touched}
            present = [k for k in touched_keys if k in m["partitions"]]
            existing = (
                read_table(
                    spark, table,
                    partition_values=[json.loads(k) for k in present],
                )
                if present
                else None
            )
            obs_new = None
        else:
            obs_new = Observation()
            new_df = new_df.observe(obs_new, F.count(F.lit(1)).alias("n"))
            batch_total = None
            existing = read_table(spark, table)

        key = [F.col(f"n.{k}") == F.col(f"e.{k}") for k in key_cols]
        if existing is not None:
            obs_exist = Observation()
            existing = existing.observe(
                obs_exist, F.count(F.lit(1)).alias("n")
            )
            obs_surv = Observation()
            survivors = existing.alias("e").join(
                new_df.select(*key_cols).alias("n"), key, "left_anti"
            ).observe(obs_surv, F.count(F.lit(1)).alias("n"))
            merged = survivors.unionByName(new_df)
        else:
            merged = new_df

        entries = _write_token(merged, table, partition_col)
        if partition_col is not None:
            # carry forward untouched partitions; replace touched ones
            parts = {
                k: v
                for k, v in m["partitions"].items()
                if k not in touched_keys
            }
            parts.update(entries)
        else:
            parts = entries
        _publish(
            table, {"partition_col": partition_col, "partitions": parts}
        )
        if existing is not None:
            matched = _obs_count(obs_exist) - _obs_count(obs_surv)
        else:
            matched = 0
        if batch_total is None:
            batch_total = _obs_count(obs_new)
        return {
            "upsertedCount": int(batch_total - matched),
            "modifiedCount": int(matched),
        }


def delete_keys_table(
    spark: SparkSession,
    table: str,
    keys_df: DataFrame,
    key_cols: list[str],
    partition_col: str | None = None,
) -> int:
    """Keyed delete with a manifest commit: touched partitions (or the
    whole table when unpartitioned) are rewritten without the doomed
    keys into a fresh prefix; untouched partitions carry forward.
    Returns the number of rows deleted."""
    with _merge_lock(table):
        m = read_manifest(table)
        if m["partition_col"] != partition_col:
            raise ValueError("partition_col mismatch")
        has_pcol = (
            partition_col is not None and partition_col in keys_df.columns
        )
        if has_pcol:
            touched_vals = [
                r[0]
                for r in keys_df.select(partition_col).distinct().collect()
            ]
        keys_df = keys_df.select(*key_cols).distinct()
        if partition_col is not None:
            if not has_pcol:
                touched_vals = None
            if touched_vals is None:
                # keys don't carry the partition value: every partition
                # is suspect — still a manifest-pruned read, no listing
                touched_vals = [json.loads(k) for k in m["partitions"]]
            touched_keys = {json.dumps(v) for v in touched_vals}
            present = [k for k in touched_keys if k in m["partitions"]]
            if not present:
                return 0
            existing = read_table(
                spark, table,
                partition_values=[json.loads(k) for k in present],
            )
        else:
            touched_keys = set()
            existing = read_table(spark, table)
        key = [F.col(f"e.{k}") == F.col(f"k.{k}") for k in key_cols]
        obs_exist, obs_surv = Observation(), Observation()
        existing = existing.observe(obs_exist, F.count(F.lit(1)).alias("n"))
        join_cols = [k for k in key_cols]
        survivors = existing.alias("e").join(
            F.broadcast(keys_df.select(*join_cols).alias("k")), key, "left_anti"
        ).observe(obs_surv, F.count(F.lit(1)).alias("n"))
        entries = _write_token(survivors, table, partition_col)
        if partition_col is not None:
            parts = {
                k: v
                for k, v in m["partitions"].items()
                if k not in touched_keys
            }
            parts.update(entries)
        else:
            parts = entries
        _publish(
            table, {"partition_col": partition_col, "partitions": parts}
        )
        return int(_obs_count(obs_exist) - _obs_count(obs_surv))


def rollback_table(table: str, version: int) -> int:
    """Reorg/restore: re-publish an OLD manifest's contents as the new
    current version — no data moves, instantly consistent."""
    old = read_manifest(table, version)
    with _merge_lock(table):
        return _publish(
            table,
            {
                "partition_col": old["partition_col"],
                "partitions": old["partitions"],
            },
        )


def vacuum_table(table: str, keep: int = 2) -> list[str]:
    """Delete data referenced by NONE of the newest ``keep`` manifests
    (snapshots older than the retention window lose their files; their
    manifests stay as tombstones). Reclaim granularity is the manifest
    ENTRY — a partition subdir for partitioned tables — because a
    merge's carry-forward means one token prefix can hold both a live
    partition and a superseded one. Returns removed relative dirs."""
    cur = current_version(table)
    if cur is None:
        return []
    mdir = os.path.join(table, "manifests")
    versions = sorted(
        int(n[2:-5])
        for n in os.listdir(mdir)
        if n.startswith("m-") and n.endswith(".json")
    )
    live: set[str] = set()
    for v in versions[-keep:]:
        for rels in read_manifest(table, v)["partitions"].values():
            live.update(os.path.normpath(rel) for rel in rels)
    ddir = os.path.join(table, "data")
    removed = []
    for token in sorted(os.listdir(ddir)) if os.path.isdir(ddir) else []:
        tok_rel = os.path.join("data", token)
        tok_abs = os.path.join(ddir, token)
        if tok_rel in live:  # unpartitioned token referenced whole
            continue
        kept_child = False
        child_removed: list[str] = []
        for child in sorted(os.listdir(tok_abs)):
            child_abs = os.path.join(tok_abs, child)
            if not os.path.isdir(child_abs):
                continue  # _SUCCESS etc. — removed with the token below
            child_rel = os.path.join(tok_rel, child)
            if child_rel in live:
                kept_child = True
            else:
                shutil.rmtree(child_abs, ignore_errors=True)
                child_removed.append(child_rel)
        if kept_child:
            removed.extend(child_removed)
        else:
            shutil.rmtree(tok_abs, ignore_errors=True)
            removed.append(tok_rel)
    return sorted(removed)
