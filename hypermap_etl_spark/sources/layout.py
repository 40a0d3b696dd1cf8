"""Physical data layout for scan pruning — the lake-side half of
"push down and prune".

Directory partitioning (merge.with_block_bucket, S7) prunes whole
partitions from coarse keys. This module covers the NEXT granularity:
ordering rows WITHIN the data files so every parquet footer carries
tight, near-disjoint min/max statistics on the clustering columns.
Readers then skip at two levels with no table format required:

  - Spark's parquet reader drops whole ROW GROUPS whose stats exclude
    the pushed filter (spark.sql.parquet.filterPushdown, on by
    default);
  - stats-aware engines and table formats (Delta/Iceberg data-skipping
    indexes are exactly per-file min/max) drop whole FILES.

Without clustering every file spans nearly the full value range (any
hash/round-robin shuffle interleaves everything), so stats exclude
nothing and a point query scans the whole table. At 100 TB this is
the difference between reading ~one file and reading all of them.

``write_clustered`` is Spark-first: repartitionByRange gives
contiguous, load-balanced (sampled) key ranges across files —
the single-dimension form of z-ordering — and sortWithinPartitions
orders rows inside each file so row-group stats are tight too. Both
are existing Catalyst operators; no custom writer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from hypermap_etl_spark.util import shuffle_partitions


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on ``cluster_cols``.

    Rows land in ``n_files`` (default: current shuffle partitions)
    contiguous key ranges (range partitioning samples the data for
    balanced splits — skewed keys get more files, empty ranges none),
    sorted within each file. Multi-column clustering nests lexically:
    lead with the highest-selectivity filter column.
    """
    n = n_files or shuffle_partitions(df.sparkSession)
    (
        df.repartitionByRange(n, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def file_stats(path: str, column: str) -> list[tuple[str, object, object]]:
    """Per-file (name, min, max) of ``column`` from the parquet footers
    — the exact statistics a stats-aware reader prunes on. Pure
    metadata: reads footers only, never row data.

    Recurses into directory-partitioned tables (names are paths
    relative to ``path``); Spark metadata dirs/files (``_``-prefixed)
    are skipped. Raises when no parquet file is found at all, so a
    wrong path reports an error instead of a silent "no pruning"."""
    import pyarrow.parquet as pq

    rel_files: list[str] = []
    for dirpath, dirnames, filenames in os.walk(path):
        dirnames[:] = [d for d in dirnames if not d.startswith(("_", "."))]
        for name in filenames:
            if name.endswith(".parquet") and not name.startswith(("_", ".")):
                rel_files.append(
                    os.path.relpath(os.path.join(dirpath, name), path)
                )
    if not rel_files:
        raise FileNotFoundError(
            f"file_stats: no *.parquet files under {path!r} (wrong path, "
            f"or a table with no data files)"
        )
    from decimal import Decimal

    def _minmax(stats):
        try:
            return stats.min, stats.max
        except Exception:
            # pyarrow cannot logically decode every stat (notably
            # Spark-written DECIMAL backed by INT32/INT64/FLBA physical
            # stats) — decode the raw unscaled values ourselves.
            lt = str(stats.logical_type or "")
            if lt.startswith("Decimal"):
                scale = int(lt.split("scale=")[1].rstrip(")"))
                vals = []
                for raw in (stats.min_raw, stats.max_raw):
                    unscaled = (
                        int.from_bytes(raw, "big", signed=True)
                        if isinstance(raw, bytes)
                        else int(raw)
                    )
                    vals.append(Decimal(unscaled).scaleb(-scale))
                return tuple(vals)
            return None, None

    out = []
    for name in sorted(rel_files):
        meta = pq.read_metadata(os.path.join(path, name))
        idx = meta.schema.names.index(column)
        lo, hi = None, None
        for rg in range(meta.num_row_groups):
            stats = meta.row_group(rg).column(idx).statistics
            if stats is None or not stats.has_min_max:
                lo = hi = None
                break
            mn, mx = _minmax(stats)
            if mn is None:
                lo = hi = None
                break
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
        out.append((name, lo, hi))
    return out


def pruning_factor(path: str, column: str) -> float | None:
    """Fraction of files a stats-aware reader can SKIP for a random
    point lookup on ``column``: 1 - avg_file_coverage, where a file's
    coverage is its [min, max] span over the table's span. ~0 for
    interleaved layouts (every file covers everything), → (n-1)/n for
    perfectly disjoint ranges. Files WITHOUT min/max stats can never be
    skipped, so they count as coverage 1.0 rather than being dropped
    from the average. Returns None for non-numeric columns
    (string/binary stats prune too, but a span ratio is undefined)."""
    from decimal import Decimal

    all_stats = file_stats(path, column)
    stats = [(lo, hi) for _, lo, hi in all_stats if lo is not None]
    if not stats:
        return 0.0
    # Decimal counts as numeric (zorder_key accepts Decimal cluster
    # columns, so its stats must be measurable too); coerce to float
    # for the span math.
    if not all(
        isinstance(v, (int, float, Decimal)) for pair in stats for v in pair
    ):
        return None
    stats = [(float(lo), float(hi)) for lo, hi in stats]
    n_statless = len(all_stats) - len(stats)
    table_lo = min(lo for lo, _ in stats)
    table_hi = max(hi for _, hi in stats)
    span = table_hi - table_lo
    if span <= 0:
        return 0.0
    coverage = (
        sum((hi - lo) / span for lo, hi in stats) + n_statless
    ) / len(all_stats)
    return 1.0 - coverage


def read_pruned(spark: SparkSession, path: str) -> DataFrame:
    """Plain parquet read — named to document that NO special reader is
    needed: pushed filters prune row groups via the same stats."""
    return spark.read.parquet(path)


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16):
    """Z-order (Morton) key over 2+ NUMERIC columns: each column is
    scaled to a ``bits``-bit bucket over its [min, max] range, then the
    bucket bits are interleaved. Files clustered by this key are
    simultaneously range-local in EVERY dimension — each of n files
    covers ~n^(-1/k) of each column's span — so min/max stats prune
    point/range queries on ANY of the columns, which one-dimensional
    sort clustering cannot do (Delta OPTIMIZE ZORDER is this exact
    construction).

    The per-column min/max come from one tiny aggregate (driver sees
    2·k floats); the key itself is a pure map-side expression built as
    a single-parse SQL string (bits·k shift-or terms).

    ``bits`` is capped at 63 // k so every interleaved bit position
    stays below 63: Spark's shiftleft masks the shift amount mod 64
    (Java semantics), so an overflowing position would silently wrap
    onto another column's low bits and destroy locality rather than
    error. Raises ValueError for empty/all-null input or non-numeric
    columns (Decimal widens to float for the bucket scaling).

    Returns (key_column, ranges) where ranges maps col -> (min, max).
    """
    from decimal import Decimal

    from pyspark.sql import functions as F

    k = len(cols)
    if k < 1:
        raise ValueError("zorder_key: need at least one column")
    bits = min(bits, 63 // k)

    dtypes = dict(df.dtypes)
    float_cols = {c for c in cols if dtypes.get(c) in ("float", "double")}
    aggs = []
    for c in cols:
        # NaN sorts ABOVE every double in Spark, so a single NaN row
        # would otherwise poison max() (and then every span). Ranges
        # come from the non-NaN values only; NaN rows are clamped to
        # the top bucket below. Only float/double can carry NaN — the
        # isnan probe must not touch other types (an ANSI string cast
        # would error before the non-numeric ValueError guard fires).
        v = (
            F.when(~F.isnan(F.col(c)), F.col(c))
            if c in float_cols
            else F.col(c)
        )
        aggs += [F.min(v).alias(f"__mn_{c}"), F.max(v).alias(f"__mx_{c}")]
    row = df.agg(*aggs).collect()[0]
    ranges = {}
    for c in cols:
        lo, hi = row[f"__mn_{c}"], row[f"__mx_{c}"]
        if lo is None or hi is None:
            raise ValueError(f"zorder_key: column {c!r} has no non-null values")
        if not isinstance(lo, (int, float, Decimal)):
            raise ValueError(
                f"zorder_key: column {c!r} is {type(lo).__name__}-valued; "
                "z-ordering needs numeric columns"
            )
        ranges[c] = (float(lo), float(hi))
    terms = []
    for j, c in enumerate(cols):
        lo, hi = ranges[c]
        span = (hi - lo) or 1.0
        # bits-bit bucket, clamped to the top bucket at col == max.
        # nanvl maps NaN rows to the column max (top bucket) BEFORE the
        # floor(): floor(NaN) is NULL under default mode and a runtime
        # error under ANSI — either way nondeterministic vs config,
        # unlike the explicit null/non-numeric ValueError guards.
        b = (
            f"least({(1 << bits) - 1}L, CAST(floor((nanvl(CAST(`{c}` AS DOUBLE),"
            f" {hi!r}D) - {lo!r})"
            f" / {span!r} * {1 << bits}) AS BIGINT))"
        )
        terms += [
            f"(shiftleft(shiftright({b}, {i}) & 1L, {k * i + j}))"
            for i in range(bits)
        ]
    return F.expr(" | ".join(terms)), ranges


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered by the Z-order key of ``cols`` — the
    multi-dimensional counterpart of write_clustered. Use when queries
    filter on more than one column; for a single dominant filter
    column plain sort clustering gives tighter ranges."""
    key, _ = zorder_key(df, cols)
    n = n_files or shuffle_partitions(df.sparkSession)
    zc = "__z"
    while zc in df.columns:  # never shadow (and then drop) a user column
        zc += "_"
    (
        df.withColumn(zc, key)
        .repartitionByRange(n, zc)
        .sortWithinPartitions(zc)
        .drop(zc)
        .write.mode(mode)
        .parquet(path)
    )
