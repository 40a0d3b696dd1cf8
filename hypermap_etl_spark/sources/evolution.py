"""Schema evolution across corpus drops.

A long-lived lake accumulates parquet drops whose schemas drift:
columns appear (lang tags added in drop 12), types widen (doc_id int →
bigint when the crawl outgrew 2^31). A 100 TB pipeline cannot rewrite
history for every drift — it needs reads that RECONCILE:

  ``read_evolving``   one DataFrame over many drops, schemas merged by
                      parquet footer union (``mergeSchema`` — a
                      metadata-only operation; no data is scanned to
                      infer anything).
  ``conform``         project any frame onto a pinned target schema:
                      missing columns become typed NULLs, compatible
                      types widen, extras drop — the contract between
                      historical drops and today's operators. Lossy
                      casts (bigint → int, double → float, string →
                      anything-non-string) raise instead of silently
                      nulling/truncating, unless explicitly allowed.

Both are pure projections — predicate pushdown and column pruning
reach the scans untouched; conforming 100 TB costs nothing beyond the
read itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# value-preserving widenings (Spark's Cast.canUpCast, restricted to the
# types the corpus schemas use); every type may also cast to itself
_WIDENS: dict[type, tuple[type, ...]] = {
    T.ByteType: (T.ShortType, T.IntegerType, T.LongType, T.DoubleType),
    T.ShortType: (T.IntegerType, T.LongType, T.DoubleType),
    T.IntegerType: (T.LongType, T.DoubleType),
    T.LongType: (T.DoubleType,),  # documented: > 2^53 loses precision
    T.FloatType: (T.DoubleType,),
}


def _can_widen(src: T.DataType, dst: T.DataType) -> bool:
    if src == dst:
        return True
    if isinstance(src, T.ArrayType) and isinstance(dst, T.ArrayType):
        return _can_widen(src.elementType, dst.elementType)
    return isinstance(dst, _WIDENS.get(type(src), ()))


def conform(
    df: DataFrame,
    schema: T.StructType,
    allow_lossy: bool = False,
    keep_extras: bool = False,
) -> DataFrame:
    """Project ``df`` onto ``schema``: missing fields become typed
    NULLs, present fields widen to the target type, extra columns drop
    (or pass through with ``keep_extras``). A cast that could lose or
    corrupt values raises ValueError unless ``allow_lossy`` — silent
    null-on-overflow is how a schema drift becomes a data bug three
    stages later."""
    have = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for f in schema.fields:
        if f.name not in have:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            continue
        src = have[f.name]
        if not allow_lossy and not _can_widen(src, f.dataType):
            raise ValueError(
                f"conform: {f.name}: {src.simpleString()} → "
                f"{f.dataType.simpleString()} is lossy; pass "
                "allow_lossy=True to force"
            )
        cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
    if keep_extras:
        target = {f.name for f in schema.fields}
        cols += [F.col(c) for c in df.columns if c not in target]
    return df.select(*cols)


def merge_schemas(schemas: list[T.StructType]) -> T.StructType:
    """Widening union of drop schemas: fields ordered by first
    appearance; same-named fields resolve to the wider type. Raises on
    irreconcilable drift (string vs bigint) — that is a data-model
    break, not evolution. (Spark's own ``mergeSchema`` refuses even
    int → bigint across files, which is why reconciliation happens
    here, per drop, instead.)"""
    order: list[str] = []
    types: dict[str, T.DataType] = {}
    for sch in schemas:
        for f in sch.fields:
            if f.name not in types:
                order.append(f.name)
                types[f.name] = f.dataType
                continue
            cur = types[f.name]
            if _can_widen(cur, f.dataType):
                types[f.name] = f.dataType
            elif not _can_widen(f.dataType, cur):
                raise ValueError(
                    f"merge_schemas: {f.name}: {cur.simpleString()} vs "
                    f"{f.dataType.simpleString()} cannot reconcile"
                )
    return T.StructType([T.StructField(n, types[n]) for n in order])


def read_evolving(
    spark: SparkSession,
    paths: list[str],
    schema: T.StructType | None = None,
    allow_lossy: bool = False,
) -> DataFrame:
    """Read many parquet drops as one frame: each drop is conformed to
    the target contract (``schema``, or the widening
    :func:`merge_schemas` union of all drops when omitted) and the
    conformed scans union — columns missing in older drops read as
    NULL, ids that later widened to bigint read as bigint everywhere.

    Schema discovery is footer-only per drop; the result plan is a
    Union of per-drop scans, so predicate pushdown and column pruning
    still reach every branch."""
    if not paths:
        raise ValueError("read_evolving: need at least one path")
    frames = [spark.read.parquet(p) for p in paths]
    target = schema or merge_schemas([f.schema for f in frames])
    out = conform(frames[0], target, allow_lossy=allow_lossy)
    for f in frames[1:]:
        out = out.unionByName(conform(f, target, allow_lossy=allow_lossy))
    return out
