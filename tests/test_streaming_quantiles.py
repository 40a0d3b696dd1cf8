"""Streaming exact quantiles (streaming/quantiles.py): additive
value-histogram partials in the idempotent store; the verdict's
integer pick rule equals the batch quantile table exactly, at any
stream chop."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Row

from hypermap_etl_spark.operators.scale import grouped_quantile_table
from hypermap_etl_spark.streaming.quantiles import (
    quantile_store_read,
    quantile_verdict,
    start_quantile_stream,
)
from hypermap_etl_spark.util import release_persisted


def _rows():
    return [
        Row(g="a", value=float((i * 13) % 101)) for i in range(900)
    ] + [Row(g="b", value=float((i * 7) % 53)) for i in range(600)]


def _run(spark, rows, base, n_files=3):
    src, store, ckpt = f"{base}/src", f"{base}/store", f"{base}/ckpt"
    chunk = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        spark.createDataFrame(rows[i * chunk:(i + 1) * chunk]).coalesce(
            1
        ).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("g string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_quantile_stream(stream, "value", ["g"], store, ckpt)
    q.awaitTermination()
    return store


def test_stream_quantiles_equal_batch_exactly(spark):
    rows = _rows()
    base = tempfile.mkdtemp()
    store = _run(spark, rows, base)
    parts = [d for d in os.listdir(store) if d.startswith("batch_id=")]
    assert len(parts) >= 2
    got = {
        (r["g"], r["q"]): (r["value"], r["n_rows"])
        for r in quantile_verdict(
            spark, store, ["g"], qs=(0.5, 0.9, 0.99)
        ).collect()
    }
    full = spark.createDataFrame(rows)
    want = {
        (r["g"], r["q"]): (r["value"], r["n_rows"])
        for r in grouped_quantile_table(
            full, "value", ["g"], qs=(0.5, 0.9, 0.99)
        ).collect()
    }
    release_persisted()
    assert got == want  # EXACT: additive histograms, integer picks
    # store is grid-bounded: far fewer rows than the stream
    hist = quantile_store_read(spark, store, ["g"])
    assert hist.count() <= 101 + 53
