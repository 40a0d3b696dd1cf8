"""SparkSession factory tuned for large-scale batch analytics.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same configs are
what we would ship to a 1000-executor cluster: AQE (runtime coalescing +
skew-join splitting), partition sizing, broadcast threshold, Arrow for
the few pandas-UDF paths, and UTC session time so results are
deterministic across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hypermap-etl-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) the session.

    Scale notes (100 TB target):
      - AQE on: runtime shuffle-partition coalescing and skew-join
        splitting replace hand-tuned partition counts.
      - ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound;
        on a real cluster set it ~2-3x total cores, AQE coalesces down.
      - 128 MB file partitions keep scan tasks memory-bounded regardless
        of total input size.
      - Broadcast threshold 64 MB: every dim table in this workload
        (region/nation/customer/supplier/part, blocks) is far below it,
        so fact-side joins never shuffle the big side.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE", "32")

    # driver heap must be set BEFORE the JVM launches: builder confs are
    # silently ignored for spark.driver.memory when a plain Python
    # process starts the gateway (the heap is already fixed). Route it
    # through PYSPARK_SUBMIT_ARGS instead; under spark-submit the env
    # var is absent and submit-time -Xmx wins as usual.
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    if "PYSPARK_SUBMIT_ARGS" not in os.environ and "PYSPARK_GATEWAY_PORT" not in os.environ:
        os.environ["PYSPARK_SUBMIT_ARGS"] = f"--driver-memory {mem} pyspark-shell"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch BYTE cap for the mapInPandas media decoders
        # (r11, guide §4.2): with multi-MB binary payloads the default
        # 10k-record batches become one giant batch per partition —
        # the JVM then serializes the whole partition before Python
        # decodes anything and per-batch memory is unbounded. 4 MB
        # batches pipeline the Arrow transfer against the Python
        # decode (measured on 3.15 MB synthetic PNGs: 0.90 -> 0.77 s
        # best-of-3, plans/r11/arrow_batch_microbench.txt) and bound
        # executor memory per batch. Narrow-row operators are
        # unaffected: the 10k-record cap binds first for them.
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(4 * 1024 * 1024))
        # NOTE: runtime row-level filter injection
        # (spark.sql.optimizer.runtime.bloomFilter.enabled /
        # runtimeFilter.semiJoinReduction) was tried and REVERTED: on
        # this Spark build it deadlocks planning of the broadcast-join
        # pyramid in local mode (q1 never finishes). On a cluster
        # deployment re-evaluate per Spark version; the workload's dim
        # joins all broadcast anyway, so the filters would only matter
        # for fact-fact joins.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # zstd for every parquet write: ~25-35% smaller files than the
        # snappy default at comparable scan speed — at 100 TB that is
        # direct storage + scan-IO + shuffle-read savings on every
        # downstream pass. Level 3 default; decode speed is what scans
        # pay and zstd decode is snappy-class.
        .config("spark.sql.parquet.compression.codec", "zstd")
        # wide-aggregate codegen: the default 100-field cap silently
        # drops whole-stage codegen for the 128-column MinHash
        # signature aggregate (and any >100-col projection), costing
        # ~2.5x on the dedup path (measured at sf0.1: 11.7s -> 4.7s).
        .config("spark.sql.codegen.maxFields", "400")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
