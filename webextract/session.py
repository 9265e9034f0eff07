"""SparkSession factory with scale-appropriate defaults.

Tests/bench use local[N]; the same config block is what we'd ship in
spark-defaults for a 1000-executor cluster (AQE on, Arrow on, shuffle
partitions sized to cores; on a real cluster shuffle partitions scale
with total cores and input volume instead).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "webextract", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = f"local[{cpus}]"
    sp = shuffle_partitions or max(cpus, 8)
    return (
        SparkSession.builder
        .master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size ≡ the reference's pipeline stage batching knob
        # (DOCLING_PERF_PAGE_BATCH_SIZE etc., settings.py:77-82) — but
        # sized for throughput; byte-budget rebatching happens in udfs.py
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # scan-split sizing for a CPU-bound kernel: the extraction cost
        # per byte is ~10^3× a columnar scan's, so splits must be much
        # finer than the 128 MB I/O default or small corpora collapse
        # to 1-2 tasks (openCostInBytes=4 MB folds 64 small files into
        # ~3 splits — measured 1.85× speedup on 32 cores; with these,
        # near-linear).  Same knob bounds straggler size at 100 TB.
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(128 * 1024))
        .config("spark.driver.memory", os.environ.get("WEBEXTRACT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
