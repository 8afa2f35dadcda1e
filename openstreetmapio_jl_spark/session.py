"""SparkSession factory with scale-oriented defaults.

Tuned for the 100 TB target (AQE on, skew-join splitting, Arrow batching) while
remaining correct on local[N]. All settings are plain public Spark confs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "openstreetmapio_jl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults chosen for scale:
    - AQE enabled with skew-join splitting and partition coalescing: at 100 TB the
      static shuffle-partition count is always wrong somewhere; AQE re-plans from
      runtime statistics.
    - Arrow execution for all pandas UDF / mapInArrow exchange (the decode kernel and
      cell-index UDFs are Arrow-batched; per-row Python is banned per BASELINE.json
      input_hint).
    - maxPartitionBytes 128m so parquet scans split into memory-sized tasks.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
        .config("spark.sql.session.timeZone", "UTC")
        # local[N] runs all executor threads inside the driver JVM — size the heap
        # for 32 concurrent tasks' scan+shuffle buffers or GC pauses dominate
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
