"""SparkSession construction with the engine's scale-oriented defaults.

Single place where shuffle sizing, AQE, and Arrow settings are pinned so
tests, bench, and the driver contract all run the same configuration
(SURVEY.md §4.2: AQE coalesce + skew-join are the built-in half of the
north rule's "adaptive shuffle sizing").
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONF = {
    # AQE: runtime partition coalescing + skew-join splitting (north rule)
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow is the only sanctioned Python<->JVM path (input_hint: no
    # per-row Python); raise batch size to amortize UDF dispatch
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    # parquet scan parallelism at 100 TB: default 128 MiB splits
    "spark.sql.files.maxPartitionBytes": "134217728",
    # deterministic timestamps across engines
    "spark.sql.session.timeZone": "UTC",
    # local[32] runs 32 executor threads in ONE JVM — Spark's 1g
    # default heap OOMs on any sort/agg-heavy stage; only applies at
    # session creation (a cluster deployment sets its own sizing)
    "spark.driver.memory": "6g",
}


def get_spark(
    app: str = "spapy_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver env
    contract) or ``local[*]``; ``shuffle_partitions`` defaults to
    2× the local core count (small enough for local runs, and AQE
    coalesces anyway).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        try:
            n = int(master.split("[")[1].rstrip("]*")) if "[" in master else 0
        except ValueError:
            n = 0
        shuffle_partitions = max(8, 2 * n) if n else 64
    b = SparkSession.builder.appName(app).master(master)
    for k, v in ENGINE_CONF.items():
        b = b.config(k, v)
    b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    b = b.config("spark.ui.enabled", "false")
    b = b.config("spark.ui.showConsoleProgress", "false")
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    from .deploy import ship_package

    ship_package(spark)  # executors import spapy_spark via the pyfiles zip
    return spark
