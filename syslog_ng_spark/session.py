"""SparkSession factory tuned for the engine.

Local-mode testing uses ``local[N]`` threads; the same settings scale to a
real cluster (AQE, shuffle partitions sized to parallelism, Arrow on).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "syslog_ng_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``shuffle_partitions`` defaults to the core count: at 100 TB on a real
    cluster this should instead be ~2-3x total executor cores, or left to
    AQE coalescing with a high initial value — both are one config away.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Log payloads are dynamically-typed strings (NVTable model):
        # casts must be forgiving (invalid → NULL), like the reference's
        # type_cast_* helpers — not ANSI errors.
        .config("spark.sql.ansi.enabled", "false")
        # kv-scanner semantics: a repeated key overwrites (last wins)
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Right-size the driver heap (guide §5: the driver does almost
        # no data work here — collects are audited-bounded, broadcasts
        # ≤0.5 GB). The old 48g default made occasional full GCs of a
        # mostly-empty huge heap show up as multi-second stalls on
        # otherwise-identical query runs; 16g bounds pause time and
        # still leaves 30× headroom over the largest audited broadcast.
        # Override with SPARK_DRIVER_MEM for cluster deployments.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
