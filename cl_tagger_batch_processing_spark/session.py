"""SparkSession factory tuned for this engine.

Local mode is the test bed (one JVM, N threads); the configs are chosen so
the same code scales to a multi-executor cluster: AQE for runtime re-planning
(skew joins, partition coalescing), Arrow for the pandas-UDF boundary, and a
shuffle-partition count sized to the parallelism rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cl_tagger_batch_processing_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    ui: bool = False,
    master: str | None = None,
) -> SparkSession:
    """``master`` overrides the default ``local[cpus]`` URL (e.g. a real
    cluster URL from the CLI's ``--master``) while keeping every config
    below — one config surface for all entry points. ``cpus`` still sizes
    ``spark.sql.shuffle.partitions`` unless ``shuffle_partitions`` is given.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    # Local mode runs every task inside the driver JVM, so the driver heap
    # IS the executor heap: Spark's 1g default leaves ~300 MB of
    # execution+storage memory shared by `cpus` concurrent tasks (~10 MB
    # per task at 32 cores) — sort/aggregate/join buffers spill and GC
    # churns long before the machine is used (guide §5/§9: size memory to
    # the workers, not the default). Parameterised, not hard-coded: env
    # override for the bench/driver, and a cluster submit's explicit
    # spark.driver.memory / spark.executor.memory win because a JVM that
    # is already running ignores this builder setting.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", str(ui).lower())
        # The driver-generated fixtures carry parquet TIMESTAMP(NANOS), which
        # Spark only reads via this legacy flag (as epoch-nanos LongType);
        # sources.tables normalizes those columns back to TimestampType.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
