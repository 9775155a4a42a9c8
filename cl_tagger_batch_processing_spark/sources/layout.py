"""Storage-layout tools: partitioned and bucketed tables.

At 100 TB the scan layout is the first optimization, before any operator:

* **Hive-partitioned parquet** (``partitionBy`` on write) turns equality /
  range predicates on the partition column into directory pruning — the
  scan never lists the other partitions.
* **Bucketed tables** (``bucketBy`` + ``saveAsTable``) pre-shuffle data on
  the join/agg key at write time; later equi-joins and aggregations on the
  bucket key run with NO exchange on either pre-bucketed side.

These helpers are exercised by tests/test_layout.py, which asserts the plan
properties (partition pruning; zero shuffles in a bucketed join).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load_table


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite") -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


LAYOUT_STAGING = "/tmp/cl_tagger_layout"


def layout_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-checked partition pruning: stage the events fixture as
    ``event_date=``-partitioned parquet, read it back with a 3-day range
    predicate, and aggregate per (date, type).

    The read's date filter resolves at PLANNING time to directory pruning
    (``PartitionFilters`` in the scan — the plan test pins it): Spark lists
    3 of 30 date directories and never opens the rest. At 100 TB of
    time-series events this is the first and biggest pushdown — the scan
    reads days, not history. The oracle recomputes the aggregate straight
    from the unpartitioned fixture, so a pruning bug that drops or doubles
    a partition breaks the value hash."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # date from naive ts
    ev = load_table(spark, sf_dir, "events")
    path = os.path.join(
        LAYOUT_STAGING, f"events_{os.path.basename(os.path.normpath(sf_dir))}"
    )
    write_partitioned(ev.withColumn("event_date", F.to_date("ts")), path, ["event_date"])
    back = spark.read.parquet(path)
    return (
        back.where(
            (F.col("event_date") >= F.lit("2024-01-10"))
            & (F.col("event_date") <= F.lit("2024-01-12"))
        )
        .groupBy("event_date", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
    )
