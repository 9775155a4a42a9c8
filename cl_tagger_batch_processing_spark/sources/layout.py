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

from pyspark.sql import DataFrame, SparkSession


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
