"""Loaders for the driver-generated fixture tables (see /root/repo/TESTDATA.md).

The fixtures are plain parquet, one file per table, at
``/root/testdata/sf{0.001,0.01,0.1}/<name>.parquet``. Three tables carry
parquet ``TIMESTAMP(NANOS)`` columns, which Spark 4.x rejects unless
``spark.sql.legacy.parquet.nanosAsLong`` is set — and then surfaces as
epoch-nanosecond ``LongType``. ``load_table`` normalizes those back to
``TimestampType`` (truncated to microseconds, which is exactly what DuckDB
does when it reads the same files, so oracle comparisons line up).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FIXTURE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Columns stored as parquet TIMESTAMP(NANOS) in the fixtures.
_NANO_TS_COLUMNS: dict[str, list[str]] = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


# PLAN memo, not a data memo: load_table's work (file listing, parquet
# footer schema read, the dtypes analysis round trip) happens at QUERY
# CONSTRUCTION time and was paid once per table per registry query —
# ~0.12s × ~500 calls across a full bench run, none of it data-dependent.
# The cached value is an unmaterialized DataFrame (a logical plan): every
# action on it still scans the parquet files, so nothing about execution
# or results changes — only the redundant re-planning goes away. Keyed and
# swept exactly like the operator memos (applicationId + sf_dir; the
# fixture-immutability contract documented on session_cache_sweep).
_TABLE_PLAN_CACHE: dict[tuple, DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing nano-timestamp columns."""
    from ..checkpointing import session_cache_sweep

    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir, name)
    session_cache_sweep(_TABLE_PLAN_CACHE, app_id)
    hit = _TABLE_PLAN_CACHE.get(key)
    if hit is not None:
        return hit
    # Runtime-settable; required before the read plans the parquet schema.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for col in _NANO_TS_COLUMNS.get(name, []):
        if dtypes.get(col) == "bigint":
            # epoch nanos -> epoch micros -> TimestampType (truncation matches
            # DuckDB's ns->us conversion of the same parquet data).
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    _TABLE_PLAN_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or FIXTURE_TABLES)}
