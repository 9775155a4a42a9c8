"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's tag-selection
semantics, appV2.py:74-101, over the sf0.001 fixtures). ``queries()`` exposes
every implemented operator from SURVEY.md §2 plus the LLM-pipeline
extensions; ``oracle_sql()`` gives the DuckDB-equivalent SQL for each
SQL-expressible entry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from cl_tagger_batch_processing_spark.operators.tagging import flagship_tag_select

    return flagship_tag_select(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cl_tagger_batch_processing_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from cl_tagger_batch_processing_spark.oracles import ORACLE_SQL

    return dict(ORACLE_SQL)
