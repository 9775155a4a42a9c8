"""Mirror of the driver's t2 correctness gate: every registry query with an
oracle must hash-match DuckDB on the sf0.001 fixtures (fast); run with
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the driver-scale check."""

from __future__ import annotations

import pytest

from cl_tagger_batch_processing_spark.oracles import ORACLE_SQL
from cl_tagger_batch_processing_spark.registry import NO_ORACLE, QUERIES

from .oracle_harness import compare_query


def test_every_query_has_oracle_or_reason():
    missing = set(QUERIES) - set(ORACLE_SQL) - set(NO_ORACLE)
    assert not missing, f"queries lacking both oracle and reason: {sorted(missing)}"
    orphans = set(ORACLE_SQL) - set(QUERIES)
    assert not orphans, f"oracles without queries: {sorted(orphans)}"


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_oracle_parity(spark, sf_dir, name):
    ok, msg = compare_query(spark, name, sf_dir)
    assert ok, f"{name}: {msg}"
