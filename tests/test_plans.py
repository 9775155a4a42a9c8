"""Plan-shape regression tests: pin the physical properties that make these
queries scale (pushdown, pruning, broadcasts, shuffle counts). Results being
right is necessary; these make sure the PLAN stays right too."""

from __future__ import annotations

from cl_tagger_batch_processing_spark.plans import inspect
from cl_tagger_batch_processing_spark.registry import QUERIES


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    pushed = " ".join(inspect.pushed_filters(df))
    assert "l_shipdate" in pushed  # predicate reached the parquet scan
    schemas = inspect.read_schemas(df)
    assert schemas, "no file scan found"
    # 7 needed columns only — no full-schema scan
    assert all("l_orderkey" not in s and "l_partkey" not in s for s in schemas)


def test_q3_small_dims_broadcast(spark, sf_dir):
    df = QUERIES["q3_shipping_priority"](spark, sf_dir)
    assert inspect.count_operator(df, "BroadcastHashJoin") >= 1
    assert inspect.count_operator(df, "SortMergeJoin") == 0


def test_tag_select_broadcasts_dimension(spark, sf_dir):
    df = QUERIES["tag_select"](spark, sf_dir)
    assert inspect.count_operator(df, "BroadcastHashJoin") >= 1
    assert inspect.count_operator(df, "SortMergeJoin") == 0
    # single-pass plan: exactly two aggregation shuffles and no join shuffle
    assert inspect.count_shuffles(df) == 2


def test_asof_join_single_shuffle(spark, sf_dir):
    df = QUERIES["asof_join_purchase_click"](spark, sf_dir)
    # union + window: one shuffle (by user), one sort — no range join blowup
    assert inspect.count_shuffles(df) == 1
    assert inspect.count_operator(df, "SortMergeJoin") == 0


def test_jaccard_never_cartesian(spark, sf_dir):
    df = QUERIES["dedup_ngram_jaccard"](spark, sf_dir)
    plan = inspect.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scan_extension_filter_prunes_columns(spark, sf_dir):
    df = QUERIES["scan_extension_filter"](spark, sf_dir)
    schemas = inspect.read_schemas(df)
    assert schemas and all("text" not in s for s in schemas)  # text column not read
