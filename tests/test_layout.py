"""Layout tests: salted-join equivalence + skew spreading, partition
pruning, and shuffle-free bucketed joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from cl_tagger_batch_processing_spark.operators import skew
from cl_tagger_batch_processing_spark.plans import inspect
from cl_tagger_batch_processing_spark.sources.layout import (
    write_bucketed,
    write_partitioned,
)
from cl_tagger_batch_processing_spark.sources.tables import load_table


def test_salted_join_equals_plain_join(spark, sf_dir):
    salted = skew.skew_salted_join(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("user_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("user_value"),
    )
    plain = ev.select("event_id", "user_id", "event_type").join(dim, "user_id")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.select(salted.columns).collect())
    )


def test_salt_spreads_hot_key(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    salted = skew.salt_fact(ev, "event_id", n_salts=8)
    per_salt = (
        salted.where(F.col("user_id") == 0).groupBy("salt").count().collect()
    )
    assert len(per_salt) == 8  # one hot user's rows spread over all salts
    counts = [r["count"] for r in per_salt]
    assert max(counts) < sum(counts)  # no salt holds everything


def test_partition_pruning(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "yr", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    write_partitioned(orders, out, ["yr"])
    df = spark.read.parquet(out).where(F.col("yr") == 1997).select("o_orderkey")
    plan = inspect.full_plan(df)
    assert "PartitionFilters: [isnotnull(yr" in plan.replace("#", "") or "PartitionFilters" in plan
    # pruned scan must not read the other year directories
    n_1997 = df.count()
    total = spark.read.parquet(out).count()
    assert 0 < n_1997 < total


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)  # stale location
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders.select("o_orderkey", "o_totalprice"), "b_orders", ["o_orderkey"])
    write_bucketed(li.select("l_orderkey", "l_quantity"), "b_lineitem", ["l_orderkey"])
    joined = spark.table("b_lineitem").join(
        spark.table("b_orders").hint("merge"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    assert inspect.count_shuffles(joined) == 0  # bucket layout co-locates the join
    assert joined.count() == li.count()


def test_layout_bucketed_join_query_single_exchange(spark, sf_dir):
    from cl_tagger_batch_processing_spark.sources.layout import layout_bucketed_join

    out = layout_bucketed_join(spark, sf_dir)
    # The fact-to-fact join is bucket-co-located: the ONLY exchange in the
    # whole plan is the final 5-group aggregation. A second exchange means
    # the bucket layout stopped lining up with the join key.
    assert inspect.count_shuffles(out) == 1
    assert inspect.count_operator(out, "SortMergeJoin") + inspect.count_operator(
        out, "BroadcastHashJoin"
    ) >= 1


def test_compaction_reduces_files_without_shuffle(spark, sf_dir):
    import glob

    from cl_tagger_batch_processing_spark.sources.layout import (
        LAYOUT_STAGING,
        layout_compact_small_files,
    )

    layout_compact_small_files(spark, sf_dir).collect()
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    frag = glob.glob(f"{LAYOUT_STAGING}/events_frag_{tag}/*.parquet")
    compact = glob.glob(f"{LAYOUT_STAGING}/events_compact_{tag}/*.parquet")
    assert len(frag) == 64
    assert 1 <= len(compact) <= 4
    # coalesce-based compaction must not shuffle: the compact job is a pure
    # scan -> write with no exchange.
    from cl_tagger_batch_processing_spark.plans import inspect

    recompact = spark.read.parquet(f"{LAYOUT_STAGING}/events_frag_{tag}").coalesce(4)
    assert inspect.count_shuffles(recompact) == 0


def test_sorted_layout_pushes_range_filter(spark, sf_dir):
    from cl_tagger_batch_processing_spark.sources.layout import (
        LAYOUT_STAGING,
        layout_sorted_skipping,
    )

    layout_sorted_skipping(spark, sf_dir).collect()  # stages the sorted copy
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    back = spark.read.parquet(f"{LAYOUT_STAGING}/events_sorted_{tag}").where(
        F.col("user_id").between(10, 20)
    )
    pushed = " ".join(inspect.pushed_filters(back))
    # Both range bounds must reach the parquet scan — with the sorted
    # layout those stats prune row groups; without pushdown nothing can.
    assert "GreaterThanOrEqual(user_id 10)" in pushed.replace(",", " ")
    assert "LessThanOrEqual(user_id 20)" in pushed.replace(",", " ")


def test_zorder_clusters_both_dimensions(spark, sf_dir):
    import glob
    import os

    import pyarrow.parquet as pq

    from cl_tagger_batch_processing_spark.sources.layout import (
        LAYOUT_STAGING,
        layout_zorder_skipping,
    )

    # stage (the query fn writes the clustered copy) and look at footers
    layout_zorder_skipping(spark, sf_dir).collect()
    tag = os.path.basename(os.path.normpath(sf_dir))
    files = sorted(glob.glob(f"{LAYOUT_STAGING}/events_zorder_{tag}/*.parquet"))
    assert len(files) >= 2, "range partitioner should emit several files"

    spans = []
    dom = {"user_id": [float("inf"), -float("inf")],
           "value": [float("inf"), -float("inf")]}
    for f in files:
        md = pq.ParquetFile(f).metadata
        cols = {md.row_group(0).column(i).path_in_schema: i
                for i in range(md.row_group(0).num_columns)}
        for rg in range(md.num_row_groups):
            stat = {}
            for name in ("user_id", "value"):
                s = md.row_group(rg).column(cols[name]).statistics
                stat[name] = (float(s.min), float(s.max))
                dom[name][0] = min(dom[name][0], float(s.min))
                dom[name][1] = max(dom[name][1], float(s.max))
            spans.append(stat)
    assert len(spans) >= 2
    full_area = (dom["user_id"][1] - dom["user_id"][0]) * (
        dom["value"][1] - dom["value"][0]
    )
    avg_area = sum(
        (s["user_id"][1] - s["user_id"][0]) * (s["value"][1] - s["value"][0])
        for s in spans
    ) / len(spans)
    # the point of Z-order: each row group covers a small (user_id, value)
    # rectangle, so 2-D predicates prune on stats alone. On a random layout
    # every row group spans ~the whole domain (ratio ≈ 1).
    assert avg_area < 0.5 * full_area, (avg_area, full_area)


def test_bucketed_hash_store_no_store_exchange(spark, sf_dir):
    """The store side of the incremental-dedup anti-join must read bucket-
    aware (paid once at ingest) — strictly fewer exchanges than the plain
    variant, and the store scan carries the bucket markers."""
    from cl_tagger_batch_processing_spark.plans import inspect
    from cl_tagger_batch_processing_spark.registry import QUERIES

    bucketed = QUERIES["dedup_exact_incremental_bucketed"](spark, sf_dir)
    plain = QUERIES["dedup_exact_incremental"](spark, sf_dir)
    assert inspect.count_shuffles(bucketed) < inspect.count_shuffles(plain)
    plan = inspect.executed_plan(bucketed)
    assert "Bucketed: true" in plan
    assert "SelectedBucketsCount" in plan
    # and the report matches the plain operator row-for-row
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))
