"""The bucketed two-pass rank machinery (r12) must be VALUE-identical to
the single-partition windows it replaces — these pin bucketed_rank /
bucketed_ntile / bucketed_cum_before against F.row_number / F.ntile /
cumulative-sum windows on synthetic frames that exercise the edges the
fixtures may not: heavy ties, N smaller than the ntile buckets, N smaller
than RANK_BUCKETS, per-partition groups of uneven size, negative and
double-typed keys, and a probe column collapsing distinct keys."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cl_tagger_batch_processing_spark.operators.relational import (
    bucketed_cum_before,
    bucketed_ntile,
    bucketed_rank,
)


def _synth(spark, n: int, mod: int):
    # (key, tiebreak) with heavy ties when mod is small
    return spark.range(n).select(
        F.col("id").alias("tb"),
        ((F.col("id") * 37) % mod).alias("v"),
        (F.col("id") % 3).alias("g"),
    )


def test_bucketed_rank_matches_row_number(spark):
    for n, mod in [(1, 1), (3, 2), (40, 5), (500, 7), (500, 499)]:
        df = _synth(spark, n, mod)
        w = Window.orderBy(F.asc("v"), F.asc("tb"))
        want = {
            (r["tb"], r["r"])
            for r in df.select("tb", F.row_number().over(w).alias("r")).collect()
        }
        got = {
            (r["tb"], r["r"])
            for r in bucketed_rank(df, "v", "tb", "r").select("tb", "r").collect()
        }
        assert got == want, (n, mod)


def test_bucketed_ntile_matches_ntile(spark):
    for n, mod, buckets in [(1, 1, 4), (2, 2, 4), (3, 3, 4), (5, 2, 4),
                            (101, 9, 4), (257, 11, 10)]:
        df = _synth(spark, n, mod)
        w = Window.orderBy(F.asc("v"), F.asc("tb"))
        want = {
            (r["tb"], r["t"])
            for r in df.select(
                "tb", F.ntile(buckets).over(w).alias("t")
            ).collect()
        }
        got = {
            (r["tb"], r["t"])
            for r in bucketed_ntile(df, "v", "tb", buckets, "t")
            .select("tb", "t")
            .collect()
        }
        assert got == want, (n, mod, buckets)


def test_bucketed_ntile_partitioned_matches(spark):
    df = _synth(spark, 200, 6)
    w = Window.partitionBy("g").orderBy(F.asc("v"), F.asc("tb"))
    want = {
        (r["g"], r["tb"], r["t"])
        for r in df.select("g", "tb", F.ntile(4).over(w).alias("t")).collect()
    }
    got = {
        (r["g"], r["tb"], r["t"])
        for r in bucketed_ntile(df, "v", "tb", 4, "t", parts=["g"])
        .select("g", "tb", "t")
        .collect()
    }
    assert got == want


def test_bucketed_rank_negated_double_key(spark):
    # the customer_rfm DESC pattern: rank ascending on a negated double
    df = _synth(spark, 300, 17).select(
        "tb", (-(F.col("v").cast("double") / 4.0)).alias("v")
    )
    w = Window.orderBy(F.asc("v"), F.asc("tb"))
    want = {
        (r["tb"], r["r"])
        for r in df.select("tb", F.row_number().over(w).alias("r")).collect()
    }
    got = {
        (r["tb"], r["r"])
        for r in bucketed_rank(df, "v", "tb", "r").select("tb", "r").collect()
    }
    assert got == want


def test_bucketed_cum_before_matches_window(spark):
    # one row per distinct value, two weight columns in one pass (KS shape)
    for n in [1, 2, 31, 400]:
        per_v = (
            _synth(spark, n, max(n, 1))
            .groupBy("v")
            .agg(
                F.count(F.lit(1)).alias("ca"),
                F.sum(F.col("tb") % 2).alias("cb"),
            )
        )
        wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
        want = {
            (r["v"], r["pa"], r["pb"])
            for r in per_v.select(
                "v",
                F.coalesce(F.sum("ca").over(wc), F.lit(0)).alias("pa"),
                F.coalesce(F.sum("cb").over(wc), F.lit(0)).alias("pb"),
            ).collect()
        }
        got = {
            (r["v"], r["pa"], r["pb"])
            for r in bucketed_cum_before(per_v, "v", ["ca", "cb"], ["pa", "pb"])
            .select("v", "pa", "pb")
            .collect()
        }
        assert got == want, n


def test_bucketed_cum_before_probe_collapse(spark):
    # a probe that collapses MANY distinct values into one bucket (constant
    # probe) must still produce exact cumulative values — correctness never
    # depends on the boundary quality, only balance does
    per_v = (
        _synth(spark, 100, 90)
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("probe", F.lit(1.0))
    )
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        (r["v"], r["p"])
        for r in per_v.select(
            "v", F.coalesce(F.sum("c").over(wc), F.lit(0)).alias("p")
        ).collect()
    }
    got = {
        (r["v"], r["p"])
        for r in bucketed_cum_before(per_v, "v", "c", "p", probe="probe")
        .select("v", "p")
        .collect()
    }
    assert got == want


def test_bucketed_rank_plan_data_window_is_partitioned(spark):
    # the machinery's point: the window that ranks the DATA is partitioned
    # by _bkt (per-bucket tasks); the only SinglePartition exchange feeds
    # the ≤RANK_BUCKETS-row offset spine, never the input rows
    import re

    from cl_tagger_batch_processing_spark.plans import inspect

    df = _synth(spark, 5000, 997)
    plan = inspect.executed_plan(bucketed_rank(df, "v", "tb", "r"))
    rn_specs = re.findall(
        r"row_number\(\) windowspecdefinition\(([^,]*)", plan
    )
    assert rn_specs and all(s.strip().startswith("_bkt#") for s in rn_specs), (
        rn_specs
    )
    # exactly the one bounded spine pass funnels to a single partition
    assert plan.count("Exchange SinglePartition") <= 1


def test_bucketed_cum_before_partitioned_matches(spark):
    # r13: parts support (the Brown-Forsythe per-group median shape) —
    # one row per distinct (g, v), cum strictly-before within each group
    per_gv = (
        _synth(spark, 300, 23)
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wc = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = {
        (r["g"], r["v"], r["p"])
        for r in per_gv.select(
            "g", "v", F.coalesce(F.sum("c").over(wc), F.lit(0)).alias("p")
        ).collect()
    }
    got = {
        (r["g"], r["v"], r["p"])
        for r in bucketed_cum_before(per_gv, "v", "c", "p", parts=["g"])
        .select("g", "v", "p")
        .collect()
    }
    assert got == want


def test_bucketed_lead_matches_lead(spark):
    from cl_tagger_batch_processing_spark.operators.relational import (
        bucketed_lead,
    )

    # one row per distinct value; every group size class incl. singleton
    # (lead of the max must be NULL) and N < RANK_BUCKETS
    for n in [1, 2, 31, 400]:
        per_v = (
            _synth(spark, n, max(n, 1))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.orderBy("v")
        want = {
            (r["v"], r["nxt"])
            for r in per_v.select(
                "v", F.lead("v").over(w).alias("nxt")
            ).collect()
        }
        got = {
            (r["v"], r["nxt"])
            for r in bucketed_lead(per_v, "v", "nxt")
            .select("v", "nxt")
            .collect()
        }
        assert got == want, n


def test_bucketed_lead_partitioned_matches(spark):
    from cl_tagger_batch_processing_spark.operators.relational import (
        bucketed_lead,
    )

    per_gv = (
        _synth(spark, 250, 19)
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("g").orderBy("v")
    want = {
        (r["g"], r["v"], r["nxt"])
        for r in per_gv.select(
            "g", "v", F.lead("v").over(w).alias("nxt")
        ).collect()
    }
    got = {
        (r["g"], r["v"], r["nxt"])
        for r in bucketed_lead(per_gv, "v", "nxt", parts=["g"])
        .select("g", "v", "nxt")
        .collect()
    }
    assert got == want


def test_bucketed_lead_plan_data_window_is_partitioned(spark):
    # same discipline as bucketed_rank: the lead over DATA rows runs
    # per-bucket; only the bucket-min spine crosses a single partition
    import re

    from cl_tagger_batch_processing_spark.operators.relational import (
        bucketed_lead,
    )
    from cl_tagger_batch_processing_spark.plans import inspect

    per_v = (
        _synth(spark, 5000, 997)
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    plan = inspect.executed_plan(bucketed_lead(per_v, "v", "nxt"))
    lead_specs = re.findall(
        r"lead\(v#\d+L?, 1, null\) windowspecdefinition\(([^,]*)", plan
    )
    assert lead_specs and all(
        s.strip().startswith("_bkt#") for s in lead_specs
    ), lead_specs
    assert plan.count("Exchange SinglePartition") <= 1
