"""Property-based tests for the bucketed two-pass machinery (r12/r13):
on ARBITRARY integer multisets — heavy ties, negatives, singletons, wide
outliers — bucketed_cum_before (global and partitioned) and bucketed_lead
must equal the single-partition windows they replace. The example-based
pins in test_bucketed_rank.py cover known edges; these sweep the input
space around them. Example counts are small because each example costs a
handful of Spark jobs (the boundary-sketch checkpoint is eager)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from cl_tagger_batch_processing_spark.operators.relational import (
    bucketed_cum_before,
    bucketed_lead,
)

# values: tight range (forces tie classes) plus rare wide outliers
VALUES = st.one_of(
    st.integers(min_value=-5, max_value=5),
    st.integers(min_value=-(10**9), max_value=10**9),
)
PANELS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2), VALUES),
    min_size=1,
    max_size=50,
)

COMMON = dict(
    deadline=None,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _per_gv(spark, panel):
    rows = [(g, v) for g, v in panel]
    return (
        spark.createDataFrame(rows, "g long, v long")
        .groupBy("g", "v")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.when(F.col("v") % 2 == 0, 1).otherwise(-1)).alias("w"),
        )
    )


@settings(**COMMON)
@given(panel=PANELS)
def test_cum_before_property_global(spark, panel):
    per_v = (
        _per_gv(spark, panel)
        .groupBy("v")
        .agg(F.sum("c").alias("c"), F.sum("w").alias("w"))
    )
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        (r["v"], r["pc"], r["pw"])
        for r in per_v.select(
            "v",
            F.coalesce(F.sum("c").over(wc), F.lit(0)).alias("pc"),
            F.coalesce(F.sum("w").over(wc), F.lit(0)).alias("pw"),
        ).collect()
    }
    got = {
        (r["v"], r["pc"], r["pw"])
        for r in bucketed_cum_before(per_v, "v", ["c", "w"], ["pc", "pw"])
        .select("v", "pc", "pw")
        .collect()
    }
    assert got == want


@settings(**COMMON)
@given(panel=PANELS)
def test_cum_before_property_partitioned(spark, panel):
    per_gv = _per_gv(spark, panel)
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


@settings(**COMMON)
@given(panel=PANELS)
def test_lead_property_partitioned(spark, panel):
    per_gv = _per_gv(spark, panel)
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
