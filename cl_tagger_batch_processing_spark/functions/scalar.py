"""Scalar-function surface (SURVEY.md §2.7).

The reference uses a small set of scalar functions (lower/replace/substring
``in``/join, sigmoid/clip/argmax, json, path ops — appV2.py:67,83,97-98,101,
135,174). These queries exercise the engine's full scalar surface over the
fixtures, each oracle-checked.

Engine-portability rules applied here:
* only exactly-representable math crosses the oracle boundary (abs, ceil,
  floor, sqrt, sign, mod, x*x — no exp/log whose last-ulp may differ between
  libm implementations);
* percentile interpolation results are rounded to 4 decimals on BOTH sides
  (Spark computes (1-d)*a + d*b, DuckDB a + (b-a)*d — same value in ℝ,
  potentially different last ulp in float);
* date arithmetic is done on DATE/epoch values, never on localized strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/upper/trim-family, substring, replace, lpad, split,
    concat, regexp_extract over part names."""
    part = load_table(spark, sf_dir, "part")
    name = F.col("p_name")
    return part.select(
        "p_partkey",
        F.lower(name).alias("lower_name"),
        F.upper(name).alias("upper_name"),
        F.substring(name, 1, 5).alias("prefix5"),
        F.replace(name, F.lit(" "), F.lit("_")).alias("snake_name"),
        F.length(name).cast("bigint").alias("name_len"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.regexp_extract(F.col("p_brand"), "Brand#(\\d+)", 1).alias("brand_num"),
        F.element_at(F.split(F.col("p_type"), " "), 1).alias("type_head"),
        F.col("p_name").contains("a").alias("has_a"),
    )


def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extraction, truncation and date arithmetic over order dates."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("yr"),
        F.month(d).cast("bigint").alias("mon"),
        F.dayofmonth(d).cast("bigint").alias("dom"),
        F.quarter(d).cast("bigint").alias("qtr"),
        d.cast("date").alias("order_date"),
        F.date_add(d.cast("date"), 30).alias("due_date"),
        F.datediff(F.lit("1999-01-01").cast("date"), d.cast("date"))
        .cast("bigint")
        .alias("days_to_1999"),
        F.unix_timestamp(d).alias("epoch_s"),
    )


def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-representable numeric functions over lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(x - 30000.0).alias("abs_dev"),
        F.ceil(x).cast("bigint").alias("ceil_price"),
        F.floor(x).cast("bigint").alias("floor_price"),
        # no round() here: Spark rounds doubles via their shortest decimal
        # repr (BigDecimal), DuckDB via the actual double value — they
        # disagree on values like 20185/1000; the raw division is identical
        (x / 1000.0).alias("kprice"),
        F.sqrt(x).alias("sqrt_price"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        (x * x).alias("price_sq"),
        F.greatest(F.col("l_quantity"), F.lit(10.0)).alias("qty_floor10"),
        F.least(F.col("l_tax"), F.col("l_discount")).alias("tax_disc_min"),
    )


def percentiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of order value per priority, rounded
    to 4 decimals for engine portability."""
    orders = load_table(spark, sf_dir, "orders")
    pct = F.expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))")
    return (
        orders.groupBy("o_orderpriority")
        .agg(pct.alias("p"))
        .select(
            "o_orderpriority",
            F.round(F.element_at("p", 1), 4).alias("p25"),
            F.round(F.element_at("p", 2), 4).alias("p50"),
            F.round(F.element_at("p", 3), 4).alias("p75"),
        )
    )


def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array surface (§2.7 extension): per-order quantity
    arrays through sort / filter / transform / aggregate / slice /
    distinct — the Column-side API a user reaches for before ever writing
    a UDF, exercised end-to-end against DuckDB's list_* equivalents.

    ``collect_list`` order is shuffle-dependent, so the array is
    ``array_sort``-ed immediately (the same determinism rule as the
    reference's A2 ordered aggregation); everything downstream is
    row-local HOF math on the sorted array."""
    li = load_table(spark, sf_dir, "lineitem")
    grouped = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list(F.col("l_quantity").cast("bigint"))).alias("qtys")
    )
    total = F.aggregate("qtys", F.lit(0).cast("bigint"), lambda a, x: a + x)
    n_big = F.size(F.filter("qtys", lambda x: x > 25)).cast("bigint")
    spread = F.element_at("qtys", -1) - F.element_at("qtys", 1)
    first3 = F.aggregate(
        F.slice("qtys", 1, 3), F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    doubled_max = F.element_at(F.transform("qtys", lambda x: x * 2), -1)
    return grouped.select(
        "l_orderkey",
        F.size("qtys").cast("bigint").alias("n_items"),
        total.alias("total_qty"),
        n_big.alias("n_big_items"),
        spread.alias("qty_spread"),
        first3.alias("first3_sum"),
        doubled_max.alias("doubled_max"),
        F.size(F.array_distinct("qtys")).cast("bigint").alias("n_distinct_qty"),
    )


def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface (§1.2: the reference's dict-shaped config/threshold
    maps become MapType): per-order position→quantity maps through
    map_from_arrays / element_at / map_keys / map_values, value-checked
    against DuckDB's MAP functions. Keys are the 1-based positions of the
    deterministically sorted entry list — unique by construction (the
    fixture's l_linenumber is NOT unique per order, and Spark maps reject
    duplicate keys at runtime)."""
    li = load_table(spark, sf_dir, "lineitem")
    entry = F.struct(
        F.col("l_linenumber").cast("bigint").alias("k"),
        F.col("l_quantity").cast("bigint").alias("v"),
    )
    sorted_entries = F.array_sort(F.collect_list(entry))
    grouped = li.groupBy("l_orderkey").agg(sorted_entries.alias("entries")).select(
        "l_orderkey",
        F.map_from_arrays(
            F.sequence(F.lit(1).cast("bigint"), F.size("entries").cast("bigint")),
            F.transform("entries", lambda e: e["v"]),
        ).alias("m"),
    )
    vals = F.map_values("m")
    return grouped.select(
        "l_orderkey",
        F.size("m").cast("bigint").alias("n_keys"),
        F.element_at("m", F.lit(1)).alias("first_qty"),
        F.array_max(F.map_keys("m")).alias("max_key"),
        F.size(F.filter(vals, lambda x: x > 25)).cast("bigint").alias("n_big_vals"),
        F.aggregate(vals, F.lit(0).cast("bigint"), lambda a, x: a + x).alias("vals_sum"),
    )
