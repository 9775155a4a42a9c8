"""Skew mitigation: salted joins for hot keys.

The events fixture is deliberately skewed — ~10k events over only 15
user_ids — the shape that melts a plain shuffle join at 100 TB (every row of
a hot key lands on one task). Two mitigations exist in the engine:

1. AQE skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``, on in
   session.get_spark) — Spark's runtime fix, free.
2. Explicit salting, for when the skewed side must join a NON-broadcastable
   dimension: fact rows get a deterministic salt (a hash of a high-
   cardinality column, NOT a random — results stay reproducible), the
   dimension is exploded ×``n_salts``, and the join key becomes
   (key, salt). One hot key's rows now spread over ``n_salts`` tasks.

``skew_salted_join`` is the oracle-checked demonstration: it must produce
exactly the rows of the plain join.

Interplay of the two mechanisms (they compose, they don't conflict): AQE
skew splitting operates on SHUFFLE PARTITION SIZES after the exchange — it
subdivides oversized partitions into extra tasks reading sub-ranges of the
same map output; it never rewrites join keys. Hand-salting rewrites the KEY
SPACE before the exchange. With both enabled, AQE sees the post-salt
partition sizes: if the salt spread a hot key well, no partition exceeds
``spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes`` and AQE
does nothing; if ``n_salts`` was too small for a pathological key, AQE
still splits the residual oversized partition at runtime. The worst case is
mild over-parallelism (extra tasks), never duplicated or lost rows —
``tests/test_llm_ops.py::test_salted_join_identical_under_aqe_skew`` pins
result identity with the AQE skew-join flag on and off.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

DEFAULT_N_SALTS = 8


def salt_fact(fact: DataFrame, salt_src: str, n_salts: int = DEFAULT_N_SALTS) -> DataFrame:
    """Deterministic salt from an existing high-cardinality column."""
    return fact.withColumn("salt", (F.col(salt_src) % n_salts).cast("int"))


def explode_dim(dim: DataFrame, n_salts: int = DEFAULT_N_SALTS) -> DataFrame:
    """Replicate each dimension row once per salt value."""
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    return dim.withColumn("salt", F.explode(salts))


def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed fact (events, 15 hot user_ids) ⋈ per-user aggregate dimension
    via an 8-way salted equi-join. Result is identical to the plain join —
    the oracle checks exactly that."""
    ev = load_table(spark, sf_dir, "events")
    user_dim = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("user_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("user_value"),
    )
    fact = salt_fact(ev.select("event_id", "user_id", "event_type"), salt_src="event_id")
    dim = explode_dim(user_dim)
    return fact.join(dim, ["user_id", "salt"]).select(
        "event_id", "user_id", "event_type", "user_events", "user_value"
    )
