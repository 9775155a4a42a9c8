"""Custom stateful streaming operator via ``applyInPandasWithState``.

The north-star surface calls for custom stateful operators beyond built-in
windows. ``stream_user_totals`` keeps one running (count, sum) state per
user across micro-batches and emits the updated totals each time the user
appears in a batch — the canonical shape for incremental per-entity
aggregates (feature stores, rate counters) where ``groupBy().agg()`` in
complete mode would rebuild the world every trigger.

Driven over the bounded events fixture the stream collapses to one batch,
so the FINAL emitted totals equal the batch group-by — which makes the
operator value-oracle-checkable despite being "custom stateful": the query
keeps only each user's last emission (max emit_seq per user).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .windows import _run_to_memory, events_stream

_STATE_SCHEMA = "n bigint, total_cents bigint, emit_seq bigint"
_OUTPUT_SCHEMA = "user_id bigint, n bigint, total_cents bigint, emit_seq bigint"


def _update_user(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Merge this batch's rows into the user's running (count, cents) state.

    Money is accumulated in integer cents (the fixture values are exact
    2-decimal) so state stays exact regardless of batch boundaries.
    """
    (user_id,) = key
    if state.exists:
        n, total_cents, emit_seq = state.get
    else:
        n, total_cents, emit_seq = 0, 0, 0
    for pdf in pdfs:
        n += len(pdf)
        # per-row cents rounding (each value is exact 2-decimal); rounding a
        # float SUM instead could drift by an accumulated ulp
        total_cents += int((pdf["value"] * 100).round().astype("int64").sum())
    emit_seq += 1
    state.update((n, total_cents, emit_seq))
    yield pd.DataFrame(
        {"user_id": [user_id], "n": [n], "total_cents": [total_cents], "emit_seq": [emit_seq]}
    )


def stream_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user totals over the event stream; returns each user's
    LAST emission (the fixpoint), as exact cents → double dollars."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = events_stream(spark, sf_dir).select("user_id", "value")
    updated = ev.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run_to_memory(updated, "update")
    w = Window.partitionBy("user_id").orderBy(F.desc("emit_seq"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "n",
            (F.col("total_cents").cast("double") / F.lit(100.0)).alias("total_value"),
        )
    )
