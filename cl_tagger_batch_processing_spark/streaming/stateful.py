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


def _protobuf_available() -> bool:
    """``transformWithState``'s state-server protocol needs google.protobuf;
    this container ships pyspark without it (and installs are off-limits),
    so the TWS path is import-gated like PIL/onnxruntime in kernels/."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


_MIX_OUTPUT_SCHEMA = "user_id bigint, n_event_types bigint, n_events bigint, emit_seq bigint"
# applyInPandasWithState state: per-type counts as a map column — arbitrary
# per-key collections are legal struct fields in the state row.
_MIX_STATE_SCHEMA = "counts map<string,bigint>, emit_seq bigint"


def _mix_update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        counts, emit_seq = state.get
        counts = dict(counts)
    else:
        counts, emit_seq = {}, 0
    for pdf in pdfs:
        for etype, cnt in pdf.groupby("event_type").size().items():
            counts[etype] = counts.get(etype, 0) + int(cnt)
    emit_seq += 1
    state.update((counts, emit_seq))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_event_types": [len(counts)],
            "n_events": [sum(counts.values())],
            "emit_seq": [emit_seq],
        }
    )


def _make_mix_processor():
    """Build the transformWithState StatefulProcessor lazily — the base class
    imports fine without protobuf; only the runtime state client needs it."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class EventMixProcessor(StatefulProcessor):
        """Per-user event-type mix with MAP state: one RocksDB map entry per
        (user, event_type) instead of one monolithic row per user. At scale
        this is the point of ``transformWithState`` over
        ``applyInPandasWithState``: updating one of a user's 10⁴ counters
        rewrites one map entry, not the whole serialized state row."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self.counts = handle.getMapState("counts", "etype string", "n bigint")
            self.seq = handle.getValueState("seq", "s bigint")

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            for pdf in rows:
                for etype, cnt in pdf.groupby("event_type").size().items():
                    prev = (
                        self.counts.getValue((etype,))[0]
                        if self.counts.containsKey((etype,))
                        else 0
                    )
                    self.counts.updateValue((etype,), (int(prev) + int(cnt),))
            seq = (self.seq.get()[0] + 1) if self.seq.exists() else 1
            self.seq.update((seq,))
            items = [(k[0], v[0]) for k, v in self.counts.iterator()]
            (user_id,) = key
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_event_types": [len(items)],
                    "n_events": [sum(v for _, v in items)],
                    "emit_seq": [seq],
                }
            )

        def close(self) -> None:
            pass

    return EventMixProcessor()


def stream_user_event_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type mix (distinct types + total events) as arbitrary
    per-key state, emitted each time the user appears; the final emission
    equals the batch COUNT(DISTINCT event_type)/COUNT(*) per user (the value
    oracle).

    Preferred path: ``transformWithState`` with MapState on the RocksDB
    state store — per-entry updates, the 100-TB shape. This container lacks
    the protobuf runtime the TWS state client requires, so the operator
    falls back to ``applyInPandasWithState`` holding the same counts as a
    map-typed struct field — identical semantics and output (the skip-marked
    parity test runs both where protobuf exists)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = events_stream(spark, sf_dir).select("user_id", "event_type")
    if _protobuf_available():
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        updated = ev.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_make_mix_processor(),
            outputStructType=_MIX_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    else:
        updated = ev.groupBy("user_id").applyInPandasWithState(
            _mix_update,
            outputStructType=_MIX_OUTPUT_SCHEMA,
            stateStructType=_MIX_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    out = _run_to_memory(updated, "update")
    w = Window.partitionBy("user_id").orderBy(F.desc("emit_seq"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "n_event_types", "n_events")
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
