"""Streaming semantics tests: batch/stream parity and watermark behavior."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cl_tagger_batch_processing_spark.sources.tables import load_table
from cl_tagger_batch_processing_spark.streaming import windows as sw


def test_stream_tumbling_equals_batch(spark, sf_dir):
    # Complete-mode streaming aggregation over a bounded source must equal
    # the batch group-by — the batch/stream parity check (SURVEY.md §7 P4).
    got = {
        (r.window_start_epoch, r.event_type): (r.n, r.sum_value)
        for r in sw.stream_tumbling_counts(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    exp = {
        (r.w, r.event_type): (r.n, r.sv)
        for r in ev.groupBy(
            (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("bigint").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sv"),
        )
        .collect()
    }
    assert got == exp


def test_stream_session_counts_subset_of_batch(spark, sf_dir):
    # Append mode withholds sessions not yet finalized by the watermark →
    # emitted sessions must be a subset of the batch sessionization.
    streamed = {
        (r.user_id, r.session_start_epoch, r.n_events)
        for r in sw.stream_session_counts(spark, sf_dir).collect()
    }
    batch = {
        (r.user_id, r.session_start_epoch, r.n_events)
        for r in sw.sessionize(spark, sf_dir).collect()
    }
    assert streamed <= batch
    assert len(streamed) > 0  # the watermark does finalize most of a month


def test_sessionize_gap_semantics(spark, sf_dir):
    # No two sessions of one user may start within the 30-min gap of the
    # previous session's span; sessions are disjoint per user.
    rows = sw.sessionize(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r.session_start_epoch)
    for starts in by_user.values():
        starts.sort()
        assert all(b - a >= 1800 for a, b in zip(starts, starts[1:]))


def test_stream_user_event_mix_equals_batch(spark, sf_dir):
    from cl_tagger_batch_processing_spark.streaming.stateful import stream_user_event_mix

    got = {
        (r.user_id, r.n_event_types, r.n_events)
        for r in stream_user_event_mix(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        (r.user_id, r.t, r.n)
        for r in ev.groupBy("user_id")
        .agg(F.count_distinct("event_type").alias("t"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_tws_event_mix_agrees_with_fallback(spark, sf_dir):
    # The preferred transformWithState (MapState) path needs the protobuf
    # runtime for its state-server client — absent in this container, so
    # this runs only on a real deployment (mirrors the real-PIL goldens).
    import pytest

    pytest.importorskip("google.protobuf")
    from cl_tagger_batch_processing_spark.streaming.stateful import (
        _MIX_OUTPUT_SCHEMA,
        _make_mix_processor,
    )
    from cl_tagger_batch_processing_spark.streaming.windows import (
        _run_to_memory,
        events_stream,
    )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    ev = events_stream(spark, sf_dir).select("user_id", "event_type")
    updated = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_mix_processor(),
        outputStructType=_MIX_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    out = _run_to_memory(updated, "update")
    w = Window.partitionBy("user_id").orderBy(F.desc("emit_seq"))
    got = {
        (r.user_id, r.n_event_types, r.n_events)
        for r in out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "emit_seq")
        .collect()
    }
    ev_batch = load_table(spark, sf_dir, "events")
    want = {
        (r.user_id, r.t, r.n)
        for r in ev_batch.groupBy("user_id")
        .agg(F.count_distinct("event_type").alias("t"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_stream_dedup_counts_collapses_duplicates(spark, sf_dir):
    from cl_tagger_batch_processing_spark.sources.tables import load_table
    from cl_tagger_batch_processing_spark.streaming.windows import stream_dedup_counts

    got = {(r.event_type, r.n) for r in stream_dedup_counts(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    want = {
        (r.event_type, r.n)
        for r in ev.groupBy("event_type").agg(F.count_distinct("event_id").alias("n")).collect()
    }
    assert got == want  # doubled input collapsed back to distinct counts


def test_stream_sink_restart_is_noop(spark, sf_dir, tmp_path):
    # Exactly-once restart semantics: a second availableNow run against the
    # SAME checkpoint+output must commit nothing — the source offsets are
    # already in the checkpoint's write-ahead log.
    from cl_tagger_batch_processing_spark.streaming.windows import run_sink_to_parquet

    out, ckpt = str(tmp_path / "sink_out"), str(tmp_path / "sink_ckpt")
    run_sink_to_parquet(spark, sf_dir, out, ckpt)
    n1 = spark.read.parquet(out).count()
    run_sink_to_parquet(spark, sf_dir, out, ckpt)
    n2 = spark.read.parquet(out).count()
    assert n1 > 0
    assert n2 == n1  # restart added nothing: no duplicated micro-batch


def test_python_udtf_extension_api(spark):
    # SURVEY.md §2.9: the reference has no extension API; the engine's
    # sanctioned user-extension points are pandas UDFs (kernels/) and, for
    # table-valued shapes, Spark 4 Python UDTFs. This pins that the UDTF
    # registration path works end-to-end — NOT a hot-path pattern (the
    # chunking/tokenizing registry queries stay JVM-side by design).
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, piece string")
    class SplitEvery:
        def eval(self, s: str, n: int):
            for i in range(0, len(s), n):
                yield i // n, s[i : i + n]

    spark.udtf.register("split_every", SplitEvery)
    rows = spark.sql(
        "SELECT * FROM split_every('abcdefgh', 3) ORDER BY chunk_idx"
    ).collect()
    assert [(r.chunk_idx, r.piece) for r in rows] == [(0, "abc"), (1, "def"), (2, "gh")]


def test_first_touch_matches_batch(spark, sf_dir):
    """Streaming first-touch state == the batch argmin per user."""
    from pyspark.sql import functions as F

    from cl_tagger_batch_processing_spark.sources.tables import load_table
    from cl_tagger_batch_processing_spark.streaming.windows import (
        stream_first_touch_attribution,
    )

    got = {
        r.user_id: (r.first_event_id, r.first_event_type, r.n_events)
        for r in stream_first_touch_attribution(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    w_rows = ev.select(
        "user_id", "event_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    ).collect()
    expected: dict = {}
    counts: dict = {}
    for r in w_rows:
        counts[r.user_id] = counts.get(r.user_id, 0) + 1
        cur = expected.get(r.user_id)
        key = (r.us, r.event_id)
        if cur is None or key < cur[0]:
            expected[r.user_id] = (key, r.event_type)
    assert got == {
        u: (k[1], t, counts[u]) for u, (k, t) in expected.items()
    }


def test_stream_quantile_histogram_agrees_with_batch_sketch(spark, sf_dir):
    """The streaming per-window estimates replay from a batch recompute of
    the SAME histogram+finalize over each hour window — one sketch
    implementation, two execution modes."""
    from pyspark.sql import functions as F

    from cl_tagger_batch_processing_spark.operators.relational import (
        histogram_bin,
        histogram_quantile_estimates,
    )
    from cl_tagger_batch_processing_spark.sources.tables import load_table
    from cl_tagger_batch_processing_spark.streaming.windows import (
        stream_quantile_histogram,
    )

    got = {
        (r.window_start_epoch, r.q): r.estimate
        for r in stream_quantile_histogram(spark, sf_dir).collect()
    }
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    hist = (
        ev.select(
            F.expr(
                "unix_micros(cast(ts as timestamp)) div 1000000 div 3600 * 3600"
            )
            .cast("bigint")
            .alias("window_start_epoch"),
            histogram_bin(F.col("value")).alias("b"),
        )
        .groupBy("window_start_epoch", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    want = {
        (r.window_start_epoch, r.q): r.estimate
        for r in histogram_quantile_estimates(
            spark, hist, ["window_start_epoch"]
        ).collect()
    }
    assert got == want and got


def test_stream_watchlist_cms_sound_and_exact_on_watchlist(spark, sf_dir):
    """CMS soundness per window: the estimate never undercounts
    (overestimate >= 0); the exact side replays from a batch recompute;
    every watchlist user active in a window appears exactly once."""
    from collections import Counter

    from pyspark.sql import functions as F

    from cl_tagger_batch_processing_spark.sources.tables import load_table
    from cl_tagger_batch_processing_spark.streaming.windows import (
        CMS_WATCH_BELOW,
        stream_watchlist_cms,
    )

    rows = stream_watchlist_cms(spark, sf_dir).collect()
    assert rows
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("unix_micros(cast(ts as timestamp)) div 1000000 div 3600 * 3600")
        .cast("bigint")
        .alias("wse"),
        "user_id",
    )
    truth = Counter(
        (r.wse, r.user_id)
        for r in ev.where(F.col("user_id") < CMS_WATCH_BELOW).collect()
    )
    got = {(r.window_start_epoch, r.user_id) for r in rows}
    assert got == set(truth)
    for r in rows:
        assert r.true_count == truth[(r.window_start_epoch, r.user_id)]
        assert r.cms_estimate >= r.true_count  # CMS can only overcount
        assert r.overestimate == r.cms_estimate - r.true_count


def test_session_watermark_boundary_inclusive(spark, tmp_path):
    # Pins the emission rule the stream_session_counts ORACLE replays: on a
    # bounded stream the final watermark is max(ts) − 10min, and a session
    # whose end (last event + 30-min gap) equals the watermark EXACTLY is
    # emitted (non-strict bound). If a Spark upgrade flips this to strict,
    # this test fails here rather than as a driver hash mismatch.
    import datetime

    base = datetime.datetime(2025, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 1),  # session end = base+30min
        (2, base + datetime.timedelta(minutes=40), 2),  # wm = base+30min
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int")
    p = str(tmp_path / "wm_tie")
    df.coalesce(1).write.parquet(p)
    raw = spark.readStream.schema("user_id int, ts timestamp, event_id int").format(
        "parquet"
    ).load(p)
    agg = (
        raw.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_tie_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    emitted = {r.user_id for r in spark.table("wm_tie_out").collect()}
    assert emitted == {1}  # the tie session flushed; the live tail did not


def test_session_watermark_is_ms_truncated(spark, tmp_path):
    # Spark tracks max event time in MILLISECONDS (EventTimeStatsAccum), so
    # the watermark is ms-truncated before the delay subtracts. A session
    # whose end falls inside the sub-ms gap (ms-truncated wm, raw-us wm]
    # must be WITHHELD — the stream_session_counts oracle replays exactly
    # the truncated rule (code-review r8 finding: the fixtures carry sub-ms
    # timestamp components, so the raw-us rule differs by up to 999us).
    import datetime

    base = datetime.datetime(2025, 1, 1, 0, 0, 0)
    rows = [
        (1, base + datetime.timedelta(microseconds=500), 1),
        (2, base + datetime.timedelta(minutes=40, microseconds=700), 2),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int")
    p = str(tmp_path / "wm_subms")
    df.coalesce(1).write.parquet(p)
    raw = spark.readStream.schema("user_id int, ts timestamp, event_id int").format(
        "parquet"
    ).load(p)
    agg = (
        raw.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_subms_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # raw-us rule would emit user 1 (end = t0+30min+500us <= t0+30min+700us);
    # the real ms-truncated watermark (t0+30min) withholds it
    assert spark.table("wm_subms_out").count() == 0
