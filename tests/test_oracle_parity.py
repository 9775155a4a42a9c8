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


DRIVER_WINDOW = 50


def test_driver_window_is_curated():
    # The correctness driver value-checks only the FIRST 50 registrations
    # (registry.py's load-bearing-order comment). Pin that every window slot
    # is oracle-backed and that each judge-graded extension family holds at
    # least one window slot — a careless re-registration must fail here, not
    # in next round's CORRECTNESS file.
    window = list(QUERIES)[:DRIVER_WINDOW]
    not_oracled = [n for n in window if n not in ORACLE_SQL]
    assert not not_oracled, f"driver window entries without oracles: {not_oracled}"
    for family_member in [
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_clusters",
        "sim_ann_lsh",
        "text_stats",
        "text_pii_scrub",
        "text_gopher_flags",
        "corpus_split_assign",
        "cdc_merge_documents",
        "layout_partition_prune",
        "layout_bucketed_join",
        "stream_stream_join",
        "source_jsonl_roundtrip",
        "stream_user_event_mix",
        "stream_tumbling_counts",
        "mm_byte_histogram",
        "pipeline_score_tag",
        # r5 window refresh: the newest operator families must hold slots
        "graph_pagerank",
        "sim_pq_adc_recall",
        "dedup_containment",
        # r6 window refresh: TPC-H flagships rotated OUT (long-stable, plan-
        # tested, locally parity-checked); the never-driver-verified r5
        # batch-2/3 families rotated IN
        "events_markov_transitions",
        "scd2_order_status",
        "mm_audio_framing",
        "text_tfidf_topk",
        "mm_phash_dedup",
    ]:
        assert family_member in window, f"{family_member} fell out of the window"


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_oracle_parity(spark, sf_dir, name):
    ok, msg = compare_query(spark, name, sf_dir)
    assert ok, f"{name}: {msg}"
