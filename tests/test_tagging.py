"""Tag-selection semantics tests (SURVEY.md §5.2-5.3).

Pins the behaviors DuckDB-oracle checks alone would not localize: A1
tie-break, F2 thresholds, F3 substring blacklist, F4 missing-dimension
indices, P1 name cleanup, A2 deterministic ordering, empty-image handling.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cl_tagger_batch_processing_spark.operators import tagging


def _dim(spark, rows):
    return spark.createDataFrame(rows, "tag_idx int, tag_name string, category string")


def _scores(spark, rows):
    return spark.createDataFrame(rows, "image_id bigint, tag_idx int, prob double")


def test_sigmoid_clip_edges(spark):
    df = spark.createDataFrame([(x,) for x in [-100.0, -30.0, 0.0, 30.0, 100.0]], "x double")
    vals = [r[0] for r in df.select(tagging.sigmoid_clip(F.col("x")).alias("p")).collect()]
    lo = 1.0 / (1.0 + math.exp(30.0))
    hi = 1.0 / (1.0 + math.exp(-30.0))
    assert vals[0] == pytest.approx(lo)  # clipped at -30 (appV2.py:174)
    assert vals[1] == pytest.approx(lo)
    assert vals[2] == pytest.approx(0.5)
    assert vals[3] == pytest.approx(hi)
    assert vals[4] == pytest.approx(hi)  # clipped at +30


def test_top1_tie_break_lowest_index(spark):
    # np.argmax takes the FIRST max (appV2.py:80) → lowest tag_idx wins ties.
    dim = _dim(spark, [(1, "r_b", "rating"), (2, "r_a", "rating"), (3, "q", "quality")])
    scores = _scores(spark, [(1, 1, 0.9), (1, 2, 0.9), (1, 3, 0.5)])
    out = tagging.select_tags(scores, dim).collect()
    assert len(out) == 1
    assert out[0]["tags_text"] == "r b, q"  # idx 1 beats idx 2 on the tie; P1 cleans '_'


def test_threshold_boundaries_inclusive(spark):
    # prob >= threshold (appV2.py:93) — boundary values are kept.
    dim = _dim(
        spark,
        [
            (0, "r", "rating"),
            (1, "gen_at", "general"),
            (2, "gen_below", "general"),
            (3, "char_at", "character"),
            (4, "char_below", "character"),
        ],
    )
    scores = _scores(
        spark,
        [(1, 0, 0.1), (1, 1, 0.55), (1, 2, 0.549999), (1, 3, 0.60), (1, 4, 0.599999)],
    )
    out = tagging.select_tags(scores, dim).collect()[0]["tags_text"]
    assert out == "r, gen at, char at"


def test_meta_blacklist_is_substring_not_word(spark):
    # 'holiday' contains 'id' → dropped; blacklist only applies to meta
    # (appV2.py:98-99).
    dim = _dim(
        spark,
        [
            (0, "r", "rating"),
            (1, "holiday", "meta"),
            (2, "commentary_track", "meta"),
            (3, "clean_meta", "meta"),
            (4, "holiday", "general"),  # same name, non-meta → kept
        ],
    )
    scores = _scores(spark, [(1, 0, 0.9), (1, 1, 0.99), (1, 2, 0.99), (1, 3, 0.99), (1, 4, 0.99)])
    out = tagging.select_tags(scores, dim).collect()[0]["tags_text"]
    assert out == "r, holiday, clean meta"


def test_output_category_order_and_index_order(spark):
    # rating, quality, general, meta, model, character, copyright, artist;
    # ascending tag_idx within category (appV2.py:75-101).
    rows = [
        (10, "a_art", "artist"),
        (11, "c_char", "character"),
        (12, "cp", "copyright"),
        (13, "g2", "general"),
        (3, "g1", "general"),
        (14, "m_meta", "meta"),
        (15, "mdl", "model"),
        (16, "q", "quality"),
        (17, "r", "rating"),
    ]
    dim = _dim(spark, [(i, n, c) for (i, n, c) in rows])
    scores = _scores(spark, [(7, i, 0.99) for (i, _, _) in rows])
    out = tagging.select_tags(scores, dim).collect()[0]["tags_text"]
    assert out == "r, q, g1, g2, m meta, mdl, c char, cp, a art"


def test_missing_dim_index_ignored(spark):
    # Indices absent from the dimension are never candidates (F4,
    # appV2.py:62-71): even a prob=1.0 unknown index contributes nothing.
    dim = _dim(spark, [(0, "r", "rating")])
    scores = _scores(spark, [(1, 0, 0.2), (1, 999, 1.0)])
    out = tagging.select_tags(scores, dim).collect()
    assert out[0]["tags_text"] == "r"


def test_images_with_no_tags_get_empty_string(spark):
    # The reference writes an empty sidecar for tagless images (appV2.py:101).
    dim = _dim(spark, [(0, "g", "general")])
    scores = _scores(spark, [(1, 0, 0.99), (2, 0, 0.01)])
    images = spark.createDataFrame([(1,), (2,)], "image_id bigint")
    out = {r["image_id"]: r["tags_text"] for r in tagging.select_tags(scores, dim, images=images).collect()}
    assert out == {1: "g", 2: ""}


def test_flagship_runs_on_fixtures(spark, sf_dir):
    df = tagging.flagship_tag_select(spark, sf_dir)
    assert df.columns == ["image_id", "tags_text"]
    n = df.count()
    assert n == 500  # one row per embeddings vec_id at sf0.001
