"""Property-based tests (SURVEY.md §5.3): the Spark tag selection must agree
with a direct Python transcription of the reference semantics
(appV2.py:74-101) on arbitrary inputs, and selection invariants must hold.

Probabilities are drawn from a discrete grid so exact ties (the argmax
tie-break path) occur frequently.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cl_tagger_batch_processing_spark.operators.tagging import (
    CATEGORIES,
    META_BLACKLIST,
    OUTPUT_CATEGORY_RANK,
    select_tags,
)

GRID = [0.0, 0.1, 0.3, 0.5, 0.55, 0.6, 0.9, 1.0]
NAMES = ["alpha_x", "beta", "holiday", "commentary_y", "plain", "gamma_z"]


def reference_get_tags(probs: dict[int, float], dim: dict[int, tuple[str, str]], gen: float, char: float) -> str:
    """Direct transcription of appV2.py:74-101 over long-form inputs."""
    by_cat: dict[str, list[int]] = {c: [] for c in CATEGORIES}
    for idx in sorted(dim):
        by_cat[dim[idx][1]].append(idx)
    tags = []
    for cat in ["rating", "quality"]:
        idxs = [i for i in by_cat[cat] if i in probs]
        if idxs:
            best = max(idxs, key=lambda i: (probs[i], -i))  # first max wins
            tags.append(dim[best][0].replace("_", " "))
    thresholds = {"general": gen, "meta": gen, "model": gen,
                  "character": char, "copyright": char, "artist": char}
    for cat, thresh in thresholds.items():
        for i in by_cat[cat]:
            if i in probs and probs[i] >= thresh:
                tag = dim[i][0].replace("_", " ")
                if cat == "meta" and any(x in tag.lower() for x in META_BLACKLIST):
                    continue
                tags.append(tag)
    return ", ".join(tags)


@st.composite
def tag_problem(draw):
    n_tags = draw(st.integers(2, 10))
    dim = {}
    for i in range(n_tags):
        name = draw(st.sampled_from(NAMES)) + f"_{i}"
        cat = draw(st.sampled_from(CATEGORIES))
        dim[i] = (name, cat)
    n_images = draw(st.integers(1, 3))
    scores = {}
    for img in range(n_images):
        present = draw(st.lists(st.sampled_from(range(n_tags)), min_size=1, unique=True))
        scores[img] = {i: draw(st.sampled_from(GRID)) for i in present}
    return dim, scores


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(tag_problem())
def test_matches_reference_semantics(spark, problem):
    dim, scores = problem
    dim_df = spark.createDataFrame(
        [(i, n, c) for i, (n, c) in dim.items()], "tag_idx int, tag_name string, category string"
    )
    score_rows = [
        (img, i, p) for img, by_idx in scores.items() for i, p in by_idx.items()
    ]
    scores_df = spark.createDataFrame(score_rows, "image_id bigint, tag_idx int, prob double")
    images_df = spark.createDataFrame([(i,) for i in scores], "image_id bigint")
    got = {
        r.image_id: r.tags_text
        for r in select_tags(scores_df, dim_df, images=images_df).collect()
    }
    expected = {
        img: reference_get_tags(by_idx, dim, 0.55, 0.60) for img, by_idx in scores.items()
    }
    assert got == expected


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(tag_problem())
def test_selection_invariants(spark, problem):
    dim, scores = problem
    dim_df = spark.createDataFrame(
        [(i, n, c) for i, (n, c) in dim.items()], "tag_idx int, tag_name string, category string"
    )
    scores_df = spark.createDataFrame(
        [(img, i, p) for img, by_idx in scores.items() for i, p in by_idx.items()],
        "image_id bigint, tag_idx int, prob double",
    )
    out = {r.image_id: r.tags_text for r in select_tags(scores_df, dim_df).collect()}
    # names are unique per idx (suffix _{i}), so name → (idx, category) is a bijection
    by_name = {n.replace("_", " "): (i, c) for i, (n, c) in dim.items()}
    for img, text in out.items():
        tags = text.split(", ") if text else []
        assert len(tags) == len(set(tags))  # a tag appears at most once
        cats = [by_name[t][1] for t in tags]
        # ≤1 tag from each top-1 category (rating/quality emit at most one)
        assert cats.count("rating") <= 1 and cats.count("quality") <= 1
        # blacklisted meta names never appear
        for t in tags:
            idx, cat = by_name[t]
            if cat == "meta":
                assert not any(x in t.lower() for x in META_BLACKLIST)
            # thresholded categories only emit tags meeting their threshold
            if cat in ("general", "meta", "model"):
                assert scores[img][idx] >= 0.55
            elif cat in ("character", "copyright", "artist"):
                assert scores[img][idx] >= 0.60
        # output respects the reference's category-rank order, ascending idx
        keys = [(OUTPUT_CATEGORY_RANK[c], by_name[t][0]) for t, c in zip(tags, cats)]
        assert keys == sorted(keys)
