"""Tag-selection operators — the reference's core "query" re-expressed as
Spark built-ins.

Reference semantics (``/root/reference/appV2.py``):

* ``get_tags`` (appV2.py:74-101): over a per-image probability vector and a
  tag dimension, (A1) take the unconditional top-1 tag for the ``rating`` and
  ``quality`` categories (argmax = first max, i.e. lowest index wins ties,
  appV2.py:80); (F2) for the six threshold categories keep tags with
  ``prob >= threshold`` where general/meta/model use ``gen_threshold`` and
  character/copyright/artist use ``char_threshold`` (appV2.py:86-95);
  (P1) rewrite ``_`` to `` `` in tag names (appV2.py:83,97); (F3) drop
  ``meta`` tags whose lower-cased name *contains* any of
  id/commentary/request/mismatch — substring, not word, match
  (appV2.py:98-99); (A2) join the surviving tags with ``", "`` in a fixed
  order: rating top-1, quality top-1, then the threshold categories in
  dict-literal order (general, meta, model, character, copyright, artist),
  ascending tag index within a category (appV2.py:75-101).
* ``sigmoid`` with ±30 clipping (appV2.py:174).

Spark mapping: the scores arrive long-form ``(image_id, tag_idx, prob)``;
the tag dimension is a small broadcast join (J1/J2, appV2.py:62-71); A1 is a
single hash aggregation on ``max(struct(prob, -tag_idx, ...))`` (no sort, and
the struct ordering reproduces the argmax first-max tie-break); A2 collects
``struct(cat_rank, tag_idx, tag)``, ``array_sort``s, and ``array_join``s —
``collect_list`` order alone is not deterministic after a shuffle, the
explicit sort is what makes the output stable. Everything stays JVM-side
(whole-stage codegen); no Python UDFs.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# appV2.py:63 — dict-literal order of the category index.
CATEGORIES = [
    "rating",
    "general",
    "artist",
    "character",
    "copyright",
    "meta",
    "quality",
    "model",
]
# appV2.py:77 — loop order for the unconditional top-1 categories.
TOP1_CATEGORIES = ["rating", "quality"]
# appV2.py:86-89 — threshold_map keys, in dict-literal (output) order.
GEN_THRESHOLD_CATEGORIES = ["general", "meta", "model"]
CHAR_THRESHOLD_CATEGORIES = ["character", "copyright", "artist"]
# appV2.py:98 — substring blacklist applied to meta tags only.
META_BLACKLIST = ["id", "commentary", "request", "mismatch"]
# Output order: rating, quality (appV2.py:77), then threshold_map order
# (appV2.py:86-89).
OUTPUT_CATEGORY_RANK = {
    "rating": 0,
    "quality": 1,
    "general": 2,
    "meta": 3,
    "model": 4,
    "character": 5,
    "copyright": 6,
    "artist": 7,
}
DEFAULT_GEN_THRESHOLD = 0.55  # appV2.py:126
DEFAULT_CHAR_THRESHOLD = 0.60  # appV2.py:127


def sigmoid_clip(logit: Column) -> Column:
    """``1/(1+exp(-clip(x, -30, 30)))`` — appV2.py:174, clip preserved
    verbatim (it changes values for |logit| > 30)."""
    x = F.greatest(F.least(logit.cast("double"), F.lit(30.0)), F.lit(-30.0))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-x))


def category_rank(category: Column) -> Column:
    """Literal rank map for the deterministic output order (A2)."""
    expr = F.lit(None).cast("int")
    for cat, rank in reversed(OUTPUT_CATEGORY_RANK.items()):
        expr = F.when(category == cat, F.lit(rank)).otherwise(expr)
    return expr


def clean_tag_name(tag_name: Column) -> Column:
    """P1 — ``tag.replace('_', ' ')`` (appV2.py:83,97)."""
    return F.replace(tag_name, F.lit("_"), F.lit(" "))


def meta_blacklisted(category: Column, cleaned_tag: Column) -> Column:
    """F3 — meta tags whose lower-cased cleaned name contains a blacklist
    substring (appV2.py:98-99; bare ``in`` ⇒ substring match)."""
    lowered = F.lower(cleaned_tag)
    hit = reduce(or_, [lowered.contains(s) for s in META_BLACKLIST])
    return (category == "meta") & hit


def top1_per_category(scored: DataFrame, categories: list[str] | None = None) -> DataFrame:
    """A1 — unconditional per-(image, category) top-1 (appV2.py:77-83).

    One hash aggregation, no sort: ``max`` over ``struct(prob, -tag_idx, …)``
    compares field-by-field, so the highest prob wins and exact prob ties go
    to the lowest tag index — the same answer as ``np.argmax``'s first-max
    (appV2.py:80). Ties are common in practice because the ±30 sigmoid clip
    plateaus saturated logits to identical probabilities.

    Input columns: image_id, category, tag_idx, prob, tag (cleaned name).
    """
    cats = categories if categories is not None else TOP1_CATEGORIES
    best = F.max(
        F.struct(
            F.col("prob").alias("prob"),
            (-F.col("tag_idx")).alias("neg_idx"),
            F.col("tag_idx").alias("tag_idx"),
            F.col("tag").alias("tag"),
        )
    ).alias("best")
    return (
        scored.where(F.col("category").isin(cats))
        .groupBy("image_id", "category")
        .agg(best)
        .select(
            "image_id",
            "category",
            F.col("best.tag_idx").alias("tag_idx"),
            F.col("best.tag").alias("tag"),
        )
    )


def threshold_select(
    scored: DataFrame,
    gen_threshold: float = DEFAULT_GEN_THRESHOLD,
    char_threshold: float = DEFAULT_CHAR_THRESHOLD,
) -> DataFrame:
    """F2 + F3 — per-category threshold filter plus the meta substring
    blacklist (appV2.py:86-99). Pure Column predicates: Catalyst pushes the
    category/threshold filter below the aggregation that follows."""
    threshold = F.when(
        F.col("category").isin(GEN_THRESHOLD_CATEGORIES), F.lit(float(gen_threshold))
    ).otherwise(F.lit(float(char_threshold)))
    return (
        scored.where(
            F.col("category").isin(GEN_THRESHOLD_CATEGORIES + CHAR_THRESHOLD_CATEGORIES)
        )
        .where(F.col("prob") >= threshold)
        .where(~meta_blacklisted(F.col("category"), F.col("tag")))
        .select("image_id", "category", "tag_idx", "tag")
    )


def ordered_tag_string(selected: DataFrame) -> DataFrame:
    """A2 — deterministic ordered string aggregation (appV2.py:75-101).

    ``collect_list`` order is shuffle-dependent, so we collect
    ``struct(cat_rank, tag_idx, tag)``, ``array_sort`` (struct comparison is
    lexicographic by field), project the name, and ``array_join``. Output:
    ``(image_id, tags_text)``.
    """
    ranked = selected.withColumn("cat_rank", category_rank(F.col("category")))
    return ranked.groupBy("image_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("cat_rank", "tag_idx", F.col("tag").alias("tag")))
                ),
                lambda s: s["tag"],
            ),
            ", ",
        ).alias("tags_text")
    )


def select_tags(
    scores: DataFrame,
    tag_dim: DataFrame,
    gen_threshold: float = DEFAULT_GEN_THRESHOLD,
    char_threshold: float = DEFAULT_CHAR_THRESHOLD,
    images: DataFrame | None = None,
) -> DataFrame:
    """The full tag-selection query (appV2.py:74-101) over long-form scores.

    ``scores``: (image_id, tag_idx, prob); ``tag_dim``: (tag_idx, tag_name,
    category) — small, broadcast. Indices absent from the dimension are
    never candidates (F4: the reference's category index only contains known
    tags, appV2.py:62-71, so the inner join is the faithful translation of
    its ``names[global_idx]`` guard).

    If ``images`` (a DataFrame with an ``image_id`` column) is given, images
    with zero selected tags still appear with an empty string — the reference
    writes an empty sidecar file for them (appV2.py:101,178-179).

    Scale notes: the dimension join is an explicit broadcast (no shuffle);
    the threshold filter runs before any shuffle so only selected tags move;
    the two aggregations (top-1, final string agg) are the only exchanges.
    """
    scored = (
        scores.join(F.broadcast(tag_dim), "tag_idx", "inner")
        .withColumn("tag", clean_tag_name(F.col("tag_name")))
        .select("image_id", "category", "tag_idx", "prob", "tag")
    )
    out = _select_tags_single_pass(scored, gen_threshold, char_threshold)
    if images is not None:
        out = (
            images.select("image_id")
            .distinct()
            .join(out, "image_id", "left")
            .withColumn("tags_text", F.coalesce(F.col("tags_text"), F.lit("")))
        )
    return out


def _select_tags_single_pass(
    scored: DataFrame, gen_threshold: float, char_threshold: float
) -> DataFrame:
    """A1+F2+F3+A2 in ONE scan of the scores relation and ONE shuffle.

    The naive plan (separate top-1 and threshold branches unioned before the
    final aggregation) recomputes the exploded/joined scores relation per
    branch — at 100 TB that relation (rows × num_tags) is the dominant cost,
    so halving its materializations matters more than any small-side trick.
    Here everything is an aggregate expression of one groupBy(image_id):

    * per top-1 category (rating, quality — a FIXED two-element set,
      appV2.py:77): a conditional max(struct(prob, -tag_idx, …)) whose
      struct comparison reproduces the argmax first-max tie-break
      (appV2.py:80);
    * ``kept`` — collect_list of threshold-surviving (cat_rank, tag_idx,
      tag) structs; the `when` emits NULL for rejected rows and
      collect_list drops NULLs, so the shuffle carries only SELECTED tags.

    The single exchange partitions by image_id; map-side partial
    aggregation compacts each partition's contribution first. The final
    array_sort on (cat_rank, tag_idx) makes the output order deterministic
    (A2) — collect_list order alone is shuffle-dependent.
    """
    threshold = F.when(
        F.col("category").isin(GEN_THRESHOLD_CATEGORIES), F.lit(float(gen_threshold))
    ).otherwise(F.lit(float(char_threshold)))
    is_top1_cat = F.col("category").isin(TOP1_CATEGORIES)
    keeps = (
        ~is_top1_cat
        & (F.col("prob") >= threshold)
        & ~meta_blacklisted(F.col("category"), F.col("tag"))
    )
    rank = category_rank(F.col("category"))
    best_aggs = [
        F.max(
            F.when(
                F.col("category") == cat,
                F.struct(
                    F.col("prob").alias("prob"),
                    (-F.col("tag_idx")).alias("neg_idx"),
                    F.col("tag_idx").alias("tag_idx"),
                    F.col("tag").alias("tag"),
                ),
            )
        ).alias(f"best_{cat}")
        for cat in TOP1_CATEGORIES
    ]
    per_image = scored.groupBy("image_id").agg(
        *best_aggs,
        F.collect_list(
            F.when(
                keeps,
                F.struct(
                    rank.alias("cat_rank"),
                    F.col("tag_idx").alias("tag_idx"),
                    F.col("tag").alias("tag"),
                ),
            )
        ).alias("kept"),
    )
    empty = F.array().cast("array<struct<cat_rank:int,tag_idx:int,tag:string>>")
    top1_arrays = [
        F.when(
            F.col(f"best_{cat}").isNotNull(),
            F.array(
                F.struct(
                    F.lit(OUTPUT_CATEGORY_RANK[cat]).alias("cat_rank"),
                    F.col(f"best_{cat}.tag_idx").alias("tag_idx"),
                    F.col(f"best_{cat}.tag").alias("tag"),
                )
            ),
        ).otherwise(empty)
        for cat in TOP1_CATEGORIES
    ]
    items = F.concat(*top1_arrays, F.col("kept"))
    return per_image.select(
        "image_id",
        F.array_join(
            F.transform(F.array_sort(items), lambda s: s["tag"]), ", "
        ).alias("tags_text"),
    )


# ---------------------------------------------------------------------------
# Flagship demo wiring over the driver fixtures (SURVEY.md §7 Phase 0):
# a deterministic `scores` relation derived from the `embeddings` fixture and
# a literal 62-row tag dimension. Fully oracle-checkable in DuckDB.
# ---------------------------------------------------------------------------

# mod-8 → category, in the appV2.py:63 dict-literal order.
_CATEGORY_BY_MOD = CATEGORIES
DEMO_TAG_COUNT = 62  # indices 62,63 deliberately absent (F4 gap, appV2.py:62-66)
DEMO_LOGIT_SCALE = 100.0  # spreads sigmoid over (0,1) and exercises the ±30 clip


def demo_tag_dim(spark: SparkSession) -> DataFrame:
    """Literal tag dimension: tag_idx 0..61, category = mod-8 bucket, names
    with ``_`` (exercises P1) and some blacklisted meta names (exercises F3).

    Derived JVM-side from ``spark.range`` — a driver ``createDataFrame``
    would serialize Python rows through an RDD for every query invocation;
    range + expressions is pure Catalyst (and constant-foldable)."""
    i = F.col("id")
    category = F.element_at(
        F.array(*[F.lit(c) for c in _CATEGORY_BY_MOD]), (i % 8 + 1).cast("int")
    )
    name = (
        F.when(i % 16 == 5, F.concat(F.lit("meta_id_"), i))
        .when(i % 8 == 5, F.concat(F.lit("meta_plain_"), i))
        .otherwise(F.concat(F.lit("tag_"), i))
    )
    return spark.range(DEMO_TAG_COUNT).select(
        i.cast("int").alias("tag_idx"), name.alias("tag_name"), category.alias("category")
    )


def scores_from_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stand-in for the model-score relation (appV2.py:171-174
    with inference stubbed): posexplode the 64-dim embedding, scale to logits,
    sigmoid with ±30 clip. The explode is partition-local — no shuffle."""
    from ..sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            F.col("vec_id").alias("image_id"),
            F.posexplode("embedding").alias("tag_idx", "raw"),
        )
        .withColumn("logit", F.col("raw").cast("double") * F.lit(DEMO_LOGIT_SCALE))
        .select("image_id", "tag_idx", sigmoid_clip(F.col("logit")).alias("prob"))
    )


def flagship_tag_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §3.3 flagship query end-to-end: (image_id, tags_text)."""
    return select_tags(scores_from_embeddings(spark, sf_dir), demo_tag_dim(spark))
