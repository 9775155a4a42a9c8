"""DuckDB oracle SQL for every SQL-expressible query in the registry.

The driver runs each registry query on Spark and the same-named SQL here on
DuckDB (views ``region nation customer supplier part orders lineitem events
documents embeddings`` over the same parquet), then compares row count,
schema, and an order-insensitive value hash. Column names are aliased
identically on both sides — the compare sorts columns by name.

Shared fragments keep the synthetic relations (demo scores / tag dimension)
textually identical across queries.
"""

# Long-form deterministic scores derived from `embeddings` — the stand-in for
# the reference's model output (appV2.py:171-174 with inference stubbed).
# Mirrors operators.tagging.scores_from_embeddings.
SCORES_CTE = """
raw_scores AS (
  SELECT vec_id AS image_id,
         generate_subscripts(embedding, 1) - 1 AS tag_idx,
         CAST(unnest(embedding) AS DOUBLE) * 100.0 AS logit
  FROM embeddings
),
scores AS (
  SELECT image_id, tag_idx,
         1.0 / (1.0 + exp(-greatest(least(logit, 30.0), -30.0))) AS prob
  FROM raw_scores
)
"""

# Mirrors operators.tagging.demo_tag_dim (62 rows; idx 62,63 absent = F4 gap).
TAG_DIM_CTE = """
tag_dim AS (
  SELECT CAST(i AS INTEGER) AS tag_idx,
         CASE i % 8 WHEN 0 THEN 'rating' WHEN 1 THEN 'general'
                    WHEN 2 THEN 'artist' WHEN 3 THEN 'character'
                    WHEN 4 THEN 'copyright' WHEN 5 THEN 'meta'
                    WHEN 6 THEN 'quality' ELSE 'model' END AS category,
         CASE WHEN i % 8 = 5 THEN
                CASE WHEN i % 16 = 5 THEN 'meta_id_' || i ELSE 'meta_plain_' || i END
              ELSE 'tag_' || i END AS tag_name
  FROM range(62) t(i)
)
"""

# scores ⋈ tag_dim with the P1 name cleanup applied (appV2.py:83,97).
SCORED_CTE = """
scored AS (
  SELECT s.image_id, s.tag_idx, s.prob, d.category,
         replace(d.tag_name, '_', ' ') AS tag
  FROM scores s JOIN tag_dim d USING (tag_idx)
)
"""

# A1 — per-(image, category) top-1, argmax first-max tie-break (appV2.py:77-83).
TOP1_CTE = """
top1 AS (
  SELECT image_id, category, tag_idx, tag
  FROM (SELECT *, row_number() OVER (PARTITION BY image_id, category
                                     ORDER BY prob DESC, tag_idx ASC) AS rn
        FROM scored WHERE category IN ('rating','quality'))
  WHERE rn = 1
)
"""

# F2 + F3 — thresholds and meta substring blacklist (appV2.py:86-99).
THRESH_CTE = """
thresh AS (
  SELECT image_id, category, tag_idx, tag
  FROM scored
  WHERE ((category IN ('general','meta','model') AND prob >= 0.55)
      OR (category IN ('character','copyright','artist') AND prob >= 0.60))
    AND NOT (category = 'meta' AND (lower(tag) LIKE '%id%'
                                 OR lower(tag) LIKE '%commentary%'
                                 OR lower(tag) LIKE '%request%'
                                 OR lower(tag) LIKE '%mismatch%'))
)
"""

_DEMO_BASE = f"WITH {SCORES_CTE.strip()},\n{TAG_DIM_CTE.strip()},\n{SCORED_CTE.strip()}"

ORACLE_SQL: dict[str, str] = {}

# --- tagging (reference core, appV2.py:74-101) -----------------------------

ORACLE_SQL["tag_select"] = f"""
{_DEMO_BASE},
{TOP1_CTE.strip()},
{THRESH_CTE.strip()},
selected AS (
  SELECT image_id,
         CASE category WHEN 'rating' THEN 0 WHEN 'quality' THEN 1
                       WHEN 'general' THEN 2 WHEN 'meta' THEN 3
                       WHEN 'model' THEN 4 WHEN 'character' THEN 5
                       WHEN 'copyright' THEN 6 ELSE 7 END AS cat_rank,
         tag_idx, tag
  FROM (SELECT * FROM top1 UNION ALL SELECT * FROM thresh)
)
SELECT image_id, string_agg(tag, ', ' ORDER BY cat_rank, tag_idx) AS tags_text
FROM selected
GROUP BY image_id
"""

ORACLE_SQL["tag_top1_rating_quality"] = f"""
{_DEMO_BASE},
{TOP1_CTE.strip()}
SELECT image_id, category, tag_idx, tag FROM top1
"""

ORACLE_SQL["tag_threshold_filter"] = f"""
{_DEMO_BASE},
{THRESH_CTE.strip()}
SELECT image_id, category, tag_idx, tag FROM thresh
"""
