"""Line-oriented text sources: JSONL and CSV readers with explicit schemas.

Source-format breadth beyond the fixture parquet (SURVEY.md §2.1 covers only
the reference's filesystem scan + CSV tag mapping; real corpora arrive as
JSONL/CSV dumps). Readers take an EXPLICIT schema — at 100 TB, schema
inference is a full extra pass over the data and a correctness hazard
(a column that is all-null in the sampled files infers as string), so the
engine never infers.

The ``source_*_roundtrip`` registry queries prove reader fidelity
end-to-end: write the documents fixture to a local staging dir in the
target format at plan-build time (the pipeline_score_tag handoff pattern),
read it back through the declared schema, and aggregate per-language counts
plus an md5-based content checksum that the DuckDB oracle recomputes
directly from the parquet fixture. Any encode/decode corruption — quoting,
escaping, unicode, integer widths — breaks the checksum match.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load_table

DOCUMENTS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"

from ..handoff import staging_path

STAGING_ROOT = staging_path("textfiles")


def write_documents_jsonl(df: DataFrame, path: str) -> None:
    """One JSON object per line, one file per partition — the standard
    corpus-dump layout (each executor writes its own split; no driver
    funnel)."""
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSONL reader with a required schema. ``mode=FAILFAST`` surfaces
    malformed lines as errors instead of silent nulls — at corpus scale a
    permissive reader hides data loss."""
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def write_documents_csv(df: DataFrame, path: str) -> None:
    """CSV with header and full quoting of the text column."""
    df.write.mode("overwrite").option("header", "true").option("quoteAll", "true").csv(
        path
    )


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "FAILFAST")
        .csv(path)
    )


def _roundtrip_agg(docs: DataFrame) -> DataFrame:
    """Per-language fidelity aggregate: counts plus an order-insensitive
    integer checksum over the text bytes (sum of each row's first-8-hex-chars
    of md5 as a bigint — exact integer math, identical in DuckDB)."""
    checksum = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(checksum).alias("text_checksum"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


def write_documents_orc(df: DataFrame, path: str) -> None:
    """ORC with zlib — the columnar interchange format for Hive-ecosystem
    consumers (parquet's peer; both carry column stats for pushdown)."""
    df.write.mode("overwrite").option("compression", "zlib").orc(path)


def read_orc(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).orc(path)


def _staged_roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(STAGING_ROOT, f"{fmt}_{os.path.basename(os.path.normpath(sf_dir))}")
    if fmt == "jsonl":
        write_documents_jsonl(docs, path)
        back = read_jsonl(spark, path, DOCUMENTS_SCHEMA)
    elif fmt == "orc":
        write_documents_orc(docs, path)
        back = read_orc(spark, path, DOCUMENTS_SCHEMA)
    else:
        write_documents_csv(docs, path)
        back = read_csv(spark, path, DOCUMENTS_SCHEMA)
    return _roundtrip_agg(back)


def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → JSONL → read with schema → fidelity aggregate."""
    return _staged_roundtrip(spark, sf_dir, "jsonl")


def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → quoted CSV → read with schema → fidelity aggregate."""
    return _staged_roundtrip(spark, sf_dir, "csv")


def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → ORC → read with schema → fidelity aggregate."""
    return _staged_roundtrip(spark, sf_dir, "orc")


def source_jsonl_corrupt_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE-mode JSONL read with corrupt-record quarantine — the
    other half of the ingest contract (``source_jsonl_roundtrip`` proves
    FAILFAST; real crawl dumps also need the keep-going path).

    The staged dump carries 3 syntactically malformed lines plus 1
    well-formed line with an unconvertible field. PERMISSIVE handling
    differs by class: malformed JSON lands whole in the
    ``columnNameOfCorruptRecord`` column with every schema field null; the
    well-formed line keeps its convertible fields (whether it ALSO sets
    the quarantine column varies with parser minutiae across line
    contents/versions). The report therefore classifies by OBSERVABLE
    field state — fully-null rows vs rows with any required field null —
    which is the robust contract downstream can rely on: at 100 TB a bad
    line must cost one flagged row, not a failed 6-hour job, but every
    damaged row must be COUNTED or permissive mode silently eats data
    loss (why FAILFAST stays the default elsewhere). The oracle knows the
    injected counts as constants and recomputes the good-side aggregate
    from the fixture."""
    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(
        STAGING_ROOT,
        f"jsonl_corrupt_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    write_documents_jsonl(docs, path)
    bad_lines = [
        '{unquoted: true, "text": }',
        "not json at all",
        '{"doc_id": 1,, "lang": "en"}',
        # well-formed, wrong types: doc_id/text/lang null, n_chars parses
        '{"doc_id": "NaN", "text": 12, "lang": ["x"], "source": "bad", "n_chars": 7}',
    ]
    with open(os.path.join(path, "part-corrupt.json"), "w") as f:
        f.write("\n".join(bad_lines) + "\n")
    back = (
        spark.read.schema(DOCUMENTS_SCHEMA + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    required_null = (
        F.col("doc_id").isNull() | F.col("text").isNull() | F.col("lang").isNull()
    )
    damaged = F.col("_corrupt_record").isNotNull() | required_null
    fully_null = (
        F.col("doc_id").isNull()
        & F.col("text").isNull()
        & F.col("lang").isNull()
        & F.col("source").isNull()
        & F.col("n_chars").isNull()
    )
    good = ~damaged
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(damaged, 1).otherwise(0)).cast("bigint").alias("n_damaged"),
        F.sum(F.when(fully_null, 1).otherwise(0)).cast("bigint").alias("n_fully_null"),
        F.sum(F.when(good, 1).otherwise(0)).cast("bigint").alias("n_good"),
        F.sum(F.when(good, F.col("n_chars")).otherwise(0))
        .cast("bigint")
        .alias("sum_chars_good"),
        F.count_distinct(F.when(good, F.col("lang"))).cast("bigint").alias("n_langs"),
    )


def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: two parquet batches with DIFFERENT schemas
    (an early crawl without ``source``/``n_chars``, a later one with them)
    land in one dataset directory; ``mergeSchema`` unifies them at read
    time, with nulls for columns absent in old files.

    This is how a years-old 100-TB dataset actually looks — columns appear
    over time and rewriting history is off the table. mergeSchema pays one
    footer read per file AT PLANNING TIME (no data pass), which is why
    it's an explicit opt-in; the per-lang aggregate counts the synthesized
    nulls so the oracle (which replays the batch split by doc_id parity)
    catches a merge that misaligns or drops either generation."""
    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(
        STAGING_ROOT, f"evolve_{os.path.basename(os.path.normpath(sf_dir))}"
    )
    old = docs.where(F.col("doc_id") % 2 == 0).select("doc_id", "text", "lang")
    new = docs.where(F.col("doc_id") % 2 == 1).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    old.write.mode("overwrite").parquet(os.path.join(path, "batch=old"))
    new.write.mode("overwrite").parquet(os.path.join(path, "batch=new"))
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("source").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_missing_source"),
        F.sum(F.coalesce(F.col("n_chars"), F.lit(0))).alias("sum_chars_new"),
        F.sum(F.length("text")).alias("sum_text_len"),
    )


def write_documents_xml(df: DataFrame, path: str) -> None:
    """XML with one <doc> element per row — Spark 4's built-in XML source
    (the format crawl archives and feed dumps still arrive in)."""
    df.write.mode("overwrite").format("xml").option("rowTag", "doc").save(path)


def read_xml(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return (
        spark.read.schema(schema)
        .format("xml")
        .option("rowTag", "doc")
        .load(path)
    )


def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → XML (rowTag=doc) → read with schema → fidelity
    aggregate. Completes the interchange-format set (JSONL, CSV, ORC,
    XML) on the same checksum contract; XML is the slow-parse format, so
    at 100 TB it is an INGEST format only — convert to parquet at the
    edge, never scan it twice."""
    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(
        STAGING_ROOT, f"xml_{os.path.basename(os.path.normpath(sf_dir))}"
    )
    write_documents_xml(docs, path)
    return _roundtrip_agg(read_xml(spark, path, DOCUMENTS_SCHEMA))
