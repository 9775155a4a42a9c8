"""Multimodal column handling: opaque binary payloads + typed metadata.

Extension surface (BASELINE.json north-star). The pattern the reference
implies (appV2.py:167: bytes → decode → features) generalized to columns:
binary payloads travel as ``BinaryType`` beside relational columns; metadata
extraction is pure Column expressions; feature extraction crosses into
Python exactly once via an Arrow-batched ``mapInPandas``.

The fixtures carry no real image bytes, so the binary payload is the UTF-8
encoding of ``documents.text`` — the Spark-side plumbing (schema, batching,
partitioning) is identical to what real image/audio bytes would use. The
actual image decode lives in ``kernels.preprocess`` (PIL-gated).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

HIST_BINS = 16


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary column (stand-in for image/audio bytes)."""
    return docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("content"))


def mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over a binary column without touching Python: byte
    length, magic-byte prefix, container sniff. On real files the same
    expressions run over ``binaryFile.content``."""
    docs = load_table(spark, sf_dir, "documents")
    payload = with_binary_payload(docs)
    magic = F.substring(F.lower(F.hex(F.col("content"))), 1, 8)
    kind = (
        F.when(magic.startswith("ffd8"), F.lit("jpeg"))
        .when(magic == "89504e47", F.lit("png"))
        .when(magic.startswith("47494638"), F.lit("gif"))
        .otherwise(F.lit("other"))
    )
    return payload.select(
        "doc_id",
        F.octet_length(F.col("content")).cast("bigint").alias("n_bytes"),
        magic.alias("magic_hex"),
        kind.alias("kind"),
    )


def mm_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via Arrow-batched
    ``mapInPandas``: 16-bin byte histogram + Shannon entropy per payload.

    This is the engine's one sanctioned Python boundary shape (SURVEY.md
    §2.9): batch-in/batch-out, per-partition, no driver collect. Swapping
    the histogram for a real image decode (kernels.preprocess) changes only
    the function body, not the plan.
    """
    docs = load_table(spark, sf_dir, "documents")
    payload = with_binary_payload(docs)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hists = []
            entropies = []
            for content in pdf["content"]:
                b = bytes(content)
                hist = [0] * HIST_BINS
                for byte in b:
                    hist[byte * HIST_BINS // 256] += 1
                n = len(b) or 1
                ent = -sum((c / n) * math.log2(c / n) for c in hist if c)
                hists.append(hist)
                entropies.append(round(ent, 6))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "hist": hists, "entropy": entropies}
            )

    return payload.mapInPandas(
        extract, schema="doc_id bigint, hist array<bigint>, entropy double"
    )
