"""Result sinks (the reference's S3, appV2.py:178-179).

Two surfaces (SURVEY.md §2.1 S3):

* ``write_sidecar_txt`` — byte-compatible behavior: one ``<basename>.txt``
  per image containing the tag string. Runs on executors via
  ``foreachPartition`` (no driver collect); an output directory must be
  given — unlike the reference, the engine never writes next to read-only
  inputs.
* ``write_tags_parquet`` — the idiomatic sink: one partitioned columnar
  table of (path, tags_text, status) instead of N tiny files. This is what
  survives 100 TB — millions of sidecar files would crush any filesystem
  metadata service.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_sidecar_txt(tagged: DataFrame, out_dir: str) -> None:
    """Write one ``<basename>.txt`` per row of (path, tags_text)."""

    def write_partition(rows) -> None:
        os.makedirs(out_dir, exist_ok=True)
        for row in rows:
            base = os.path.splitext(os.path.basename(row["path"]))[0]  # appV2.py:178
            with open(os.path.join(out_dir, base + ".txt"), "w", encoding="utf-8") as f:
                f.write(row["tags_text"] or "")

    tagged.select("path", "tags_text").foreachPartition(write_partition)


def write_tags_parquet(tagged: DataFrame, out_path: str, mode: str = "overwrite") -> None:
    tagged.write.mode(mode).parquet(out_path)
