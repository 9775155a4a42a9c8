"""Result sinks (the reference's S3, appV2.py:178-179).

Two surfaces (SURVEY.md §2.1 S3):

* ``write_sidecar_txt`` — byte-compatible behavior: one ``<basename>.txt``
  per image containing the tag string. Runs on executors as a
  ``mapInPandas`` stage consumed by a SQL aggregation (no driver collect
  of the rows; only one count per partition comes back). The SQL path
  matters beyond style: plan-attached ``Observation`` metrics only fire
  for actions that run through the SQL execution engine, and the previous
  ``DataFrame.foreachPartition`` implementation (an RDD-path action)
  bypassed that listener — ``Observation.get`` after a sidecar-only run
  blocked forever. An output directory must be given — unlike the
  reference, the engine never writes next to read-only inputs.
* ``write_tags_parquet`` — the idiomatic sink: one partitioned columnar
  table of (path, tags_text, status) instead of N tiny files. This is what
  survives 100 TB — millions of sidecar files would crush any filesystem
  metadata service.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_sidecar_txt(tagged: DataFrame, out_dir: str) -> int:
    """Write one ``<basename>.txt`` per row of (path, tags_text).

    Returns the number of sidecars written. Idempotent under task retry
    (same path → same bytes), so speculative/retried tasks are safe.
    """

    def write_batches(batches):
        import pandas as pd  # local import: runs on executors

        os.makedirs(out_dir, exist_ok=True)
        n = 0
        for pdf in batches:
            for path, text in zip(pdf["path"], pdf["tags_text"]):
                base = os.path.splitext(os.path.basename(path))[0]  # appV2.py:178
                with open(os.path.join(out_dir, base + ".txt"), "w", encoding="utf-8") as f:
                    f.write(text if isinstance(text, str) else "")
                n += 1
        yield pd.DataFrame({"n_written": [n]})

    written = tagged.select("path", "tags_text").mapInPandas(
        write_batches, schema="n_written long"
    )
    # SQL action (fires any upstream Observation); one long per partition.
    row = written.agg(F.sum("n_written").alias("n")).collect()[0]
    return int(row["n"] or 0)


def write_tags_parquet(tagged: DataFrame, out_path: str, mode: str = "overwrite") -> None:
    tagged.write.mode(mode).parquet(out_path)
