"""Per-build staging root for on-disk handoffs.

Several queries stage intermediate relations on local disk: the
pipeline_score_tag float32 kernel output (its PARTIAL oracle replays the
relational tail from those exact values), the exactly-once streaming file
sink, the text-format round-trips, and the layout/compaction fixtures.

All of these used ONE fixed ``/tmp`` path, which collides when two builds
run concurrently on one machine (round-3 verdict). The root is now unique
per (user, checkout): two users, or two checkouts of the repo, get disjoint
staging trees. It is deliberately STABLE across processes of the same
checkout — the pipeline_score_tag oracle reads the parquet the Spark query
wrote, and that handoff must survive a harness that evaluates the two sides
in separate interpreters. (Two concurrent builds of the SAME checkout still
share a root — but they already race on spark-warehouse and checkpoint
dirs; set ``CL_TAGGER_STAGING_DIR`` to isolate such a build completely.)

This module must stay pyspark-free: oracles.py imports it and is consumed
by oracle-only (DuckDB) tooling.
"""

from __future__ import annotations

import getpass
import hashlib
import os
import tempfile

_checkout_tag = hashlib.md5(
    os.path.abspath(os.path.dirname(__file__)).encode("utf-8")
).hexdigest()[:8]

STAGING_ROOT = os.environ.get("CL_TAGGER_STAGING_DIR") or os.path.join(
    tempfile.gettempdir(),
    f"cl_tagger_staging_{getpass.getuser()}_{_checkout_tag}",
)


def staging_path(*parts: str) -> str:
    return os.path.join(STAGING_ROOT, *parts)


PIPELINE_SCORED_PATH = staging_path("pipeline_scored.parquet")
