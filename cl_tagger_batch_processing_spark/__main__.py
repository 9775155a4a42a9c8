"""Batch CLI — the reference's interactive ``main()`` (appV2.py:103-191)
with the same parameter surface, flag-driven instead of prompt-driven:

    python -m cl_tagger_batch_processing_spark \
        --folder /data/images --recursive \
        --model-dir /models/cl_tagger_1_02 \
        --gen-thresh 0.55 --char-thresh 0.60 \
        --out-dir /data/tags

Parameter mapping to the reference:

* model pick (appV2.py:109-119)  → ``--model-dir`` holding ``model.onnx``
  + ``tag_mapping.json``; without onnxruntime (or without the flag) the
  deterministic StubScorer + demo tag dimension run instead, so the full
  pipeline is exercisable anywhere.
* gen/char thresholds (126-127)  → ``--gen-thresh`` / ``--char-thresh``
  (same 0.55 / 0.60 defaults).
* folder + recursive (128-129)   → ``--folder`` / ``--recursive``.
* sidecar .txt outputs (178-179) → ``--out-dir`` (the engine never writes
  next to read-only inputs); ``--parquet-out`` adds the columnar sink.
* success/failure counters + timing (186-190) → printed summary.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m cl_tagger_batch_processing_spark",
        description="Batch image tagging on Spark (reference parameter surface).",
    )
    p.add_argument("--folder", required=True, help="image folder to tag")
    p.add_argument(
        "--recursive", action="store_true", help="recurse into subfolders"
    )
    p.add_argument(
        "--model-dir",
        default=None,
        help="directory with model.onnx + tag_mapping.json (needs onnxruntime); "
        "omit to run the deterministic stub scorer + demo tag dimension",
    )
    p.add_argument("--gen-thresh", type=float, default=None, help="general threshold [0.55]")
    p.add_argument("--char-thresh", type=float, default=None, help="character threshold [0.60]")
    p.add_argument("--out-dir", default=None, help="sidecar .txt output directory")
    p.add_argument("--parquet-out", default=None, help="parquet output path")
    p.add_argument("--batch-size", type=int, default=32, help="scoring batch size")
    p.add_argument("--master", default=None, help="Spark master (default local[cpus])")
    p.add_argument("--cpus", type=int, default=None, help="local parallelism")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not args.out_dir and not args.parquet_out:
        print("error: at least one of --out-dir / --parquet-out is required", file=sys.stderr)
        return 2

    # Heavy imports after argparse so `--help` stays instant.
    from .kernels.scoring import HAS_ORT, OnnxScorer, StubScorer
    from .operators.tagging import (
        DEFAULT_CHAR_THRESHOLD,
        DEFAULT_GEN_THRESHOLD,
        demo_tag_dim,
    )
    from .pipeline import observe_status, tag_images
    from .session import get_spark
    from .sources.sinks import write_sidecar_txt, write_tags_parquet
    from .sources.tag_mapping import load_tag_dim

    gen_thresh = DEFAULT_GEN_THRESHOLD if args.gen_thresh is None else args.gen_thresh
    char_thresh = DEFAULT_CHAR_THRESHOLD if args.char_thresh is None else args.char_thresh

    from pyspark.sql import SparkSession

    # Reuse an active session if the caller (tests, a notebook) owns one —
    # and then do NOT stop it on exit; the CLI only tears down sessions it
    # itself created.
    owns_session = SparkSession.getActiveSession() is None
    # --master threads through get_spark so both paths share one config
    # surface (UTC timezone, Arrow, AQE, nanosAsLong, shuffle partitions);
    # --cpus still sizes shuffle partitions under an explicit master.
    spark = get_spark(app_name="cl_tagger_cli", cpus=args.cpus, master=args.master)

    scorer = None
    if args.model_dir:
        model_path = os.path.join(args.model_dir, "model.onnx")
        mapping_path = os.path.join(args.model_dir, "tag_mapping.json")
        if not os.path.exists(model_path):  # appV2.py:118-120
            print(f"error: model file not found: {model_path}", file=sys.stderr)
            return 2
        if not HAS_ORT:
            print("error: --model-dir given but onnxruntime is not installed", file=sys.stderr)
            return 2
        scorer = OnnxScorer(model_path)
        tag_dim = load_tag_dim(spark, mapping_path)
    else:
        scorer = StubScorer()
        tag_dim = demo_tag_dim(spark)
        print("note: no --model-dir; running deterministic stub scorer + demo tag dim")

    t0 = time.time()
    try:
        result = tag_images(
            spark,
            args.folder,
            tag_dim,
            gen_threshold=gen_thresh,
            char_threshold=char_thresh,
            recursive=args.recursive,
            scorer=scorer,
            batch_size=args.batch_size,
            fail_on_empty=True,  # appV2.py:139-141
        )
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1

    observed, obs = observe_status(result)
    if args.parquet_out:
        write_tags_parquet(observed, args.parquet_out)
        if args.out_dir:
            # Counters already accumulated by the parquet action; reuse the
            # written table for the sidecars rather than re-scoring.
            write_sidecar_txt(spark.read.parquet(args.parquet_out), args.out_dir)
    else:
        write_sidecar_txt(observed, args.out_dir)

    metrics = obs.get
    elapsed = time.time() - t0
    n_total = metrics["n_total"] or 0
    print(f"total: {elapsed:.2f}s"
          + (f" (avg {elapsed / n_total:.2f}s/image)" if n_total else ""))
    print(f"success: {metrics['n_ok']}, failed: {metrics['n_error']}")  # appV2.py:190
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
