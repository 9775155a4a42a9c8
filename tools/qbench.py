#!/usr/bin/env python
"""Isolated per-query measurement + plan capture for the optimization rounds.

Usage:
    python tools/qbench.py --plans-dir plans/r13 --suffix before q1 q2 ...
    python tools/qbench.py --runs 3 q1 q2 ...          # timing only
    python tools/qbench.py --runs 0 --suffix after q1  # plans only

Timing methodology matches bench.py exactly: noop-sink materialization on
local[$SPARK_GRAFT_CPUS] over $SPARK_GRAFT_SF_DIR, median of --runs runs.
Plans are captured with explain("formatted") AFTER one materialization so
AQE's final plan is what lands in the file.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from cl_tagger_batch_processing_spark.plans.inspect import (
        count_shuffles,
        formatted_plan,
    )
    from cl_tagger_batch_processing_spark.session import get_spark

    from __spark_entry__ import queries

    spark = get_spark(app_name="qbench", cpus=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm
    qmap = queries()
    for name in args.queries:
        fn = qmap[name]
        spark.sparkContext.setJobDescription(f"qbench:{name}")
        times = []
        for _ in range(max(args.runs, 1 if args.plans_dir else args.runs)):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            # Materialized above at least once; capture the formatted plan
            # (pre-execution initial plan for this fresh df) plus shuffle
            # count of the executed form.
            txt = formatted_plan(df)
            n_shuffles = count_shuffles(df)
            path = os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(
                json.dumps(
                    {
                        "query": name,
                        "runs": times,
                        "median": sorted(times)[len(times) // 2] if times else None,
                        "shuffle_exchanges": n_shuffles,
                        "plan": path,
                    }
                )
            )
        else:
            print(
                json.dumps(
                    {
                        "query": name,
                        "runs": times,
                        "median": sorted(times)[len(times) // 2],
                    }
                )
            )
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
