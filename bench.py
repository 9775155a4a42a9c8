#!/usr/bin/env python
"""Benchmark runner: times every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line. Each query is materialized with a noop write (full execution, no
driver-side collect).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from cl_tagger_batch_processing_spark.session import get_spark

    from __spark_entry__ import queries

    spark = get_spark(app_name="bench", cpus=cpus)
    # Warm the machinery every query pays for on first touch (JVM classes,
    # parquet reader, broadcast + window codegen paths) so per-query times
    # measure the query, not session startup.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cl_tagger_batch_processing_spark.sources.tables import load_table

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    (
        warm.join(F.broadcast(region), warm.n_regionkey == region.r_regionkey)
        .withColumn("rn", F.row_number().over(Window.partitionBy("n_regionkey").orderBy("n_nationkey")))
        .groupBy("rn")
        .agg(F.collect_list(F.struct("n_name")).alias("xs"))
        .write.format("noop").mode("overwrite").save()
    )

    times: dict[str, float] = {}
    for name, fn in sorted(queries().items()):
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # a failing query must not sink the whole bench
            times[name] = -1.0
            print(f"# bench error in {name}: {e}", file=sys.stderr)

    total = round(sum(t for t in times.values() if t >= 0), 3)
    # The driver records only the TAIL of stdout, so the giant per-query dict
    # must NOT live on the final line (r3/r4 lost the artifact to head
    # truncation). Emit one small JSON line per query — sorted ascending by
    # time so the expensive queries sit nearest the end and survive any
    # truncation — then END with one small self-contained summary line that
    # always parses.
    for name, t in sorted(times.items(), key=lambda kv: kv[1]):
        print(json.dumps({"query": name, "sec": t}))
    slowest = dict(sorted(times.items(), key=lambda kv: -kv[1])[:20])
    print(
        json.dumps(
            {
                "metric": "sum_query_seconds",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(times),
                "n_errors": sum(1 for t in times.values() if t < 0),
                "queries": slowest,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
