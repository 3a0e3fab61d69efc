"""Round-8 optimization harness (guide §1): isolate individual registry
queries with the noop sink, capture `.explain("formatted")` plans, and
time them under the SAME session config bench.py uses. bench.py itself is
FROZEN for measurement — this file exists so plan captures and per-query
A/B timings never touch it.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    python bench_extra.py [--plans-dir plans/r08 --suffix before] \
    [--repeats 2] query1 query2 ...

  `--plan-only` captures plans without timing (fast).
  `--streaming` marks queries as streaming (timed once, no plan capture
  of the drained sink read-back being meaningless for plan audits).

Prints one JSON line per query: {"query": name, "secs": [..], "best": s}.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--plan-only", action="store_true")
    ap.add_argument("--streaming", action="store_true")
    args = ap.parse_args()

    try:
        avail = sorted(os.sched_getaffinity(0))
        os.sched_setaffinity(0, set(avail[:CPUS]))
    except (AttributeError, OSError):
        pass

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("usls_doc_spark_bench_extra")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from usls_doc_spark.queries import build_registry

    queries, _ = build_registry()

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for name in args.queries:
        if name not in queries:
            print(json.dumps({"query": name, "error": "unknown"}))
            continue
        if args.plans_dir:
            pdir = pathlib.Path(args.plans_dir)
            pdir.mkdir(parents=True, exist_ok=True)
            df = queries[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (pdir / f"{name}_{args.suffix}.txt").write_text(plan)
        if args.plan_only:
            print(json.dumps({"query": name, "plan": "captured"}))
            continue
        spark.sparkContext.setJobDescription(f"r08 {name}")
        secs = []
        n = 1 if args.streaming else args.repeats
        for _ in range(n):
            t0 = time.monotonic()
            noop(queries[name](spark, SF_DIR))
            secs.append(round(time.monotonic() - t0, 3))
        print(json.dumps({"query": name, "secs": secs, "best": min(secs)}))
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
