"""Scaling-efficiency evidence for the north rule: the same extraction job,
same input, at parallelism N (local[8]) and 4N (local[32]); efficiency =
(throughput@4N / throughput@N) / 4, target >= 0.8. Writes BENCH/BASELINE.md.

(This sandbox has no multi-executor cluster — per the round instructions the
two-cluster-size criterion is evidenced with two local parallelism levels.)

Usage: python scripts/bench_scaling.py [sf_dir] [copies]
"""

from __future__ import annotations

import datetime
import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
COPIES = sys.argv[2] if len(sys.argv) > 2 else "10"

BENCH_SNIPPET = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
cpus = int(os.environ["CPUS"])
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from usls_doc_spark.io.synth import pages_from_documents
from usls_doc_spark.pipeline.extract import extract_pages
pages = pages_from_documents(spark, os.environ["SF_DIR"],
                             copies=int(os.environ["COPIES"]),
                             n_partitions=cpus * 4)
pages.persist()
s = pages.agg(F.count(F.lit(1)).alias("n"), F.sum(F.octet_length("html")).alias("b")).collect()[0]
# warmup (JIT, Arrow, python workers), then timed run
extract_pages(pages).write.format("noop").mode("overwrite").save()
t0 = time.monotonic()
extract_pages(pages).write.format("noop").mode("overwrite").save()
dt = time.monotonic() - t0
print(json.dumps({{"cpus": cpus, "docs": s["n"], "mb": s["b"] / 1e6,
                   "sec": dt, "docs_per_sec": s["n"] / dt,
                   "mb_per_sec": s["b"] / 1e6 / dt}}))
spark.stop()
""".format(repo=str(REPO))


def run(cpus: int) -> dict:
    env = {
        "CPUS": str(cpus),
        "SF_DIR": SF_DIR,
        "COPIES": COPIES,
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "HOME": "/root",
        "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", ""),
    }
    out = subprocess.run(
        [sys.executable, "-c", BENCH_SNIPPET], env=env, capture_output=True, text=True
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n = run(8)
    n4 = run(32)
    eff = (n4["docs_per_sec"] / n["docs_per_sec"]) / 4.0
    md = f"""# BENCH — measured baseline & scaling evidence

Generated {datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds")} by scripts/bench_scaling.py.
Input: deterministic synthetic pages from `{SF_DIR}/documents.parquet`
(copies={COPIES}); job = full extraction pipeline (DOM parse -> layout decode
-> abandon filter -> XY-cut -> span assembly) forced end-to-end via noop sink;
one warmup run, then one timed run per parallelism level.

## Throughput scaling (north rule: efficiency >= 0.8 from N to 4N)

| parallelism | docs | input MB | wall sec | docs/sec | MB/sec |
|---|---|---|---|---|---|
| local[8]  (N)  | {n["docs"]} | {n["mb"]:.1f} | {n["sec"]:.2f} | {n["docs_per_sec"]:.0f} | {n["mb_per_sec"]:.1f} |
| local[32] (4N) | {n4["docs"]} | {n4["mb"]:.1f} | {n4["sec"]:.2f} | {n4["docs_per_sec"]:.0f} | {n4["mb_per_sec"]:.1f} |

**Scaling efficiency = ({n4["docs_per_sec"]:.0f} / {n["docs_per_sec"]:.0f}) / 4 = {eff:.3f}**
(target >= 0.8 — {"MET" if eff >= 0.8 else "NOT MET"})

Notes: single-JVM local mode; the sandbox has no multi-executor cluster, so
N->4N executors is evidenced as N->4N local cores on identical input + code
(per round instructions). The reference publishes no numbers (BASELINE.md).
"""
    (REPO / "BENCH" / "BASELINE.md").write_text(md)
    print(md)


if __name__ == "__main__":
    main()
