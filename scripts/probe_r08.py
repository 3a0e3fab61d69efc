"""Round-8 phase probes (guide §1): where does streaming drain time and
per-query constant overhead actually go? Prints JSON lines. Run on a
quiet machine; results feed OPTIMIZATION_r08.md."""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    try:
        avail = sorted(os.sched_getaffinity(0))
        os.sched_setaffinity(0, set(avail[:CPUS]))
    except (AttributeError, OSError):
        pass

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("usls_probe_r08")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    # ---- probe 1: _register_views cost, repeated ----------------------
    if which in ("views", "all"):
        from usls_doc_spark.queries import _register_views

        t0 = time.monotonic()
        _register_views(spark, SF_DIR)
        cold = time.monotonic() - t0
        times = []
        for _ in range(5):
            t0 = time.monotonic()
            _register_views(spark, SF_DIR)
            times.append(round(time.monotonic() - t0, 4))
        print(json.dumps({"probe": "register_views", "cold": round(cold, 3),
                          "warm": times}))

    # ---- probe 2: streaming drains with per-batch breakdown ------------
    def drain_probe(name: str, fn) -> None:
        from pyspark.sql import functions as F  # noqa

        t0 = time.monotonic()
        df = fn(spark, SF_DIR)
        t_setup_and_drain = time.monotonic() - t0
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        t_read = time.monotonic() - t0
        print(json.dumps({"probe": name, "drain": round(t_setup_and_drain, 3),
                          "sink_read": round(t_read, 3)}))

    if which in ("streaming", "all"):
        import usls_doc_spark.streaming.attribution as attr
        import usls_doc_spark.streaming.events as ev

        # wrap start to capture progress
        for name, fn in [
            ("streaming_events_window", ev.streaming_events_window),
            ("streaming_events_hopping", ev.streaming_events_hopping),
            ("streaming_click_attribution", attr.streaming_click_attribution),
            ("streaming_click_attribution_outer",
             attr.streaming_click_attribution_outer),
            ("streaming_click_attribution_full",
             attr.streaming_click_attribution_full),
        ]:
            drain_probe(name, fn)

    # ---- probe 3: progress details for one drained run -----------------
    if which in ("progress", "all"):
        import atexit
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        import usls_doc_spark.streaming.events as ev

        work = tempfile.mkdtemp(prefix="probe_ev_")
        atexit.register(shutil.rmtree, work, ignore_errors=True)
        events_dir = f"{work}/in"
        os.makedirs(events_dir)
        shutil.copy(f"{SF_DIR}/events.parquet", f"{events_dir}/batch0.parquet")
        os.utime(f"{events_dir}/batch0.parquet", (2_000_000_000, 2_000_000_000))
        t0 = time.monotonic()
        max_ts = (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .agg(F.max("ts")).collect()[0][0]
        )
        t_maxts = time.monotonic() - t0
        t0 = time.monotonic()
        ev.write_window_sentinels(spark, events_dir, max_ts)
        t_sent = time.monotonic() - t0
        sink_dir = f"{work}/sink"
        t0 = time.monotonic()
        q = ev.start_window_stream(spark, events_dir, sink_dir,
                                   "probe_events", slide=None,
                                   max_files=1, glob="*.parquet")
        t_start = time.monotonic() - t0
        t0 = time.monotonic()
        q.processAllAvailable()
        t_drain = time.monotonic() - t0
        prog = [
            {
                "batchId": p["batchId"],
                "numInputRows": p.get("numInputRows"),
                "durationMs": p.get("durationMs"),
            }
            for p in (x if isinstance(x, dict) else json.loads(x)
                      for x in q.recentProgress)
        ]
        q.stop()
        print(json.dumps({"probe": "events_window_phases",
                          "max_ts_job": round(t_maxts, 3),
                          "sentinels": round(t_sent, 3),
                          "start": round(t_start, 3),
                          "drain": round(t_drain, 3),
                          "batches": prog}, indent=1))

    spark.stop()


if __name__ == "__main__":
    main()
