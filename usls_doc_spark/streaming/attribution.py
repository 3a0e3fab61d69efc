"""Custom streaming operator #3: stream-stream interval JOIN — view-to-
purchase attribution (every purchase within 2 hours of a same-user view).

The reference's pipeline is single-process batch; this is the Spark-native
operator its event-log consumers would need at crawl scale: TWO watermarked
streams joined on an equi-key (user_id) plus an event-time interval bound.
Structured Streaming buffers both sides' state, shuffles both streams on
the join key, and the watermark + time bound let it EVICT view state older
than (watermark - 2 h) — so state is bounded at any stream length, the
property that makes this run forever on a real cluster.

Determinism contract: the joined row set is a pure function of the input
(inner join, no arbitrary-arrival choice), so the drained stream equals
the batch interval join at ANY micro-batch split — the DuckDB oracle is
the batch SQL. Cross-batch buffering (a view arriving in micro-batch 1
matched by a purchase in micro-batch 2) is exercised deterministically in
tests/test_streaming_attribution.py via a time-ordered 2-file split.

Sink discipline: append-mode foreachBatch parquet (executor-side write,
never driver memory), zero-batch guarded by read_sink_or_empty.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)

ATTRIBUTION_OUT_SCHEMA = (
    "view_id bigint, purchase_id bigint, user_id bigint, "
    "view_ts timestamp, purchase_ts timestamp, lag_ms bigint"
)

WINDOW_MINUTES = 120

_QUERY_NAME = "usls_stream_attribution"


def _event_stream(spark: SparkSession, events_dir: str, glob: str,
                  max_files: int | None):
    reader = spark.readStream.schema(EVENTS_SCHEMA).option("pathGlobFilter", glob)
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", max_files)
    return reader.parquet(events_dir)


def start_attribution_stream(spark: SparkSession, events_dir: str,
                             sink_dir: str, query_name: str = _QUERY_NAME,
                             max_files: int | None = None,
                             glob: str = "events.parquet"):
    """Start the two-stream interval join, appending matched pairs to
    ``sink_dir`` per micro-batch (executor-side parquet, no driver sink)."""
    for q in spark.streams.active:
        if q.name == query_name:
            q.stop()
    views = (
        _event_stream(spark, events_dir, glob, max_files)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("view_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        _event_stream(spark, events_dir, glob, max_files)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        F.expr(
            f"""view_user = user_id
                AND purchase_ts >= view_ts
                AND purchase_ts <= view_ts + INTERVAL {WINDOW_MINUTES} MINUTES"""
        ),
        "inner",
    ).select(
        "view_id",
        "purchase_id",
        "user_id",
        "view_ts",
        "purchase_ts",
        (F.unix_millis("purchase_ts") - F.unix_millis("view_ts")).alias("lag_ms"),
    )

    def _append(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(sink_dir)

    return (
        joined.writeStream.outputMode("append")
        .foreachBatch(_append)
        .queryName(query_name)
        .start()
    )


def streaming_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the stream over the events table and return the matched
    pairs — exactly the batch interval join (ATTRIBUTION_ORACLE)."""
    import atexit

    sink_dir = tempfile.mkdtemp(prefix="usls_stream_attr_")
    shutil.rmtree(sink_dir, ignore_errors=True)
    atexit.register(shutil.rmtree, sink_dir, ignore_errors=True)
    q = start_attribution_stream(spark, sf_dir, sink_dir)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    from .sink import read_sink_or_empty

    return read_sink_or_empty(spark, sink_dir, ATTRIBUTION_OUT_SCHEMA)


# the batch equivalent the drained stream must converge to (inner interval
# join is a pure function of the input — no arbitrary-arrival semantics)
ATTRIBUTION_ORACLE = f"""
SELECT v.event_id AS view_id,
       p.event_id AS purchase_id,
       v.user_id,
       v.ts AS view_ts,
       p.ts AS purchase_ts,
       epoch_ms(p.ts) - epoch_ms(v.ts) AS lag_ms
FROM events v JOIN events p ON v.user_id = p.user_id
WHERE v.event_type = 'view' AND p.event_type = 'purchase'
  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL {WINDOW_MINUTES} MINUTE
"""
