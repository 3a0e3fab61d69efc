"""Structured Streaming: watermarked tumbling-window aggregation over the
events table, driven to completion against the parquet file source.

The reference's streaming analogue is the DataLoader producer/consumer
pipeline (/root/reference/src/misc/dataloader.rs:234-331 — bounded-channel
batches). Spark-first re-expression: readStream -> withWatermark ->
window agg -> foreachBatch overwrite sink (executor-side parquet write,
NO driver-memory sink — same discipline as streaming/dedup.py; complete
mode rewrites the full aggregate per trigger, and its cardinality is
windows x event types, so the per-trigger overwrite is bounded). The
batch query events_tumbling_window (operators/relational.py) is the exact
batch equivalent the oracle checks; this streaming version must produce
identical rows.

Late-data semantics (append mode + watermark eviction) are exercised
deterministically in tests/test_streaming_sessionize.py::
test_watermark_drops_late_events via a controlled 2-file micro-batch
split.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sink import read_sink_or_empty

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)

WINDOW_OUT_SCHEMA = (
    "win_start timestamp, event_type string, n bigint, total_value double"
)

_QUERY_NAME = "usls_stream_events_window"


def streaming_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the windowed aggregation as a streaming query to completion and
    return the (batch) result table."""
    for q in spark.streams.active:
        if q.name == _QUERY_NAME:
            q.stop()
    # the file stream source requires a DIRECTORY; select just the events
    # file out of the shared testdata dir with a glob filter
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    import atexit

    sink_dir = tempfile.mkdtemp(prefix="usls_stream_events_")
    shutil.rmtree(sink_dir, ignore_errors=True)
    atexit.register(shutil.rmtree, sink_dir, ignore_errors=True)

    def _overwrite(batch_df: DataFrame, _batch_id: int) -> None:
        # complete mode re-emits the whole (bounded) aggregate: replace
        batch_df.write.mode("overwrite").parquet(sink_dir)

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(_overwrite)
        .queryName(_QUERY_NAME)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return read_sink_or_empty(spark, sink_dir, WINDOW_OUT_SCHEMA)


# identical to EVENTS_TUMBLING_ORACLE (relational.py) — the streaming query
# must converge to the batch answer
STREAMING_ORACLE = """
SELECT to_timestamp(floor(epoch(ts) / 21600) * 21600)::TIMESTAMP AS win_start,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""

_HOP_QUERY_NAME = "usls_stream_events_hopping"


def streaming_events_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window (size 6h, slide 2h) streaming aggregation — the
    streaming twin of events_hopping_window (operators/relational.py).
    Each event enters size/slide = 3 open windows, so the state store
    holds 3x the tumbling window count — still bounded by the number of
    open windows, never by the stream length; the watermark closes
    windows once event time passes end + 1h. Complete-mode foreachBatch
    overwrite, same executor-side sink discipline as the tumbling form."""
    for q in spark.streams.active:
        if q.name == _HOP_QUERY_NAME:
            q.stop()
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours", "2 hours"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    import atexit

    sink_dir = tempfile.mkdtemp(prefix="usls_stream_events_hop_")
    shutil.rmtree(sink_dir, ignore_errors=True)
    atexit.register(shutil.rmtree, sink_dir, ignore_errors=True)

    def _overwrite(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(sink_dir)

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(_overwrite)
        .queryName(_HOP_QUERY_NAME)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return read_sink_or_empty(spark, sink_dir, WINDOW_OUT_SCHEMA)
