"""Structured Streaming: watermarked tumbling-window aggregation over the
events table, driven to completion against the parquet file source.

The reference's streaming analogue is the DataLoader producer/consumer
pipeline (/root/reference/src/misc/dataloader.rs:234-331 — bounded-channel
batches). Spark-first re-expression: readStream -> withWatermark ->
window agg -> memory sink. The batch query events_tumbling_window
(operators/relational.py) is the exact batch equivalent the oracle checks;
this streaming version must produce identical rows in complete mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
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
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(_QUERY_NAME)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(_QUERY_NAME)


# identical to EVENTS_TUMBLING_ORACLE (relational.py) — the streaming query
# must converge to the batch answer
STREAMING_ORACLE = """
SELECT to_timestamp(floor(epoch(ts) / 21600) * 21600)::TIMESTAMP AS win_start,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""
