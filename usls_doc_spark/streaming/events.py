"""Structured Streaming: watermarked window aggregations (tumbling 6h and
hopping 6h/2h) over the events table, driven to completion against the
parquet file source in APPEND output mode with real watermark eviction.

The reference's streaming analogue is the DataLoader producer/consumer
pipeline (/root/reference/src/misc/dataloader.rs:234-331 — bounded-channel
batches). Spark-first re-expression: readStream -> withWatermark ->
window agg -> append-mode foreachBatch parquet sink (executor-side write,
NO driver-memory sink — same discipline as streaming/dedup.py).

Why append mode (round-6 VERDICT item 1): in complete mode the watermark
CANNOT evict aggregation state — Spark must retain every (window,
event_type) group ever seen to re-emit the full result each trigger, so
state and the per-trigger sink rewrite both grow with total stream
history. In append mode a window's groups are emitted exactly once, when
the watermark passes the window end, and their state rows are EVICTED
(observable as numRowsRemoved > 0 in the state-operator progress). State
is then genuinely bounded by the number of OPEN windows (x event types;
the hopping form holds size/slide = 3x the tumbling count), never by the
stream length — the property that lets this run forever at 100 TB.

Drain protocol: append mode only emits windows the watermark has closed,
so at end-of-input every window younger than max_ts - (size + delay)
would stay open forever and the drained sink would be missing exactly
those rows. The sentinel protocol from streaming/attribution.py closes
them: the events file is staged into a work dir followed by two
far-future sentinel waves (event_type '__wm__', filtered from the
result) under maxFilesPerTrigger=1 — wave 1 advances the watermark past
every real window's end (watermark = max_ts + 8h - 1h delay = +7h >
max window end of +6h), and wave 2 forces the batch in which that
watermark is APPLIED, emitting + evicting the final windows. Structured
Streaming applies the watermark computed at the end of batch N during
batch N+1, so without wave 2 the final emission would depend on Spark's
optional no-data micro-batch racing processAllAvailable. Files carry
pinned ascending mtimes (oldest-first), so nothing is ever late —
asserted via dropped_by_watermark == 0; full-closure is asserted via
numRowsRemoved > 0.

The batch queries events_tumbling_window / events_hopping_window
(operators/relational.py) are the exact batch equivalents the oracle
checks; the drained streams must produce identical rows.

Late-data semantics (watermark drops) are exercised deterministically in
tests/test_streaming_events.py via controlled multi-file micro-batch
splits.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from datetime import timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .attribution import dropped_by_watermark
from .sink import read_sink_or_empty

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)

WINDOW_OUT_SCHEMA = (
    "win_start timestamp, event_type string, n bigint, total_value double"
)

SENTINEL_EVENT_TYPE = "__wm__"  # never a real event_type (synth types are words)

_QUERY_NAME = "usls_stream_events_window"
_HOP_QUERY_NAME = "usls_stream_events_hopping"


def state_rows_removed(q) -> int:
    """Total aggregation-state rows evicted across the query's recorded
    progress — zero after a sentinel-closed drain means the watermark
    never evicted closed-window state (append-mode drain incomplete)."""
    return sum(
        int(so.get("numRowsRemoved", 0))
        for p in q.recentProgress
        for so in p.get("stateOperators", [])
    )


def write_window_sentinels(spark: SparkSession, events_dir: str,
                           max_ts, waves=(8, 12),
                           mtime_base: int = 2_000_000_000) -> None:
    """Write one tiny parquet file per sentinel wave into ``events_dir``:
    a single ``__wm__`` event at max_ts + <wave> hours, with pinned
    ascending mtimes so the file source triggers them AFTER the real
    data. Waves (8, 12): the largest window containing max_ts ends at
    most max_ts + 6h (tumbling and hopping alike), so wave 1's watermark
    of max_ts + 7h strictly exceeds every real window end; wave 2 forces
    the batch that applies it (see module docstring). Files are written
    driver-side via pyarrow (round 8 — a Spark write job per 1-row wave
    measured ~5 s of pure overhead; see streaming/sentinel.py)."""
    from .sentinel import write_events_file

    for i, hours in enumerate(waves):
        ts = max_ts + timedelta(hours=hours)
        write_events_file(
            f"{events_dir}/sentinel{i}.parquet",
            [(-(i + 1), ts, -1, SENTINEL_EVENT_TYPE, 0.0, "")],
            mtime_base + i + 1,
        )


def start_window_stream(spark: SparkSession, events_dir: str, sink_dir: str,
                        query_name: str, slide: str | None = None,
                        max_files: int | None = None,
                        glob: str = "events.parquet"):
    """Start the watermarked window aggregation (tumbling when ``slide``
    is None, hopping otherwise) in append mode, appending closed windows
    to ``sink_dir`` per micro-batch (executor-side parquet, no driver
    sink). Sentinel ``__wm__`` rows flow THROUGH the aggregation (they
    form their own far-future groups) so the watermark node always sees
    them — filtering them pre-agg would risk Catalyst pushing the filter
    below EventTimeWatermark and silently breaking the closure protocol;
    callers filter them from the sink instead."""
    for q in spark.streams.active:
        if q.name == query_name:
            q.stop()
    reader = spark.readStream.schema(EVENTS_SCHEMA).option("pathGlobFilter", glob)
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", max_files)
    stream = reader.parquet(events_dir)
    win = (
        F.window("ts", "6 hours")
        if slide is None
        else F.window("ts", "6 hours", slide)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(win, "event_type")
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

    def _append(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(sink_dir)

    return (
        agg.writeStream.outputMode("append")
        .foreachBatch(_append)
        .queryName(query_name)
        .start()
    )


def _drained_window_agg(spark: SparkSession, sf_dir: str, query_name: str,
                        slide: str | None) -> DataFrame:
    from .sentinel import events_max_ts

    work = tempfile.mkdtemp(prefix="usls_stream_events_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    events_dir = f"{work}/in"
    os.makedirs(events_dir)
    shutil.copy(f"{sf_dir}/events.parquet", f"{events_dir}/batch0.parquet")
    os.utime(f"{events_dir}/batch0.parquet", (2_000_000_000, 2_000_000_000))
    max_ts = events_max_ts(f"{sf_dir}/events.parquet")
    write_window_sentinels(spark, events_dir, max_ts)

    sink_dir = f"{work}/sink"
    # maxFilesPerTrigger=2 packs [data, wave1] into micro-batch 1 and
    # leaves wave2 as micro-batch 2 (mtime order): wave 1's far-future
    # event raises the watermark computed at batch 1's END, wave 2's
    # batch APPLIES it — one fewer state-store round than the r7
    # one-file-per-trigger protocol, same emitted rows, and nothing is
    # late in batch 1 because the watermark during it is still the
    # initial one (dropped_by_watermark == 0 still asserted).
    from .tuning import scaled_state_partitions, stream_shuffle_partitions

    with stream_shuffle_partitions(
        spark, scaled_state_partitions(spark, f"{sf_dir}/events.parquet")
    ):
        q = start_window_stream(
            spark, events_dir, sink_dir, query_name, slide=slide,
            max_files=2, glob="*.parquet",
        )
        try:
            q.processAllAvailable()
            dropped = dropped_by_watermark(q)
            removed = state_rows_removed(q)
        finally:
            q.stop()
    if dropped:
        raise RuntimeError(
            f"{dropped} late rows dropped by watermark — sentinel protocol broken"
        )
    if removed == 0:
        raise RuntimeError(
            "watermark never evicted closed-window state — append-mode drain "
            "incomplete (sentinel waves failed to close the final windows)"
        )
    return read_sink_or_empty(spark, sink_dir, WINDOW_OUT_SCHEMA).filter(
        F.col("event_type") != SENTINEL_EVENT_TYPE
    )


def streaming_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the tumbling-window (6h) aggregation in append mode and
    return the closed windows — exactly the batch events_tumbling_window
    answer. State is bounded by open windows x event types; closed
    windows are evicted at watermark passage (asserted)."""
    return _drained_window_agg(spark, sf_dir, _QUERY_NAME, slide=None)


def streaming_events_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window (size 6h, slide 2h) streaming aggregation — the
    streaming twin of events_hopping_window (operators/relational.py).
    Each event enters size/slide = 3 open windows, so the state store
    holds 3x the tumbling window count — still bounded by OPEN windows
    (append mode evicts a window's groups when the watermark passes its
    end), never by the stream length."""
    return _drained_window_agg(spark, sf_dir, _HOP_QUERY_NAME, slide="2 hours")


# identical to EVENTS_TUMBLING_ORACLE (relational.py) — the drained stream
# must converge to the batch answer
STREAMING_ORACLE = """
SELECT to_timestamp(floor(epoch(ts) / 21600) * 21600)::TIMESTAMP AS win_start,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""
