"""Driver-side sentinel-file plumbing for the drain protocols (round 8).

The watermark-closure sentinels are 1-2 row parquet files. Round 7 wrote
them via ``spark.createDataFrame(...).coalesce(1).write.parquet()`` — a
full Spark job (plan, schedule, task, commit protocol) per wave, measured
~5 s per wave at bench time, i.e. ~10 s of the 13-15 s drained-query
wall. The event-time maximum likewise ran a Spark read+agg job. Both are
driver-side metadata chores over KNOWN tiny data, so round 8 does them
with pyarrow directly (guide §1.2: remove work, don't tune it):

  * ``events_max_ts`` reads ONLY the ts column of the events parquet via
    pyarrow and takes its max — the exact same value the Spark
    ``agg(F.max("ts"))`` job produced, with zero timezone round-trips
    (both paths are micros-since-epoch under the UTC session),
  * ``write_events_file`` writes the sentinel rows as a parquet file via
    pyarrow — physical types (int64 / timestamp[us] / string / double)
    are read identically by the streaming source's explicit schema.

The sentinel SEMANTICS (wave timing, mtime ordering, two-wave
application) are unchanged — see streaming/events.py and
streaming/attribution.py module docstrings."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_EVENTS_ARROW_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()),
        ("event_type", pa.string()),
        ("value", pa.float64()),
        ("props", pa.string()),
    ]
)


def events_max_ts(events_path: str):
    """Max event time of an events parquet file as a naive datetime
    (micros-since-epoch semantics — identical to what the UTC-session
    Spark ``agg(F.max("ts"))`` produced)."""
    t = pq.read_table(events_path, columns=["ts"])
    return pc.max(t.column("ts")).as_py()


def write_events_file(dest: str, rows: list[tuple], mtime: int) -> None:
    """Write ``rows`` (EVENTS_SCHEMA order: event_id, ts, user_id,
    event_type, value, props) as one parquet file with a pinned mtime."""
    cols = list(zip(*rows))
    table = pa.Table.from_arrays(
        [pa.array(list(c), type=f.type)
         for c, f in zip(cols, _EVENTS_ARROW_SCHEMA)],
        schema=_EVENTS_ARROW_SCHEMA,
    )
    pq.write_table(table, dest)
    os.utime(dest, (mtime, mtime))
