"""Custom stateful streaming operator: cross-micro-batch sessionization via
``applyInPandasWithState`` (the task-mandated custom-stateful-operator path;
pyspark guide "Stateful" section).

State per user: (last event epoch-seconds, session count, event count). A
new session opens when the gap to the previous event exceeds 30 minutes —
the exact semantics of the batch SESSIONIZE_SQL (operators/relational.py),
which is the correctness oracle: after the stream drains, the per-user
final counts must equal the batch query's (asserted in
tests/test_streaming_sessionize.py, including sessions spanning micro-batch
boundaries, which only the STATE can stitch together).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .events import EVENTS_SCHEMA

GAP_SECONDS = 30 * 60

OUTPUT_SCHEMA = "user_id bigint, n_sessions bigint, n_events bigint"
STATE_SCHEMA = "last_us bigint, n_sessions bigint, n_events bigint"


def _sessionize_group(key, pdfs, state: GroupState):
    """Accumulate ALL Arrow chunks for the group, then sort ONCE by
    (ts, event_id) before folding the state — a large group spanning
    multiple chunks would otherwise interleave out-of-order timestamps and
    inflate n_sessions vs the batch oracle (round-1 ADVICE).

    In-order-arrival assumption ACROSS micro-batches: events with ts
    earlier than the stored last_us (late data) are counted as new-session
    starts, exactly like the batch oracle would if it only saw the prefix —
    late data is not reordered retroactively (no retraction support)."""
    last_us, n_sessions, n_events = state.get if state.exists else (None, 0, 0)
    chunks = [pdf[["ts", "event_id"]] for pdf in pdfs]
    ts_us: list[int] = []
    if chunks:
        batch = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        batch = batch.sort_values(["ts", "event_id"])
        ts_us = [int(t.value // 1000) for t in pd.to_datetime(batch["ts"])]
    for t in ts_us:
        if last_us is None or (t - last_us) > GAP_SECONDS * 1_000_000:
            n_sessions += 1
        n_events += 1
        last_us = t
    state.update((last_us, n_sessions, n_events))
    yield pd.DataFrame(
        [(key[0], n_sessions, n_events)],
        columns=["user_id", "n_sessions", "n_events"],
    )


def streaming_sessionize(spark, events_dir: str, query_name: str, max_files: int = 1,
                         sink_dir: str | None = None):
    """Start the stateful sessionization stream over parquet event files.

    Returns (StreamingQuery, sink_dir): update rows append to ``sink_dir``
    parquet through foreachBatch ON THE EXECUTORS (no driver-memory sink —
    per-user state is corpus-cardinality at scale; same discipline as
    streaming/dedup.py). Fold the log with max() per user: counts are
    monotone, so the latest update per key is the max.
    """
    import tempfile

    for q in spark.streams.active:
        if q.name == query_name:
            q.stop()
    if sink_dir is None:
        sink_dir = tempfile.mkdtemp(prefix="usls_stream_sess_") + "/updates"
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .option("pathGlobFilter", "*.parquet")
        .parquet(events_dir)
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def _append(batch_df, _batch_id):
        batch_df.write.mode("append").parquet(sink_dir)

    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(_append)
        .queryName(query_name)
        .start()
    )
    return q, sink_dir
