"""Stateful streaming sessionization must converge to the batch answer —
including sessions that span micro-batch boundaries (stitched by state)."""

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_stateful_sessionize_matches_batch(spark, tmp_path_factory):
    from usls_doc_spark.operators.relational import events_sessionize
    from usls_doc_spark.streaming.sessionize import streaming_sessionize

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # split by GLOBAL time into two files -> two micro-batches; per-user
    # streams stay time-ordered and many sessions straddle the cut
    median_ts = (
        events.select(F.expr("percentile_approx(unix_micros(CAST(ts AS TIMESTAMP)), 0.5)").alias("m"))
        .collect()[0]["m"]
    )
    events = events.withColumn("_us", F.unix_micros(F.col("ts").cast("timestamp")))
    base = tmp_path_factory.mktemp("ev_stream")
    stage = tmp_path_factory.mktemp("ev_stage")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    events.filter(F.col("_us") <= median_ts).select(cols).coalesce(1).write.parquet(
        str(stage / "b0")
    )
    events.filter(F.col("_us") > median_ts).select(cols).coalesce(1).write.parquet(
        str(stage / "b1")
    )
    # the file stream source lists leaf files under its path — flatten the
    # writer's per-dataset directories into ordered single files
    for i, sub in enumerate(("b0", "b1")):
        part = next((stage / sub).glob("part-*.parquet"))
        part.rename(base / f"batch{i}.parquet")

    sink = str(tmp_path_factory.mktemp("sess_sink") / "updates")
    q, sink = streaming_sessionize(spark, str(base), "sess_state_test", max_files=1,
                                   sink_dir=sink)
    try:
        q.processAllAvailable()
        desc = (q.lastProgress or {}).get("sink", {}).get("description", "")
    finally:
        q.stop()
    assert "ForeachBatch" in desc and "MemorySink" not in desc
    # update log appended per trigger: counts are monotone, max = final
    got = {
        r["user_id"]: (r["ns"], r["ne"])
        for r in spark.read.parquet(sink)
        .groupBy("user_id")
        .agg(F.max("n_sessions").alias("ns"), F.max("n_events").alias("ne"))
        .collect()
    }
    expected = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in events_sessionize(spark, SF_DIR).collect()
    }
    assert got == expected


def test_sessionize_group_sorts_across_chunks():
    """A group arriving as multiple Arrow chunks (large groups) must be
    sorted globally, not per-chunk: these two chunks interleave in time and
    form exactly 2 sessions — per-chunk sorting would count 3+."""
    import pandas as pd

    from usls_doc_spark.streaming.sessionize import _sessionize_group

    class FakeState:
        exists = False
        get = None

        def update(self, v):
            self.stored = v

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    m = pd.Timedelta(minutes=1)
    # session A: 00:00, 00:05, 00:10; session B (gap > 30min): 01:00, 01:05
    chunk1 = pd.DataFrame({"ts": [t0, t0 + 60 * m], "event_id": [1, 4]})
    chunk2 = pd.DataFrame({"ts": [t0 + 5 * m, t0 + 10 * m, t0 + 65 * m], "event_id": [2, 3, 5]})
    st = FakeState()
    out = list(_sessionize_group((7,), iter([chunk1, chunk2]), st))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row.user_id, row.n_sessions, row.n_events) == (7, 2, 5)


def test_watermark_drops_late_events(spark, tmp_path_factory):
    """Append-mode watermark semantics, deterministically: batch 1 advances
    the watermark to 11:00; batch 2 carries one event INSIDE the still-open
    06:00-12:00 window (kept) and one for the already-finalized 00:00-06:00
    window (dropped). The emitted 00-06 row must count only batch-1 rows."""
    import datetime as dt

    base = tmp_path_factory.mktemp("late_stream")
    cp = str(tmp_path_factory.mktemp("late_cp"))
    out_dir = str(tmp_path_factory.mktemp("late_out") / "rows")
    cols = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"

    def write_batch(name, rows):
        df = spark.createDataFrame(rows, cols).coalesce(1)
        stage = tmp_path_factory.mktemp(f"stage_{name}")
        df.write.parquet(str(stage / "d"))
        part = next((stage / "d").glob("part-*.parquet"))
        part.rename(base / f"{name}.parquet")

    t = lambda hh, mm=0: dt.datetime(2024, 1, 1, hh, mm)
    import os

    # batch 1: two events in 00-06, one at 12:00 (watermark -> 11:00)
    write_batch("b0", [(1, t(1), 1, "c", 1.0, ""), (2, t(2), 1, "c", 1.0, ""),
                       (3, t(12), 1, "c", 1.0, "")])
    os.utime(base / "b0.parquet", (1_000_000, 1_000_000))
    # batch 2: in-watermark row; the 11:00 watermark takes effect and the
    # 00-06 window (n=2) finalizes/emits at this batch's commit (the
    # watermark computed by batch N filters inputs from batch N+2 on —
    # it lags one batch by design)
    write_batch("b1", [(4, t(11, 30), 1, "c", 1.0, "")])
    os.utime(base / "b1.parquet", (2_000_000, 2_000_000))
    # batch 3: 10:30 within watermark (kept in open 06-12 state); 03:00 is
    # later than the finalized 00-06 window -> DROPPED by the watermark
    write_batch("b2", [(5, t(10, 30), 1, "c", 1.0, ""), (6, t(3), 1, "c", 1.0, "")])
    os.utime(base / "b2.parquet", (3_000_000, 3_000_000))

    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema(cols)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(base))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("win_start"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp)
        .start()
    )
    try:
        q.processAllAvailable()
        dropped = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for pr in q.recentProgress
            for op in pr.get("stateOperators", [])
        )
    finally:
        q.stop()
    assert dropped == 1  # exactly the 03:00 straggler
    rows = {r["win_start"]: r["n"] for r in spark.read.parquet(out_dir).collect()}
    # only the 00-06 window has closed (watermark 11:00 > 06:00); its count
    # is 2 — the late 03:00 event was watermark-dropped, and the in-watermark
    # 10:30/11:30 events sit in the still-open 06-12 state (not emitted)
    assert rows == {dt.datetime(2024, 1, 1, 0, 0): 2}


def test_zero_micro_batch_stream_returns_empty_not_path_error(spark, tmp_path_factory):
    """Round-3 ADVICE item 2: if the source yields ZERO micro-batches the
    foreachBatch sink dir is never created — the read-back must return an
    empty result with the declared schema, not path-not-found."""
    from usls_doc_spark.streaming.events import streaming_events_window
    from usls_doc_spark.streaming.sink import read_sink_or_empty

    empty_src = str(tmp_path_factory.mktemp("no_events"))
    df = streaming_events_window(spark, empty_src)  # no events.parquet inside
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "win_start", "event_type", "n", "total_value"
    ]

    missing = str(tmp_path_factory.mktemp("gone") / "never_written")
    df2 = read_sink_or_empty(spark, missing, "a bigint, b string")
    assert df2.count() == 0 and len(df2.schema.fields) == 2
