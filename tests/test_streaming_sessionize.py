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

    q = streaming_sessionize(spark, str(base), "sess_state_test", max_files=1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update-mode memory sink: counts are monotone, max = final
    got = {
        r["user_id"]: (r["ns"], r["ne"])
        for r in spark.table("sess_state_test")
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
