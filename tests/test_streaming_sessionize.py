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
