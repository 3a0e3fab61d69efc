"""Streaming sessionization (applyInPandasWithState + EventTimeTimeout)
must converge to the batch events_sessionize answer, continue sessions
across micro-batches, and EVICT generation state at watermark passage —
with the post-eviction generations summing exactly in the fold."""

import os
import shutil

from tests.conftest import SF_DIR
from tests.oracle_utils import compare, duck_con
from usls_doc_spark.operators.relational import SESSIONIZE_SQL
from usls_doc_spark.streaming.attribution import EVENTS_SCHEMA
from usls_doc_spark.streaming.sessionize import (
    OUT_SCHEMA,
    fold_session_log,
    start_streaming_sessionize,
    streaming_sessionize,
)
from usls_doc_spark.streaming.sink import read_sink_or_empty


def test_sessionize_matches_batch(spark):
    got = streaming_sessionize(spark, SF_DIR)
    con = duck_con(SF_DIR)
    ok, msg = compare(got, con.sql(SESSIONIZE_SQL))
    assert ok, msg


def _write_event_file(spark, rows, dest_dir, name, mtime, stage_dir):
    sdir = str(stage_dir / name)
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.parquet(sdir)
    part = next(
        p for p in os.listdir(sdir) if p.startswith("part-") and p.endswith(".parquet")
    )
    dest = f"{dest_dir}/{name}.parquet"
    shutil.move(f"{sdir}/{part}", dest)
    os.utime(dest, (mtime, mtime))


def test_sessionize_splits_sessions_across_batches(spark, tmp_path_factory):
    """An unsplit events table vs a 2-file time-ordered split must fold to
    the same answer: a session whose events straddle the file boundary can
    only be counted once via the carried state."""
    base = tmp_path_factory.mktemp("sess_split")
    stage = tmp_path_factory.mktemp("sess_stage")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    t_split = events.selectExpr(
        "percentile_approx(ts, 0.5) AS m"
    ).collect()[0]["m"]
    for i, pred in enumerate(
        (f"ts < timestamp'{t_split}'", f"ts >= timestamp'{t_split}'")
    ):
        sdir = str(stage / f"b{i}")
        events.filter(pred).coalesce(1).write.parquet(sdir)
        part = next(
            p for p in os.listdir(sdir) if p.startswith("part-") and p.endswith(".parquet")
        )
        dest = str(base / f"b{i}.parquet")
        shutil.move(f"{sdir}/{part}", dest)
        os.utime(dest, (2_000_000_000 + i, 2_000_000_000 + i))

    sink = str(tmp_path_factory.mktemp("sess_sink") / "log")
    q = start_streaming_sessionize(
        spark, str(base), sink, "sess_split_test", max_files=1, glob="*.parquet"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = fold_session_log(spark, sink)
    con = duck_con(SF_DIR)
    ok, msg = compare(got, con.sql(SESSIONIZE_SQL))
    assert ok, msg


def test_sessionize_eviction_and_generation_sum(spark, tmp_path_factory):
    """The EventTimeTimeout contract end-to-end on a hand-built stream:
    (1) watermark passage past last_ts + 30 min EVICTS the generation
    (numRowsRemoved > 0) and emits its closed row; (2) an event arriving
    after eviction opens a NEW generation; (3) the fold SUMS generations
    to exactly the batch answer. no-data micro-batches are disabled so
    watermark application points are deterministic."""
    import datetime as dt

    t0 = dt.datetime(2024, 6, 1, 0, 0, 0)

    def T(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    base = tmp_path_factory.mktemp("sess_gen")
    stage = tmp_path_factory.mktemp("sess_gen_stage")
    # generation 1: two events 10 min apart (one session)
    _write_event_file(
        spark,
        [(1, T(0), 7, "view", 0.0, ""), (2, T(10), 7, "view", 0.0, "")],
        str(base), "f0", 2_000_000_000, stage,
    )
    # sentinel wave @ +5 h advances the watermark to +4 h (past the
    # generation's +40 min close point); the NEXT batch applies it
    _write_event_file(
        spark, [(-1, T(300), -1, "view", 0.0, "")],
        str(base), "f1", 2_000_000_001, stage,
    )
    # a second sentinel batch APPLIES that watermark while user 7 has no
    # data — timeouts fire only for keys without data in the batch, so
    # this is the batch where generation 1 is closed and evicted
    _write_event_file(
        spark, [(-2, T(360), -1, "view", 0.0, "")],
        str(base), "f2", 2_000_000_002, stage,
    )
    # generation 2: a single event at +10 h (> watermark, not late) —
    # state for user 7 no longer exists, so this opens a fresh generation
    _write_event_file(
        spark, [(3, T(600), 7, "view", 0.0, "")],
        str(base), "f3", 2_000_000_003, stage,
    )
    # closure waves for generation 2 (advance + apply)
    _write_event_file(
        spark, [(-3, T(1200), -1, "view", 0.0, "")],
        str(base), "f4", 2_000_000_004, stage,
    )
    _write_event_file(
        spark, [(-4, T(1260), -1, "view", 0.0, "")],
        str(base), "f5", 2_000_000_005, stage,
    )

    sink = str(tmp_path_factory.mktemp("sess_gen_sink") / "log")
    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    q = start_streaming_sessionize(
        spark, str(base), sink, "sess_gen_test", max_files=1, glob="*.parquet"
    )
    try:
        q.processAllAvailable()
        removed = sum(
            int(o.get("numRowsRemoved", 0))
            for p in q.recentProgress
            for o in p.get("stateOperators", [])
        )
    finally:
        q.stop()
        spark.conf.set(key, prev)

    assert removed > 0, "no generation state was evicted at watermark passage"
    log = read_sink_or_empty(spark, sink, OUT_SCHEMA).filter("user_id >= 0")
    closed = log.filter("closed = 1").collect()
    assert len(closed) == 2, closed  # both generations closed by timeout
    gens = {r["gen"] for r in log.collect()}
    assert len(gens) == 2, gens  # eviction forced a second generation

    final = fold_session_log(spark, sink).collect()
    assert len(final) == 1
    r = final[0]
    assert r["user_id"] == 7
    assert r["n_sessions"] == 2  # one per generation, summed in the fold
    assert r["n_events"] == 3
    assert r["first_ts"] == T(0)
    assert r["last_ts"] == T(600)
