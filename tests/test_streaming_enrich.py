"""Stream-static enrichment join: the drained stream must equal the batch
LEFT JOIN oracle, including when the events arrive across multiple
micro-batches (the static dim is re-broadcast per batch), including the
unmatched-user NULL branch (exercised via a filtered static dim), and the
batch twin's physical plan must broadcast the dim so the stream side
never shuffles for the lookup."""

import duckdb
import pytest

from tests.conftest import SF_DIR
from tests.oracle_utils import compare, duck_con
from usls_doc_spark.streaming.enrich import (
    ENRICH_ORACLE,
    build_enrich,
    run_enrich_to_sink,
    streaming_enrich_events,
)


def test_enrich_matches_batch_left_join(spark):
    got = streaming_enrich_events(spark, SF_DIR)
    con = duck_con(SF_DIR)
    ok, msg = compare(got, con.sql(ENRICH_ORACLE))
    assert ok, msg


@pytest.fixture()
def split_dirs(spark, tmp_path_factory):
    """Events split into two files (forced into two micro-batches) + a
    DOCTORED dim dir whose customer table is missing custkeys < 5, so
    some events enrich to NULL."""
    import shutil

    events_dir = tmp_path_factory.mktemp("enrich_events")
    dim_dir = tmp_path_factory.mktemp("enrich_dim")
    scratch = tmp_path_factory.mktemp("enrich_scratch")

    def write_flat(df, dest):
        # the file-stream source lists leaf FILES: flatten the part file
        tmp = scratch / (dest.name + ".d")
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        part = next(tmp.glob("part-*.parquet"))
        shutil.copy(str(part), str(dest))

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    write_flat(ev.filter("event_id % 2 = 0"), events_dir / "a.parquet")
    write_flat(ev.filter("event_id % 2 = 1"), events_dir / "b.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    write_flat(cust.filter("c_custkey >= 5"), dim_dir / "customer.parquet")
    write_flat(spark.read.parquet(f"{SF_DIR}/nation.parquet"),
               dim_dir / "nation.parquet")
    return str(events_dir), str(dim_dir)


def test_enrich_cross_batch_and_null_branch(spark, split_dirs):
    events_dir, dim_dir = split_dirs
    got = run_enrich_to_sink(spark, events_dir, dim_dir,
                             glob="*.parquet", max_files=1)
    assert got.filter("segment IS NULL").count() > 0  # the LEFT semantics
    assert got.filter("segment IS NOT NULL").count() > 0

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{events_dir}/*.parquet'")
    con.sql(f"CREATE VIEW customer AS SELECT * FROM '{dim_dir}/customer.parquet'")
    con.sql(f"CREATE VIEW nation AS SELECT * FROM '{dim_dir}/nation.parquet'")
    ok, msg = compare(got, con.sql(ENRICH_ORACLE))
    assert ok, msg


def test_enrich_plan_broadcasts_dim(spark):
    """The batch twin of the same declarative join: the dim reaches the
    events side as a broadcast (both hops), never a shuffle of the events
    — and the events scan reads no dropped column."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    df = build_enrich(spark, events, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE prints the initial AND final plan: 2 joins, each listed twice
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan
    # no Exchange other than broadcast distribution
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "BroadcastExchange" in line, line
