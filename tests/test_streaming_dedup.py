"""Stateful streaming exact-dedup must converge to the batch dedup_exact
answer, including duplicate groups that SPAN micro-batch boundaries (only
the state can stitch those counts together)."""

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tests.oracle_utils import compare, duck_con
from usls_doc_spark.operators.dialect import DUCK
from usls_doc_spark.operators.text_queries import TEXT_QUERIES


def test_streaming_dedup_stitches_across_micro_batches(spark, tmp_path_factory):
    from usls_doc_spark.streaming.dedup import start_streaming_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # split by doc_id parity: members of a dup group land in BOTH files,
    # so their counts exist only if state carries across the two triggers
    base = tmp_path_factory.mktemp("docs_stream")
    stage = tmp_path_factory.mktemp("docs_stage")
    for i, pred in enumerate(("doc_id % 2 = 0", "doc_id % 2 = 1")):
        docs.filter(pred).coalesce(1).write.parquet(str(stage / f"b{i}"))
        part = next((stage / f"b{i}").glob("part-*.parquet"))
        part.rename(base / f"batch{i}.parquet")

    q = start_streaming_dedup(
        spark, str(base), "dedup_state_test", max_files=1, glob="*.parquet"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (
        spark.table("dedup_state_test")
        .groupBy("dup_key")
        .agg(
            F.min("canonical_id").alias("canonical_id"),
            F.max("n_members").alias("n_members"),
        )
        .filter(F.col("n_members") > 1)
    )
    con = duck_con(SF_DIR)
    ok, msg = compare(got, con.sql(TEXT_QUERIES["dedup_exact"](DUCK)))
    assert ok, msg
