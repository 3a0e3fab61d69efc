"""Stateful streaming MinHash-LSH dedup must converge to the batch
dedup_minhash_lsh answer, including candidate pairs whose members arrive
in DIFFERENT micro-batches (only the per-bucket state can stitch those),
with state bounded per bucket at BAND_CAP members and the sink running
executor-side through foreachBatch (never a driver memory sink)."""

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tests.oracle_utils import compare, duck_con
from usls_doc_spark.operators.dialect import DUCK
from usls_doc_spark.operators.text_queries import BAND_CAP, TEXT_QUERIES


def test_streaming_minhash_stitches_across_micro_batches(spark, tmp_path_factory):
    from usls_doc_spark.streaming.dedup_minhash import (
        OUTPUT_SCHEMA,
        _signature_array_expr,
        fold_bucket_log,
        start_streaming_dedup_minhash,
    )
    from usls_doc_spark.streaming.sink import read_sink_or_empty

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # split by doc_id parity: near-dup pair members land in BOTH files, so
    # their shared buckets exist only if state carries across the triggers
    base = tmp_path_factory.mktemp("mh_stream")
    stage = tmp_path_factory.mktemp("mh_stage")
    for i, pred in enumerate(("doc_id % 2 = 0", "doc_id % 2 = 1")):
        docs.filter(pred).coalesce(1).write.parquet(str(stage / f"b{i}"))
        part = next((stage / f"b{i}").glob("part-*.parquet"))
        part.rename(base / f"batch{i}.parquet")

    sink = str(tmp_path_factory.mktemp("mh_sink") / "updates")
    q = start_streaming_dedup_minhash(
        spark, str(base), sink, "mh_state_test", max_files=1, glob="*.parquet"
    )
    try:
        q.processAllAvailable()
        progress = q.lastProgress
        state_rows = sum(
            int(o.get("numRowsTotal", 0))
            for o in (progress or {}).get("stateOperators", [])
        )
    finally:
        q.stop()

    desc = (progress or {}).get("sink", {}).get("description", "")
    assert "ForeachBatch" in desc, f"unexpected sink: {desc!r}"
    assert "MemorySink" not in desc

    # state cardinality == distinct (band, band_key) buckets in the corpus
    # (bounded by 8 x n_docs, NEVER by pairs), computed independently by
    # the same signature expression the batch sigs CTE renders
    sig_arr, ws, sh = _signature_array_expr()
    n_buckets = (
        docs.select("doc_id", F.expr(ws).alias("ws"))
        .select("doc_id", F.expr(sh).alias("sh"))
        .select(F.posexplode(F.expr(sig_arr)).alias("band", "band_key"))
        .distinct()
        .count()
    )
    assert state_rows == n_buckets, (state_rows, n_buckets)

    # every folded bucket respects the BAND_CAP membership bound
    updates = read_sink_or_empty(spark, sink, OUTPUT_SCHEMA)
    max_members = updates.select(
        F.size(F.split("members", ",")).alias("n")
    ).agg(F.max("n")).collect()[0][0]
    assert max_members <= BAND_CAP

    got = fold_bucket_log(spark, sink)
    # the corpus genuinely exercises cross-batch stitching: at least one
    # candidate pair spans the parity split
    crossing = got.filter("doc_a % 2 <> doc_b % 2").count()
    assert crossing > 0

    con = duck_con(SF_DIR)
    ok, msg = compare(got, con.sql(TEXT_QUERIES["dedup_minhash_lsh"](DUCK)))
    assert ok, msg
