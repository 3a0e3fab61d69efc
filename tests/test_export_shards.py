"""The JSONL shard export must be byte-deterministic: identical shard
files regardless of input partitioning, one file per shard directory,
line order total (doc_id within shard)."""

import glob
import json
import pathlib

from tests.conftest import SF_DIR
from usls_doc_spark.io.export import export_jsonl_shards
from usls_doc_spark.operators.text_queries import render_spark
from usls_doc_spark.queries import _register_views


def _shard_bytes(out_dir: str) -> dict[str, bytes]:
    out = {}
    for d in glob.glob(f"{out_dir}/split=*/shard=*"):
        parts = sorted(glob.glob(f"{d}/part-*"))
        assert len(parts) == 1, f"{d} has {len(parts)} files (want exactly 1)"
        key = "/".join(pathlib.Path(d).parts[-2:])
        out[key] = pathlib.Path(parts[0]).read_bytes()
    return out


def test_export_shards_byte_deterministic(spark, tmp_path_factory):
    _register_views(spark, SF_DIR)
    packed = spark.sql(render_spark("split_and_pack"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    out_a = str(tmp_path_factory.mktemp("shards_a"))
    out_b = str(tmp_path_factory.mktemp("shards_b"))
    summary_a = export_jsonl_shards(packed.repartition(3), docs.repartition(5), out_a)
    summary_b = export_jsonl_shards(packed.repartition(11), docs.repartition(2), out_b)

    a, b = _shard_bytes(out_a), _shard_bytes(out_b)
    assert a.keys() == b.keys() and len(a) > 1
    for k in a:
        assert a[k] == b[k], f"shard {k} bytes differ across partitionings"
    assert summary_a == summary_b
    assert summary_a["docs"] == docs.count()

    # lines are valid JSON, doc_id-ordered, and pack->shard assignment holds
    for key, blob in a.items():
        shard_no = int(key.split("shard=")[1])
        ids = []
        for line in blob.decode().splitlines():
            row = json.loads(line)
            assert row["pack_id"] // 4 == shard_no
            ids.append(row["doc_id"])
        assert ids == sorted(ids)


def test_export_rerun_same_dir_is_idempotent(spark, tmp_path_factory):
    """Re-exporting over the same directory (the failed-job retry story)
    must leave byte-identical shards, not duplicates."""
    _register_views(spark, SF_DIR)
    packed = spark.sql(render_spark("split_and_pack"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path_factory.mktemp("shards_rerun"))
    export_jsonl_shards(packed, docs, out)
    first = _shard_bytes(out)
    export_jsonl_shards(packed, docs, out)  # retry over the same dir
    second = _shard_bytes(out)
    assert first == second
