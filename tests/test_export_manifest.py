"""Export-sink manifest + resume (round-4 VERDICT item 5): a per-shard
manifest (line count + sha256) is written next to the shards, a manifest
entry exists only for a COMPLETED shard, and a resumed export rewrites
exactly the missing/unrecorded shards — completed shard files are never
touched (byte- and mtime-identical), which is the checkpoint discipline
pipeline/checkpoint.py applies, extended to the terminal sink."""

import glob
import hashlib
import json
import os
import pathlib

import pytest

from tests.conftest import SF_DIR
from usls_doc_spark.io.export import (
    MANIFEST_NAME,
    export_jsonl_shards,
    read_manifest,
)
from usls_doc_spark.operators.text_queries import render_spark
from usls_doc_spark.queries import _register_views


def _shard_files(out_dir: str) -> dict[str, str]:
    out = {}
    for d in glob.glob(f"{out_dir}/split=*/shard=*"):
        parts = sorted(glob.glob(f"{d}/part-*.txt"))
        assert len(parts) == 1
        out["/".join(pathlib.Path(d).parts[-2:])] = parts[0]
    return out


@pytest.fixture()
def packed_docs(spark):
    _register_views(spark, SF_DIR)
    return (
        spark.sql(render_spark("split_and_pack")),
        spark.read.parquet(f"{SF_DIR}/documents.parquet"),
    )


def test_manifest_records_every_shard_with_true_hashes(
    spark, packed_docs, tmp_path_factory
):
    packed, docs = packed_docs
    out = str(tmp_path_factory.mktemp("shards_manifest"))
    summary = export_jsonl_shards(packed, docs, out)
    m = read_manifest(spark, out)
    assert m is not None and m["packs_per_shard"] == 4
    files = _shard_files(out)
    assert set(m["shards"]) == set(files)
    assert summary["shards"] == len(files) and summary["skipped_shards"] == 0
    total_lines = 0
    for key, path in files.items():
        data = pathlib.Path(path).read_bytes()
        ent = m["shards"][key]
        assert ent["sha256"] == hashlib.sha256(data).hexdigest(), key
        assert ent["lines"] == data.count(b"\n"), key
        total_lines += ent["lines"]
    assert summary["docs"] == total_lines == docs.count()


def test_resume_rewrites_only_missing_shards(spark, packed_docs, tmp_path_factory):
    packed, docs = packed_docs
    out = str(tmp_path_factory.mktemp("shards_resume"))
    export_jsonl_shards(packed, docs, out)
    files = _shard_files(out)
    original = {
        k: pathlib.Path(p).read_bytes() for k, p in files.items()
    }
    mtimes = {k: os.stat(p).st_mtime_ns for k, p in files.items()}
    assert len(files) >= 3

    # simulate a killed run: one shard never completed (dir missing, no
    # manifest entry) and one was mid-write at the kill (partial file,
    # no manifest entry — entries are only written AFTER completion)
    keys = sorted(files)
    lost, partial = keys[0], keys[1]
    import shutil

    shutil.rmtree(str(pathlib.Path(files[lost]).parent))
    with open(files[partial], "wb") as f:
        f.write(original[partial][: len(original[partial]) // 2])
    # drop their manifest entries THROUGH the module's writer (keeps the
    # Hadoop checksum sidecar consistent, as any real writer would)
    from usls_doc_spark.io.export import _write_text_file

    mpath = f"{out}/{MANIFEST_NAME}"
    m = json.loads(pathlib.Path(mpath).read_text())
    del m["shards"][lost]
    del m["shards"][partial]
    _write_text_file(spark, mpath, json.dumps(m))

    summary = export_jsonl_shards(packed, docs, out, resume=True)
    assert summary["skipped_shards"] == len(keys) - 2

    after = _shard_files(out)
    assert set(after) == set(keys)
    for k in keys:
        assert pathlib.Path(after[k]).read_bytes() == original[k], k
    # completed shards were never rewritten: same file, same mtime
    for k in keys:
        if k not in (lost, partial):
            assert after[k] == files[k] and os.stat(after[k]).st_mtime_ns == mtimes[k]
    # manifest is whole again and content-true
    m2 = read_manifest(spark, out)
    assert set(m2["shards"]) == set(keys)
    for k in (lost, partial):
        assert (
            m2["shards"][k]["sha256"] == hashlib.sha256(original[k]).hexdigest()
        )


def test_resume_refuses_rebinned_shards(spark, packed_docs, tmp_path_factory):
    packed, docs = packed_docs
    out = str(tmp_path_factory.mktemp("shards_rebin"))
    export_jsonl_shards(packed, docs, out, packs_per_shard=4)
    with pytest.raises(ValueError, match="packs_per_shard"):
        export_jsonl_shards(packed, docs, out, packs_per_shard=8, resume=True)


def test_resume_rewrites_shard_recorded_but_lost_on_disk(
    spark, packed_docs, tmp_path_factory
):
    """Round-5 ADVICE (medium): a shard present in the manifest whose FILE
    was since deleted must be re-produced on resume — never silently
    counted as complete."""
    import shutil

    packed, docs = packed_docs
    out = str(tmp_path_factory.mktemp("shards_lost"))
    export_jsonl_shards(packed, docs, out)
    files = _shard_files(out)
    original = {k: pathlib.Path(p).read_bytes() for k, p in files.items()}
    lost = sorted(files)[0]
    # delete the shard file but LEAVE its manifest entry (the blind-trust
    # failure mode: storage loss after a successful export)
    shutil.rmtree(str(pathlib.Path(files[lost]).parent))
    assert lost in read_manifest(spark, out)["shards"]

    summary = export_jsonl_shards(packed, docs, out, resume=True)
    # the lost shard was NOT skipped...
    assert summary["skipped_shards"] == len(files) - 1
    after = _shard_files(out)
    assert set(after) == set(files)
    # ...and came back byte-identical (determinism contract)
    assert pathlib.Path(after[lost]).read_bytes() == original[lost]
    m = read_manifest(spark, out)
    assert m["shards"][lost]["sha256"] == hashlib.sha256(
        original[lost]
    ).hexdigest()
    assert summary["docs"] == docs.count()


def test_corrupt_manifest_is_treated_as_absent(
    spark, packed_docs, tmp_path_factory
):
    """Round-5 ADVICE (low): a truncated/corrupt manifest (crash mid-write
    on a filesystem without atomic rename) must mean 'no resume state',
    not a json.loads crash — the export rewrites deterministically."""
    packed, docs = packed_docs
    out = str(tmp_path_factory.mktemp("shards_corrupt"))
    export_jsonl_shards(packed, docs, out)
    files = _shard_files(out)
    mpath = pathlib.Path(f"{out}/{MANIFEST_NAME}")
    whole = mpath.read_text()
    mpath.write_text(whole[: len(whole) // 2])  # truncated JSON
    # the Hadoop local FS keeps a checksum sidecar; drop it so the raw
    # truncated bytes are what read_manifest actually sees
    crc = mpath.parent / f".{MANIFEST_NAME}.crc"
    if crc.exists():
        crc.unlink()
    assert read_manifest(spark, out) is None

    summary = export_jsonl_shards(packed, docs, out, resume=True)
    assert summary["skipped_shards"] == 0
    assert set(_shard_files(out)) == set(files)
    m = read_manifest(spark, out)
    assert set(m["shards"]) == set(files)
