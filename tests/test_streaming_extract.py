"""Streaming extraction: micro-batched file ingest produces the same
byte-identical rows as the batch path, and restarts resume exactly-once."""

import json
import pathlib

from tests.conftest import SF_DIR

FIXTURES = (
    pathlib.Path(__file__).resolve().parents[1] / "fixtures" / "golden_extractions_sf0.001.json"
)


def test_streaming_matches_batch_and_resumes(spark, tmp_path_factory):
    from usls_doc_spark.io.synth import pages_from_documents
    from usls_doc_spark.streaming.extract import start_streaming_extraction

    base = tmp_path_factory.mktemp("stream")
    pages_dir = str(base / "pages")
    out_dir = str(base / "out")
    ckpt_dir = str(base / "ckpt")

    pages = pages_from_documents(spark, SF_DIR).repartition(6)
    pages.write.parquet(pages_dir)

    q = start_streaming_extraction(spark, pages_dir, out_dir, ckpt_dir)
    q.processAllAvailable()
    q.stop()

    got = {r["url"]: r for r in spark.read.parquet(out_dir).collect()}
    golden = {r["url"]: r for r in json.loads(FIXTURES.read_text())}
    assert set(got) == set(golden)
    for url, g in golden.items():
        assert got[url]["extracted_text"] == g["extracted_text"]

    # restart with the same checkpoint: nothing reprocessed, no duplicates
    q2 = start_streaming_extraction(spark, pages_dir, out_dir, ckpt_dir)
    q2.processAllAvailable()
    q2.stop()
    again = spark.read.parquet(out_dir)
    assert again.count() == len(golden)


def test_kill_mid_stream_then_resume_no_duplicates(spark, tmp_path_factory):
    """North-rule failure contract for the streaming path (round-3 VERDICT
    item 7): a query stopped partway through the input (killed after the
    micro-batches covering the files present so far) leaves a checkpoint
    the next start resumes from — the second query processes ONLY the
    remaining files and the sink ends with exactly one row per page.
    Deterministic kill point: the first query's source dir holds half the
    files; the rest land before the resume."""
    from usls_doc_spark.io.synth import pages_from_documents
    from usls_doc_spark.streaming.extract import start_streaming_extraction

    base = tmp_path_factory.mktemp("stream_kill")
    pages_dir = base / "pages"
    stage = base / "stage"
    out_dir = str(base / "out")
    ckpt_dir = str(base / "ckpt")
    pages = pages_from_documents(spark, SF_DIR)
    n_pages = pages.count()
    pages.repartition(4).write.parquet(str(stage))
    parts = sorted(stage.glob("part-*.parquet"))
    assert len(parts) == 4
    pages_dir.mkdir()
    for p in parts[:2]:
        p.rename(pages_dir / p.name)

    # first query: drains the 2 visible files, then is killed
    q = start_streaming_extraction(spark, str(pages_dir), out_dir, ckpt_dir,
                                   max_files_per_trigger=1)
    q.processAllAvailable()
    q.stop()
    n_first = spark.read.parquet(out_dir).count()
    assert 0 < n_first < n_pages

    # the remaining crawl files arrive; resume from the same checkpoint
    for p in parts[2:]:
        p.rename(pages_dir / p.name)
    q2 = start_streaming_extraction(spark, str(pages_dir), out_dir, ckpt_dir,
                                    max_files_per_trigger=1)
    q2.processAllAvailable()
    q2.stop()

    out = spark.read.parquet(out_dir)
    assert out.count() == n_pages
    assert out.select("url").distinct().count() == n_pages  # no duplicates
