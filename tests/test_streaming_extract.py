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
