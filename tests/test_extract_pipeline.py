"""End-to-end extraction pipeline tests: byte-identical golden fixtures,
partition-count invariance, corrupt-row degradation (SURVEY.md §5.2)."""

import json
import pathlib

import pytest

from tests.conftest import SF_DIR

FIXTURES = pathlib.Path(__file__).resolve().parents[1] / "fixtures" / "golden_extractions_sf0.001.json"


@pytest.fixture(scope="module")
def golden():
    rows = json.loads(FIXTURES.read_text())
    return {r["url"]: r for r in rows}


def _run_extraction(spark, n_partitions: int):
    from usls_doc_spark.io.synth import pages_from_documents
    from usls_doc_spark.pipeline.extract import extract_pages

    pages = pages_from_documents(spark, SF_DIR).repartition(n_partitions)
    return {r["url"]: r.asDict(recursive=True) for r in extract_pages(pages).collect()}


def test_byte_identical_vs_fixtures(spark, golden):
    got = _run_extraction(spark, 8)
    assert set(got) == set(golden)
    for url, g in golden.items():
        r = got[url]
        assert r["error"] is None, (url, r["error"])
        # THE per-row invariant: byte-identical extracted text per url
        assert r["extracted_text"].encode("utf-8") == g["extracted_text"].encode("utf-8"), url
        assert r["n_blocks"] == g["n_blocks"], url
        assert r["extracted_bytes"] == g["extracted_bytes"], url
        got_blocks = [
            (b["x"], b["y"], b["width"], b["height"], b["cls"], b["order"]) for b in r["blocks"]
        ]
        exp_blocks = [
            (b["x"], b["y"], b["width"], b["height"], b["cls"], b["order"]) for b in g["blocks"]
        ]
        assert got_blocks == exp_blocks, url


def test_partition_count_invariance(spark):
    # same bytes out of 3-partition and 16-partition runs — no dependence on
    # task layout (SURVEY.md §7 "byte-identical under reordering")
    a = _run_extraction(spark, 3)
    b = _run_extraction(spark, 16)
    assert a.keys() == b.keys()
    for url in a:
        assert a[url]["extracted_text"] == b[url]["extracted_text"]
        assert a[url]["blocks"] == b[url]["blocks"]


def test_corrupt_rows_degrade_not_fail(spark):
    # dataloader.rs:376-383 semantics: unreadable input -> warn/skip, keyed by
    # url (no positional zip misalignment — docstructbench.rs:74 bug avoided)
    import datetime as dt

    from usls_doc_spark.pipeline.extract import extract_pages

    rows = [
        ("u-null", dt.datetime(2024, 1, 1), None, "t", "en"),
        ("u-bad-utf8", dt.datetime(2024, 1, 1), b"\xff\xfe<p>x</p>", "t", "en"),
        ("u-ok", dt.datetime(2024, 1, 1), b"<html><body><h1>T</h1><p>hello world</p></body></html>", "t", "en"),
    ]
    pages = spark.createDataFrame(
        rows, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    )
    out = {r["url"]: r.asDict() for r in extract_pages(pages).collect()}
    assert len(out) == 3
    assert out["u-null"]["error"] is not None
    assert out["u-null"]["extracted_text"] is None
    assert out["u-bad-utf8"]["error"] is None  # decodes with replacement
    assert out["u-ok"]["error"] is None
    assert out["u-ok"]["extracted_text"] == "T hello world"


def test_batched_rows_bitwise_equal_per_page_path():
    """Round-6 kernel lever A/B: extract_rows (decode batched across the
    whole Arrow batch) must be BITWISE identical to the per-page
    extract_page path over the full corpus — including skew pages, table
    pages, two-column pages, and interleaved corrupt rows."""
    import duckdb
    import numpy as np

    from usls_doc_spark.io.synth import synth_page
    from usls_doc_spark.kernels.stub_layout import StubLayoutModel
    from usls_doc_spark.pipeline.extract import extract_page, extract_rows

    docs = duckdb.sql(
        f"SELECT doc_id, text, lang FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    htmls, urls = [], []
    for i, (d, t, l) in enumerate(docs):
        p = synth_page(d, t, l)
        htmls.append(p["html"])
        urls.append(p["url"])
        if i % 97 == 0:  # interleave corrupt rows among real pages
            htmls.append(None)
            urls.append(f"u-null-{i}")
    model = StubLayoutModel()
    batched = extract_rows(htmls, urls, model)
    for h, u, got in zip(htmls, urls, batched):
        want = extract_page(h, u, model)
        # float32 conf compared by exact bits via np.float32 equality
        assert got["url"] == want["url"]
        assert got["extracted_text"] == want["extracted_text"]
        assert got["error"] == want["error"]
        assert got["n_blocks"] == want["n_blocks"]
        assert got["extracted_bytes"] == want["extracted_bytes"]
        for gb, wb in zip(got["blocks"], want["blocks"]):
            assert gb == wb or (
                {k: v for k, v in gb.items() if k != "conf"}
                == {k: v for k, v in wb.items() if k != "conf"}
                and np.float32(gb["conf"]).tobytes()
                == np.float32(wb["conf"]).tobytes()
            ), u


def test_fallback_decode_isolates_pathological_page(monkeypatch):
    """Round-6 ADVICE item 1: when the batched decode fails AND one page's
    per-page decode also fails, that page alone degrades to an error row —
    the rest of the Arrow batch still extracts (S3 skip-unreadable)."""
    import usls_doc_spark.pipeline.extract as px
    from usls_doc_spark.kernels.stub_layout import StubLayoutModel

    def boom_batched(*a, **k):
        raise RuntimeError("batched decode exploded")

    real_decode = px.decode_preds
    calls = {"i": -1}

    def boom_second_page(*a, **k):
        calls["i"] += 1
        if calls["i"] == 1:
            raise ValueError("pathological page")
        return real_decode(*a, **k)

    monkeypatch.setattr(px, "decode_preds_batched", boom_batched)
    monkeypatch.setattr(px, "decode_preds", boom_second_page)

    htmls = [
        b"<html><body><h1>A</h1><p>alpha beta</p></body></html>",
        b"<html><body><h1>B</h1><p>gamma delta</p></body></html>",
        b"<html><body><h1>C</h1><p>epsilon zeta</p></body></html>",
    ]
    rows = px.extract_rows(htmls, ["u0", "u1", "u2"], StubLayoutModel())
    by = {r["url"]: r for r in rows}
    assert len(rows) == 3
    assert by["u1"]["error"] is not None and "pathological" in by["u1"]["error"]
    assert by["u1"]["extracted_text"] is None
    assert by["u0"]["error"] is None and by["u0"]["extracted_text"] == "A alpha beta"
    assert by["u2"]["error"] is None and by["u2"]["extracted_text"] == "C epsilon zeta"


def test_fallback_infer_isolates_pathological_page(monkeypatch):
    """Round-7 infer batching keeps S3 semantics: when the batched infer
    fails AND one page's per-page infer also fails, that page alone
    degrades to an error row."""
    import usls_doc_spark.pipeline.extract as px
    from usls_doc_spark.kernels.stub_layout import StubLayoutModel

    def boom_batched(*a, **k):
        raise RuntimeError("batched infer exploded")

    monkeypatch.setattr(px, "infer_pages_batched", boom_batched)

    class FlakyModel(StubLayoutModel):
        calls = 0

        def infer(self, blocks, two_col):
            FlakyModel.calls += 1
            if FlakyModel.calls == 2:
                raise ValueError("pathological infer page")
            return super().infer(blocks, two_col)

    htmls = [
        b"<html><body><h1>A</h1><p>alpha beta</p></body></html>",
        b"<html><body><h1>B</h1><p>gamma delta</p></body></html>",
        b"<html><body><h1>C</h1><p>epsilon zeta</p></body></html>",
    ]
    rows = px.extract_rows(htmls, ["u0", "u1", "u2"], FlakyModel())
    by = {r["url"]: r for r in rows}
    assert by["u1"]["error"] is not None and "pathological" in by["u1"]["error"]
    assert by["u0"]["error"] is None and by["u0"]["extracted_text"] == "A alpha beta"
    assert by["u2"]["error"] is None and by["u2"]["extracted_text"] == "C epsilon zeta"


def test_infer_pages_batched_bitwise_equal_edge_pages():
    """infer_pages_batched == per-page model.infer bit-for-bit, including
    the segmented-prefix edge cases: empty leading/middle/trailing pages
    (a trailing empty page once corrupted the preceding page's height via
    reduceat — pinned here) and two-column pages mid-batch."""
    import numpy as np

    from usls_doc_spark.kernels.boilerplate import parse_blocks
    from usls_doc_spark.kernels.stub_layout import (
        StubLayoutModel,
        infer_pages_batched,
    )

    def page(words, two=False):
        body = " ".join(f"w{k}" for k in range(words))
        return parse_blocks(f"<html><body><h1>T</h1><p>{body}</p></body></html>")

    model = StubLayoutModel()
    page_blocks = [[], page(3), page(400), [], page(40), page(7), []]
    two_cols = [True, False, True, False, True, False, True]
    batched = infer_pages_batched(model, page_blocks, two_cols)
    for (b, tc), (p2, s2, c2) in zip(zip(page_blocks, two_cols), batched):
        p1, s1, c1 = model.infer(b, tc)
        assert np.array_equal(p1, p2)
        assert s1 == s2
        assert list(c1) == list(c2)
