"""Annotator SVG sink + artifact cache tests (SURVEY.md §2.1 S4/S5)."""

import pathlib

import pytest

from usls_doc_spark.io.annotator import annotate_extractions, render_svg
from usls_doc_spark.io.artifacts import fetch_artifact


def test_render_svg_deterministic():
    blocks = [
        {"x": 48, "y": 48, "width": 64, "height": 16, "cls": "title", "conf": 0.95, "order": 0},
        {"x": 48, "y": 72, "width": 344, "height": 32, "cls": "plain text", "conf": 0.7, "order": 1},
    ]
    svg1 = render_svg(blocks)
    svg2 = render_svg(list(reversed(blocks)))  # order field, not list order
    assert svg1 == svg2
    assert svg1.count("<rect") == 3  # background + 2 boxes
    assert "#d62728" in svg1 and "plain text" in svg1


def test_annotate_extractions_writes_files(tmp_path):
    rows = [
        {"url": "https://example.org/doc/00000042", "blocks": [
            {"x": 1, "y": 2, "width": 3, "height": 4, "cls": "table", "conf": 0.8, "order": 0}
        ]},
        {"url": "https://example.org/doc/00000043", "blocks": []},
    ]
    n = annotate_extractions(rows, str(tmp_path), saveout="dbg")
    assert n == 2
    files = sorted(p.name for p in (tmp_path / "dbg").iterdir())
    assert files == ["00000042.svg", "00000043.svg"]


def test_fetch_artifact_cache_and_retry(tmp_path):
    src = tmp_path / "model.onnx"
    src.write_bytes(b"fake-model-bytes")
    url = src.as_uri()
    p1 = fetch_artifact(url, cache_dir=str(tmp_path / "cache"))
    assert p1.read_bytes() == b"fake-model-bytes"
    # cache hit: same path, no re-fetch even if source disappears
    src.unlink()
    p2 = fetch_artifact(url, cache_dir=str(tmp_path / "cache"))
    assert p2 == p1

    # retry/backoff: flaky fetcher succeeds on 3rd attempt
    calls = {"n": 0}

    def flaky(u):
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")
        return b"ok"

    p3 = fetch_artifact(
        "https://example.org/m.bin", cache_dir=str(tmp_path / "c2"),
        fetch_fn=flaky, backoff_s=0.01,
    )
    assert p3.read_bytes() == b"ok" and calls["n"] == 3

    # exhausted retries raise
    def always_fail(u):
        raise OSError("down")

    with pytest.raises(RuntimeError):
        fetch_artifact(
            "https://example.org/x.bin", cache_dir=str(tmp_path / "c3"),
            fetch_fn=always_fail, backoff_s=0.01,
        )
