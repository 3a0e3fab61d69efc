"""Anchor-text extraction (round 6): kernel unit tests on adversarial
markup, an independent per-page reference check against the generator,
and plan-shape assertions for the aggregate."""

import duckdb
import pytest

from tests.conftest import SF_DIR
from usls_doc_spark.kernels.links import extract_links


def test_extract_links_basic_shapes():
    html = (
        '<a href="/x">one</a>'
        "<a href='/y'>two words</a>"
        "<a href=/bare>bare</a>"
        '<a class="z" href="/attr" rel="nofollow">attrs</a>'
    )
    assert extract_links(html) == [
        ("/x", "one"),
        ("/y", "two words"),
        ("/bare", "bare"),
        ("/attr", "attrs"),
    ]


def test_extract_links_inner_markup_entities_whitespace():
    html = '<a href="/a">click <b>here</b> &amp; now\n  please</a>'
    assert extract_links(html) == [("/a", "click here & now please")]
    # entity in the href unescapes too
    assert extract_links('<a href="/q?a=1&amp;b=2">q</a>') == [("/q?a=1&b=2", "q")]


def test_extract_links_malformed_degrades_never_raises():
    assert extract_links("<a href=") == []
    assert extract_links("<a>no href</a>") == []
    assert extract_links('<a href="/u">unclosed') == []
    # multiline body, close tag with whitespace
    assert extract_links('<a href="/m">a\nb</a  >') == [("/m", "a b")]


def test_page_links_match_generator_spec():
    """Per-page reference: the scanner over REAL generated HTML must yield
    exactly the generator's closed-form link list (io/synth.py)."""
    from usls_doc_spark.io.synth import SKEW_MOD, synth_page

    rows = duckdb.sql(
        f"SELECT doc_id, text, lang FROM '{SF_DIR}/documents.parquet' LIMIT 200"
    ).fetchall()
    checked_skew = False
    for doc_id, text, lang in rows:
        html = synth_page(doc_id, text, lang)["html"].decode("utf-8")
        nav_n = 1200 if doc_id % SKEW_MOD == 0 else 12
        checked_skew = checked_skew or nav_n == 1200
        want = [(f"/cat/{k}", f"section {k} link") for k in range(nav_n)]
        want += [
            ("/more", "read more stories here"),
            ("/about", "about"),
            ("/tos", "terms"),
        ]
        assert extract_links(html) == want, doc_id
    assert checked_skew, "corpus slice never hit a skew page"


def test_anchor_agg_plan_hot_key_safe(spark):
    from usls_doc_spark.pipeline.links import anchor_text_agg

    df = anchor_text_agg(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # '/about' is on EVERY page (site-chrome hot key): the aggregate must
    # carry a map-side PARTIAL level so the hot key collapses per mapper
    # before the shuffle. (min over a string buffer forces SortAggregate
    # rather than HashAggregate in Spark — the partial/merge structure,
    # which is what skew-safety rests on, is identical.)
    assert "partial_count" in plan and "partial_min" in plan
    # exact-distinct docs = the standard two-level (href,url)->href expand
    assert "count(distinct url" in plan
    # exactly the two aggregation exchanges — nothing else shuffles (the
    # REPARTITION_BY_NUM exchange is the deliberate pre-Arrow repartition)
    assert plan.count("ENSURE_REQUIREMENTS") == 2
    # the scan feeding the Arrow crossing carries only what synth needs
    reads = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert reads and all("warc_ts" not in r for r in reads)
