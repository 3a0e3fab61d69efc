"""DOM block parser robustness (kernels/boilerplate.py): table merging,
boilerplate ancestry, class hints, entities, malformed input."""

from usls_doc_spark.kernels.boilerplate import classify_block, parse_blocks


def blocks_of(html: str):
    return parse_blocks(html)


def test_table_cells_merge_into_one_block():
    html = """<table><tr><td>a1</td><td>a2</td></tr>
              <tr><td>b1</td><td>b2</td></tr></table>"""
    b = blocks_of(html)
    assert len(b) == 1
    assert b[0].tag == "table"
    assert b[0].text == "a1 a2 b1 b2"
    assert classify_block(b[0])[0] == "table"


def test_nav_aside_ancestry_marks_boilerplate():
    html = "<nav><ul><li>x</li></ul></nav><aside><p>promo</p></aside><p>body text here</p>"
    b = blocks_of(html)
    assert [blk.boilerplate_ancestor for blk in b] == [True, True, False]
    assert classify_block(b[0])[0] == "abandon"
    assert classify_block(b[2])[0] == "plain text"


def test_class_hint_divs():
    html = '<div class="Sidebar promo"><p>buy now</p></div><div class="content"><p>real</p></div>'
    b = blocks_of(html)
    assert b[0].boilerplate_ancestor is True
    assert b[1].boilerplate_ancestor is False


def test_link_density_counts_anchor_text():
    html = '<p><a href="/x">link text</a> and plain</p>'
    b = blocks_of(html)[0]
    assert b.link_chars == len("link text")
    assert 0 < b.link_density < 1
    pure = blocks_of('<p><a href="/y">only links</a></p>')[0]
    assert pure.link_density == 1.0
    assert classify_block(pure)[0] == "abandon"


def test_entities_unescaped():
    b = blocks_of("<p>a &amp; b &lt;c&gt;</p>")[0]
    assert b.text == "a & b <c>"


def test_script_style_skipped():
    html = "<script>var x = 'nope';</script><style>p{}</style><p>kept</p>"
    b = blocks_of(html)
    assert len(b) == 1 and b[0].text == "kept"


def test_malformed_html_degrades():
    # unclosed tags, stray close tags, truncated entity — never raises
    for bad in (
        "<p>unclosed",
        "</p></div><p>stray closes</p>",
        "<p>trunc &am",
        "<table><td>never closed",
        "\x00\x01<p>binary noise</p>",
    ):
        bs = blocks_of(bad)
        assert isinstance(bs, list)
    assert blocks_of("<p>unclosed")[0].text == "unclosed"


def test_whitespace_normalization():
    b = blocks_of("<p>  a\n\t b   c </p>")[0]
    assert b.text == "a b c"


def test_nested_blocks_inner_wins():
    # li inside ul: text lands in the li block
    b = blocks_of("<ul><li>one</li><li>two</li></ul>")
    assert [x.text for x in b] == ["one", "two"]


def test_void_element_with_hint_class_does_not_poison_page():
    # <img class="ad"> is a void element: it must not push a boilerplate
    # marker that never pops (round-1 ADVICE — every later block silently
    # became 'abandon' and its text was dropped)
    html = '<img class="ad"><p>real article text here</p>'
    b = blocks_of(html)
    assert len(b) == 1
    assert b[0].text == "real article text here"
    assert not b[0].boilerplate_ancestor


def test_nested_same_name_tag_keeps_outer_marker():
    # inner </div> must close the INNER div, not pop the sidebar marker —
    # the <p> is still inside the boilerplate container
    html = '<div class="sidebar"><div>x</div><p>sidebar junk text</p></div><p>body</p>'
    b = blocks_of(html)
    texts = {x.text: x.boilerplate_ancestor for x in b}
    assert texts["sidebar junk text"] is True
    assert texts["body"] is False


def test_self_closing_hinted_element_recovers():
    # XHTML-style self-closing non-void tag: start+end fire back to back
    html = '<div class="promo"/><p>after</p>'
    b = blocks_of(html)
    assert b[-1].text == "after"
    assert not b[-1].boilerplate_ancestor


def test_stray_end_tags_do_not_underflow():
    html = "</div></nav></footer><p>fine</p>"
    b = blocks_of(html)
    assert b[0].text == "fine" and not b[0].boilerplate_ancestor
