"""DOM boilerplate stripping: block segmentation + text/link-density scoring.

North-rule capability (BASELINE.json north_star: "DOM-tree boilerplate
stripping via text-density and link-density heuristics (readability/
Arc90-style scoring)"). The reference has no HTML code — this is new,
Spark-first design: a pure-python kernel (stdlib html.parser, no external
deps) run per document inside an Arrow-batched pandas UDF.

Classification maps each DOM block onto the DocStructBench label set
(/root/reference/src/models/yolo/config.rs:23-34) so the downstream layout /
abandon-filter path (docstructbench.rs:82-108 semantics) applies unchanged:
navigation/footer/ad blocks become "abandon" candidates whose confidence is
derived from link density; content blocks become "title"/"plain text"/
"table"/"figure_caption".

Determinism: pure function of the HTML bytes; all confidences computed in
float32; whitespace normalized with str.split()/join.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from html import unescape
from html.parser import HTMLParser

import numpy as np

_USE_SLOW_PARSER = os.environ.get("USLS_SLOW_PARSER", "") == "1"

# tags whose text forms one extractable block
BLOCK_TAGS = frozenset(
    {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre", "blockquote", "figcaption", "caption"}
)
# containers treated as a single block (all nested text merges)
MERGE_CONTAINER_TAGS = frozenset({"table"})
# ancestors that mark a block as boilerplate regardless of its own density
BOILERPLATE_ANCESTOR_TAGS = frozenset({"nav", "footer", "header", "aside"})
BOILERPLATE_CLASS_HINTS = frozenset({"sidebar", "ad", "ads", "banner", "menu", "promo", "related"})
SKIP_CONTENT_TAGS = frozenset({"script", "style", "noscript", "template"})
# stdlib html.parser raw-text (CDATA) mode applies ONLY to these two
# (HTMLParser.CDATA_CONTENT_ELEMENTS); noscript/template content is
# tokenized normally — its tags still run the handlers (so e.g. a
# class="ad" div inside <noscript> marks boilerplate ancestry) while
# _skip_depth drops the text. The fast tokenizer must match exactly.
CDATA_CONTENT_TAGS = frozenset({"script", "style"})
# HTML5 void elements: never produce end tags, must not occupy the open-
# element stack (an <img class="ad"> would otherwise mark the rest of the
# page boilerplate)
VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

LINK_DENSITY_ABANDON = np.float32(0.5)

# one dict lookup instead of ~6 set-membership tests per tag event (the
# handlers run ~100x per page inside the extraction hot path); bit values
# are private to this module
_F_SKIP, _F_BP, _F_VOID, _F_ANCHOR, _F_MERGE, _F_BLOCK, _F_CELLSEP = (
    1, 2, 4, 8, 16, 32, 64,
)
_TAG_FLAGS: dict[str, int] = {}
for _t, _f in (
    *((t, _F_SKIP) for t in SKIP_CONTENT_TAGS),
    *((t, _F_BP) for t in BOILERPLATE_ANCESTOR_TAGS),
    *((t, _F_VOID) for t in VOID_TAGS),
    ("a", _F_ANCHOR),
    *((t, _F_MERGE) for t in MERGE_CONTAINER_TAGS),
    *((t, _F_BLOCK) for t in BLOCK_TAGS),
    *((t, _F_CELLSEP) for t in ("td", "th", "tr", "caption", "li", "p")),
):
    _TAG_FLAGS[_t] = _TAG_FLAGS.get(_t, 0) | _f


@dataclass
class Block:
    tag: str  # block tag (p, h1, li, table, ...)
    text: str = ""
    link_chars: int = 0
    boilerplate_ancestor: bool = False
    _parts: list = field(default_factory=list)

    @property
    def n_chars(self) -> int:
        return len(self.text)

    @property
    def link_density(self) -> float:
        return float(np.float32(self.link_chars) / np.float32(max(self.n_chars, 1)))


class _BlockParser(HTMLParser):
    """Segment HTML into text blocks, tracking anchor text and boilerplate
    ancestry. Never raises on malformed input (S3 semantics,
    dataloader.rs:376-383: unreadable inputs degrade, they don't fail)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._open: list[Block] = []
        # open-element stack: one (tag, is_boilerplate_marker) entry per
        # non-void start tag, popped per matching end tag — nested same-name
        # tags no longer pop an outer boilerplate marker early, and void
        # elements never corrupt the stack (round-1 ADVICE)
        self._elem_stack: list[tuple[str, bool]] = []
        self._bp_depth = 0  # count of open boilerplate markers
        self._skip_depth = 0  # script/style nesting
        self._anchor_depth = 0
        self._merge_depth = 0  # inside <table>

    def _start_block(self, tag: str) -> None:
        self._open.append(Block(tag=tag, boilerplate_ancestor=self._bp_depth > 0))

    def _end_block(self) -> None:
        blk = self._open.pop()
        blk.text = " ".join("".join(blk._parts).split())
        if blk.text:
            self.blocks.append(blk)

    def handle_starttag(self, tag, attrs):
        f = _TAG_FLAGS.get(tag, 0)
        if f & _F_SKIP:
            self._skip_depth += 1
            return
        if attrs:
            classes = set((dict(attrs).get("class") or "").lower().split())
            is_bp = bool(f & _F_BP) or bool(classes & BOILERPLATE_CLASS_HINTS)
        else:  # the common case: no attributes -> no class hints to check
            is_bp = bool(f & _F_BP)
        if not f & _F_VOID:
            self._elem_stack.append((tag, is_bp))
            if is_bp:
                self._bp_depth += 1
        if not f & (_F_ANCHOR | _F_MERGE | _F_BLOCK):
            return  # plain container (div/span/...), the common case
        if f & _F_ANCHOR:
            self._anchor_depth += 1
            return
        if f & _F_MERGE:
            self._merge_depth += 1
            if self._merge_depth == 1:
                self._start_block(tag)
            return
        if self._merge_depth == 0:  # block tag
            self._start_block(tag)

    def handle_endtag(self, tag):
        f = _TAG_FLAGS.get(tag, 0)
        if f & _F_SKIP:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        # close the NEAREST open element with this name (standard HTML
        # recovery): pop it plus everything opened after it. Fast path:
        # the matching element is the stack top (well-nested markup).
        st = self._elem_stack
        if st and st[-1][0] == tag:
            if st[-1][1]:
                self._bp_depth -= 1
            st.pop()
        else:
            for i in range(len(st) - 1, -1, -1):
                if st[i][0] == tag:
                    for _t, bp in st[i:]:
                        if bp:
                            self._bp_depth -= 1
                    del st[i:]
                    break
        if not f & (_F_ANCHOR | _F_MERGE | _F_CELLSEP | _F_BLOCK):
            return  # plain container, the common case
        if f & _F_ANCHOR:
            self._anchor_depth = max(0, self._anchor_depth - 1)
            return
        if f & _F_MERGE:
            if self._merge_depth == 1 and self._open:
                self._end_block()
            self._merge_depth = max(0, self._merge_depth - 1)
        elif self._merge_depth > 0 and f & _F_CELLSEP:
            # cell/row boundaries become whitespace inside a merged block
            if self._open:
                self._open[-1]._parts.append(" ")
        elif f & _F_BLOCK and self._merge_depth == 0:
            if self._open and self._open[-1].tag == tag:
                self._end_block()

    def handle_data(self, data):
        if self._skip_depth or not self._open:
            return
        blk = self._open[-1]
        blk._parts.append(data)
        if self._anchor_depth > 0:
            blk.link_chars += len(" ".join(data.split()))


# ---------------------------------------------------------------------------
# fast tokenizer: single-pass regex scan with the _BlockParser handler
# semantics inlined over plain locals (stdlib html.parser spends ~60% of
# extraction time in its char-by-char goahead loop; the per-event method
# dispatch was the next-largest share). Byte-identical block output is
# enforced by tests/test_boilerplate_parser.py differential tests over all
# fixture pages and an adversarial corpus; USLS_SLOW_PARSER=1 forces the
# stdlib path.
# ---------------------------------------------------------------------------

# WELL-FORMED tag grammar only: simple name, whitespace-separated attrs with
# quoted or plain bare values. Anything outside this subset (stray quotes in
# attr names, '<' inside tags, '/' not before '>', junk in end tags, ...)
# raises _FallbackToStdlib and the WHOLE page re-parses through stdlib
# html.parser — its tolerant-recovery grammar has too many quirks to
# replicate safely, and real pages that trip it are rare, so correctness is
# guaranteed by construction and speed preserved for the common case.
# re.ASCII: python's Unicode \s accepts \x1c-\x1f/\x85/\xa0 as whitespace,
# which stdlib's tolerant tag grammar recovers from differently — those
# pages must FALL BACK, not parse here. '<' is likewise excluded from attr
# tokens ('<p\x1f<p>' must not read as one tag with a '<p' attribute).
# Shrinking the accepted subset is always safe: rejected pages reparse
# through stdlib (the oracle), they are never mis-tokenized.
_TAG_RE = re.compile(
    r"<(?P<end>/)?(?P<name>[a-zA-Z][a-zA-Z0-9:._-]*)"
    r"(?P<attrs>(?:\s+[^\s/>='\"`<]+(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s>'\"`=<]*))?)*)"
    r"\s*(?P<slash>/?)>",
    re.ASCII,
)


class _FallbackToStdlib(Exception):
    """Markup outside the fast tokenizer's well-formed subset."""
_CLASS_RE = re.compile(
    r"""[\s"']class\s*=\s*("([^"]*)"|'([^']*)'|([^\s>/]+))""", re.IGNORECASE
)
# stdlib closes comments with _markupbase._commentclose = r'--\s*>' —
# whitespace IS allowed between -- and > ('<!--x--\n>' ends the comment).
# Same pattern verbatim (deliberately NOT re.ASCII: this REPLICATES
# stdlib, it does not approximate it, so exotic-whitespace closers must
# match too). A literal find('-->') here mis-parsed '--\n>' closers —
# caught by the 20k-example differential fuzz, round 5.
_COMMENT_CLOSE_RE = re.compile(r"--\s*>")
# stdlib exits CDATA mode only on a STRICT close tag r'</\s*tag\s*>' with
# the exact element name — '</scriptx>' or '</script x=1>' stay inside.
# Only script/style: stdlib's CDATA_CONTENT_ELEMENTS excludes noscript/
# template, whose inner tags must keep firing the handlers.
_SKIP_CLOSE_RES = {
    t: re.compile(rf"</\s*{t}\s*>", re.IGNORECASE) for t in CDATA_CONTENT_TAGS
}


def _fast_parse(html: str) -> list[Block]:
    """Single-function tokenizer + block state machine over plain locals.

    Semantics are EXACTLY the _BlockParser handlers driven by the regex
    tokenizer (the pre-round-5 ``_fast_feed`` shape), with the per-event
    method dispatch and attribute traffic inlined away — the handlers run
    ~300x per page and were the largest remaining share of extraction
    kernel time after the NMS conflict-graph fix. Byte-identical block
    output vs the stdlib path is enforced by the differential tests in
    tests/test_boilerplate_parser.py (fixtures + adversarial corpus +
    hypothesis fuzz). Raises _FallbackToStdlib outside the well-formed
    subset; any other internal error degrades to the blocks recovered so
    far (S3 semantics), matching the old except-pass behavior.
    """
    blocks: list[Block] = []
    open_blocks: list[Block] = []
    elem_stack: list[tuple[str, bool]] = []
    bp_depth = 0
    skip_depth = 0
    anchor_depth = 0
    merge_depth = 0
    flags = _TAG_FLAGS
    hints = BOILERPLATE_CLASS_HINTS
    i, n = 0, len(html)
    find = html.find
    tag_match = _TAG_RE.match
    class_search = _CLASS_RE.search
    pend: str | None = None  # end-tag event funnel: one inline handler site
    try:
        while i < n or pend is not None:
            if pend is not None:
                name, pend = pend, None
                f = flags.get(name, 0)
                if f & _F_SKIP:
                    if skip_depth:
                        skip_depth -= 1
                    continue
                # close the NEAREST open element with this name (standard
                # HTML recovery); fast path: well-nested markup
                if elem_stack and elem_stack[-1][0] == name:
                    if elem_stack[-1][1]:
                        bp_depth -= 1
                    elem_stack.pop()
                else:
                    for j in range(len(elem_stack) - 1, -1, -1):
                        if elem_stack[j][0] == name:
                            for _t, was_bp in elem_stack[j:]:
                                if was_bp:
                                    bp_depth -= 1
                            del elem_stack[j:]
                            break
                if not f & (_F_ANCHOR | _F_MERGE | _F_CELLSEP | _F_BLOCK):
                    continue  # plain container, the common case
                if f & _F_ANCHOR:
                    if anchor_depth:
                        anchor_depth -= 1
                elif f & _F_MERGE:
                    if merge_depth == 1 and open_blocks:
                        blk = open_blocks.pop()
                        blk.text = " ".join("".join(blk._parts).split())
                        if blk.text:
                            blocks.append(blk)
                    if merge_depth:
                        merge_depth -= 1
                elif merge_depth > 0 and f & _F_CELLSEP:
                    # cell/row boundaries become whitespace in merged blocks
                    if open_blocks:
                        open_blocks[-1]._parts.append(" ")
                elif f & _F_BLOCK and merge_depth == 0:
                    if open_blocks and open_blocks[-1].tag == name:
                        blk = open_blocks.pop()
                        blk.text = " ".join("".join(blk._parts).split())
                        if blk.text:
                            blocks.append(blk)
                continue
            lt = find("<", i)
            if lt != i:
                s = html[i:] if lt < 0 else html[i:lt]
                if s and skip_depth == 0 and open_blocks:
                    if "&" in s:
                        s = unescape(s)
                    blk = open_blocks[-1]
                    blk._parts.append(s)
                    if anchor_depth > 0:
                        blk.link_chars += len(" ".join(s.split()))
                if lt < 0:
                    break
            nxt = html[lt + 1] if lt + 1 < n else ""
            # comment check only under '!' — '<!--' implies nxt == '!', so
            # hoisting the nxt dispatch saves a startswith per tag (~200
            # tags/page) with identical semantics
            if nxt == "!" and html.startswith("<!--", lt):
                cm = _COMMENT_CLOSE_RE.search(html, lt + 4)
                if cm is None:
                    # invalid/unterminated comment ('<!-->', '<!--->', or
                    # EOF): stdlib close() emits through the next '>' as
                    # data and resumes; with no '>', it emits only up to
                    # the NEXT '<' (exclusive) and reprocesses from there
                    # — NOT the whole remainder (goahead(end=1) recovery;
                    # round-5 differential-fuzz fix, the one-fragment
                    # flush drifted link_chars by the collapsed gap)
                    g = find(">", lt + 1)
                    if g < 0:
                        g2 = find("<", lt + 1)
                        s = html[lt:] if g2 < 0 else html[lt:g2]
                    else:
                        s = html[lt : g + 1]
                    if s and skip_depth == 0 and open_blocks:
                        if "&" in s:
                            s = unescape(s)
                        blk = open_blocks[-1]
                        blk._parts.append(s)
                        if anchor_depth > 0:
                            blk.link_chars += len(" ".join(s.split()))
                    if g >= 0:
                        i = g + 1
                        continue
                    if g2 < 0:
                        break
                    i = g2
                    continue
                i = cm.end()
                continue
            if nxt in ("!", "?"):
                end = find(">", lt + 2)
                if end < 0:  # unterminated decl/PI: data up to next '<'
                    g2 = find("<", lt + 1)
                    s = html[lt:] if g2 < 0 else html[lt:g2]
                    if s and skip_depth == 0 and open_blocks:
                        if "&" in s:
                            s = unescape(s)
                        blk = open_blocks[-1]
                        blk._parts.append(s)
                        if anchor_depth > 0:
                            blk.link_chars += len(" ".join(s.split()))
                    if g2 < 0:
                        break
                    i = g2
                    continue
                i = end + 1
                continue
            is_letter = "a" <= nxt <= "z" or "A" <= nxt <= "Z"
            if nxt == "/" and not (
                lt + 2 < n
                and ("a" <= html[lt + 2] <= "z" or "A" <= html[lt + 2] <= "Z")
            ):
                # '</' + non-name: html.parser consumes it as a bogus
                # comment (up to and including the next '>'), emitting
                # nothing; if no '>' follows, close() emits data up to
                # the next '<' and reprocesses from there
                end = find(">", lt + 2)
                if end < 0:
                    g2 = find("<", lt + 1)
                    s = html[lt:] if g2 < 0 else html[lt:g2]
                    if s and skip_depth == 0 and open_blocks:
                        if "&" in s:
                            s = unescape(s)
                        blk = open_blocks[-1]
                        blk._parts.append(s)
                        if anchor_depth > 0:
                            blk.link_chars += len(" ".join(s.split()))
                    if g2 < 0:
                        break
                    i = g2
                    continue
                i = end + 1
                continue
            if not is_letter and nxt != "/":
                # recovery: bare '<' is text
                if skip_depth == 0 and open_blocks:
                    blk = open_blocks[-1]
                    blk._parts.append("<")
                    if anchor_depth > 0:
                        blk.link_chars += 1  # len(" ".join("<".split()))
                i = lt + 1
                continue
            m = tag_match(html, lt)
            if not m:
                if find(">", lt) < 0:
                    # incomplete tag at EOF: close() emits data up to the
                    # next '<' and reprocesses from there (never the whole
                    # remainder in one fragment — the whitespace-collapse
                    # of a merged fragment drifts link_chars)
                    g2 = find("<", lt + 1)
                    s = html[lt:] if g2 < 0 else html[lt:g2]
                    if s and skip_depth == 0 and open_blocks:
                        if "&" in s:
                            s = unescape(s)
                        blk = open_blocks[-1]
                        blk._parts.append(s)
                        if anchor_depth > 0:
                            blk.link_chars += len(" ".join(s.split()))
                    if g2 < 0:
                        break
                    i = g2
                    continue
                raise _FallbackToStdlib  # tag outside the well-formed subset
            end_g, name, attrs_s, slash = m.group("end", "name", "attrs", "slash")
            name = name.lower()
            i = m.end()
            if end_g:
                if attrs_s.strip() or slash:
                    raise _FallbackToStdlib  # junk inside an end tag
                pend = name
                continue
            f = flags.get(name, 0)
            if f & _F_SKIP:
                skip_depth += 1
            else:
                is_bp = bool(f & _F_BP)
                if not is_bp and attrs_s and "class" in attrs_s.lower():
                    cm = class_search(attrs_s)
                    if cm:
                        val = cm.group(2) or cm.group(3) or cm.group(4) or ""
                        if "&" in val:
                            val = unescape(val)
                        is_bp = not hints.isdisjoint(val.lower().split())
                if not f & _F_VOID:
                    elem_stack.append((name, is_bp))
                    if is_bp:
                        bp_depth += 1
                if f & (_F_ANCHOR | _F_MERGE | _F_BLOCK):
                    if f & _F_ANCHOR:
                        anchor_depth += 1
                    elif f & _F_MERGE:
                        merge_depth += 1
                        if merge_depth == 1:
                            open_blocks.append(
                                Block(tag=name, boilerplate_ancestor=bp_depth > 0)
                            )
                    elif merge_depth == 0:
                        open_blocks.append(
                            Block(tag=name, boilerplate_ancestor=bp_depth > 0)
                        )
            if slash:
                pend = name
            elif name in CDATA_CONTENT_TAGS:
                # CDATA mode: raw content until the strict matching close
                cm2 = _SKIP_CLOSE_RES[name].search(html, i)
                if cm2 is None:
                    break  # unclosed script/style swallows the rest
                pend = name
                i = cm2.end()
    except _FallbackToStdlib:
        raise
    except Exception:  # defensive: degrade to blocks recovered so far (S3)
        pass
    while open_blocks:  # flush unclosed blocks (malformed html)
        blk = open_blocks.pop()
        blk.text = " ".join("".join(blk._parts).split())
        if blk.text:
            blocks.append(blk)
    return blocks


def parse_blocks(html: str) -> list[Block]:
    """Parse HTML into ordered text blocks. Malformed HTML degrades to
    whatever blocks were recoverable (never raises). Markup outside the
    fast tokenizer's well-formed subset re-parses through stdlib."""
    if _USE_SLOW_PARSER:
        return parse_blocks_stdlib(html)
    try:
        return _fast_parse(html)
    except _FallbackToStdlib:
        return parse_blocks_stdlib(html)


def parse_blocks_stdlib(html: str) -> list[Block]:
    """Reference stdlib-html.parser path (the differential-test oracle)."""
    p = _BlockParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    while p._open:
        p._end_block()
    return p.blocks


# hoisted float32 band constants (identical values; np scalar construction
# per call was a measurable share of the extraction hot path). The literal
# doubles above are asserted equal to their float32 expressions in
# tests/test_boilerplate_parser.py.
_F008 = np.float32(0.08)
_F009 = np.float32(0.09)
_F030 = np.float32(0.30)
_F035 = np.float32(0.35)
_F041 = np.float32(0.41)
_F060 = np.float32(0.60)
_F280 = np.float32(280)


def classify_block(blk: Block) -> tuple[str, float]:
    """Map a DOM block to a DocStructBench class + deterministic confidence.

    Confidence bands are engineered so every reference gate is exercised
    (SURVEY.md §2.4 L5-L7, L12):
      - boilerplate-ancestor blocks -> "abandon", conf in [0.41, 0.49] —
        above the model conf threshold 0.4 (yolo/config.rs:27) but below the
        abandon floor 0.50 (docstructbench.rs:88-91) -> filtered there;
        unless the block is huge (>2000 chars) -> conf 0.55 -> kept as a
        block but still excluded from text assembly (cls == 'abandon').
      - high-link-density non-ancestor blocks -> "abandon", conf <= 0.39 —
        below the model threshold -> dropped at decode (L6).
      - content blocks -> conf in [0.60, 0.95].
    """
    ld = np.float32(min(blk.link_density, 1.0))
    if blk.boilerplate_ancestor:
        if blk.n_chars > 2000:
            return "abandon", 0.550000011920929  # float(np.float32(0.55))
        return "abandon", float(_F041 + _F008 * ld)
    if ld > LINK_DENSITY_ABANDON:
        return "abandon", float(_F030 + _F009 * ld)
    if blk.tag == "h1":
        return "title", 0.949999988079071  # float(np.float32(0.95))
    if blk.tag in ("h2", "h3", "h4", "h5", "h6"):
        return "title", 0.8999999761581421  # float(np.float32(0.90))
    if blk.tag == "table":
        return "table", 0.8500000238418579  # float(np.float32(0.85))
    if blk.tag == "caption":
        return "table_caption", 0.800000011920929  # float(np.float32(0.80))
    if blk.tag == "figcaption":
        return "figure_caption", 0.800000011920929
    size = np.float32(min(blk.n_chars, 280)) / _F280
    return "plain text", float(_F060 + _F035 * size)


_F055 = np.float32(0.55)
_F080 = np.float32(0.80)
_F085 = np.float32(0.85)
_F090 = np.float32(0.90)
_F095 = np.float32(0.95)
_TAG_CLASS_CONF = {
    "h1": ("title", _F095),
    "h2": ("title", _F090),
    "h3": ("title", _F090),
    "h4": ("title", _F090),
    "h5": ("title", _F090),
    "h6": ("title", _F090),
    "table": ("table", _F085),
    "caption": ("table_caption", _F080),
    "figcaption": ("figure_caption", _F080),
}


def classify_blocks(blocks: list[Block]) -> tuple[list[str], np.ndarray]:
    """Vectorized classify_block over a whole page.

    EXACTLY the same classes and float32 confidences as calling
    classify_block per block (A/B-proven bitwise in
    tests/test_boilerplate_parser.py::test_classify_blocks_vectorized_ab):
    every elementwise float32 op here mirrors the scalar op sequence, and
    f32→f64→min(·,1.0)→f32 round-trips the link-density clamp exactly.
    This is the hot-path form (the stub model classifies ~50 blocks per
    page per document); the scalar classify_block stays as the reference
    and for one-off call sites.
    """
    n = len(blocks)
    if n == 0:
        return [], np.empty(0, dtype=np.float32)
    if n < 256:
        # typical pages: the scalar loop beats the vector form — array
        # construction is the dominant cost at tens of blocks in this
        # environment (fresh-allocation gotcha, CLAUDE.md); the vector
        # path pays off on multi-thousand-block skew pages
        out_c = []
        out_conf = np.empty(n, dtype=np.float32)
        for i, blk in enumerate(blocks):
            c, cf = classify_block(blk)
            out_c.append(c)
            out_conf[i] = cf
        return out_c, out_conf
    link = np.fromiter((b.link_chars for b in blocks), dtype=np.int64, count=n)
    chars = np.fromiter((b.n_chars for b in blocks), dtype=np.int64, count=n)
    bp = np.fromiter((b.boilerplate_ancestor for b in blocks), dtype=bool, count=n)
    # scalar path: ld = f32(min(float(f32(link)/f32(max(chars,1))), 1.0))
    ld = link.astype(np.float32) / np.maximum(chars, 1).astype(np.float32)
    ld = np.minimum(ld.astype(np.float64), 1.0).astype(np.float32)

    conf = _F060 + _F035 * (np.minimum(chars, 280).astype(np.float32) / _F280)
    classes = ["plain text"] * n
    decided = np.zeros(n, dtype=bool)

    big = bp & (chars > 2000)
    conf[big] = _F055
    small_bp = bp & ~big
    conf[small_bp] = (_F041 + _F008 * ld)[small_bp]
    for i in np.nonzero(bp)[0]:
        classes[i] = "abandon"
    decided |= bp

    high_ld = ~decided & (ld > LINK_DENSITY_ABANDON)
    conf[high_ld] = (_F030 + _F009 * ld)[high_ld]
    for i in np.nonzero(high_ld)[0]:
        classes[i] = "abandon"
    decided |= high_ld

    get = _TAG_CLASS_CONF.get
    for i in np.nonzero(~decided)[0]:
        hit = get(blocks[i].tag)
        if hit is not None:
            classes[i], conf[i] = hit
    return classes, conf


# classes whose text participates in the extracted main content, in the
# spirit of the reference's downstream mask consumer (docstructbench.rs:33):
# abandon and pure-figure regions contribute no text.
TEXTUAL_CLASSES = frozenset(
    {"title", "plain text", "table", "table_caption", "table_footnote", "figure_caption"}
)
