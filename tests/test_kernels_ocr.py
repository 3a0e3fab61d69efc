"""OCR kernel tests: DB polygon pipeline (D1-D7) + decoders (R1, R3)."""

import numpy as np

from usls_doc_spark.kernels.ocr import (
    binarize_prob_map,
    convex_hull,
    ctc_greedy_decode,
    db_postprocess,
    find_outer_contours,
    greedy_generate,
    polygon_area,
    polygon_perimeter,
    resample,
    unclip,
    verify,
)


def test_binarize_thresholds():
    pm = np.array([[0.0, 0.2, 0.21, 0.9]], dtype=np.float32)
    out = binarize_prob_map(pm)
    # x <= 0.2 -> 0; else x*255 truncated to u8 (db/impl.rs:98-104)
    assert out.tolist() == [[0, 0, int(0.21 * 255), int(0.9 * 255)]]


def test_contours_rectangle():
    mask = np.zeros((10, 12), dtype=np.uint8)
    mask[2:7, 3:9] = 255
    cs = find_outer_contours(mask)
    assert len(cs) == 1
    c = cs[0]
    assert c[:, 0].min() == 3 and c[:, 0].max() == 8
    assert c[:, 1].min() == 2 and c[:, 1].max() == 6
    # boundary of a 6x5 rect has 2*(6+5)-4 = 18 pixels
    assert len(c) == 18
    # shoelace area of the pixel-boundary polygon is (w-1)*(h-1)
    assert polygon_area(c) == 5 * 4
    assert polygon_perimeter(c) == 2 * (5 + 4)


def test_contours_two_components():
    mask = np.zeros((8, 8), dtype=np.uint8)
    mask[1:3, 1:3] = 1
    mask[5:7, 5:7] = 1
    assert len(find_outer_contours(mask)) == 2


def test_unclip_square_expands():
    # counter-clockwise in image coords (y down) — the tracer's output order
    sq = np.array([[2, 2], [2, 6], [6, 6], [6, 2]], dtype=np.float64)
    out = unclip(sq, delta=1.0, width=100, height=100)
    # each corner normal is the prev->next diagonal's perpendicular, unit
    # length, so corners move out by 1/sqrt(2) per axis
    d = 1.0 / np.sqrt(2.0)
    exp = np.array([[2 - d, 2 - d], [2 - d, 6 + d], [6 + d, 6 + d], [6 + d, 2 - d]])
    assert np.allclose(out, exp)
    # clamping to the image bounds
    out2 = unclip(sq, delta=10.0, width=7.0, height=7.0)
    assert out2.min() >= 0.0 and out2.max() <= 7.0


def test_resample_counts():
    tri = np.array([[0, 0], [10, 0], [0, 10]], dtype=np.float64)
    out = resample(tri, num_samples=4)
    assert len(out) == 3 * 4  # per edge: start + 3 interpolated
    assert np.allclose(out[1], [2.5, 0.0])


def test_convex_hull_and_verify():
    pts = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [2, 2], [1, 1]], dtype=np.float64)
    hull = convex_hull(pts)
    assert len(hull) == 4
    assert polygon_area(hull) == 16.0
    # verify dedups on int-cast coords, keeping first occurrence
    noisy = np.array([[0.2, 0.3], [0.4, 0.9], [3.0, 3.0], [0.0, 0.0]], dtype=np.float64)
    v = verify(noisy)
    assert [(int(x), int(y)) for x, y in v] == [(0, 0), (3, 3)]
    # trailing point equal to first (int-cast) is dropped
    closed = np.array([[1.0, 1.0], [5.0, 1.0], [5.0, 5.0], [1.2, 1.4]], dtype=np.float64)
    assert len(verify(closed)) == 3


def test_db_postprocess_end_to_end():
    pm = np.zeros((48, 120), dtype=np.float32)
    pm[8:40, 8:104] = 0.9
    regions = db_postprocess(pm, ratio=1.0)
    assert len(regions) == 1
    r = regions[0]
    x1, y1, x2, y2 = r["bbox"]
    # unclip expands the (95 x 31)-pixel-boundary rect by delta on each side
    delta = (95 * 31) * 1.5 / (2 * (95 + 31))
    assert abs((8 - delta) - x1) < 1.0 or x1 == 0.0
    assert x2 > 103 and y2 > 39
    assert r["conf"] > 0.9  # near-rectangular polygon
    # min-size filter: a sliver region is dropped
    pm2 = np.zeros((20, 20), dtype=np.float32)
    pm2[5:8, 5:18] = 0.9  # 3px tall < MIN_HEIGHT=12 even after unclip?
    regs2 = db_postprocess(pm2, ratio=1.0)
    for rr in regs2:
        assert (rr["bbox"][3] - rr["bbox"][1]) >= 12


def test_hull_resample_identity():
    # the hot path skips resample because hull(resample(X)) is geometrically
    # hull(X): interpolated points are convex combinations of edge endpoints
    # (float rounding can leave epsilon-on-edge vertices, so the identity is
    # area/bbox equality, which is all the pipeline outputs depend on)
    pts = np.array([[3, 2], [9, 1], [14, 7], [8, 13], [2, 9]], dtype=np.float64)
    h1 = convex_hull(pts)
    h2 = convex_hull(resample(pts, 50))
    assert abs(polygon_area(h1) - polygon_area(h2)) < 1e-9
    assert np.allclose(h1.min(axis=0), h2.min(axis=0))
    assert np.allclose(h1.max(axis=0), h2.max(axis=0))


def test_ctc_greedy_decode_reference_semantics():
    vocab = ["<blank>", "a", "b", "c"]
    # timesteps: a, a (repeat NOT collapsed), blank (dropped), low-conf b, c
    logits = np.array(
        [
            [0.0, 0.9, 0.0, 0.0],
            [0.0, 0.9, 0.0, 0.0],
            [0.9, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.1, 0.0],  # conf 0.1 < 0.2 -> dropped
            [0.0, 0.0, 0.0, 0.8],
        ],
        dtype=np.float32,
    )
    assert ctc_greedy_decode(logits, vocab) == "aac"
    # max_length truncation
    assert ctc_greedy_decode(logits, vocab, max_length=2) == "aa"


def test_greedy_generate_eos_and_refeed():
    # fake decoder: emits token 3, then 4, then EOS(2); asserts re-feed grows
    seen_lens = []

    def step(ids):
        seen_lens.append(len(ids))
        nxt = {1: 3, 3: 4, 4: 2}[ids[-1]]
        out = np.zeros((len(ids), 5), dtype=np.float32)
        out[-1, nxt] = 1.0
        return out

    assert greedy_generate(step) == [3, 4]
    assert seen_lens == [1, 2, 3]
    # max_steps bound

    def forever(ids):
        out = np.zeros((len(ids), 5), dtype=np.float32)
        out[-1, 3] = 1.0
        return out

    assert len(greedy_generate(forever, max_steps=7)) == 7


def test_ocr_page_roundtrips_uppercase_punct_and_long_chunks():
    """The span == chunk invariant must survive uppercase, punctuation and
    chunks longer than the old 256-step decode cap (round-1 ADVICE)."""
    from usls_doc_spark.pipeline.ocr import ocr_page

    long_words = " ".join("Supercalifragilistic-Expialidocious!?" for _ in range(8))
    html = (
        "<html><body><h1>T</h1>"
        "<p>Hello, World! MIXED case &amp; punct: (yes).</p>"
        f"<p>{long_words}</p>"
        "</body></html>"
    ).encode()
    rows = ocr_page(html, "u")
    texts = [r["span_text"] for r in rows]
    assert texts[0] == "Hello, World! MIXED case & punct: (yes)."
    assert texts[1] == long_words
    assert len(long_words) > 256


def test_ocr_batch_width_buckets_preserve_order():
    """R2: recognition groups by width bucket across the Arrow batch but
    output rows stay in (page, region) order with exact span text."""
    import pandas as pd

    from usls_doc_spark.pipeline.ocr import WIDTH_BUCKET, detect_page_regions, ocr_batch

    short = "tiny"
    long = "x" * 90  # 4*90+... > WIDTH_BUCKET/4? width = 4*n_chars -> 360 > 320
    html1 = f"<html><body><p>{short}</p><p>{long}</p></body></html>".encode()
    html2 = f"<html><body><p>{long}</p><p>{short}</p></body></html>".encode()
    pdf = pd.DataFrame({"url": ["u1", "u2"], "html": [html1, html2]})
    out = pd.concat(list(ocr_batch(iter([pdf]))))
    assert list(out["url"]) == ["u1", "u1", "u2", "u2"]
    assert list(out["region_id"]) == [0, 1, 0, 1]
    assert list(out["span_text"]) == [short, long, long, short]
    # the two lengths really land in different buckets
    regs = detect_page_regions(html1, "u1")
    assert regs[0]["bucket"] != regs[1]["bucket"]
    assert regs[1]["width"] >= WIDTH_BUCKET


# ---------------------------------------------------------------------------
# contour fast-path differential fuzz (round-2 VERDICT item 7): the
# vectorized rectangle ring and the bbox-local Moore trace must be
# POINT-IDENTICAL to a full-frame Moore trace on arbitrary masks.
# ---------------------------------------------------------------------------

def _reference_contours(mask):
    """The pre-optimization full-frame implementation, kept here as the
    differential oracle."""
    from usls_doc_spark.kernels.ocr import _label_components, _trace_boundary

    fg = np.asarray(mask) > 0
    if not fg.any():
        return []
    labels, n = _label_components(fg)
    out = []
    for comp_id in range(1, n + 1):
        comp = labels == comp_id
        ys, xs = np.nonzero(comp)
        pts = _trace_boundary(comp, (int(ys[0]), int(xs[0])))
        out.append(np.asarray(pts[::-1], dtype=np.float64))
    return out


def test_rect_ring_fuzz_vs_moore():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from usls_doc_spark.kernels.ocr import find_outer_contours

    @settings(max_examples=150, deadline=None)
    @given(st.integers(0, 6), st.integers(0, 6), st.integers(1, 30), st.integers(1, 30))
    def check(x0, y0, w, h):
        fg = np.zeros((y0 + h + 2, x0 + w + 2), dtype=np.uint8)
        fg[y0 : y0 + h, x0 : x0 + w] = 1
        got = find_outer_contours(fg)
        want = _reference_contours(fg)
        assert len(got) == len(want) == 1
        assert np.array_equal(got[0], want[0])

    check()


def test_blob_fuzz_vs_full_frame_moore():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from usls_doc_spark.kernels.ocr import find_outer_contours

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 17), st.integers(0, 17)), min_size=1, max_size=60),
           st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15),
                              st.integers(1, 4), st.integers(1, 4)), max_size=4))
    def check(pixels, rects):
        fg = np.zeros((20, 20), dtype=np.uint8)
        for y, x in pixels:
            fg[y, x] = 1
        for x, y, w, h in rects:
            fg[y : y + h, x : x + w] = 1
        got = find_outer_contours(fg)
        want = _reference_contours(fg)
        assert len(got) == len(want)
        for g, w_ in zip(got, want):
            assert np.array_equal(g, w_)

    check()


def test_simplify_runs_hull_identity_fuzz():
    """hull(unclip(simplified)) must equal hull(unclip(full)) EXACTLY —
    vertex set, order, and bits — on arbitrary blob contours."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from usls_doc_spark.kernels.ocr import (
        _simplify_runs,
        convex_hull,
        find_outer_contours,
        polygon_area,
        polygon_perimeter,
        unclip,
        verify,
    )

    @settings(max_examples=120, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 19), st.integers(0, 19),
                              st.integers(1, 9), st.integers(1, 9)), min_size=1, max_size=5))
    def check(rects):
        fg = np.zeros((32, 32), dtype=np.uint8)
        for x, y, w, h in rects:
            fg[y : y + h, x : x + w] = 1
        for contour in find_outer_contours(fg):
            if len(contour) <= 2:
                continue
            area, perim = polygon_area(contour), polygon_perimeter(contour)
            if perim <= 0:
                continue
            delta = area * 1.5 / perim
            full = verify(convex_hull(unclip(contour, delta, 32.0, 32.0)))
            fast = verify(convex_hull(unclip(_simplify_runs(contour), delta, 32.0, 32.0)))
            assert np.array_equal(full, fast)

    check()


def test_single_rect_fast_path_condition_boundaries():
    """Round-5 single-solid-rectangle fast path in find_outer_contours
    (bbox fully set == exactly one component == that rect): the guard's
    edges — stray pixel outside the rect (count mismatch), hollow rect
    (.all() fails), 1-px-wide/tall rects (excluded, Moore path), two
    touching rects forming a bigger rect (fast path CORRECTLY fires) —
    must all be point-identical to the full-frame Moore reference."""
    from usls_doc_spark.kernels.ocr import find_outer_contours

    cases = []
    m = np.zeros((10, 14), dtype=np.uint8)
    m[2:7, 3:11] = 1
    cases.append(m.copy())                       # clean solid rect
    m2 = m.copy(); m2[0, 0] = 1
    cases.append(m2)                             # stray pixel: 2 components
    m3 = m.copy(); m3[4, 6] = 0
    cases.append(m3)                             # hole: not solid
    m4 = np.zeros((10, 14), dtype=np.uint8); m4[3, 2:9] = 1
    cases.append(m4)                             # 1-px-tall strip
    m5 = np.zeros((10, 14), dtype=np.uint8); m5[2:5, 3:6] = 1; m5[2:5, 6:9] = 1
    cases.append(m5)                             # touching rects == one rect
    for fg in cases:
        got = find_outer_contours(fg)
        want = _reference_contours(fg)
        assert len(got) == len(want)
        for g, w_ in zip(got, want):
            assert np.array_equal(g, w_) and g.dtype == w_.dtype
