"""Property-based tests (hypothesis) for the kernels' invariants —
the SURVEY.md §5.2 upgrade over the reference's example-only testing."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from usls_doc_spark.kernels.boilerplate import parse_blocks
from usls_doc_spark.kernels.geometry import iou
from usls_doc_spark.kernels.letterbox import boxes_to_canvas, boxes_to_original, letterbox_spec
from usls_doc_spark.kernels.nms import nms_indices
from usls_doc_spark.kernels.xycut import xycut_order
from usls_doc_spark.kernels.yolo_decode import round_half_away

boxes_strategy = st.lists(
    st.tuples(
        st.floats(0, 1000, allow_nan=False, width=32),
        st.floats(0, 1000, allow_nan=False, width=32),
        st.floats(1, 500, allow_nan=False, width=32),
        st.floats(1, 500, allow_nan=False, width=32),
    ),
    min_size=0,
    max_size=40,
)


@given(boxes_strategy, st.floats(0.05, 0.95))
@settings(max_examples=60, deadline=None)
def test_nms_invariants(box_list, thr):
    boxes = np.asarray(box_list, dtype=np.float32).reshape(-1, 4)
    confs = (np.arange(len(boxes)) % 7 / 7.0 + 0.1).astype(np.float32)
    kept = nms_indices(boxes, confs, thr)
    # kept indices are unique and valid
    assert len(set(kept.tolist())) == len(kept)
    assert all(0 <= i < len(boxes) for i in kept)
    # pairwise IoU among kept boxes never exceeds the threshold
    if len(kept) > 1:
        m = iou(boxes[kept], boxes[kept])
        np.fill_diagonal(m, 0.0)
        assert float(m.max()) <= thr + 1e-6
    # deterministic
    assert nms_indices(boxes, confs, thr).tolist() == kept.tolist()
    # every dropped box overlaps some kept box above the threshold
    dropped = set(range(len(boxes))) - set(kept.tolist())
    if dropped and len(kept):
        m2 = iou(boxes[sorted(dropped)], boxes[kept])
        assert (m2.max(axis=1) > thr - 1e-6).all()


@given(boxes_strategy)
@settings(max_examples=60, deadline=None)
def test_xycut_is_deterministic_permutation(box_list):
    boxes = np.asarray(box_list, dtype=np.float64).reshape(-1, 4)
    order = xycut_order(boxes)
    assert sorted(order.tolist()) == list(range(len(boxes)))
    assert xycut_order(boxes).tolist() == order.tolist()


@given(st.floats(-1e6, 1e6, allow_nan=False, width=32))
@settings(max_examples=100, deadline=None)
def test_round_half_away_matches_rust_round(x):
    # Rust f32::round: nearest, ties away from zero
    import math

    got = float(round_half_away(np.float32(x)))
    frac = abs(x) - math.floor(abs(x))
    if frac == 0.5:
        exp = math.copysign(math.ceil(abs(x)), x)
    else:
        exp = math.copysign(math.floor(abs(x) + 0.5), x)
    assert got == exp


@given(
    st.integers(10, 4000),
    st.integers(10, 4000),
    st.lists(
        st.tuples(
            st.floats(0, 500, width=32),
            st.floats(0, 500, width=32),
            st.floats(1, 200, width=32),
            st.floats(1, 200, width=32),
        ),
        min_size=1,
        max_size=10,
    ),
)
@settings(max_examples=60, deadline=None)
def test_letterbox_roundtrip_property(h0, w0, box_list):
    spec = letterbox_spec(h0, w0, 1024, 1024)
    boxes = np.asarray(box_list, dtype=np.float32).reshape(-1, 4)
    rt = boxes_to_original(boxes_to_canvas(boxes, spec), spec)
    # roundtrip error stays far below the 0.5px rounding margin
    assert float(np.abs(rt - boxes).max()) < 0.05


@given(st.text(max_size=400))
@settings(max_examples=80, deadline=None)
def test_parser_never_raises_on_arbitrary_text(s):
    blocks = parse_blocks(s)
    for b in blocks:
        assert b.text == " ".join(b.text.split())  # normalized
        assert b.link_chars >= 0
