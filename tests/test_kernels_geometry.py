"""Kernel unit tests mirroring the reference's exact-value inline tests
(SURVEY.md §5.1: /root/reference/src/xy/bbox.rs:251-290 tests_bbox)."""

import numpy as np

from usls_doc_spark.kernels.geometry import area, contains, intersect, iou, union
from usls_doc_spark.kernels.nms import nms_indices
from usls_doc_spark.kernels.xycut import xycut_order
from usls_doc_spark.kernels.yolo_decode import (
    abandon_filter_and_round,
    decode_preds,
    dyn_conf,
    round_half_away,
)
from usls_doc_spark.kernels.letterbox import letterbox_spec, boxes_to_canvas, boxes_to_original


def test_bbox_funcs_reference_values():
    # exact numbers from bbox.rs tests_bbox::funcs (:276-290)
    b1 = np.array([[0.0, 0.0, 5.0, 5.0]])
    b2 = np.array([[1.0, 1.0, 5.0, 5.0]])
    b3 = np.array([[2.0, 2.0, 3.0, 3.0]])
    assert intersect(b1, b2)[0, 0] == 16.0
    assert area(b1)[0] == 25.0
    assert area(b2)[0] == 25.0
    assert union(b1, b2)[0, 0] == 34.0
    assert not contains(b1, b2)[0, 0]
    assert contains(b1, b3)[0, 0]
    assert contains(b2, b3)[0, 0]
    assert np.isclose(iou(b1, b2)[0, 0], 16.0 / 34.0)


def test_nms_reference_semantics():
    # three boxes: A and B overlap heavily, C is separate; B has higher conf
    boxes = np.array([[0, 0, 10, 10], [1, 0, 10, 10], [50, 50, 10, 10]], dtype=np.float32)
    confs = np.array([0.8, 0.9, 0.5], dtype=np.float32)
    kept = nms_indices(boxes, confs, iou_threshold=0.45)
    # sort: B(1), A(0), C(2); A dropped (iou vs B = 90/110 > .45)
    assert kept.tolist() == [1, 2]
    # strict '>' on the threshold (y.rs:102): iou exactly == thr is kept
    boxes2 = np.array([[0, 0, 10, 10], [5, 0, 10, 10]], dtype=np.float32)  # iou = 50/150 = 1/3
    confs2 = np.array([0.9, 0.8], dtype=np.float32)
    assert nms_indices(boxes2, confs2, iou_threshold=1.0 / 3.0).tolist() == [0, 1]
    assert nms_indices(boxes2, confs2, iou_threshold=0.33).tolist() == [0]
    # stable tie order: equal confs keep input order
    confs3 = np.array([0.7, 0.7], dtype=np.float32)
    assert nms_indices(boxes2, confs3, iou_threshold=0.2).tolist() == [0]


def test_dyn_conf_broadcast_last():
    # dynconf.rs:33-50: pad with the LAST value
    assert dyn_conf([0.4], 3).tolist() == [np.float32(0.4)] * 3
    assert dyn_conf([0.1, 0.2], 4).tolist()[2:] == [np.float32(0.2)] * 2
    assert dyn_conf([0.1, 0.2, 0.3], 2).tolist() == [np.float32(0.1), np.float32(0.2)]


def test_round_half_away_from_zero():
    # Rust f32::round semantics, not numpy banker's rounding
    x = np.array([0.5, 1.5, 2.5, -0.5, -1.5, 2.4999])
    assert round_half_away(x).tolist() == [1.0, 2.0, 3.0, -1.0, -2.0, 2.0]


def test_letterbox_roundtrip():
    spec = letterbox_spec(h0=2000, w0=816, th=1024, tw=1024)
    assert spec.ratio == np.float32(1024.0) / np.float32(2000.0)
    boxes = np.array([[48, 48, 720, 160], [48, 300, 344, 32]], dtype=np.float32)
    rt = boxes_to_original(boxes_to_canvas(boxes, spec), spec)
    assert np.allclose(rt, boxes, atol=1e-2)


def test_letterbox_centered_padding():
    # ops.rs:404-412: centering splits the slack on the non-fitted axis
    spec = letterbox_spec(h0=500, w0=1000, th=1024, tw=1024, center=True)
    # width fits exactly (r = 1024/1000); height is padded: t = (1024-512)/2
    assert spec.pad_left == 0 and spec.pad_top == 256
    boxes = np.array([[0, 0, 1000, 500]], dtype=np.float32)
    canvas = boxes_to_canvas(boxes, spec)
    assert abs(canvas[0, 1] - 256) < 1e-3
    rt = boxes_to_original(canvas, spec)
    assert np.allclose(rt, boxes, atol=1e-2)


def test_decode_preds_gates_and_abandon_filter():
    spec = letterbox_spec(h0=1024, w0=1024, th=1024, tw=1024)  # ratio 1
    # anchors: [cxcywh + 10 class scores]
    def anchor(cx, cy, w, h, cls, conf):
        row = [cx, cy, w, h] + [0.0] * 10
        row[4 + cls] = conf
        return row

    preds = np.array(
        [
            anchor(100, 100, 40, 20, 0, 0.95),  # title, kept
            anchor(100, 100, 40, 20, 0, 0.855),  # dup -> NMS drop
            anchor(100, 200, 40, 20, 2, 0.49),  # abandon 0.49 -> abandon filter drop
            anchor(100, 300, 40, 20, 2, 0.55),  # abandon 0.55 -> kept
            anchor(100, 400, 40, 20, 1, 0.39),  # below conf thr 0.4 -> decode drop
        ],
        dtype=np.float32,
    )
    decoded = decode_preds(preds, spec)
    assert decoded.boxes.shape[0] == 3  # title, abandon .49, abandon .55
    kept = abandon_filter_and_round(decoded)
    assert [(b["cls"], b["conf"]) for b in kept] == [
        ("title", float(np.float32(0.95))),
        ("abandon", float(np.float32(0.55))),
    ]
    assert kept[0]["x"] == 80 and kept[0]["y"] == 90
    assert kept[0]["width"] == 40 and kept[0]["height"] == 20
    assert kept[0]["id_born"] == 0 and kept[1]["id_born"] == 3


def test_decode_class_retain_exclude():
    spec = letterbox_spec(h0=100, w0=100, th=100, tw=100)
    preds = np.array(
        [[50, 50, 10, 10] + [0] * 10, [20, 20, 10, 10] + [0] * 10], dtype=np.float32
    )
    preds[0, 4 + 1] = 0.9  # plain text
    preds[1, 4 + 5] = 0.9  # table
    assert decode_preds(preds, spec, classes_excluded=(5,)).names == ["plain text"]
    assert decode_preds(preds, spec, classes_retained=(5,)).names == ["table"]


def test_xycut_single_column():
    # three stacked blocks, shuffled input order
    boxes = np.array([[48, 200, 700, 30], [48, 48, 700, 30], [48, 120, 700, 30]])
    assert xycut_order(boxes).tolist() == [1, 2, 0]


def test_xycut_two_columns_with_title():
    # title spans top; two columns below with ALIGNED row gaps — the widest-
    # gap rule must still order left column before right column
    boxes = np.array(
        [
            [48, 48, 64, 16],  # 0 title
            [48, 72, 344, 32],  # 1 L1
            [48, 112, 344, 32],  # 2 L2
            [408, 72, 344, 32],  # 3 R1
            [408, 112, 344, 32],  # 4 R2
        ]
    )
    assert xycut_order(boxes).tolist() == [0, 1, 2, 3, 4]


def test_xycut_full_width_block_blocks_column_gap():
    # a full-width banner above columns: horizontal cut first, then columns
    boxes = np.array(
        [
            [48, 10, 704, 16],  # banner spans the gutter
            [48, 72, 344, 32],
            [408, 72, 344, 32],
            [48, 112, 344, 32],
        ]
    )
    assert xycut_order(boxes).tolist() == [0, 1, 3, 2]


def test_xycut_deterministic_tiebreak():
    # overlapping boxes (no gaps): leaf order (y, x, index)
    boxes = np.array([[10, 10, 50, 50], [10, 10, 50, 50], [5, 10, 50, 50]])
    assert xycut_order(boxes).tolist() == [2, 0, 1]


def test_letterbox_image_raster_semantics():
    """P1-P3 raster path: resize to round(dim*r), pad value 114, corner or
    centered placement (ops.rs:382-450 single-plane semantics)."""
    import numpy as np

    from usls_doc_spark.kernels.letterbox import letterbox_image, letterbox_spec

    plane = np.arange(36 * 52, dtype=np.uint8).reshape(36, 52)
    # corner placement: resized content top-left, pad right/bottom
    spec = letterbox_spec(36, 52, 64, 64, center=False)
    out = letterbox_image(plane, spec)
    assert out.shape == (64, 64) and out.dtype == np.uint8
    rw = int(round(52 * spec.ratio))
    rh = int(round(36 * spec.ratio))
    assert rw == 64  # width-limited
    assert (out[rh:, :] == 114).all()  # bottom pad strip
    assert not (out[:rh, :rw] == 114).all()
    # identity resize: same dims -> pixels unchanged
    spec_id = letterbox_spec(36, 52, 36, 52, center=False)
    assert (letterbox_image(plane, spec_id) == plane).all()
    # centered placement: pad split between top and bottom
    spec_c = letterbox_spec(36, 52, 64, 64, center=True)
    out_c = letterbox_image(plane, spec_c)
    top = spec_c.pad_top
    assert top > 0 and (out_c[:top, :] == 114).all()
    assert (out_c[top + rh:, :] == 114).all()
