"""MBR / OBB / keypoint / instance-mask kernel tests — exact values ported
from the reference's inline tests (/root/reference/src/xy/mbr.rs:189-325)."""

import math

import numpy as np

from usls_doc_spark.kernels import mbr
from usls_doc_spark.kernels.instances import (
    decode_instance_mask,
    decode_keypoints,
    decode_obb,
)


def test_mbr_from_cxcywhd_axis_aligned():
    # mbr.rs tests from_cxcywhd1: unit square at (1,1) size 2, 0 deg
    sq = np.array([[0, 0], [0, 2], [2, 2], [2, 0]], dtype=float)
    m = mbr.from_cxcywhd(1.0, 1.0, 2.0, 2.0, 0.0)
    assert mbr.iou(sq, m) == 1.0


def test_mbr_from_cxcywhd_rotated_90():
    # mbr.rs from_cxcywhd2: 10x5 rotated 90deg == 5x10 axis-aligned
    rect = np.array([[2.5, 5], [-2.5, 5], [-2.5, -5], [2.5, -5]], dtype=float)
    m = mbr.from_cxcywhd(0.0, 0.0, 10.0, 5.0, 90.0)
    assert abs(mbr.iou(rect, m) - 1.0) < 1e-9


def test_mbr_intersect_union_iou_reference_values():
    # mbr.rs tests intersect/union/iou — exact expected numbers
    diamond = np.array([[2, 0], [0, 2], [-2, 0], [0, -2]], dtype=float)
    square = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=float)
    assert round(mbr.union_area(diamond, square)) == 10.0
    assert abs(mbr.iou(diamond, square) - 0.2) < 1e-9  # mbr.rs:313-325
    m1 = mbr.from_cxcywhr(0.0, 0.0, 2.828427, 2.828427, math.radians(45.0))
    m2 = mbr.from_cxcywhr(1.0, 1.0, 2.0, 2.0, 0.0)
    assert round(mbr.intersect_area(m1, m2)) == 2.0  # mbr.rs:286-291


def test_mbr_distance_min_max():
    diamond = np.array([[2, 0], [0, 2], [-2, 0], [0, -2]], dtype=float)
    lo, hi = mbr.distance_min_max(diamond)
    assert (round(lo, 6), round(hi, 6)) == (2.828427, 2.828427)  # mbr.rs:258


def test_decode_obb_swaps_and_wraps():
    # w <= h -> swap and +pi/2 (yolo/impl.rs:424-431)
    v1 = decode_obb(0, 0, 2, 10, 0.0)
    v2 = mbr.from_cxcywhr(0, 0, 10, 2, math.pi / 2)
    assert np.allclose(v1, v2)
    # already-landscape boxes keep their angle mod pi
    v3 = decode_obb(0, 0, 10, 2, math.pi + 0.3)
    v4 = mbr.from_cxcywhr(0, 0, 10, 2, 0.3)
    assert np.allclose(v3, v4)


def test_decode_keypoints_gate_scale_clamp():
    raw = np.array(
        [[100.0, 50.0, 0.9], [10.0, 10.0, 0.4], [5000.0, 50.0, 0.8]], dtype=np.float32
    )
    out = decode_keypoints(raw, ratio=2.0, image_h=100, image_w=200, conf_thresh=0.5)
    assert np.allclose(out[0], [50.0, 25.0, 0.9])
    assert np.allclose(out[1], [0.0, 0.0, 0.0])  # below threshold -> zeroed
    assert out[2, 0] == 200.0  # clamped to image width


def test_decode_instance_mask():
    # one prototype that is high in the top-left quadrant
    protos = np.full((1, 8, 8), -6.0, dtype=np.float32)
    protos[0, :4, :4] = 6.0
    mask, poly = decode_instance_mask(
        coefs=np.array([1.0], dtype=np.float32),
        protos=protos,
        bbox_xyxy=(0, 0, 8, 8),
        image_h=16,
        image_w=16,
    )
    assert mask.shape == (16, 16)
    assert mask[1, 1] == 255 and mask[12, 12] == 0
    assert poly is not None and len(poly) >= 4
    # bbox crop zeroes outside the detection box
    mask2, _ = decode_instance_mask(
        np.array([1.0], dtype=np.float32), protos, (4, 4, 8, 8), 16, 16
    )
    assert mask2[1, 1] == 0
