"""Axis-aligned bounding-box geometry kernels (vectorized numpy).

Reference semantics: ``Bbox`` ops in /root/reference/src/xy/bbox.rs —
``area`` (:214-216), ``intersect`` (:229-235), ``union`` (:238-240),
``contains`` (:243-248), ``iou = intersect/union`` (:28-31).

Boxes are float32 arrays of shape [N, 4] in (x, y, w, h) layout (top-left +
size), matching the reference's ``Bbox {x, y, w, h}``.
"""

from __future__ import annotations

import numpy as np


def area(boxes: np.ndarray) -> np.ndarray:
    """w*h per box. Ref: bbox.rs:214-216."""
    boxes = np.asarray(boxes, dtype=np.float32)
    return boxes[:, 2] * boxes[:, 3]


def _corners(boxes: np.ndarray):
    x1 = boxes[:, 0]
    y1 = boxes[:, 1]
    x2 = boxes[:, 0] + boxes[:, 2]
    y2 = boxes[:, 1] + boxes[:, 3]
    return x1, y1, x2, y2


def intersect(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise intersection areas, shape [len(a), len(b)]. Ref: bbox.rs:229-235."""
    a = np.asarray(a, dtype=np.float32)
    b = np.asarray(b, dtype=np.float32)
    ax1, ay1, ax2, ay2 = _corners(a)
    bx1, by1, bx2, by2 = _corners(b)
    l = np.maximum(ax1[:, None], bx1[None, :])
    r = np.minimum(ax2[:, None], bx2[None, :])
    t = np.maximum(ay1[:, None], by1[None, :])
    bo = np.minimum(ay2[:, None], by2[None, :])
    return np.maximum(r - l, 0.0) * np.maximum(bo - t, 0.0)


def union(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise union areas. Ref: bbox.rs:238-240."""
    inter = intersect(a, b)
    return area(a)[:, None] + area(b)[None, :] - inter


def iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU matrix. Ref: bbox.rs:28-31 (intersect/union).

    Zero-union pairs (both boxes degenerate) have zero intersection too, so
    the epsilon guard yields exactly 0.0 for them — no errstate needed.
    """
    inter = intersect(a, b)
    uni = area(a)[:, None] + area(b)[None, :] - inter
    return (inter / np.maximum(uni, np.float32(1e-12))).astype(np.float32)


def contains(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise containment a⊇b (boolean [len(a), len(b)]). Ref: bbox.rs:243-248."""
    a = np.asarray(a, dtype=np.float32)
    b = np.asarray(b, dtype=np.float32)
    ax1, ay1, ax2, ay2 = _corners(a)
    bx1, by1, bx2, by2 = _corners(b)
    return (
        (ax1[:, None] <= bx1[None, :])
        & (ax2[:, None] >= bx2[None, :])
        & (ay1[:, None] <= by1[None, :])
        & (ay2[:, None] >= by2[None, :])
    )
