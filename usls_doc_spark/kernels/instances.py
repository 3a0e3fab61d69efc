"""Instance-level decode kernels: oriented boxes (L8), keypoints (L9),
instance masks (L10) — per-image numpy, SURVEY.md §2.4.

OBB decode (yolo/impl.rs:422-443): if w <= h, swap (w, h) and add pi/2 to
the angle; angle %= pi; build the Mbr from (cx, cy, w, h, radians).

Keypoint decode (yolo/impl.rs:481-513): per-box keypoint triples
(x, y, conf) divided by the letterbox ratio; below-threshold keypoints
become (0, 0, id, 0); coords clamped to the original image.

Instance-mask decode (yolo/impl.rs:516-601): mask coefficients [nm] times
prototypes [nm, mh*mw] -> sigmoid -> resize to original size -> zero
outside the detection bbox -> largest contour -> polygon.
"""

from __future__ import annotations

import math

import numpy as np

from .mbr import from_cxcywhr
from .ocr import find_outer_contours
from .ops import resize_plane, sigmoid


def decode_obb(cx: float, cy: float, w: float, h: float, radians: float) -> np.ndarray:
    """L8: returns oriented-box vertices [4,2] (yolo/impl.rs:424-443)."""
    if w <= h:
        w, h = h, w
        radians = radians + math.pi / 2.0
    radians = math.fmod(radians, math.pi)
    return from_cxcywhr(float(cx), float(cy), float(w), float(h), float(radians))


def decode_keypoints(
    kpts_raw: np.ndarray,
    ratio: float,
    image_h: float,
    image_w: float,
    conf_thresh: float = 0.5,
) -> np.ndarray:
    """L9: [K,3] raw (x, y, conf) in canvas coords -> [K,3] original coords.

    Below-threshold keypoints zero out (yolo/impl.rs:492-497); coordinates
    divide by the letterbox ratio then clamp to the image bounds
    (yolo/impl.rs:498-508).
    """
    k = np.asarray(kpts_raw, dtype=np.float32).reshape(-1, 3).copy()
    r = np.float32(ratio)
    x = np.clip(k[:, 0] / r, 0.0, np.float32(image_w))
    y = np.clip(k[:, 1] / r, 0.0, np.float32(image_h))
    conf = k[:, 2]
    keep = conf >= np.float32(conf_thresh)
    out = np.stack([x, y, conf], axis=1).astype(np.float32)
    out[~keep] = 0.0
    return out


def decode_instance_mask(
    coefs: np.ndarray,
    protos: np.ndarray,
    bbox_xyxy: tuple[float, float, float, float],
    image_h: int,
    image_w: int,
    threshold: float = 0.5,
) -> tuple[np.ndarray, np.ndarray | None]:
    """L10: returns (mask u8 [image_h, image_w], largest-contour polygon or
    None). coefs [nm]; protos [nm, mh, mw]."""
    coefs = np.asarray(coefs, dtype=np.float32)
    protos = np.asarray(protos, dtype=np.float32)
    nm, mh, mw = protos.shape
    # [1, nm] x [nm, mh*mw] matmul (yolo/impl.rs:526-528)
    flat = coefs @ protos.reshape(nm, mh * mw)
    prob = sigmoid(flat.reshape(mh, mw))
    # resize to original (yolo/impl.rs:531-540)
    mask = resize_plane(prob, image_h, image_w, "bilinear")
    mask = (mask > np.float32(threshold)).astype(np.uint8) * 255
    # zero outside bbox (yolo/impl.rs:552-562)
    x1, y1, x2, y2 = (int(v) for v in bbox_xyxy)
    clipped = np.zeros_like(mask)
    y1c, y2c = max(y1, 0), min(y2, image_h)
    x1c, x2c = max(x1, 0), min(x2, image_w)
    clipped[y1c:y2c, x1c:x2c] = mask[y1c:y2c, x1c:x2c]
    # largest contour -> polygon (yolo/impl.rs:565-583)
    contours = find_outer_contours(clipped)
    if not contours:
        return clipped, None
    largest = max(contours, key=len)
    return clipped, largest
