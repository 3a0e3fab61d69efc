"""Oriented (minimum) bounding rectangles — numpy rebuild of
/root/reference/src/xy/mbr.rs.

Construction from (cx, cy, w, h, theta) uses the exact rotation-matrix
vertex formula (mbr.rs:56-86); IoU is polygon-boolean intersection/union
(mbr.rs:176-186) computed with Sutherland-Hodgman convex clipping +
shoelace areas (both operands are rectangles, hence convex).
"""

from __future__ import annotations

import math

import numpy as np


def from_cxcywhr(cx: float, cy: float, w: float, h: float, r: float) -> np.ndarray:
    """Vertices [4,2] float64 — exact mbr.rs:56-86 construction."""
    m00 = math.cos(r) * 0.5 * w
    m01 = -math.sin(r) * 0.5 * h
    m10 = math.sin(r) * 0.5 * w
    m11 = math.cos(r) * 0.5 * h
    a = (m00 + m01, m10 + m11)
    b = (m00 - m01, m10 - m11)
    v1 = (cx + a[0], cy + a[1])
    v2 = (cx + b[0], cy + b[1])
    v3 = (2 * cx - v1[0], 2 * cy - v1[1])
    v4 = (2 * cx - v2[0], 2 * cy - v2[1])
    return np.asarray([v1, v2, v3, v4], dtype=np.float64)


def from_cxcywhd(cx: float, cy: float, w: float, h: float, d: float) -> np.ndarray:
    return from_cxcywhr(cx, cy, w, h, math.radians(d))


def _shift_back(a: np.ndarray) -> np.ndarray:
    """np.roll(a, -1) without its axis-normalization overhead."""
    out = np.empty_like(a)
    out[-1] = a[0]
    out[:-1] = a[1:]
    return out


def shoelace_area(poly: np.ndarray) -> float:
    p = np.asarray(poly, dtype=np.float64)
    if len(p) < 3:
        return 0.0
    x, y = p[:, 0], p[:, 1]
    return float(abs(np.dot(x, _shift_back(y)) - np.dot(y, _shift_back(x))) / 2.0)


def _clip_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland-Hodgman: clip convex ``subject`` by convex ``clip``."""
    clip = np.asarray(clip, dtype=np.float64)
    # ensure counter-clockwise clip polygon (positive signed area)
    x, y = clip[:, 0], clip[:, 1]
    if (np.dot(x, _shift_back(y)) - np.dot(y, _shift_back(x))) < 0:
        clip = clip[::-1]
    output = [tuple(p) for p in np.asarray(subject, dtype=np.float64)]
    for i in range(len(clip)):
        a = clip[i]
        b = clip[(i + 1) % len(clip)]
        input_pts, output = output, []
        if not input_pts:
            break
        s = input_pts[-1]

        def inside(p):
            return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= 0

        def intersect(p, q):
            dc = (a[0] - b[0], a[1] - b[1])
            dp = (p[0] - q[0], p[1] - q[1])
            n1 = a[0] * b[1] - a[1] * b[0]
            n2 = p[0] * q[1] - p[1] * q[0]
            den = dc[0] * dp[1] - dc[1] * dp[0]
            return ((n1 * dp[0] - n2 * dc[0]) / den, (n1 * dp[1] - n2 * dc[1]) / den)

        for e in input_pts:
            if inside(e):
                if not inside(s):
                    output.append(intersect(s, e))
                output.append(e)
            elif inside(s):
                output.append(intersect(s, e))
            s = e
    return np.asarray(output, dtype=np.float64)


def intersect_area(a: np.ndarray, b: np.ndarray) -> float:
    """mbr.rs:176-180."""
    clipped = _clip_convex(a, b)
    return shoelace_area(clipped)


def union_area(a: np.ndarray, b: np.ndarray) -> float:
    """mbr.rs:182-186 (inclusion-exclusion for convex operands)."""
    return shoelace_area(a) + shoelace_area(b) - intersect_area(a, b)


def iou(a: np.ndarray, b: np.ndarray) -> float:
    """Nms trait iou = intersect/union (mbr.rs:21-23)."""
    u = union_area(a, b)
    return float(intersect_area(a, b) / u) if u > 0 else 0.0


def distance_min_max(vertices: np.ndarray) -> tuple[float, float]:
    """(shorter, longer) adjacent-edge lengths (mbr.rs:164-174), f32-rounded
    like the reference's `as f32` casts."""
    v = np.asarray(vertices, dtype=np.float64)
    d1 = float(np.hypot(*(v[0] - v[1])))
    d2 = float(np.hypot(*(v[1] - v[2])))
    lo, hi = (d1, d2) if d1 < d2 else (d2, d1)
    return float(np.float32(lo)), float(np.float32(hi))
