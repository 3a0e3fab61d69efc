"""Greedy class-agnostic non-maximum suppression.

Reference semantics: ``Y::nms`` /root/reference/src/xy/y.rs:92-114 —
stable sort by confidence descending, then keep a box unless its IoU with
any previously-kept box exceeds ``iou_threshold`` (strict ``>``). Kept boxes
retain sort order. Per-image local — in Spark this runs inside the
extraction pandas UDF, never as a shuffle.

Implementation note: small n uses one n×n IoU matrix; large n uses an exact
conflict-graph reduction (y-interval sweep finds every positive-overlap
pair; unconflicted boxes are kept outright, greedy runs only on the
conflicted subset — bit-identical to the sequential loop, A/B-proven in
tests/test_nms_conflict_graph.py). Dense pages past the pair budget fall
back to incremental candidate-vs-kept IoU (O(n*k) with small 1-D
temporaries) — never a materialized n×n matrix, since large fresh
allocations are far more expensive than the arithmetic here.
"""

from __future__ import annotations

import numpy as np

# Candidate-pair budget for the large-n conflict-graph sweep. Past this the
# page is genuinely dense (overlap graph ~ quadratic) and the flat pair
# arrays would become the kind of large fresh allocation this sandbox
# punishes — fall back to the incremental sequential loop instead.
_PAIR_CAP = 1_000_000


def nms_indices(boxes: np.ndarray, confs: np.ndarray, iou_threshold: float) -> np.ndarray:
    """Return indices (into the input) of kept boxes, in kept order.

    Mirrors y.rs:92-114: sort conf desc (stable — ties keep input order,
    matching Rust ``sort_by`` stability), drop when iou > threshold vs any
    previously kept box.
    """
    boxes = np.asarray(boxes, dtype=np.float32)
    confs = np.asarray(confs, dtype=np.float32)
    n = len(confs)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    order = np.argsort(-confs, kind="stable")

    # Collapse EXACT duplicate boxes to their max-conf instance (stable).
    # Equivalent under greedy NMS for thr < 1: a duplicate has IoU 1.0 with
    # its twin (suppressed if the twin is kept) and identical IoUs against
    # every other box (suppressed by exactly the same kept boxes if the
    # twin was dropped) — so it can never be kept and never affects other
    # decisions. Duplicate anchors are the common case (the stub emits 2
    # identical anchors per block).
    bo = np.ascontiguousarray(boxes[order])
    if iou_threshold < 1.0:
        # first-occurrence row dedup via a byte-key set. BITWISE equality
        # is the invariant: rows that are value-equal but byte-distinct
        # (0.0 vs -0.0, NaN coords) are NOT collapsed here, unlike
        # np.unique(axis=0) — the surviving twin is still suppressed via
        # IoU 1.0 below, so the FINAL NMS OUTPUT is identical (fuzz-
        # verified incl. -0.0), at a fraction of unique's lexsort cost
        # (n is tens of boxes per page, once per doc in the hot path)
        rows = bo.view(np.uint8).reshape(n, -1)
        seen: set[bytes] = set()
        keep_j = [
            j
            for j in range(n)
            if (k := rows[j].tobytes()) not in seen and not seen.add(k)
        ]
        if len(keep_j) != n:
            order = order[np.asarray(keep_j, dtype=np.int64)]
            bo = np.ascontiguousarray(boxes[order])
            n = len(order)

    if n <= 512:
        # small-n fast path: one n x n IoU matrix (the dominant cost at
        # typical page box counts is per-call numpy overhead, not FLOPs).
        # Inline geometry.iou's exact float32 op sequence (bit-identical
        # comparisons) without its per-call asarray/function overhead.
        x1 = bo[:, 0]
        y1 = bo[:, 1]
        x2 = bo[:, 0] + bo[:, 2]
        y2 = bo[:, 1] + bo[:, 3]
        l = np.maximum(x1[:, None], x1[None, :])
        r = np.minimum(x2[:, None], x2[None, :])
        t = np.maximum(y1[:, None], y1[None, :])
        btm = np.minimum(y2[:, None], y2[None, :])
        inter = np.maximum(r - l, 0.0) * np.maximum(btm - t, 0.0)
        ar = bo[:, 2] * bo[:, 3]
        uni = ar[:, None] + ar[None, :] - inter
        ious = (inter / np.maximum(uni, np.float32(1e-12))).astype(np.float32)
        suppress = ious > np.float32(iou_threshold)
        np.fill_diagonal(suppress, False)
        if not suppress.any():
            # no pair conflicts (disjoint flow layouts — the common page):
            # greedy NMS keeps everything, no sequential pass needed
            return order
        kept_mask = np.zeros(n, dtype=bool)
        kept_small: list[int] = []
        for i in range(n):
            if not suppress[i, kept_mask].any():
                kept_mask[i] = True
                kept_small.append(i)
        return order[np.asarray(kept_small, dtype=np.int64)]

    b = boxes[order]
    x1 = b[:, 0]
    y1 = b[:, 1]
    x2 = b[:, 0] + b[:, 2]
    y2 = b[:, 1] + b[:, 3]
    areas = b[:, 2] * b[:, 3]
    thr = np.float32(iou_threshold)

    # Large-n exact conflict-graph reduction (y-interval sweep). Suppression
    # requires IoU > thr >= 0, which requires strictly positive intersection
    # area; a box with no positive-area partner among ALL boxes is therefore
    # kept unconditionally and contributes IoU 0 (or NaN, never > thr) to
    # every later decision. So greedy only needs to run on the conflicted
    # subset, with identical float ops -> bit-identical output (A/B-proven
    # in tests/test_nms_conflict_graph.py). Skew pages — thousands of
    # y-disjoint flow blocks — collapse to zero pairs and skip the
    # sequential loop entirely. NaN-coordinate boxes are excluded from the
    # sweep (sort/searchsorted are undefined on NaN) and treated as
    # unconflicted, which matches greedy exactly: NaN IoU is never > thr in
    # either direction.
    if thr >= 0:
        nan_free = ~(np.isnan(x1) | np.isnan(y1) | np.isnan(x2) | np.isnan(y2))
        if nan_free.all():
            vidx = None
            sy1, sy2, sx1, sx2 = y1, y2, x1, x2
        else:
            vidx = np.nonzero(nan_free)[0]
            sy1, sy2, sx1, sx2 = y1[vidx], y2[vidx], x1[vidx], x2[vidx]
        m = len(sy1)
        o = np.argsort(sy1, kind="stable")
        ys1, ys2, xs1, xs2 = sy1[o], sy2[o], sx1[o], sx2[o]
        # per sweep row i: candidate partners j>i with ys1[j] < ys2[i]
        hi = np.searchsorted(ys1, ys2, side="left")
        win = hi - np.arange(1, m + 1)
        np.maximum(win, 0, out=win)
        n_pairs = int(win.sum())
        if n_pairs <= _PAIR_CAP:
            conflicted = np.zeros(n, dtype=bool)
            if n_pairs:
                ii = np.repeat(np.arange(m), win)
                off = np.cumsum(win) - win
                jj = np.arange(n_pairs) - np.repeat(off, win) + ii + 1
                # strict both-axis overlap — a superset of inter > 0, so a
                # false positive only costs a seat in the exact subset loop
                ov = (
                    (xs1[ii] < xs2[jj])
                    & (xs1[jj] < xs2[ii])
                    & (ys1[ii] < ys2[jj])
                )  # window already guarantees ys1[jj] < ys2[ii]
                src = o if vidx is None else vidx[o]
                conflicted[src[ii[ov]]] = True
                conflicted[src[jj[ov]]] = True
            if not conflicted.any():
                return order
            sub = np.nonzero(conflicted)[0]  # ascending == conf order
            s = len(sub)
            kx1 = np.empty(s, dtype=np.float32)
            ky1 = np.empty(s, dtype=np.float32)
            kx2 = np.empty(s, dtype=np.float32)
            ky2 = np.empty(s, dtype=np.float32)
            karea = np.empty(s, dtype=np.float32)
            kept_mask = ~conflicted  # unconflicted boxes are always kept
            k = 0
            for i in sub:
                if k:
                    l = np.maximum(kx1[:k], x1[i])
                    r = np.minimum(kx2[:k], x2[i])
                    t = np.maximum(ky1[:k], y1[i])
                    bo = np.minimum(ky2[:k], y2[i])
                    inter = np.maximum(r - l, 0.0) * np.maximum(bo - t, 0.0)
                    uni = karea[:k] + areas[i] - inter
                    iou_k = inter / np.maximum(uni, np.float32(1e-12))
                    if (iou_k > thr).any():
                        continue
                kx1[k] = x1[i]
                ky1[k] = y1[i]
                kx2[k] = x2[i]
                ky2[k] = y2[i]
                karea[k] = areas[i]
                kept_mask[i] = True
                k += 1
            return order[np.nonzero(kept_mask)[0]]

    # kept-box coordinate buffers, filled as boxes are accepted
    kx1 = np.empty(n, dtype=np.float32)
    ky1 = np.empty(n, dtype=np.float32)
    kx2 = np.empty(n, dtype=np.float32)
    ky2 = np.empty(n, dtype=np.float32)
    karea = np.empty(n, dtype=np.float32)
    kept: list[int] = []
    k = 0
    for i in range(n):
        if k:
            l = np.maximum(kx1[:k], x1[i])
            r = np.minimum(kx2[:k], x2[i])
            t = np.maximum(ky1[:k], y1[i])
            bo = np.minimum(ky2[:k], y2[i])
            inter = np.maximum(r - l, 0.0) * np.maximum(bo - t, 0.0)
            uni = karea[:k] + areas[i] - inter
            iou_k = inter / np.maximum(uni, np.float32(1e-12))
            if (iou_k > thr).any():
                continue
        kx1[k] = x1[i]
        ky1[k] = y1[i]
        kx2[k] = x2[i]
        ky2[k] = y2[i]
        karea[k] = areas[i]
        kept.append(i)
        k += 1
    return order[np.asarray(kept, dtype=np.int64)]
