"""OCR-path kernels: DB text-detection postprocess + SVTR/TrOCR decoding.

The reference's OCR half does not compile (SURVEY.md §0) but its intended
semantics are fully legible and are part of the spec:

  D1 binarize:   x <= binary_thresh (0.2) -> 0 else x*255 u8
                 (/root/reference/src/models/db/impl.rs:95-106)
  D3 contours:   find_contours_with_threshold(mask, 1); drop holes <= 2 pts
                 (db/impl.rs:121-131) — re-implemented as Moore-neighbor
                 boundary tracing over 4-connected components (numpy only)
  D4 unclip:     per-vertex normal offset, delta = area * round(ratio) *
                 unclip_ratio(1.5) / perimeter, clamped to the image
                 (db/impl.rs:136-144; kernel /root/reference/src/xy/polygon.rs:151-187)
  D5 resample:   densify each edge with num_samples-1 interpolated points
                 (polygon.rs:131-149); convex hull; verify = dedup on
                 int-cast coords incl. trailing-first cleanup (polygon.rs:189-211)
  D6 filters:    drop if bbox h < 12 or w < 5 (db/config.rs:16-17);
                 conf = polygon_area / bbox_area, threshold 0.35 (db/config.rs:15)
  R1 SVTR:       per-timestep argmax over vocab, truncate to max_length,
                 drop blank id 0 and conf < thresh (0.2), join vocab chars —
                 note: NO repeat-collapse, faithfully mirroring
                 /root/reference/src/models/svtr/impl.rs:73-97
  R3 TrOCR:      greedy autoregressive loop: start token 1, EOS 2, max 50
                 steps, argmax of last-position logits, concat re-feed
                 (/root/reference/src/models/trocr/impl.rs:51-140)
  R5 sampler:    argmax only (determinism; the reference's top-p path uses
                 RNG and is intentionally not replicated —
                 /root/reference/src/misc/logits_sampler.rs:34-93)

All per-region local: runs inside the extraction/OCR pandas UDF.
"""

from __future__ import annotations


import numpy as np

BINARY_THRESH = np.float32(0.2)  # options.rs:192 default
UNCLIP_RATIO = 1.5  # db unclip_ratio default
MIN_HEIGHT = 12.0  # db/config.rs:16
MIN_WIDTH = 5.0  # db/config.rs:17
CONF_THRESH = np.float32(0.35)  # db/config.rs:15


def binarize_prob_map(prob_map: np.ndarray, thresh: float = BINARY_THRESH) -> np.ndarray:
    """D1: probability map -> u8 mask."""
    pm = np.asarray(prob_map, dtype=np.float32)
    return np.where(pm <= np.float32(thresh), 0, (pm * 255.0).astype(np.uint8)).astype(np.uint8)


# 8-neighborhood in clockwise order starting East
_MOORE = [(-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1)]
# indexed as (dy, dx); order: N, NE, E, SE, S, SW, W, NW


def _trace_boundary(fg: np.ndarray, start: tuple[int, int]) -> list[tuple[int, int]]:
    """Moore-neighbor boundary trace (clockwise) from the topmost-leftmost
    pixel of a component. Returns (x, y) points in traversal order."""
    h, w = fg.shape
    sy, sx = start
    boundary = [(sx, sy)]
    # backtrack starts W of the start pixel (row-major scan guarantees bg/edge)
    prev_dir = 6  # W
    cy, cx = sy, sx
    first_move = None
    while True:
        found = False
        # search clockwise starting just after the backtrack direction
        for k in range(1, 9):
            d = (prev_dir + k) % 8
            dy, dx = _MOORE[d]
            ny, nx = cy + dy, cx + dx
            if 0 <= ny < h and 0 <= nx < w and fg[ny, nx]:
                if (ny, nx) == (sy, sx) and first_move is not None:
                    return boundary
                if first_move is None:
                    first_move = d
                elif (cy, cx) == (sy, sx) and d == first_move:
                    return boundary  # Jacob's stopping criterion
                boundary.append((nx, ny))
                # new backtrack: direction pointing back to the previous pixel
                prev_dir = (d + 4) % 8
                cy, cx = ny, nx
                found = True
                break
        if not found:  # isolated pixel
            return boundary
        if len(boundary) > 4 * fg.size:  # safety bound
            return boundary


def _label_components(fg: np.ndarray) -> tuple[np.ndarray, int]:
    """4-connected component labeling via per-row run extraction +
    union-find over runs — O(rows x runs), not O(pixels) python (a BFS
    flood fill costs ~1us/pixel in python and dominated the OCR stage)."""
    h, w = fg.shape
    labels = np.zeros((h, w), dtype=np.int32)
    parent: list[int] = [0]  # parent[0] unused

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    prev_runs: list[tuple[int, int, int]] = []  # (start, end, label)
    all_runs: list[int] = []  # labels in row-major run order
    # iterate NONEMPTY rows only (one vectorized any(axis=1) instead of a
    # per-row .any() — detect maps/page rasters are mostly background and
    # the empty-row python iterations dominated the labeling cost)
    nonempty = np.nonzero(fg.any(axis=1))[0]
    last_y = -2
    for y in nonempty:
        if y != last_y + 1:
            prev_runs = []  # a background row gap breaks 4-connectivity
        last_y = y
        row = fg[y]
        # transition positions (identical to diff(int8)==+/-1): a change at
        # index t means row flips at t; flips INTO fg start a run, flips
        # OUT end one — single comparison + two masked selects
        t = np.flatnonzero(row[1:] != row[:-1]) + 1
        on = row[t]
        starts = t[on].tolist()
        ends = t[~on].tolist()
        if row[0]:
            starts.insert(0, 0)
        if row[-1]:
            ends.append(w)
        runs = []
        for s, e in zip(starts, ends):
            lab = 0
            for ps, pe, pl in prev_runs:
                if ps < e and s < pe:  # 4-connected overlap
                    if lab == 0:
                        lab = find(pl)
                    else:
                        rb = find(pl)
                        if rb != lab:
                            parent[rb] = lab
            if lab == 0:
                parent.append(len(parent))
                lab = len(parent) - 1
            labels[y, s:e] = lab
            runs.append((s, e, lab))
            all_runs.append(lab)
        prev_runs = runs
    # compress to consecutive ids in first-appearance (row-major) order
    remap: dict[int, int] = {}
    for lab in all_runs:
        r = find(lab)
        if r not in remap:
            remap[r] = len(remap) + 1
    lut = np.zeros(len(parent), dtype=np.int32)
    for lab in range(1, len(parent)):
        lut[lab] = remap[find(lab)]
    return lut[labels], len(remap)


def _rect_ring(x0: int, y0: int, x1: int, y1: int) -> np.ndarray:
    """Clockwise boundary ring of a filled rectangle, POINT-IDENTICAL to
    _trace_boundary from the topmost-leftmost pixel (differential fuzz in
    tests/test_kernels_ocr.py): top L->R, right T->B, bottom R->L, left
    B->T. Vectorized — the solid-rectangle case is the OCR stage's hot
    path (round-2 VERDICT item 7) and the python-stepping Moore walk was
    ~40% of ocr_spans."""
    xs = np.concatenate(
        [
            np.arange(x0, x1 + 1),
            np.full(y1 - y0, x1),
            np.arange(x1 - 1, x0 - 1, -1),
            np.full(y1 - y0 - 1, x0),
        ]
    )
    ys = np.concatenate(
        [
            np.full(x1 - x0 + 1, y0),
            np.arange(y0 + 1, y1 + 1),
            np.full(x1 - x0, y1),
            np.arange(y1 - 1, y0, -1),
        ]
    )
    return np.stack([xs, ys], axis=1)


def find_outer_contours(mask: np.ndarray) -> list[np.ndarray]:
    """D3: outer boundaries of 4-connected foreground components, in
    row-major discovery order. Returns [K,2] float64 (x, y) arrays.

    One nonzero pass groups pixels per label (no per-component full-frame
    scans — O(fg pixels), not O(components x H x W)); solid rectangles
    take the vectorized ring; everything else Moore-traces inside its own
    bbox window (identical output, the trace never consults pixels outside
    the component)."""
    fg = np.asarray(mask) > 0
    if not fg.any():
        return []
    # single-solid-rectangle fast path: if the foreground's bounding box is
    # fully set AND contains every fg pixel, there is exactly one
    # 4-connected component and it is that solid rect — the labeling /
    # nonzero / argsort machinery below would reach the same _rect_ring via
    # its per-component rect test (bitwise-identical, A/B-asserted in
    # tests/test_kernels_ocr.py). This is the DB-detect hot shape: every
    # stub prob map is one solid text rectangle.
    rows = fg.any(axis=1)
    cols = fg.any(axis=0)
    ry = np.flatnonzero(rows)
    cx = np.flatnonzero(cols)
    y0r, y1r = int(ry[0]), int(ry[-1])
    x0r, x1r = int(cx[0]), int(cx[-1])
    if (
        y1r > y0r
        and x1r > x0r
        and int(np.count_nonzero(fg)) == (y1r - y0r + 1) * (x1r - x0r + 1)
        and fg[y0r : y1r + 1, x0r : x1r + 1].all()
    ):
        return [_rect_ring(x0r, y0r, x1r, y1r)[::-1].astype(np.float64)]
    labels, n = _label_components(fg)
    ys, xs = np.nonzero(labels)
    lab = labels[ys, xs]
    order = np.argsort(lab, kind="stable")  # stable: row-major within label
    ys, xs, lab = ys[order], xs[order], lab[order]
    bounds = np.searchsorted(lab, np.arange(1, n + 2))
    contours = []
    for comp_id in range(1, n + 1):
        sl = slice(bounds[comp_id - 1], bounds[comp_id])
        cys, cxs = ys[sl], xs[sl]
        y0, y1 = int(cys[0]), int(cys[-1])  # row-major: first/last rows
        x0, x1 = int(cxs.min()), int(cxs.max())
        if y1 > y0 and x1 > x0 and len(cys) == (y1 - y0 + 1) * (x1 - x0 + 1):
            pts_arr = _rect_ring(x0, y0, x1, y1)
            contours.append(pts_arr[::-1].astype(np.float64))
            continue
        comp = np.zeros((y1 - y0 + 1, x1 - x0 + 1), dtype=bool)
        comp[cys - y0, cxs - x0] = True
        start = (int(cys[0]) - y0, int(cxs[0]) - x0)
        pts = _trace_boundary(comp, start)
        arr = np.asarray(pts[::-1], dtype=np.float64)
        arr[:, 0] += x0
        arr[:, 1] += y0
        # Moore tracing walks clockwise (image coords, y down); reversed to
        # counter-clockwise so the unclip normal (-dy, dx) points OUTWARD —
        # the dilation the DB unclip semantics require (db/impl.rs:136-144)
        contours.append(arr)
    return contours


def _shift_fwd(a: np.ndarray) -> np.ndarray:
    """np.roll(a, 1, axis=0) without roll's axis-normalization overhead
    (identical values; these run per detected region in the OCR hot path)."""
    out = np.empty_like(a)
    out[0] = a[-1]
    out[1:] = a[:-1]
    return out


def _shift_back(a: np.ndarray) -> np.ndarray:
    """np.roll(a, -1, axis=0) — see _shift_fwd."""
    out = np.empty_like(a)
    out[-1] = a[0]
    out[:-1] = a[1:]
    return out


def _simplify_runs(points: np.ndarray) -> np.ndarray:
    """Drop interior points of straight AXIS-ALIGNED boundary runs before
    unclip+hull — output-identical by construction, proven by fuzz:

      * a dropped point's unclip offset lies ON the segment between its
        kept run-mates' offsets (same unit normal, collinear positions),
        and the monotone chain pops collinear points anyway, so the hull
        vertex SET and ORDER are unchanged;
      * kept vertices see bit-identical normals: direction-change vertices
        keep both original neighbors, and run points keep their exact unit
        direction because k*(±1,0) / k and k*(0,±1) / k are exact in IEEE
        (diagonal runs are NOT dropped: sqrt(2k²) vs k*sqrt(2) can differ
        in the last bit).

    This is the round-2 VERDICT item-7 hot-spot fix: the python monotone
    chain ran over every boundary pixel (~650/region); now it sees only
    corners."""
    p = np.asarray(points, dtype=np.float64)
    n = len(p)
    if n <= 8:
        return p
    d = p - _shift_fwd(p)  # incoming step per vertex
    dn = _shift_back(d)  # outgoing step
    change = (d != dn).any(axis=1)
    axis_run = (d[:, 0] == 0) | (d[:, 1] == 0)
    keep = change | _shift_fwd(change) | _shift_back(change) | ~axis_run
    return p[keep]


def polygon_area(points: np.ndarray) -> float:
    """Shoelace (absolute)."""
    p = np.asarray(points, dtype=np.float64)
    if len(p) < 3:
        return 0.0
    x, y = p[:, 0], p[:, 1]
    return float(abs(np.dot(x, _shift_back(y)) - np.dot(y, _shift_back(x))) / 2.0)


def polygon_area_ordered(points: np.ndarray) -> float:
    """Shoelace with an EXPLICIT sequential left-fold: acc += x_i*y_{i+1} -
    y_i*x_{i+1} in vertex order. Bit-reproducible anywhere IEEE doubles
    exist — unlike np.dot (BLAS may reassociate) — so a SQL oracle can
    state the same value term-for-term. Used for the hull-confidence ratio,
    whose inputs are non-integer; `polygon_area` (dot-based) stays on the
    integer-exact contour path where summation order cannot matter."""
    p = np.asarray(points, dtype=np.float64)
    n = len(p)
    if n < 3:
        return 0.0
    s = 0.0
    for i in range(n):
        x1, y1 = p[i]
        x2, y2 = p[(i + 1) % n]
        s += x1 * y2 - y1 * x2
    return abs(s) / 2.0


def polygon_perimeter(points: np.ndarray) -> float:
    p = np.asarray(points, dtype=np.float64)
    if len(p) < 2:
        return 0.0
    d = _shift_back(p) - p  # == np.diff of the closed ring
    return float(np.sqrt((d**2).sum(axis=1)).sum())


def unclip(points: np.ndarray, delta: float, width: float, height: float) -> np.ndarray:
    """D4: offset each vertex along the normal of its prev->next edge vector
    by delta, clamped to [0,width]x[0,height]. Exact polygon.rs:151-187 loop
    (NOT shapely buffer — numerics must match the reference)."""
    p = np.asarray(points, dtype=np.float64)
    n = len(p)
    if n == 0:
        return p
    prev_pts = _shift_fwd(p)
    next_pts = _shift_back(p)
    edge = next_pts - prev_pts
    normal = np.stack([-edge[:, 1], edge[:, 0]], axis=1)
    length = np.sqrt((normal**2).sum(axis=1))
    out = p.copy()
    ok = np.abs(length) >= 1e-6
    out[ok] = p[ok] + normal[ok] / length[ok, None] * delta
    out[:, 0] = np.clip(out[:, 0], 0.0, width)
    out[:, 1] = np.clip(out[:, 1], 0.0, height)
    # non-ok vertices keep original coords (polygon.rs:172-173)
    out[~ok] = p[~ok]
    return out


def resample(points: np.ndarray, num_samples: int = 50) -> np.ndarray:
    """D5a: densify — for each edge (incl. closing edge) emit the start point
    plus num_samples-1 evenly interpolated points (polygon.rs:131-149)."""
    p = np.asarray(points, dtype=np.float64)
    n = len(p)
    if n == 0:
        return p
    starts = p
    ends = _shift_back(p)
    t = (np.arange(num_samples, dtype=np.float64) / num_samples)[None, :, None]  # [1,S,1]
    seg = starts[:, None, :] + t * (ends - starts)[:, None, :]  # [n,S,2]
    return seg.reshape(-1, 2)


def convex_hull(points: np.ndarray) -> np.ndarray:
    """D5b: Andrew monotone chain, CCW order (scalar cross products —
    np.cross has per-call overhead that dominates on dense contours).
    Dedup is one lexsort + consecutive-row diff (np.unique(axis=0) sorts
    AND the old code re-sorted after it — same sorted-unique rows, half
    the work)."""
    p = np.asarray(points, dtype=np.float64)
    if len(p) == 0:
        return p.reshape(0, 2)
    p = p[np.lexsort((p[:, 1], p[:, 0]))]
    if len(p) > 1:
        keep = np.ones(len(p), dtype=bool)
        keep[1:] = (p[1:] != p[:-1]).any(axis=1)
        p = p[keep]
    if len(p) <= 2:
        return p
    pts = [(float(x), float(y)) for x, y in p]

    def half(seq):
        out: list[tuple[float, float]] = []
        for q in seq:
            while len(out) >= 2:
                ox, oy = out[-2]
                ax, ay = out[-1]
                if (ax - ox) * (q[1] - oy) - (ay - oy) * (q[0] - ox) <= 0:
                    out.pop()
                else:
                    break
            out.append(q)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1], dtype=np.float64)


def verify(points: np.ndarray) -> np.ndarray:
    """D5c: dedup on int-cast coords — drop trailing points equal to the
    first, then keep first occurrence of each (int(x), int(y))
    (polygon.rs:189-211)."""
    p = list(np.asarray(points, dtype=np.float64))
    if p:
        first = (int(p[0][0]), int(p[0][1]))
        while len(p) > 1 and (int(p[-1][0]), int(p[-1][1])) == first:
            p.pop()
    seen = set()
    out = []
    for q in p:
        key = (int(q[0]), int(q[1]))
        if key not in seen:
            seen.add(key)
            out.append(q)
    return np.asarray(out, dtype=np.float64)


def db_postprocess(
    prob_map: np.ndarray,
    ratio: float = 1.0,
    binary_thresh: float = BINARY_THRESH,
    unclip_ratio: float = UNCLIP_RATIO,
    min_width: float = MIN_WIDTH,
    min_height: float = MIN_HEIGHT,
    conf_thresh: float = CONF_THRESH,
) -> list[dict]:
    """D1-D7 over one region probability map (already at original scale —
    the stateless resize2-style caller carries scale metadata per row).

    Returns dicts: polygon [K,2], bbox (x1,y1,x2,y2) floats, conf float.
    """
    mask = binarize_prob_map(prob_map, binary_thresh)
    h, w = mask.shape
    regions = []
    for contour in find_outer_contours(mask):
        if len(contour) <= 2:
            continue  # db/impl.rs:124-129 (degenerate/hole drop)
        area = polygon_area(contour)
        perim = polygon_perimeter(contour)
        if perim <= 0:
            continue
        delta = area * round(ratio) * unclip_ratio / perim  # db/impl.rs:136-139
        # reference chain is unclip -> resample(50) -> hull -> verify
        # (db/impl.rs:141-144); resample inserts only convex combinations of
        # edge endpoints, so hull(resample(X)) == hull(X) — we skip the 50x
        # point blowup in the hot path (identity asserted in unit tests);
        # straight-run interior points are likewise hull-invariant and are
        # dropped pre-unclip (_simplify_runs, fuzz-proven identical)
        poly = verify(convex_hull(unclip(_simplify_runs(contour), delta, float(w), float(h))))
        if len(poly) < 3:
            continue
        x1, y1 = poly.min(axis=0)
        x2, y2 = poly.max(axis=0)
        if (y2 - y1) < min_height or (x2 - x1) < min_width:  # db/impl.rs:146-148
            continue
        bbox_area = (x2 - x1) * (y2 - y1)
        # ordered shoelace: the conf a render-spec oracle can restate bitwise
        conf = float(np.float32(polygon_area_ordered(poly) / bbox_area)) if bbox_area > 0 else 0.0
        if np.float32(conf) < np.float32(conf_thresh):  # db/impl.rs:150-152
            continue
        regions.append(
            {
                "polygon": poly,
                "bbox": (float(x1), float(y1), float(x2), float(y2)),
                "conf": conf,
            }
        )
    return regions


# --------------------------------------------------------------------------
# recognition decoders
# --------------------------------------------------------------------------

def ctc_greedy_decode(
    logits: np.ndarray,
    vocab: list[str],
    max_length: int = 256,
    conf_thresh: float = 0.2,
) -> str:
    """R1: per-timestep argmax; truncate to max_length; drop blank id 0 and
    low-conf steps; join vocab entries. No repeat-collapse (svtr/impl.rs:83-93)."""
    lg = np.asarray(logits, dtype=np.float32)
    if lg.size == 0:
        return ""
    ids = np.argmax(lg, axis=1)
    confs = lg[np.arange(len(ids)), ids]
    ids = ids[:max_length]
    confs = confs[:max_length]
    keep = (ids != 0) & (confs >= np.float32(conf_thresh))
    return "".join(vocab[int(i)] for i in ids[keep])


def greedy_generate(
    step_fn,
    start_token: int = 1,
    eos_token: int = 2,
    max_steps: int = 50,
) -> list[int]:
    """R3: TrOCR-style greedy autoregressive loop. ``step_fn(input_ids)``
    returns logits [len(input_ids), V]; we argmax the LAST position, append,
    stop on EOS or max_steps (trocr/impl.rs:74-121)."""
    ids = [start_token]
    for _ in range(max_steps):
        logits = np.asarray(step_fn(ids), dtype=np.float32)
        nxt = int(np.argmax(logits[-1]))
        if nxt == eos_token:
            break
        ids.append(nxt)
    return ids[1:]  # strip start token
