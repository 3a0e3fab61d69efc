"""Pixel-native text-region detection (round-2 VERDICT item 1): the FULL
D1-D7 DB postprocess (binarize -> 4-connected components -> Moore contour
-> unclip -> convex hull -> verify -> min-size/conf filters,
kernels/ocr.py; reference semantics /root/reference/src/models/db/impl.rs:95-153)
runs on real rendered page pixels (io/synth.render_page_raster) instead of
an n_chars-derived probability map — and the oracle is derived from the
RENDER SPEC, not from kernel output.

How the oracle avoids circularity: for an axis-aligned filled rectangle at
(x0, y0, w, h) every float64 operation in the detect chain has a closed
form —

  contour       all boundary pixel centers; shoelace area (w-1)(h-1) and
                perimeter 2((w-1)+(h-1)) are EXACT integers in float64
  delta         ((w-1)(h-1) * 1.5) / (2((w-1)+(h-1)))   [one IEEE divide]
  unclip        edge pixels move exactly +/-delta along an axis (unit
                normals are exact); the 4 corner pixels move diagonally by
                q = (1.0/sqrt(2.0)) * delta per coordinate
  hull          a fixed 12-gon: 2 extreme points per side + 4 chamfered
                corners, in the fixed monotone-chain order
  verify        keeps all 12 (distinct int-cast coords; asserted in tests)
  conf          ordered-shoelace(12-gon) / ((x2-x1)*(y2-y1)), cast float32
  x/y/w/h       round-half-away(float32(...)) -> int

Each step is one (or a fixed chain of) IEEE operation(s), so the DuckDB
oracle states the SAME value bit-for-bit by writing the operations in the
same order (the kernel's hull-area shoelace was made an explicit
sequential fold for exactly this reason — np.dot's BLAS summation order is
not portable). The oracle below is BUILT symbolically from the spec
formulas; no kernel runs during its construction, closing the
pinned-lookup circularity the round-2 VERDICT flagged.

The spec guarantees no region is ever dropped by the D6/D7 filters
(min height 15+2*delta >= 12, min width 3+2*delta >= 5, conf ~0.97 >=
0.35) and no unclip vertex clamps at the border (margin 16 > max delta
14.25) — asserted at render time — so region_id == chunk index k.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from ..io.synth import raster_spec, render_page_raster
from ..kernels.ocr import db_postprocess
from ..kernels.yolo_decode import round_half_away

RASTER_OCR_SCHEMA = (
    "doc_id bigint, region_id int, x int, y int, width int, height int, conf float"
)


def detect_raster_regions(doc_id: int, text: str) -> list[tuple]:
    """Render the page raster and run the real detect postprocess on it."""
    rects = raster_spec(doc_id, text)
    if not rects:
        return []
    prob = render_page_raster(rects).astype(np.float32) / np.float32(255.0)
    regions = db_postprocess(prob, ratio=1.0)
    if len(regions) != len(rects):  # loud, not silently shifted region ids
        raise RuntimeError(
            f"doc {doc_id}: detected {len(regions)} regions for {len(rects)} rects"
        )
    rows = []
    for k, r in enumerate(regions):
        x1, y1, x2, y2 = r["bbox"]
        rows.append(
            (
                doc_id,
                k,
                int(round_half_away(np.float32(x1))),
                int(round_half_away(np.float32(y1))),
                int(round_half_away(np.float32(x2 - x1))),
                int(round_half_away(np.float32(y2 - y1))),
                float(np.float32(r["conf"])),
            )
        )
    return rows


def _raster_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ["doc_id", "region_id", "x", "y", "width", "height", "conf"]
    for pdf in batches:
        rows: list[tuple] = []
        for d, t in zip(pdf["doc_id"], pdf["text"]):
            rows.extend(detect_raster_regions(int(d), t))
        yield pd.DataFrame(rows, columns=cols)


def raster_ocr_regions(spark, sf_dir: str):
    """documents -> per-chunk detected glyph-box geometry from pixels.

    The source parquet is a single split at test scale — repartition on
    doc_id BEFORE the Arrow crossing (4 waves per core) so the raster
    render + contour trace runs on every core, same shape as
    io/synth.pages_from_documents."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    nparts = spark.sparkContext.defaultParallelism * 4
    return docs.repartition(nparts, "doc_id").mapInPandas(
        _raster_batch, schema=RASTER_OCR_SCHEMA
    )


# ---------------------------------------------------------------------------
# symbolic oracle builder (DuckDB SQL, constructed from the render spec)
# ---------------------------------------------------------------------------

def _hull_vertices() -> list[tuple[str, str]]:
    """The 12 hull vertices as (x_expr, y_expr) SQL strings over the spec
    columns x0d/y0d/xrd/ybd (doubles) and dd/qd (delta and its diagonal
    component), in the monotone-chain output order
      [L1, TLc, T1, T2, TRc, R1, R2, BRc, B2, B1, BLc, L2]
    (lexicographic start at the left edge's upper point; asserted against
    the kernel in tests/test_raster_ocr.py)."""
    return [
        ("(x0d - dd)", "(y0d + 1)"),          # L1
        ("(x0d - qd)", "(y0d - qd)"),          # TLc
        ("(x0d + 1)", "(y0d - dd)"),           # T1
        ("((xrd - 1))", "(y0d - dd)"),         # T2  (x0 + w - 2 == xr - 1)
        ("(xrd + qd)", "(y0d - qd)"),          # TRc
        ("(xrd + dd)", "(y0d + 1)"),           # R1
        ("(xrd + dd)", "((ybd - 1))"),         # R2  (y0 + h - 2 == yb - 1)
        ("(xrd + qd)", "(ybd + qd)"),          # BRc
        ("((xrd - 1))", "(ybd + dd)"),         # B2
        ("(x0d + 1)", "(ybd + dd)"),           # B1
        ("(x0d - qd)", "(ybd + qd)"),          # BLc
        ("(x0d - dd)", "((ybd - 1))"),         # L2
    ]


def _shoelace_fold(verts: list[tuple[str, str]]) -> str:
    """Sequential left-fold of x_i*y_{i+1} - y_i*x_{i+1} — the exact
    rounding sequence of kernels.ocr.polygon_area_ordered."""
    n = len(verts)
    terms = []
    for i in range(n):
        xi, yi = verts[i]
        xj, yj = verts[(i + 1) % n]
        terms.append(f"({xi} * {yj} - {yi} * {xj})")
    acc = terms[0]
    for t in terms[1:]:
        acc = f"({acc} + {t})"
    return f"(abs({acc}) / 2.0)"


def _rha_int(expr: str) -> str:
    """round_half_away(float32(v)) -> int, in DuckDB f32 arithmetic:
    floor(|v32| + 0.5f) with the sign restored is just floor(v32 + 0.5f)
    for the non-negative geometry here."""
    return f"CAST(floor(CAST({expr} AS FLOAT) + CAST(0.5 AS FLOAT)) AS INT)"


def raster_ocr_oracle() -> str:
    verts = _hull_vertices()
    hull_area = _shoelace_fold(verts)
    return f"""
WITH d0 AS (
  SELECT doc_id,
         [array_to_string((string_split(text, ' '))[i:i+7], ' ')
          for i in range(1, len(string_split(text, ' ')) + 1, 8)] AS chunks
  FROM documents
),
ch AS (
  SELECT doc_id,
         generate_subscripts(chunks, 1) - 1 AS k,
         length(unnest(chunks)) AS c
  FROM d0
),
spec AS (
  SELECT doc_id, CAST(k AS INT) AS region_id,
         16 + 4 * (k % 3) AS x0, 16 + 40 * k AS y0,
         4 * c AS w, 16 + 4 * ((doc_id + k) % 2) AS h
  FROM ch
),
geom AS (
  SELECT doc_id, region_id,
         CAST(x0 AS DOUBLE) AS x0d, CAST(y0 AS DOUBLE) AS y0d,
         CAST(x0 + w - 1 AS DOUBLE) AS xrd, CAST(y0 + h - 1 AS DOUBLE) AS ybd,
         (CAST((w - 1) * (h - 1) AS DOUBLE) * 1.5)
           / (2.0 * ((w - 1) + (h - 1))) AS dd
  FROM spec
),
geom2 AS (
  SELECT *, ((1.0 / sqrt(2.0)) * dd) AS qd FROM geom
),
boxes AS (
  SELECT doc_id, region_id,
         (x0d - dd) AS bx1, (y0d - dd) AS by1,
         (xrd + dd) AS bx2, (ybd + dd) AS by2,
         {hull_area} AS hull_area
  FROM geom2
)
SELECT doc_id, region_id,
       {_rha_int("bx1")} AS x,
       {_rha_int("by1")} AS y,
       {_rha_int("(bx2 - bx1)")} AS width,
       {_rha_int("(by2 - by1)")} AS height,
       CAST(hull_area / ((bx2 - bx1) * (by2 - by1)) AS FLOAT) AS conf
FROM boxes
"""
