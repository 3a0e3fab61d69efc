"""Debug annotation sink: layout regions rendered as SVG overlays.

The reference's Annotator draws boxes/polygons on raster images and saves
timestamped PNGs under runs/<saveout>/ (/root/reference/src/misc/annotator.rs:
327-417). Raster libs are absent here, and at Spark scale a per-image raster
sink is debug-only anyway (SURVEY.md §2.1 S5) — so the rebuild renders
deterministic SVG (pure text), one file per url, under <out_dir>/<saveout>/.

Colors follow a fixed per-class palette; geometry comes straight from the
extraction output rows, so an SVG diff is a readable regression artifact.
"""

from __future__ import annotations

import html
import pathlib

CLASS_COLORS = {
    "title": "#d62728",
    "plain text": "#1f77b4",
    "abandon": "#7f7f7f",
    "figure": "#2ca02c",
    "figure_caption": "#98df8a",
    "table": "#9467bd",
    "table_caption": "#c5b0d5",
    "table_footnote": "#8c564b",
    "isolate_formula": "#e377c2",
    "formula_caption": "#f7b6d2",
}


def render_svg(blocks: list[dict], page_w: int = 816, page_h: int | None = None) -> str:
    """blocks: dicts with x, y, width, height, cls, conf, order."""
    if page_h is None:
        page_h = max((b["y"] + b["height"] for b in blocks), default=100) + 48
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{page_w}" height="{page_h}" '
        f'viewBox="0 0 {page_w} {page_h}">',
        f'<rect width="{page_w}" height="{page_h}" fill="white"/>',
    ]
    for b in sorted(blocks, key=lambda b: b.get("order", 0)):
        color = CLASS_COLORS.get(b["cls"], "#000000")
        label = html.escape(f'{b.get("order", "")}: {b["cls"]} {b["conf"]:.2f}')
        parts.append(
            f'<rect x="{b["x"]}" y="{b["y"]}" width="{b["width"]}" height="{b["height"]}" '
            f'fill="none" stroke="{color}" stroke-width="3"/>'
        )
        parts.append(
            f'<text x="{b["x"]}" y="{max(b["y"] - 4, 10)}" font-size="12" '
            f'fill="{color}">{label}</text>'
        )
    parts.append("</svg>")
    return "\n".join(parts)


def annotate_extractions(extraction_rows, out_dir: str, saveout: str = "doclayout") -> int:
    """Write one SVG per row (driver-side debug sink — pass a LIMITed
    collect, never a full table). Returns files written."""
    root = pathlib.Path(out_dir) / saveout
    root.mkdir(parents=True, exist_ok=True)
    n = 0
    for row in extraction_rows:
        blocks = [b if isinstance(b, dict) else b.asDict() for b in (row["blocks"] or [])]
        name = row["url"].rstrip("/").rsplit("/", 1)[-1] or f"page{n}"
        (root / f"{name}.svg").write_text(render_svg(blocks))
        n += 1
    return n
