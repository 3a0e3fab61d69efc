"""OCR-span pipeline: text-region detection (DB postprocess) + recognition
(SVTR-style CTC decode) over region crops, per page, inside one
Arrow-batched UDF.

Model boundary: the ONNX DB/SVTR sessions are stubbed (image libs absent)
with deterministic emitters — the DETECTION stub renders each text block as
a probability map (rectangle of 0.9) and the RECOGNITION stub emits one-hot
logits whose argmax encodes the block text — so the full reference
postprocess path (binarize -> contour -> unclip -> resample -> hull ->
verify -> min-size/conf filter -> CTC decode, SURVEY.md §2.5-2.6) runs for
real on every span and the decoded text is independently checkable against
the source documents (the DuckDB oracle states span == 8-word chunk).

Width bucketing (R2, svtr/config.rs:14-17): recognition is batched ACROSS
the whole Arrow batch, grouped by crop-width bucket (``width // 320``) —
detection runs per page, recognition defers each region crop into its
bucket, and one recognizer call serves each bucket (`recognize_bucket`,
where a production ONNX SVTR would pad the bucket to a common width and
issue a single session.run). Output rows re-assemble in (page, region)
order, so the bucketing is invisible to results — the ocr_spans /
ocr_regions_detail oracles pin that.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from ..kernels.boilerplate import classify_block, parse_blocks
from ..kernels.ocr import ctc_greedy_decode, db_postprocess
from ..kernels.yolo_decode import round_half_away

OCR_SCHEMA = (
    "url string, region_id int, span_text string, "
    "x int, y int, width int, height int, conf float"
)

# id 0 = CTC blank (svtr vocab convention, options.rs:231-244). Alphabet
# covers ALL printable ASCII (0x20-0x7e) so uppercase/punctuation chunks
# round-trip; chars outside it map to blank (documented model boundary,
# round-1 ADVICE). MAX_DECODE_LEN must exceed the longest possible chunk
# (8 words; observed max 59 chars) — a truncating decode silently breaks
# the span == chunk invariant.
VOCAB = ["<blank>"] + [chr(c) for c in range(0x20, 0x7F)]
_CHAR_TO_ID = {c: i for i, c in enumerate(VOCAB)}
MAX_DECODE_LEN = 4096

CELL = 4  # px per char in the stub prob map
# margin EXCEEDS the maximum unclip delta (0.75 * RECT_H-1 = 8.25), so no
# offset vertex ever clamps at the map border and the detect geometry has
# the clamp-free closed form the symbolic oracle states
# (pipeline/raster_ocr.rect_detect_geometry_sql — this replaced the pinned
# operators/ocr_geom.py lookup in round 3)
PAD = 16
MAP_H = 44  # PAD + RECT_H + PAD
RECT_H = 12


def render_region_prob_map(n_chars: int) -> np.ndarray:
    """Stub DB 'model': a text region renders as a filled rectangle."""
    w = CELL * max(n_chars, 1) + 2 * PAD
    pm = np.zeros((MAP_H, w), dtype=np.float32)
    pm[PAD : PAD + RECT_H, PAD : w - PAD] = np.float32(0.9)
    return pm


def stub_recognizer_logits(text: str) -> np.ndarray:
    """Stub SVTR 'model': one-hot 0.95 logits per character timestep."""
    lg = np.zeros((len(text), len(VOCAB)), dtype=np.float32)
    for t, ch in enumerate(text):
        lg[t, _CHAR_TO_ID.get(ch, 0)] = np.float32(0.95)
    return lg


WIDTH_BUCKET = 320  # svtr/config.rs:14-17 bucket granularity


def detect_page_regions(html_bytes: bytes | None, url: str) -> list[dict]:
    """DB-detect stage only: one pending record per text region, carrying
    the crop geometry + source text for the deferred recognition stage."""
    if html_bytes is None:
        return []
    html = bytes(html_bytes).decode("utf-8", errors="replace")
    blocks = parse_blocks(html)
    out = []
    region_id = 0
    for blk in blocks:
        cls, _conf = classify_block(blk)
        if cls != "plain text":
            continue
        pm = render_region_prob_map(blk.n_chars)
        regions = db_postprocess(pm, ratio=1.0)
        if not regions:
            region_id += 1
            continue
        r = regions[0]
        x1, y1, x2, y2 = r["bbox"]
        width = int(round_half_away(np.float32(x2 - x1)))
        out.append(
            {
                "url": url,
                "region_id": region_id,
                "crop_text": blk.text,
                "x": int(round_half_away(np.float32(x1))),
                "y": int(round_half_away(np.float32(y1))),
                "width": width,
                "height": int(round_half_away(np.float32(y2 - y1))),
                "conf": float(np.float32(r["conf"])),
                "bucket": width // WIDTH_BUCKET,
            }
        )
        region_id += 1
    return out


def recognize_bucket(crops: list[str]) -> list[str]:
    """One recognizer invocation per width bucket (R2): a production SVTR
    would pad these same-bucket crops to a common width and run ONE
    session.run over the stacked tensor; the stub decodes each one-hot
    logits block through the real CTC path."""
    return [
        ctc_greedy_decode(stub_recognizer_logits(t), VOCAB, max_length=MAX_DECODE_LEN)
        for t in crops
    ]


def ocr_page(html_bytes: bytes | None, url: str) -> list[dict]:
    """Single-page convenience path (tests): detect + recognize inline."""
    pending = detect_page_regions(html_bytes, url)
    texts = recognize_bucket([r["crop_text"] for r in pending])
    out = []
    for r, t in zip(pending, texts):
        r = dict(r)
        r.pop("crop_text")
        r.pop("bucket")
        r["span_text"] = t
        out.append(r)
    return out


def ocr_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ["url", "region_id", "span_text", "x", "y", "width", "height", "conf"]
    for pdf in batches:
        # stage 1: detection per page, recognition deferred
        pending: list[dict] = []
        for h, u in zip(pdf["html"].to_numpy(), pdf["url"].to_numpy()):
            pending.extend(detect_page_regions(h, u))
        # stage 2: recognition batched per width bucket across the WHOLE
        # Arrow batch (R2); results written back by index, so output order
        # stays (page, region)
        by_bucket: dict[int, list[int]] = {}
        for idx, r in enumerate(pending):
            by_bucket.setdefault(r["bucket"], []).append(idx)
        texts: list[str | None] = [None] * len(pending)
        for bucket in sorted(by_bucket):
            idxs = by_bucket[bucket]
            decoded = recognize_bucket([pending[i]["crop_text"] for i in idxs])
            for i, t in zip(idxs, decoded):
                texts[i] = t
        rows = []
        for r, t in zip(pending, texts):
            rows.append(
                {
                    "url": r["url"],
                    "region_id": r["region_id"],
                    "span_text": t,
                    "x": r["x"],
                    "y": r["y"],
                    "width": r["width"],
                    "height": r["height"],
                    "conf": r["conf"],
                }
            )
        yield pd.DataFrame(rows, columns=cols)


def ocr_spans(pages_df):
    """pages -> one row per recognized text span (lazy)."""
    return pages_df.select("url", "html").mapInPandas(ocr_batch, schema=OCR_SCHEMA)
