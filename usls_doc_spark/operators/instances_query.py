"""Distributed instance-decode query: oriented boxes (L8), keypoints (L9),
instance masks (L10) run per document, SURVEY.md §2.4.

Reference semantics: yolo/impl.rs:422-443 (OBB w/h swap + angle fold),
:481-513 (keypoint ratio/clamp/threshold), :516-601 (mask coefs x protos ->
sigmoid -> resize -> bbox clip -> largest contour).

Data shape: the detector-head outputs (box params, raw keypoints, mask
coefficients, prototypes) are synthesized as pure functions of
k = doc_id % 64 — the same invariant trick as io/synth.py — so the decoded
geometry is a 64-row lookup. The DuckDB oracle joins documents to the
PINNED table (operators/instances_geom.py, generated once by
scripts/gen_instances_geom.py) on doc_id % 64: a kernel regression fails
the hash instead of being silently followed. The decode is MEMOIZED per
class k per task (_instances_batch's cache) — the kernels execute
distributed inside the Arrow batches, but at most 64 times per task, and
the query is effectively a computed-lookup join; a real per-image decode
would drop the memo because its inputs vary per row.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from ..kernels.instances import decode_instance_mask, decode_keypoints, decode_obb
from ..kernels.letterbox import letterbox_image, letterbox_spec

N_CLASSES = 64
KP_CONF_THRESH = 0.5
IMAGE_H, IMAGE_W = 480.0, 640.0
MASK_HW = 32

INSTANCES_SCHEMA = (
    "doc_id bigint, k int, "
    "x1 float, y1 float, x2 float, y2 float, "
    "x3 float, y3 float, x4 float, y4 float, "
    "n_valid_kpts int, kp0_x float, kp0_y float, "
    "mask_area bigint, poly_len int, lb_checksum bigint"
)

# synthetic page-raster dims fed through the P1-P3 raster letterbox
RASTER_H, RASTER_W = 36, 52
CANVAS = 64


def synth_head_outputs(k: int) -> dict:
    """Deterministic detector-head outputs for class k (stands in for the
    ONNX head tensors; every value an exact small rational)."""
    obb = (
        100.0 + 3.0 * k,  # cx
        80.0 + 2.0 * k,  # cy
        20.0 + float(k),  # w
        10.0 + float(k % 7),  # h
        k * math.pi / 32.0,  # radians
    )
    kpts = np.array(
        [
            [40.0 + 8.0 * k + 5.0 * j, 30.0 + 4.0 * k + 3.0 * j, 0.3 + 0.05 * ((k + j) % 10)]
            for j in range(4)
        ],
        dtype=np.float32,
    )
    ratio = 0.5 if k % 2 else 2.0
    coefs = np.array([((k * 7 + j * 3) % 11 - 5) / 2.0 for j in range(4)], dtype=np.float32)
    protos = np.array(
        [
            [[((m + r * 3 + c * 5 + k) % 13 - 6) / 3.0 for c in range(8)] for r in range(8)]
            for m in range(4)
        ],
        dtype=np.float32,
    )
    bbox = (2.0 + k % 10, 1.0 + k % 5, 20.0 + k % 12, 24.0 + k % 8)
    raster = np.fromfunction(
        lambda r, c: (r * 7 + c * 13 + k * 31) % 256, (RASTER_H, RASTER_W)
    ).astype(np.uint8)
    return {
        "obb": obb, "kpts": kpts, "ratio": ratio, "coefs": coefs,
        "protos": protos, "bbox": bbox, "raster": raster,
    }


def decode_instance_row(k: int) -> tuple:
    """Run all three decode kernels for class k -> flat output tuple."""
    h = synth_head_outputs(k)
    verts = decode_obb(*h["obb"])  # [4, 2] float32
    kp = decode_keypoints(h["kpts"], h["ratio"], IMAGE_H, IMAGE_W, KP_CONF_THRESH)
    n_valid = int((kp[:, 2] >= np.float32(KP_CONF_THRESH)).sum())
    mask, poly = decode_instance_mask(
        h["coefs"], h["protos"], h["bbox"], MASK_HW, MASK_HW, threshold=0.5
    )
    # P1-P3 raster letterbox over the synthetic page raster: u8-exact
    # bilinear resize + 114-pad, summarized as an integer pixel checksum
    spec = letterbox_spec(RASTER_H, RASTER_W, CANVAS, CANVAS, center=bool(k % 2))
    canvas = letterbox_image(h["raster"], spec)
    return (
        k,
        *[float(v) for v in verts.reshape(-1)],
        n_valid,
        float(kp[0, 0]),
        float(kp[0, 1]),
        int((mask > 0).sum()),
        0 if poly is None else int(len(poly)),
        int(canvas.sum()),
    )


def _instances_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.split(" ")[0] for f in INSTANCES_SCHEMA.split(", ")]
    cache: dict[int, tuple] = {}
    for pdf in batches:
        rows = []
        for d in pdf["doc_id"]:
            k = int(d) % N_CLASSES
            if k not in cache:
                cache[k] = decode_instance_row(k)
            rows.append((int(d), *cache[k]))
        yield pd.DataFrame(rows, columns=cols)


def layout_instances(spark, sf_dir: str):
    """documents -> per-doc decoded OBB vertices, keypoints, mask stats."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return docs.mapInPandas(_instances_batch, schema=INSTANCES_SCHEMA)


def instances_oracle() -> str:
    from .instances_geom import INSTANCE_ROWS

    float_cols = ("x1", "y1", "x2", "y2", "x3", "y3", "x4", "y4", "kp0_x", "kp0_y")
    names = (
        "k x1 y1 x2 y2 x3 y3 x4 y4 n_valid_kpts kp0_x kp0_y mask_area poly_len "
        "lb_checksum"
    ).split()
    values = ",\n    ".join(
        "(" + ", ".join(
            f"CAST({v!r} AS DOUBLE)" if isinstance(v, float) else str(v) for v in row
        ) + ")"
        for row in INSTANCE_ROWS
    )
    sel = ", ".join(
        f"CAST(g.{c} AS FLOAT) AS {c}" if c in float_cols
        else (
            f"CAST(g.{c} AS INT) AS {c}" if c in ("k", "n_valid_kpts", "poly_len")
            else f"CAST(g.{c} AS BIGINT) AS {c}"
        )
        for c in names
    )
    return f"""
WITH geom({", ".join(names)}) AS (
  VALUES
    {values}
)
SELECT d.doc_id, {sel}
FROM documents d JOIN geom g ON d.doc_id % {N_CLASSES} = g.k
"""
