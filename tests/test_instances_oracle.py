"""layout_instances closed-form oracle (round-3 VERDICT item 4): the
pinned surface is ONLY the 64 (cos, sin) doubles; every output column is
derived in SQL. These tests prove each derivation against the real decode
kernels — exhaustively over the 64 classes and by fuzz beyond them."""

import math
import random

import duckdb
import numpy as np
import pandas as pd
import pytest

from usls_doc_spark.operators.instances_query import (
    LB_H,
    LB_W,
    N_CLASSES,
    RASTER_H,
    RASTER_W,
    decode_instance_row,
    instances_oracle,
    mask_rect,
    synth_head_outputs,
)


def test_oracle_matches_kernel_for_every_class():
    """The whole-row check: DuckDB closed-form SQL == decode kernels,
    bit-for-bit after the FLOAT schema casts, for all 64 classes."""
    con = duckdb.connect()
    con.register("docs_src", pd.DataFrame({"doc_id": list(range(N_CLASSES))}))
    con.sql("CREATE VIEW documents AS SELECT doc_id FROM docs_src")
    got = {r[0]: r[1:] for r in con.sql(instances_oracle()).fetchall()}
    for k in range(N_CLASSES):
        want = decode_instance_row(k)
        w = (
            [want[0]]
            + [float(np.float32(v)) for v in want[1:9]]
            + [want[9], float(np.float32(want[10])), float(np.float32(want[11]))]
            + list(want[12:])
        )
        assert [got[k][0]] + [float(v) for v in got[k][1:]] == w, f"k={k}"


def test_spec_preconditions():
    """The properties the closed forms rely on, asserted at the source:
    no OBB swap (w > h), mask dominance (64 > 32+16+8 with |logit| >= 8),
    single mask component, and the letterbox resize target (44, 64)."""
    from usls_doc_spark.kernels.letterbox import letterbox_spec
    from usls_doc_spark.kernels.ocr import find_outer_contours
    from usls_doc_spark.kernels.instances import decode_instance_mask

    spec = letterbox_spec(RASTER_H, RASTER_W, 64, 64)
    r = np.float32(spec.ratio)
    assert (int(np.rint(np.float32(RASTER_H) * r)),
            int(np.rint(np.float32(RASTER_W) * r))) == (LB_H, LB_W)
    for k in range(N_CLASSES):
        h = synth_head_outputs(k)
        assert h["obb"][2] > h["obb"][3]  # w > h: swap branch never fires
        coefs, protos = h["coefs"], h["protos"]
        assert abs(coefs[0]) > sum(abs(c) for c in coefs[1:])  # dominance
        logits = coefs @ protos.reshape(4, -1)
        assert np.abs(logits).min() >= 8  # sigmoid within 3.4e-4 of {0,1}
        mask, poly = decode_instance_mask(coefs, protos, h["bbox"], 32, 32)
        assert len(find_outer_contours(mask)) == 1  # single component
        assert poly is not None


def test_trig_table_is_pure_math():
    """The pinned constants are exactly cos/sin(fmod(k*pi/32, pi)) — the
    generator's 3-line formula, never kernel output."""
    from usls_doc_spark.operators.instances_trig import TRIG

    assert len(TRIG) == N_CLASSES
    for k, c, s in TRIG:
        r = math.fmod(k * math.pi / 32.0, math.pi)
        assert c == math.cos(r) and s == math.sin(r)


def _profile8(a: int, b: int) -> list[int]:
    """The oracle's 1-D dyadic interpolation profile (in eighths)."""
    out = []
    for i in range(32):
        y0, w8 = (0, 0) if i < 2 else ((2 * i - 3) // 8, (2 * i - 3) % 8)
        y1 = min(y0 + 1, 7)
        out.append((8 - w8) * (a <= y0 <= b) + w8 * (a <= y1 <= b))
    return out


def _closed_form(a, b, c, d, bbox):
    R, C = _profile8(a, b), _profile8(c, d)
    x1, y1, x2, y2 = (int(v) for v in bbox)
    widths = [
        w
        for w in (
            sum(1 for j in range(max(x1, 0), min(x2, 32)) if R[i] * C[j] > 32)
            for i in range(max(y1, 0), min(y2, 32))
        )
        if w
    ]
    area = sum(widths)
    if not widths:
        return area, 0
    H, Wf, Wl = len(widths), widths[0], widths[-1]
    poly = (2 * Wf - 2 if Wf >= 2 else 1) if H == 1 else 2 * H + Wf + Wl - 4
    return area, poly


def test_mask_closed_form_fuzz():
    """The mask area + Moore-trace-length closed forms hold for ARBITRARY
    dominant rectangles, secondary prototype noise, coefficient signs and
    bbox clips — not just the 64 shipped classes."""
    from usls_doc_spark.kernels.instances import decode_instance_mask

    rng = random.Random(20260817)
    np_rng = np.random.default_rng(4)
    for _ in range(400):
        a = rng.randint(0, 7); b = rng.randint(a, 7)
        c = rng.randint(0, 7); d = rng.randint(c, 7)
        rect1 = np.full((8, 8), -1.0)
        rect1[a : b + 1, c : d + 1] = 1.0
        others = np.where(np_rng.random((3, 8, 8)) > 0.5, 1.0, -1.0)
        protos = np.concatenate([rect1[None], others]).astype(np.float32)
        coefs = np.array(
            [64.0] + [m * rng.choice([-1, 1]) for m in (32.0, 16.0, 8.0)],
            dtype=np.float32,
        )
        bbox = (rng.randint(0, 20), rng.randint(0, 20),
                rng.randint(4, 32), rng.randint(4, 32))
        if bbox[2] <= bbox[0] or bbox[3] <= bbox[1]:
            continue
        mask, poly = decode_instance_mask(
            coefs, protos, tuple(float(v) for v in bbox), 32, 32
        )
        area, plen = _closed_form(a, b, c, d, bbox)
        assert int((mask > 0).sum()) == area, (a, b, c, d, bbox)
        assert (0 if poly is None else len(poly)) == plen, (a, b, c, d, bbox)


def test_mask_rect_formula_matches_synth():
    for k in range(N_CLASSES):
        a, b, c, d = mask_rect(k)
        p0 = synth_head_outputs(k)["protos"][0]
        want = np.full((8, 8), -1.0, dtype=np.float32)
        want[a : b + 1, c : d + 1] = 1.0
        assert np.array_equal(p0, want)
