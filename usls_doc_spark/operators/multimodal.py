"""Multimodal binary-column plumbing: opaque media bytes + typed metadata,
decode/feature-extract as Arrow-batched pandas UDFs.

The reference decodes images via the `image` crate inside DataLoader
(/root/reference/src/misc/dataloader.rs:388-416, RGB8 forced) and resizes
via fast_image_resize (ops.rs:366-450). The image/audio libraries are not
in this container, so the DECODE step is a clearly-marked stub
(`decode_image`) with a deterministic fake feature extractor standing in —
the Spark-side plumbing (binary column, schema, batch shape, partitioning)
is real and tested. Swap `_fake_features` for a PIL/cv2 call in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

MULTIMODAL_SCHEMA = (
    "url string, n_bytes bigint, magic string, mean_byte double, "
    "n_frames int, features array<float>"
)

N_FEATURES = 8


def decode_image(data: bytes):  # pragma: no cover - documented stub
    """Real image decode (PIL/cv2) — unavailable in this environment."""
    raise NotImplementedError(
        "image decode requires PIL/cv2; use _fake_features for the "
        "deterministic test path"
    )


def _fake_features(arr: np.ndarray) -> np.ndarray:
    """Deterministic 8-dim 'embedding' from raw bytes: mean of each of 8
    byte-position strata. Stands in for a real conv feature extractor."""
    n = len(arr)
    if n == 0:
        return np.zeros(N_FEATURES, dtype=np.float32)
    pad = (-n) % N_FEATURES
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=arr.dtype)])
    return arr.reshape(-1, N_FEATURES).mean(axis=0).astype(np.float32)


def media_features_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for url, data in zip(pdf["url"], pdf["html"]):
            if data is None:
                rows.append((url, 0, "", 0.0, 0, [0.0] * N_FEATURES))
                continue
            arr = np.frombuffer(bytes(data), dtype=np.uint8)
            rows.append(
                (
                    url,
                    len(arr),
                    bytes(data[:4]).hex(),
                    float(arr.mean()) if len(arr) else 0.0,
                    int(len(arr) // 4096) + 1,  # fake frame-sample count
                    _fake_features(arr).tolist(),
                )
            )
        yield pd.DataFrame(
            rows, columns=["url", "n_bytes", "magic", "mean_byte", "n_frames", "features"]
        )


def multimodal_features(spark, sf_dir: str):
    """pages(html binary) -> per-doc media metadata + stub features.

    Rows-only correctness check (no SQL analogue for the UDF path); the
    deterministic fake keeps outputs stable across runs/partitionings.
    """
    from ..io.synth import pages_from_documents

    pages = pages_from_documents(spark, sf_dir)
    return pages.select("url", "html").mapInPandas(
        media_features_batch, schema=MULTIMODAL_SCHEMA
    )
