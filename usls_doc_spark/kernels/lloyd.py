"""Pure-numpy Lloyd-assignment kernels over 1e6-quantized int64 vectors
(round 8). No Spark imports.

The SQL templates in operators/training_mix.py state the algorithm in
exact integer arithmetic: every coordinate is a BIGINT on the 1e6
fixed-point grid, squared-L2 distances are exact int64, and the argmin
tie-break is the dist*K + cid encoding. These kernels compute the SAME
integers with vectorized int64 numpy (associativity-free: integer
addition is exact, so any summation order gives the bit-identical
result) — replacing an 8-centroid x 64-dim literal SQL expression that
Catalyst analyzed in ~1 s per use and janino could not compile (64 KB
method limit -> interpreted fallback).

Memory discipline (CLAUDE.md env gotcha): no [N, K, 64] broadcast
temporaries — the K=8 centroid loop keeps peak extra memory at one
[N, 64] diff buffer.
"""

from __future__ import annotations

import numpy as np


def assign_cells(
    Q: np.ndarray, C: np.ndarray, cids: np.ndarray, K: int
) -> np.ndarray:
    """Nearest-centroid assignment with the dist*K + cid tie-break.

    Q: int64 [N, D] quantized vectors; C: int64 [M, D] centroids with ids
    ``cids`` (int64 [M], each < K); K is the FIXED encoding modulus (the
    template's KMEANS_K — not len(cids), which can be smaller when the
    seed table has fewer than K rows). Returns int64 [N] cluster ids:
    min_j(dist_j * K + cid_j) % K, exactly the SQL MIN/LEAST encoding.
    """
    enc = None
    for j in range(C.shape[0]):
        diff = Q - C[j]
        np.multiply(diff, diff, out=diff)
        e = diff.sum(axis=1) * K + int(cids[j])
        enc = e if enc is None else np.minimum(enc, e)
    return enc % K


def partial_cluster_sums(
    Q: np.ndarray, cells: np.ndarray, K: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-cluster member counts and per-dim int64 sums for ONE batch:
    (n[K], S[K, D]). Batch-local sums stay far below int64 range
    (|q| <= ~2^21 per coordinate, batches are ~10^4 rows); the global
    accumulation runs in Spark as SUM(DECIMAL(38,0)) so corpus-scale
    totals cannot overflow (the template's d.wide discipline)."""
    n = np.zeros(K, dtype=np.int64)
    S = np.zeros((K, Q.shape[1]), dtype=np.int64)
    for c in range(K):
        m = cells == c
        cnt = int(m.sum())
        if cnt:
            n[c] = cnt
            S[c] = Q[m].sum(axis=0)
    return n, S
