"""Character-k-gram polynomial window hashes, O(total_chars) via the
Rabin-Karp prefix trick — the numpy kernel behind dup_char_kgram_fraction's
Spark side (round 7).

The two-dialect SQL template computes each 50-char window's base-31 hash
mod 1e9+7 with an O(K) per-window fold; Spark evaluates higher-order
lambdas interpreted (outside whole-stage codegen), so the fold costs
~n_chars x K interpreted steps per document — measured minutes at sf0.1.
This kernel produces the IDENTICAL integers in one vectorized pass over
the whole Arrow batch:

    fold:  H_t = (H_{t-1} * 31 + c_t) mod M,  H_0 = 0
    so     H_t = sum_{j<=t} c_j * 31^(t-j) mod M
    let    T_t = sum_{j<=t} c_j * inv31^j  mod M   (prefix-summable!)
    then   W_i = hash of window [i, i+K-1]
               = 31^(i+K-1) * (T_{i+K-1} - T_{i-1}) mod M

Every product stays under 2**63 (codepoints <= 0x10FFFF, factors < M),
cumsums stay exact to ~9e9 characters per batch, and the per-document
prefix reset is the same segmented-offset arithmetic as
stub_layout.infer_pages_batched — no python loop over documents.
Equality with the fold is asserted element-by-element in
tests/test_dup_window.py over the corpus plus adversarial unicode.
"""

from __future__ import annotations

import numpy as np

MOD = 1_000_000_007
BASE = 31
_INV31 = pow(BASE, MOD - 2, MOD)  # modular inverse of the base

_pow_cache = np.array([1], dtype=np.int64)  # 31^j mod M, grows on demand
_inv_cache = np.array([1], dtype=np.int64)  # inv31^j mod M


def _powers(n: int) -> tuple[np.ndarray, np.ndarray]:
    """pow31[0..n] and inv31[0..n] mod M (cached, grown geometrically)."""
    global _pow_cache, _inv_cache
    if len(_pow_cache) <= n:
        grow = max(n + 1, 2 * len(_pow_cache))
        p = np.empty(grow, dtype=np.int64)
        v = np.empty(grow, dtype=np.int64)
        p[: len(_pow_cache)] = _pow_cache
        v[: len(_inv_cache)] = _inv_cache
        for j in range(len(_pow_cache), grow):
            p[j] = (p[j - 1] * BASE) % MOD
            v[j] = (v[j - 1] * _INV31) % MOD
        _pow_cache, _inv_cache = p, v
    return _pow_cache, _inv_cache


def window_hashes_batched(
    texts: list[str], k: int
) -> tuple[np.ndarray, np.ndarray]:
    """All k-char sliding-window hashes for every text in one numpy pass.

    Returns (doc_idx, hashes): parallel int64 arrays, one entry per
    window, doc_idx indexing into ``texts``. A text shorter than ``k``
    contributes exactly one window — the fold over its whole codepoint
    sequence — matching the SQL template's greatest(n - k + 1, 1) bound.
    Codepoints (not UTF-8 bytes) feed the hash, exactly like the SQL
    sides' split-char ascii()/ord semantics.
    """
    n_docs = len(texts)
    if n_docs == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    # exact unicode codepoints, vectorized (utf-32-le = one u32 per char)
    codes = [
        np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        for t in texts
    ]
    lens = np.fromiter((len(c) for c in codes), dtype=np.int64, count=n_docs)
    total = int(lens.sum())
    offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    c_all = (
        np.concatenate(codes) if total else np.empty(0, dtype=np.int64)
    )
    pow31, inv31 = _powers(max(int(lens.max(initial=0)) + 1, k + 1))

    # per-document local positions j = 1..L via the segmented arange trick
    j_local = np.arange(1, total + 1, dtype=np.int64) - np.repeat(offs[:-1], lens)
    # T prefix: cumsum of c_j * inv31^j mod M, reset per document
    terms = (c_all * inv31[j_local]) % MOD
    cum = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(terms, out=cum[1:])
    base = np.repeat(cum[offs[:-1]], lens)
    T = (cum[1:] - base) % MOD  # T[g] = T_{j_local(g)} for its document

    # one output window per position i = 1..max(L-k+1, 1)
    n_win = np.maximum(lens - (k - 1), 1)
    total_w = int(n_win.sum())
    woffs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_win, out=woffs[1:])
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n_win)
    if total == 0:
        # every document empty (r7 ADVICE): one hash-0 window per doc —
        # the SQL fold's semantics; the gather below would index into
        # the zero-length T array otherwise
        return doc_idx, np.zeros(total_w, dtype=np.int64)
    i_local = (
        np.arange(1, total_w + 1, dtype=np.int64)
        - np.repeat(woffs[:-1], n_win)
    )
    L_rep = lens[doc_idx]
    # window end position (capped at L for the short-document whole-text fold)
    end = np.minimum(i_local + (k - 1), L_rep)
    g_end = np.repeat(offs[:-1], n_win) + end - 1  # global index of T_{end}
    T_end = np.where(L_rep > 0, T[np.minimum(g_end, max(total - 1, 0))], 0)
    g_prev = np.repeat(offs[:-1], n_win) + i_local - 2  # T_{i-1}; i=1 -> T_0=0
    T_prev = np.where(i_local > 1, T[np.maximum(g_prev, 0)], 0)
    w = (pow31[end] * ((T_end - T_prev) % MOD)) % MOD
    w = np.where(L_rep > 0, w, 0)  # empty text: fold over zero chars = 0
    return doc_idx, w
