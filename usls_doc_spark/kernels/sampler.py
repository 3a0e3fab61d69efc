"""Logits sampler (R5): argmax + top-p nucleus sampling, mirroring
/root/reference/src/misc/logits_sampler.rs:34-93 — including its quirks:

  * temperature clamps to >= 1e-7; p clamps to [0, 1]; p == 0 -> argmax
    (first max wins on ties: `>` comparison in the reduce);
  * softmax in float32 over logits / temperature, max-subtracted;
  * candidates accumulate sorted-desc probs until acc >= p; the boundary
    element joins ONLY if the set would otherwise be empty;
  * the weighted draw uses the CUMULATIVE probability as each candidate's
    weight (logits_sampler.rs:75-79 passes acc_prob to WeightedIndex) —
    faithfully reproduced, not "fixed".

The ONE deliberate deviation (documented determinism contract,
SURVEY.md §7): the reference draws from thread_rng; here the uniform is
INJECTED (default: a fixed-seed xorshift64* stream), so a given
(logits, p, temperature, seed) always yields the same token at any
parallelism — the property every oracled query in this repo relies on.
"""

from __future__ import annotations

import numpy as np


def xorshift64s(seed: int = 0x9E3779B97F4A7C15):
    """Deterministic uniform stream in [0, 1): xorshift64* (public-domain
    PRNG family), 53-bit mantissa outputs."""
    state = seed & 0xFFFFFFFFFFFFFFFF or 1

    def nxt() -> float:
        nonlocal state
        state ^= state >> 12
        state = (state ^ (state << 25)) & 0xFFFFFFFFFFFFFFFF
        state ^= state >> 27
        mixed = (state * 0x2545F4914F6CDD1D) & 0xFFFFFFFFFFFFFFFF
        return (mixed >> 11) / float(1 << 53)

    return nxt


# module-level shared default stream (round-3 ADVICE): a fresh fixed-seed
# stream per call would make every default-argument call consume the SAME
# first uniform — repeated calls must advance one shared stream instead.
# Callers that need task-level determinism (sampled_generate) still inject
# their own per-row-seeded stream.
_DEFAULT_UNIFORM = None


def _default_uniform() -> float:
    global _DEFAULT_UNIFORM
    if _DEFAULT_UNIFORM is None:
        _DEFAULT_UNIFORM = xorshift64s()
    return _DEFAULT_UNIFORM()


def softmax_t(logits: np.ndarray, temperature: float) -> np.ndarray:
    """float32 temperature softmax, max-subtracted (logits_sampler.rs:85-93)."""
    t = np.float32(max(temperature, 1e-7))
    x = np.asarray(logits, dtype=np.float32) / t
    e = np.exp(x - x.max(), dtype=np.float32)
    return (e / e.sum(dtype=np.float32)).astype(np.float32)


def sample_topp(
    logits: np.ndarray,
    p: float,
    temperature: float = 1.0,
    uniform=None,
) -> int:
    """Top-p decode. p == 0 -> argmax (first max wins). Otherwise nucleus
    candidates with CUMULATIVE-prob weights (the reference's quirk) and a
    weighted draw from `uniform()` (defaults to a fixed-seed stream)."""
    lg = np.asarray(logits, dtype=np.float32)
    p = min(max(float(p), 0.0), 1.0)
    if p == 0.0:
        return int(np.argmax(lg))
    probs = softmax_t(lg, temperature)
    order = np.argsort(-probs, kind="stable")  # desc, stable ties like sort_by
    cand_idx: list[int] = []
    cand_w: list[float] = []
    acc = np.float32(0.0)
    for i in order:
        acc = np.float32(acc + probs[i])
        if acc >= np.float32(p):
            if not cand_idx:
                cand_idx.append(int(i))
                cand_w.append(float(acc))
            break
        cand_idx.append(int(i))
        cand_w.append(float(acc))
    if uniform is None:
        uniform = _default_uniform
    total = float(sum(cand_w))
    u = uniform() * total
    run = 0.0
    for idx, w in zip(cand_idx, cand_w):
        run += w
        if u < run:
            return idx
    return cand_idx[-1]
