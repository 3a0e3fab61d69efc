"""Top-p sampler kernel (R5, logits_sampler.rs:34-93 semantics with an
injected-uniform determinism contract)."""

import numpy as np

from usls_doc_spark.kernels.sampler import sample_topp, softmax_t, xorshift64s


def test_p_zero_is_argmax_first_max_wins():
    assert sample_topp([1.0, 5.0, 5.0, 2.0], p=0.0) == 1  # '>' keeps the first


def test_nucleus_membership():
    # probs ~ [0.84, 0.11, 0.04, ...]: p=0.5 -> only the top token qualifies
    logits = np.array([6.0, 4.0, 3.0, 1.0, 0.0], dtype=np.float32)
    for u in (0.0, 0.3, 0.7, 0.999):
        assert sample_topp(logits, p=0.5, uniform=lambda: u) == 0


def test_boundary_element_joins_only_when_empty():
    # uniform probs over 4 tokens (0.25 each); p=0.2 < first acc ->
    # candidates would be empty -> the boundary element alone is kept
    logits = np.zeros(4, dtype=np.float32)
    got = {sample_topp(logits, p=0.2, uniform=lambda: u) for u in (0.0, 0.5, 0.99)}
    assert got == {0}


def test_cumulative_weight_quirk():
    # probs (0.5, 0.3, 0.2) with p=0.85: the nucleus is tokens {0, 1}
    # (the boundary token 2 does NOT join a non-empty nucleus) and the
    # weights are CUMULATIVE (0.5, 0.8) -> P(token1) = 0.8/1.3 ~ 0.615,
    # not the renormalized 0.3/0.8 = 0.375 — the reference's quirk
    logits = np.log(np.array([0.5, 0.3, 0.2], dtype=np.float32))
    picks = [sample_topp(logits, p=0.85, uniform=lambda u=u: u)
             for u in np.linspace(0.001, 0.999, 400)]
    assert 2 not in picks
    frac1 = sum(1 for t in picks if t == 1) / len(picks)
    assert abs(frac1 - 0.8 / 1.3) < 0.02


def test_temperature_flattens():
    logits = np.array([3.0, 0.0], dtype=np.float32)
    sharp = softmax_t(logits, 0.5)
    flat = softmax_t(logits, 5.0)
    assert sharp[0] > flat[0] > 0.5
    assert abs(float(sharp.sum()) - 1.0) < 1e-6


def test_deterministic_default_stream():
    # ONE stream shared across draws (the contract sampled_generate relies
    # on): successive calls must consume successive uniforms, and two
    # same-seed streams must replay the identical sequence
    logits = np.array([1.0, 1.0, 1.0, 0.5], dtype=np.float32)
    ua, ub = xorshift64s(7), xorshift64s(7)
    a = [sample_topp(logits, p=0.9, uniform=ua) for _ in range(10)]
    b = [sample_topp(logits, p=0.9, uniform=ub) for _ in range(10)]
    assert a == b
    assert len(set(a)) > 1  # the stream advances (ties would hide a stuck rng)
    u = xorshift64s(42)
    vals = [u() for _ in range(1000)]
    assert all(0.0 <= v < 1.0 for v in vals)
    assert len(set(vals)) == 1000


def test_default_uniform_is_one_shared_stream():
    """Round-3 ADVICE: default-argument calls must consume SUCCESSIVE
    uniforms from one module-level stream, not re-create a fixed-seed
    stream per call (which made every default call return the same token
    for a given distribution)."""
    logits = np.array([1.0, 1.0, 1.0, 0.5], dtype=np.float32)
    draws = [sample_topp(logits, p=0.9) for _ in range(20)]
    assert len(set(draws)) > 1  # the shared stream advances between calls
