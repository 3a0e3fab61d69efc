"""Independent oracle for bloom_dedup_probe: the full construction rebuilt
with hashlib + plain ints (no code shared with the two-dialect template),
plus the two structural Bloom properties — NO false negatives ever, and a
filter whose row count is bounded by m/32 regardless of corpus size."""

from hashlib import md5

import duckdb
import pytest

from tests.conftest import SF_DIR
from usls_doc_spark.operators.web_curation import (
    BLOOM_BITS,
    BLOOM_K,
    BLOOM_WORD_BITS,
    PARA_WORDS,
)


@pytest.fixture(scope="module")
def chunks():
    """(doc_id, chunk_hash_hex) per non-overlapping PARA_WORDS chunk."""
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    out = []
    for doc_id, text in rows:
        ws = text.split(" ")
        n = max(-(-len(ws) // PARA_WORDS), 1)
        for i in range(n):
            chunk = " ".join(ws[i * PARA_WORDS : (i + 1) * PARA_WORDS])
            out.append((doc_id, md5(chunk.encode()).hexdigest()))
    return out


def _positions(h):
    return [int(h[8 * k : 8 * k + 8], 16) % BLOOM_BITS for k in range(BLOOM_K)]


def test_bloom_probe_vs_hashlib_reference(spark, chunks):
    from usls_doc_spark.queries import build_registry

    seen = {h for d, h in chunks if d % 2 == 0}
    bits = set()
    for h in seen:
        bits.update(_positions(h))
    # the filter the query builds is at most m/word_bits rows
    assert len({p // BLOOM_WORD_BITS for p in bits}) <= BLOOM_BITS // BLOOM_WORD_BITS

    expected = {}
    tp = fp = 0
    for d, h in chunks:
        if d % 2 != 1:
            continue
        maybe = int(all(p in bits for p in _positions(h)))
        actual = int(h in seen)
        assert maybe >= actual, "Bloom false negative — impossible by construction"
        n_ch, n_maybe, n_act, n_fp = expected.get(d, (0, 0, 0, 0))
        expected[d] = (
            n_ch + 1,
            n_maybe + maybe,
            n_act + actual,
            n_fp + (maybe and not actual),
        )
        tp += actual
        fp += maybe and not actual
    assert tp > 0, "no true positives — the seen-overlap branch is untested"
    assert fp > 0, "no false positives — m is oversized for the test corpus"

    qs, _ = build_registry()
    got = {
        r["doc_id"]: (
            r["n_chunks"],
            r["n_maybe_seen"],
            r["n_actually_seen"],
            r["n_false_pos"],
        )
        for r in qs["bloom_dedup_probe"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_bloom_probe_plan_broadcasts_filter(spark):
    """The membership test must reach the probe side as a broadcast of the
    <= m/32-row filter (never a shuffle of the big side), the filter build
    must combine map-side (partial_bit_or), and there is no window."""
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    df = qs["bloom_dedup_probe"](spark, SF_DIR)
    df.collect()  # AQE finalizes join strategies
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition" not in plan and "row_number" not in plan
    assert "partial_bit_or" in plan
    assert "BroadcastHashJoin [word" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read and "text" in read and "lang" not in read
