"""Independent oracle for dedup_simhash: the full construction rebuilt
with hashlib + plain ints (no code shared with the two-dialect template),
plus the banding-completeness property — when no band bucket exceeds the
cap, the pigeonhole guarantee makes the candidate stage LOSSLESS, so the
query's output must equal the brute-force set of ALL pairs within hamming
distance SIMHASH_HAM_MAX."""

from collections import defaultdict
from hashlib import md5

import duckdb
import pytest

from tests.conftest import SF_DIR
from usls_doc_spark.operators.text_queries import (
    SIMHASH_BAND_BITS,
    SIMHASH_BAND_CAP,
    SIMHASH_BANDS,
    SIMHASH_HAM_MAX,
)


@pytest.fixture(scope="module")
def sigs():
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    out = {}
    for doc_id, text in rows:
        hexes = [md5(w.encode()).hexdigest() for w in text.split(" ")]
        bands = []
        for k in range(SIMHASH_BANDS):
            votes = [0] * SIMHASH_BAND_BITS
            for h in hexes:
                v = int(h[4 * k : 4 * k + 4], 16)
                for b in range(SIMHASH_BAND_BITS):
                    votes[b] += 1 if (v >> b) & 1 else -1
            bands.append(
                sum(1 << b for b in range(SIMHASH_BAND_BITS) if votes[b] > 0)
            )
        out[doc_id] = tuple(bands)
    return out


def _hamming(a, b):
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


def test_dedup_simhash_vs_hashlib_bruteforce(spark, sigs):
    from usls_doc_spark.queries import build_registry

    # band buckets small enough that the candidate stage is lossless here
    buckets = defaultdict(list)
    for doc_id, bands in sigs.items():
        for k, v in enumerate(bands):
            buckets[(k, v)].append(doc_id)
    assert max(len(v) for v in buckets.values()) <= SIMHASH_BAND_CAP

    ids = sorted(sigs)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = _hamming(sigs[a], sigs[b])
            if h <= SIMHASH_HAM_MAX:
                shared = sum(x == y for x, y in zip(sigs[a], sigs[b]))
                expected[(a, b)] = (shared, h)
    assert expected, "corpus has no near-dup pairs — test proves nothing"
    assert any(h == 0 for _, h in expected.values())  # exact dups present
    assert any(h > 0 for _, h in expected.values())  # true NEAR dups too

    qs, _ = build_registry()
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_shared_bands"], r["hamming"])
        for r in qs["dedup_simhash"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_dedup_simhash_plan_is_capped_agg_not_window(spark):
    """The candidate buckets must be a bounded hash aggregate (map-side
    partial collect + sorted slice), never a row_number window on the
    band key — the round-4 VERDICT hot-key-window discipline."""
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    df = qs["dedup_simhash"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition" not in plan and "row_number" not in plan
    assert "partial_collect_list" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # round 8: the final plan reads ONLY the materialized signature
    # table (the r7 template re-ran the md5+bit-vote projection for each
    # of its three sigs references — 6 parquet scans); the signature
    # materialization itself projects doc_id+text only
    assert "Scan parquet" not in plan
    from usls_doc_spark.operators.text_queries import _words
    from usls_doc_spark.operators.dialect import SPARK as _S

    sig_plan = (
        spark.sql(f"SELECT doc_id, {_words(_S)} AS ws FROM documents")
        ._jdf.queryExecution().executedPlan().toString()
    )
    read = [l for l in sig_plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read and "text" in read and "lang" not in read
