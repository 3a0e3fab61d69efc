"""Independent oracle for cms_heavy_hitters: the count-min sketch rebuilt
with hashlib + collections.Counter + plain ints (no code shared with the
two-dialect template), plus the two structural CMS properties — ONE-SIDED
error (estimate >= exact for EVERY key, not just the head) and a sketch
whose row count is bounded by DEPTH*WIDTH regardless of corpus size."""

from collections import Counter
from hashlib import md5

import duckdb
import pytest

from tests.conftest import SF_DIR
from usls_doc_spark.operators.web_curation import CMS_DEPTH, CMS_TOP_K, CMS_WIDTH


@pytest.fixture(scope="module")
def bigram_counts():
    rows = duckdb.sql(
        f"SELECT text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    c = Counter()
    for (text,) in rows:
        ws = text.split(" ")
        if len(ws) >= 2:
            c.update(" ".join(ws[i : i + 2]) for i in range(len(ws) - 1))
    return c


def _indices(gram):
    h = md5(gram.encode()).hexdigest()
    return [int(h[8 * k : 8 * k + 8], 16) % CMS_WIDTH for k in range(CMS_DEPTH)]


def test_cms_vs_counter_reference(spark, bigram_counts):
    from usls_doc_spark.queries import build_registry

    # build the sketch exactly as a streaming system would: one counter
    # increment per occurrence per row
    sketch = Counter()
    for gram, n in bigram_counts.items():
        for r, idx in enumerate(_indices(gram)):
            sketch[(r, idx)] += n
    assert len(sketch) <= CMS_DEPTH * CMS_WIDTH  # fixed memory, always

    def estimate(gram):
        return min(sketch[(r, idx)] for r, idx in enumerate(_indices(gram)))

    # one-sided error over the ENTIRE key space (the CMS guarantee)
    assert all(estimate(g) >= n for g, n in bigram_counts.items())
    # WIDTH is deliberately tight vs the key space: collisions must occur
    assert any(estimate(g) > n for g, n in bigram_counts.items()), (
        "no collisions anywhere — widen the key space or shrink CMS_WIDTH"
    )

    head = sorted(bigram_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:CMS_TOP_K]
    expected = [
        (gram, n, estimate(gram), estimate(gram) - n, rank)
        for rank, (gram, n) in enumerate(head, start=1)
    ]

    got = build_registry()[0]["cms_heavy_hitters"](spark, SF_DIR).orderBy("rnk")
    assert [
        (r["gram"], r["exact_cnt"], r["cms_est"], r["overestimate"], r["rnk"])
        for r in got.collect()
    ] == expected
    # the collision branch is exercised INSIDE the audited head too
    assert any(e[3] > 0 for e in expected), "head all exact — collision branch dead"


def test_cms_plan_bounded(spark):
    """Round-8 exec shape: the final plan reads ONLY the materialized
    per-gram exact table (no parquet scan — the r7 template recomputed
    the 2M-bigram md5 explode twice via CTE inlining); the sketch is one
    hash aggregate with map-side partial combine (partial_sum, output
    bounded at DEPTH*WIDTH rows); the exact audit head executes as
    TakeOrderedAndProject (bounded heap, never a vocab-wide sort); the
    only Window sits above the TakeOrdered LIMIT (20 rows); no cartesian
    anywhere."""
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    df = qs["cms_heavy_hitters"](spark, SF_DIR)
    df.collect()  # AQE finalizes join strategies
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan  # reads the materialized exact table
    assert "TakeOrderedAndProject" in plan
    assert "partial_sum" in plan
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the exact-table materialization itself: one scan, one count agg
    # with partial combine, text column only
    from usls_doc_spark.operators.web_curation import cms_heavy_hitters_exec  # noqa: F401

    ex = spark.table("_cms_exact_mat")
    eplan = ex._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in eplan or "LocalTableScan" in eplan
