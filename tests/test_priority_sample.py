"""Independent oracle for priority_sample_weighted: the Duffield-Lund-
Thorup construction rebuilt with hashlib + plain ints (no code shared
with the two-dialect template), plus the scheme's structural properties —
the sample IS the exact per-stratum top-K by (priority DESC, doc_id ASC),
priority >= weight always, the threshold is the (K+1)-th priority, and
strata with <= K documents estimate EXACTLY (tau = 0)."""

from hashlib import md5

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_DIR
from usls_doc_spark.operators.web_curation import PRIO_K, PRIO_W_CAP


def _prio(doc_id: int, w: int) -> int:
    h = int(md5(f"{doc_id}:prio".encode()).hexdigest()[:8], 16)
    return (min(w, PRIO_W_CAP) << 32) // (h + 1)


def _dlt_reference(rows):
    """rows: (doc_id, text, lang) -> {(lang, rnk): expected row tuple}."""
    strata = {}
    for doc_id, text, lang in rows:
        w = len(text.split(" "))
        strata.setdefault(lang, []).append((doc_id, w, _prio(doc_id, w)))
    expected = {}
    for lang, docs in strata.items():
        order = sorted(docs, key=lambda t: (-t[2], t[0]))
        tau = order[PRIO_K][2] if len(order) > PRIO_K else 0
        exact = sum(min(w, PRIO_W_CAP) for _, w, _ in docs)
        sample = order[:PRIO_K]
        est = sum(max(min(w, PRIO_W_CAP), tau) for _, w, _ in sample)
        for rnk, (doc_id, w, q) in enumerate(sample, start=1):
            assert q >= min(w, PRIO_W_CAP)  # priority = w/u with u <= 1
            expected[(lang, rnk)] = (
                doc_id, w, q, tau, max(min(w, PRIO_W_CAP), tau),
                est, exact, len(docs),
            )
    return expected


@pytest.fixture(scope="module")
def docs_rows():
    return duckdb.sql(
        f"SELECT doc_id, text, lang FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()


def test_priority_sample_vs_dlt_reference(spark, docs_rows):
    from usls_doc_spark.queries import build_registry

    expected = _dlt_reference(docs_rows)
    qs, _ = build_registry()
    got = {
        (r["lang"], r["rnk"]): (
            r["doc_id"], r["weight"], r["q_prio"], r["tau_q"], r["w_hat"],
            r["est_total"], r["exact_total"], r["n_docs"],
        )
        for r in qs["priority_sample_weighted"](spark, SF_DIR).collect()
    }
    assert got == expected
    # the estimator is doing something (not the bare sample sum): at this
    # corpus every weight sits below tau, so w_hat == tau for every row —
    # the tau branch of greatest() is the live one here
    assert all(v[4] == v[3] > 0 for v in expected.values())


def test_priority_sample_small_stratum_exact(spark):
    """DLT's exactness-on-small-strata property: a stratum with <= K
    documents has no (K+1)-th priority, tau = 0, every document is
    sampled, and the estimate IS the exact total (the w-branch of
    greatest() — dead on the big corpus where tau dominates — is the
    live one). A second stratum with > K docs rides along so both
    branches appear in ONE result; parity vs DuckDB asserted on the
    same constructed input."""
    from tests.oracle_utils import compare
    from usls_doc_spark.operators.dialect import DUCK, SPARK
    from usls_doc_spark.operators.text_queries import TEXT_QUERIES

    rows = [(i, " ".join(f"w{i}x{j}" for j in range(3 + i)), "xx")
            for i in range(PRIO_K - 2)]
    rows += [(100 + i, " ".join(f"y{i}z{j}" for j in range(5 + i % 7)), "yy")
             for i in range(PRIO_K + 6)]
    sdf = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    sdf.createOrReplaceTempView("documents")
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))

    got = spark.sql(TEXT_QUERIES["priority_sample_weighted"](SPARK))
    ok, msg = compare(got, con.sql(TEXT_QUERIES["priority_sample_weighted"](DUCK)))
    assert ok, msg

    by_lang = {}
    for r in got.collect():
        by_lang.setdefault(r["lang"], []).append(r)
    xx, yy = by_lang["xx"], by_lang["yy"]
    assert len(xx) == PRIO_K - 2  # every doc sampled
    assert all(r["tau_q"] == 0 for r in xx)
    assert all(r["est_total"] == r["exact_total"] for r in xx)
    assert all(r["w_hat"] == r["weight"] for r in xx)
    assert len(yy) == PRIO_K and all(r["tau_q"] > 0 for r in yy)

    expected = _dlt_reference(rows)
    for lang, rs in by_lang.items():
        for r in rs:
            assert expected[(lang, r["rnk"])][0] == r["doc_id"]


def test_priority_sample_plan_bounded(spark):
    """The per-stratum top-(K+1) must be the two-level salted bounded
    top-k (per-(lang, salt) sorted head arrays with map-side
    partial_collect_list, merged per lang) — never a window over document
    rows; the one row_number window ranks the already-sliced <= K+1 keys
    per lang, so it sits ABOVE the collect aggregates in the plan tree."""
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    df = qs["priority_sample_weighted"](spark, SF_DIR)
    df.collect()  # AQE finalizes join strategies
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_collect_list" in plan
    assert plan.index("windowspecdefinition") < plan.index("partial_collect_list")
