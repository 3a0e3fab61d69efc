"""Independent oracle for token_quantiles: per-language type-1
(inverted-CDF) percentiles recomputed from plain sorted python lists AND
cross-checked against numpy's method='inverted_cdf' — no code shared with
the two-dialect template."""

import duckdb
import numpy as np
import pytest

from tests.conftest import SF_DIR
from usls_doc_spark.operators.text_queries import QUANTILE_PCTS


@pytest.fixture(scope="module")
def lang_lengths():
    rows = duckdb.sql(
        f"SELECT lang, text FROM '{SF_DIR}/documents.parquet' ORDER BY lang"
    ).fetchall()
    out = {}
    for lang, text in rows:
        out.setdefault(lang, []).append(len(text.split(" ")))
    return {k: sorted(v) for k, v in out.items()}


def _type1(sorted_vals, p):
    """Smallest value whose cumulative count reaches ceil(p% of n)."""
    n = len(sorted_vals)
    return sorted_vals[-(-p * n // 100) - 1]


def test_token_quantiles_vs_sorted_reference(spark, lang_lengths):
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    got = {r["lang"]: r for r in
           qs["token_quantiles"](spark, SF_DIR).collect()}
    assert set(got) == set(lang_lengths)
    for lang, vals in lang_lengths.items():
        r = got[lang]
        assert r["n_docs"] == len(vals)
        assert r["min_tok"] == vals[0] and r["max_tok"] == vals[-1]
        for p in QUANTILE_PCTS:
            assert r[f"p{p}"] == _type1(vals, p), (lang, p)
            # the integer restatement IS numpy's inverted_cdf quantile
            assert r[f"p{p}"] == int(
                np.quantile(np.array(vals), p / 100, method="inverted_cdf")
            ), (lang, p)
        assert r["p50"] <= r["p90"] <= r["p99"] <= r["max_tok"]


def test_token_quantiles_plan_histogram_first(spark):
    """Documents must collapse into the (lang, n_tokens) histogram by a
    map-side-combinable hash aggregate BEFORE any window: the cumulative
    window's partitions hold histogram rows (bounded by distinct lengths),
    never document rows — so the partial_count aggregate sits BELOW the
    window in the plan tree. Scan reads only (lang, text)."""
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    df = qs["token_quantiles"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan
    assert plan.index("windowspecdefinition") < plan.index("partial_count")
    assert "CartesianProduct" not in plan and "Join" not in plan
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "lang" in read and "text" in read and "doc_id" not in read
