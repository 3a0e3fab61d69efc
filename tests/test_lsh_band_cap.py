"""Hot-band-key cap: a degenerate bucket (many docs sharing every band key)
must produce at most C(BAND_CAP, 2) pairs, identically in both engines —
the k² blow-up guard for LSH self-joins at scale."""

import os

import duckdb
import pytest
import pandas as pd

from usls_doc_spark.operators.dialect import DUCK, SPARK
from usls_doc_spark.operators.text_queries import BAND_CAP, build_minhash_lsh_pairs

N_HOT = BAND_CAP + 36  # 100 identical docs -> every band key is shared

HOT_TEXT = "the same boilerplate navigation text repeated on every page " * 2
DOCS = [(i, HOT_TEXT, "en") for i in range(N_HOT)] + [
    (1000, "a unique document about rivers and mountains far away", "en"),
    (1001, "another unique document on astronomy and telescopes tonight", "en"),
]


def _docs_df():
    return pd.DataFrame(DOCS, columns=["doc_id", "text", "lang"])


def test_duckdb_pairs_capped():
    con = duckdb.connect()
    con.register("docs_src", _docs_df())
    con.sql("CREATE VIEW documents AS SELECT * FROM docs_src")
    pairs = con.sql(build_minhash_lsh_pairs(DUCK)).df()
    expected = BAND_CAP * (BAND_CAP - 1) // 2  # C(64,2), not C(100,2)
    assert len(pairs) == expected
    assert pairs["doc_a"].max() < BAND_CAP  # only the smallest doc_ids kept


def test_spark_matches_duckdb_on_hot_key(spark):
    sdf = spark.createDataFrame(DOCS, "doc_id bigint, text string, lang string")
    sdf.createOrReplaceTempView("documents")
    got = {
        (r.doc_a, r.doc_b, r.n_shared_bands)
        for r in spark.sql(build_minhash_lsh_pairs(SPARK)).collect()
    }
    con = duckdb.connect()
    con.register("docs_src", _docs_df())
    con.sql("CREATE VIEW documents AS SELECT * FROM docs_src")
    want = {
        tuple(r)
        for r in con.sql(build_minhash_lsh_pairs(DUCK)).fetchall()
    }
    assert got == want


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SLOW") != "1",
    reason="quadratic ground-truth harness at sf0.1 (~1 min); SPARK_GRAFT_SLOW=1 opts in",
)
def test_recall_sf01(spark):
    """Round-3 VERDICT item 5: the BAND_CAP recall floor, measured at
    sf0.1 against the exhaustive inverted-index ground truth (measured
    1.0 on 2026-08-17 — BENCH/BASELINE.md)."""
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    row = qs["lsh_recall"](spark, "/root/testdata/sf0.1").collect()[0]
    assert row.n_exact > 0
    assert row.recall >= 0.95
