"""Rolling-hash/winnowing semantics vs an independent pure-Python reference,
including the edge lengths the O(L) recurrence rewrite must preserve
(len < 8, == 8, == 9) and a long document (the round-1 O(L²) pathology)."""

import duckdb
import pandas as pd
import pytest

from usls_doc_spark.operators.dialect import DUCK, SPARK
from usls_doc_spark.operators.text_queries import q_rolling_hash

MOD = 1_000_000_007

TEXTS = [
    (1, "a"),
    (2, "abcdefg"),          # len 7  (< one window)
    (3, "abcdefgh"),         # len 8  (exactly one window)
    (4, "abcdefghi"),        # len 9  (two windows)
    (5, "the quick brown fox jumps over the lazy dog"),
    (6, "zz" + "ab" * 3000 + "q"),  # long doc: 6003 chars
    (7, "same same same same same"),
]


def py_reference(text: str) -> tuple[int, int]:
    codes = [ord(c) for c in text]
    h = 0
    for c in codes:
        h = (h * 31 + c) % MOD
    if len(codes) <= 8:
        return h, h
    wins = []
    for i in range(len(codes) - 7):
        w = 0
        for c in codes[i : i + 8]:
            w = (w * 31 + c) % MOD
        wins.append(w)
    return h, min(wins)


@pytest.fixture(scope="module")
def expected():
    return {
        doc_id: py_reference(t) for doc_id, t in TEXTS
    }


def test_duckdb_rendering_matches_python(expected):
    con = duckdb.connect()
    con.register("docs_src", pd.DataFrame(TEXTS, columns=["doc_id", "text"]))
    con.sql("CREATE VIEW documents AS SELECT * FROM docs_src")
    out = con.sql(q_rolling_hash(DUCK)).df().set_index("doc_id")
    for doc_id, (full, mn) in expected.items():
        assert out.loc[doc_id, "rolling_hash"] == full, doc_id
        assert out.loc[doc_id, "winnow_min_hash"] == mn, doc_id


def test_spark_rendering_matches_python(spark, expected):
    sdf = spark.createDataFrame(TEXTS, "doc_id int, text string")
    sdf.createOrReplaceTempView("documents")
    out = {r.doc_id: r for r in spark.sql(q_rolling_hash(SPARK)).collect()}
    for doc_id, (full, mn) in expected.items():
        assert out[doc_id].rolling_hash == full, doc_id
        assert out[doc_id].winnow_min_hash == mn, doc_id
