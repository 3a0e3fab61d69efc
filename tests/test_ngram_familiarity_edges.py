"""quality_ngram_familiarity edge cases (round-2 ADVICE):
 * documents shorter than 3 chars must drop out identically in both
   dialects instead of aborting the Spark query (sequence() steps
   DESCENDING when stop < start and element_at(0) throws);
 * the weighted corpus-count sum must not wrap BIGINT (DECIMAL-exact
   until the single final division)."""

import duckdb
import pandas as pd

from usls_doc_spark.operators.dialect import DUCK, SPARK
from usls_doc_spark.operators.text_queries import q_quality_ngram_familiarity

DOCS = [
    (0, "", "en"),
    (1, "a", "en"),
    (2, "ab", "en"),          # 2 chars: no trigram, must not throw
    (3, "abc", "en"),         # exactly one trigram
    (4, "abcd", "en"),
    (5, "the quick brown fox jumps over the lazy dog", "en"),
    (6, "the quick brown fox jumps over the lazy dog", "en"),
]


def _duck():
    con = duckdb.connect(":memory:")
    con.register("docs_src", pd.DataFrame(DOCS, columns=["doc_id", "text", "lang"]))
    con.sql("CREATE VIEW documents AS SELECT * FROM docs_src")
    return con


def test_short_docs_drop_out_identically(spark):
    sdf = spark.createDataFrame(DOCS, "doc_id bigint, text string, lang string")
    sdf.createOrReplaceTempView("documents")
    got = sorted(
        (r.doc_id, r.n_trigrams, r.familiarity)
        for r in spark.sql(q_quality_ngram_familiarity(SPARK)).collect()
    )
    con = _duck()
    want = sorted(tuple(r) for r in con.sql(q_quality_ngram_familiarity(DUCK)).fetchall())
    # docs 0-2 have no trigrams and appear in NEITHER result
    assert [r[0] for r in got] == [3, 4, 5, 6]
    assert got == want  # bit-identical doubles


def test_familiarity_values_exact():
    con = _duck()
    rows = {r[0]: r for r in con.sql(q_quality_ngram_familiarity(DUCK)).fetchall()}
    # doc 3: its single trigram 'abc' appears once (docs 4 has 'abc' too -> c=2)
    n_total = sum(max(len(t) - 2, 0) for _, t, _ in DOCS)
    assert rows[3][1] == 1
    assert rows[3][2] == (2 * 1_000_000) / (1 * n_total)
