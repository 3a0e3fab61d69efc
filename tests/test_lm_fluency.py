"""Independent oracle for lm_bigram_fluency (round 7): the add-one
smoothed bigram LM rebuilt with collections.Counter and exact python
integers — no code shared with the two-dialect template."""

import duckdb
import pytest

from tests.conftest import SF_DIR
from usls_doc_spark.operators.text_queries import LM_PPB, render_spark


@pytest.fixture(scope="module")
def docs_rows():
    return duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()


def _reference(rows):
    from collections import Counter

    c2, c1, vocab = Counter(), Counter(), set()
    for doc_id, text in rows:
        ws = text.split(" ")
        if doc_id % 2 == 0:
            vocab.update(ws)
            for a, b in zip(ws, ws[1:]):
                c2[(a, b)] += 1
                c1[a] += 1
    V = len(vocab)
    out = {}
    for doc_id, text in rows:
        ws = text.split(" ")
        ps = [
            round((LM_PPB * (c2[(a, b)] + 1)) / (c1[a] + V))
            for a, b in zip(ws, ws[1:])
        ]
        n_oov = sum(1 for w in ws if w not in vocab)
        out[doc_id] = (
            len(ps),
            sum(ps) // len(ps) if ps else 0,
            n_oov,
            n_oov / len(ws),
        )
    return out


def test_lm_bigram_fluency_matches_counter_reference(spark, docs_rows):
    from usls_doc_spark.queries import _register_views

    want = _reference(docs_rows)
    _register_views(spark, SF_DIR)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_prob_ppb"], r["n_oov"], r["oov_rate"])
        for r in spark.sql(render_spark("lm_bigram_fluency")).collect()
    }
    assert got == want
    # the split genuinely exercises both smoothing branches: odd (held-out)
    # docs must include unseen bigrams AND the train half scores higher on
    # average than the held-out half (it memorized itself)
    train = [v[1] for k, v in got.items() if k % 2 == 0]
    held = [v[1] for k, v in got.items() if k % 2 == 1]
    assert sum(train) / len(train) > sum(held) / len(held)
    # (the synthetic corpus shares one vocabulary, so the OOV branch is
    # exercised by the constructed-input test below instead)


def test_lm_fluency_separates_predictable_from_shuffled(spark):
    """Sanity on the filter semantics: a document of in-domain repeated
    phrases must outscore a document of corpus-alien words."""
    rows = [
        (0, "the cat sat on the mat and the cat sat on the mat"),
        (2, "the cat sat on the mat again and the dog sat too"),
        (1, "the cat sat on the mat and the dog sat on the mat"),
        (3, "zyx wvu tsr qpo nml kji hgf edc ba zz yy xx ww vv"),
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").createOrReplaceTempView(
        "documents"
    )
    got = {r["doc_id"]: r for r in spark.sql(render_spark("lm_bigram_fluency")).collect()}
    assert got[1]["avg_prob_ppb"] > got[3]["avg_prob_ppb"]
    assert got[3]["oov_rate"] == 1.0
    assert got[1]["oov_rate"] < 0.2
