"""Independent oracle for dup_window_fraction: sliding-window doc
frequencies rebuilt with dict/set (no code shared with the two-dialect
template), plus a constructed input exercising the below-threshold
partial-overlap branch the real corpus lacks (its duplicates are
near-full-doc, fractions 0.89-1.0)."""

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_DIR
from usls_doc_spark.operators.text_queries import DUPWIN_MIN_FREQ, DUPWIN_WORDS


def _reference(rows):
    """rows: (doc_id, text) -> {doc_id: (n_windows, n_dup, dropped)}."""
    doc_wins = {}
    for doc_id, text in rows:
        ws = text.split(" ")
        n = max(len(ws) - DUPWIN_WORDS + 1, 1)
        doc_wins[doc_id] = [" ".join(ws[i : i + DUPWIN_WORDS]) for i in range(n)]
    df = {}
    for doc_id, wins in doc_wins.items():
        for w in set(wins):
            df[w] = df.get(w, 0) + 1
    out = {}
    for doc_id, wins in doc_wins.items():
        dup = sum(1 for w in wins if df[w] >= DUPWIN_MIN_FREQ)
        out[doc_id] = (len(wins), dup, int(2 * dup >= len(wins)))
    return out


@pytest.fixture(scope="module")
def docs_rows():
    return duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()


def test_dup_window_vs_dict_reference(spark, docs_rows):
    from usls_doc_spark.queries import build_registry

    expected = _reference(docs_rows)
    qs, _ = build_registry()
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dropped"],
                      r["dup_fraction"])
        for r in qs["dup_window_fraction"](spark, SF_DIR).collect()
    }
    assert set(got) == set(expected)
    for doc_id, (n, dup, dropped) in expected.items():
        g = got[doc_id]
        assert g[:3] == (n, dup, dropped), doc_id
        assert g[3] == dup / n, doc_id  # single IEEE division, bit-identical
    # both corpus-level branches are live: clean docs and dropped dups
    assert any(v[2] == 1 for v in expected.values())
    assert any(v[1] == 0 for v in expected.values())


def test_dup_window_partial_overlap_below_threshold(spark):
    """A doc sharing ONE 16-word run with another (shifted by an offset a
    chunk-aligned scheme would miss) must count exactly the shared
    windows, land below the 0.5 threshold, and NOT be dropped — identical
    in both engines on the same constructed input."""
    from tests.oracle_utils import compare
    from usls_doc_spark.operators.dialect import DUCK, SPARK
    from usls_doc_spark.operators.text_queries import TEXT_QUERIES

    shared = " ".join(f"s{i}" for i in range(DUPWIN_WORDS))
    rows = [
        (1, " ".join(f"a{i}" for i in range(40)) + " " + shared, "en"),
        # offset by 3 words so the shared run is NOT chunk-aligned
        (2, "x0 x1 x2 " + shared + " " + " ".join(f"b{i}" for i in range(40)), "en"),
        (3, " ".join(f"c{i}" for i in range(30)), "en"),
    ]
    sdf = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    sdf.createOrReplaceTempView("documents")
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))

    got = spark.sql(TEXT_QUERIES["dup_window_fraction"](SPARK))
    ok, msg = compare(got, con.sql(TEXT_QUERIES["dup_window_fraction"](DUCK)))
    assert ok, msg
    by_id = {r["doc_id"]: r for r in got.collect()}
    ref = _reference([(i, t) for i, t, _ in rows])
    for doc_id, (n, dup, dropped) in ref.items():
        r = by_id[doc_id]
        assert (r["n_windows"], r["n_dup_windows"], r["dropped"]) == (n, dup, dropped)
    assert by_id[1]["n_dup_windows"] == 1  # exactly the one shared window
    assert by_id[2]["n_dup_windows"] == 1
    assert by_id[1]["dropped"] == 0 and by_id[2]["dropped"] == 0
    assert by_id[3]["n_dup_windows"] == 0


def test_dup_window_plan_no_window_function(spark):
    """Despite the name: doc frequencies are nested hash aggregates with
    map-side combine and the verdict is an AQE-splittable hash equi-join —
    never a window function, never a cartesian."""
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    df = qs["dup_window_fraction"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan


def _char_reference(rows):
    """Round-7 char-k-gram variant: polynomial-hash 50-char windows
    rebuilt with plain python ints (no code shared with the template)."""
    from usls_doc_spark.operators.text_queries import CHAR_KGRAM, CHAR_KGRAM_MOD

    def h(s):
        acc = 0
        for ch in s:
            acc = (acc * 31 + ord(ch)) % CHAR_KGRAM_MOD
        return acc

    doc_wins = {}
    for doc_id, text in rows:
        n = max(len(text) - CHAR_KGRAM + 1, 1)
        doc_wins[doc_id] = [h(text[i : i + CHAR_KGRAM]) for i in range(n)]
    df = {}
    for wins in doc_wins.values():
        for w in set(wins):
            df[w] = df.get(w, 0) + 1
    out = {}
    for doc_id, wins in doc_wins.items():
        dup = sum(1 for w in wins if df[w] >= DUPWIN_MIN_FREQ)
        out[doc_id] = (len(wins), dup, int(2 * dup >= len(wins)))
    return out


def test_dup_char_kgram_vs_dict_reference(spark, docs_rows):
    from usls_doc_spark.queries import build_registry

    expected = _char_reference(docs_rows)
    qs, _ = build_registry()
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dropped"])
        for r in qs["dup_char_kgram_fraction"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_dup_char_kgram_catches_word_split_duplication(spark):
    """The blind spot this query closes: two documents sharing a long
    character run that WORD windows tokenize differently (punctuation
    drift) — invisible to dup_window_fraction, flagged here."""
    base = "the quick brown fox jumps over the lazy dog again and again and again"
    rows = [
        (1, base + " tail one marker alpha"),
        (2, base.replace(" ", "  ", 1) + " other ending entirely beta"),
        (3, "completely unrelated text with no shared character windows xyz"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    df.createOrReplaceTempView("documents")
    from usls_doc_spark.operators.text_queries import render_spark

    got = {r["doc_id"]: r["n_dup_windows"] for r in
           spark.sql(render_spark("dup_char_kgram_fraction")).collect()}
    # the extra space shifts offsets but stride-1 char windows realign
    assert got[1] > 0 and got[2] > 0
    assert got[3] == 0


def test_rollhash_kernel_equals_fold_reference():
    """kernels/rollhash.py must produce EXACTLY the SQL fold's integers —
    corpus + adversarial unicode + empty/short/boundary-length texts."""
    from usls_doc_spark.kernels.rollhash import BASE, MOD, window_hashes_batched
    from usls_doc_spark.operators.text_queries import CHAR_KGRAM

    def fold_ref(text, k):
        out = []
        for i in range(max(len(text) - k + 1, 1)):
            acc = 0
            for ch in text[i : i + k]:
                acc = (acc * BASE + ord(ch)) % MOD
            out.append(acc)
        return out

    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    texts += ["", "a", "x" * (CHAR_KGRAM - 1), "y" * CHAR_KGRAM,
              "z" * (CHAR_KGRAM + 1),
              "héllo wörld ünïcode ß∑œ∂ƒ 😀 emoji padding " * 3]
    di, w = window_hashes_batched(texts, CHAR_KGRAM)
    for t_i, t in enumerate(texts):
        assert w[di == t_i].tolist() == fold_ref(t, CHAR_KGRAM), t_i

    # r7 ADVICE: a batch of ONLY empty texts once crashed (IndexError on
    # the empty prefix array); the SQL fold yields one hash-0 window each
    di0, w0 = window_hashes_batched(["", ""], CHAR_KGRAM)
    assert di0.tolist() == [0, 1] and w0.tolist() == [0, 0]


def test_dup_char_kernel_callable_equals_spark_sql_template(spark):
    """The registry's kernel-backed callable must equal the Spark-dialect
    SQL-fold rendering row-for-row (in-dialect cross-check; the fold form
    is the reference, too slow for the bench path)."""
    from usls_doc_spark.queries import _register_views, build_registry

    qs, _ = build_registry()
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dropped"])
        for r in qs["dup_char_kgram_fraction"](spark, SF_DIR).collect()
    }
    from usls_doc_spark.operators.text_queries import render_spark

    _register_views(spark, SF_DIR)
    want = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dropped"])
        for r in spark.sql(render_spark("dup_char_kgram_fraction")).collect()
    }
    assert got == want
