"""Differential test of the dialect PRIMITIVES themselves — the
foundation every two-dialect template stands on. Each helper is rendered
over the same literal inputs in Spark SQL and DuckDB SQL and the results
compared value-by-value, over seeded-random word arrays, integers and
edge cases (empty-ish arrays, n > len, negative ints, zero divisors
excluded by construction). A drift in any helper's cross-engine
semantics fails HERE with the helper's name, not three templates away."""

import random

import duckdb
import pytest

from usls_doc_spark.operators.dialect import DUCK, SPARK


def _lit_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _lit_arr(d, words):
    body = ", ".join(_lit_str(w) for w in words)
    return f"array({body})" if d.name == "spark" else f"[{body}]"


def _cases():
    rng = random.Random(20260817)
    cases = []  # (label, fn(d) -> sql expr)
    for i in range(8):
        n_words = rng.choice([1, 2, 3, 5, 9])
        words = [
            "".join(rng.choice("abcxyz'") for _ in range(rng.randint(1, 5)))
            for _ in range(n_words)
        ]
        sent = " ".join(w.replace("'", "q") for w in words)
        for label, fn in [
            (f"split_len_{i}", lambda d, s=sent: d.array_len(d.split(_lit_str(s)))),
            (f"element1_{i}", lambda d, ws=words: d.element(_lit_arr(d, ws), "1")),
            (f"array_min_{i}", lambda d, ws=words: d.array_min(_lit_arr(d, ws))),
            (f"array_sort_join_{i}", lambda d, ws=words: d.array_join(
                d.array_sort(_lit_arr(d, ws)), "','")),
            (f"array_distinct_len_{i}", lambda d, ws=words: d.array_len(
                d.array_distinct(_lit_arr(d, ws + ws)))),
            (f"slice_{i}", lambda d, ws=words, k=rng.randint(1, 4): d.array_join(
                d.array_slice(_lit_arr(d, ws), 1, k), "'|'")),
            (f"shingles2_{i}", lambda d, s=sent: d.array_join(
                d.shingles(d.split(_lit_str(s)), 2), "'#'")),
            (f"shingles3_{i}", lambda d, s=sent: d.array_join(
                d.shingles(d.split(_lit_str(s)), 3), "'#'")),
            (f"transform_{i}", lambda d, ws=words: d.array_join(
                d.array_transform(_lit_arr(d, ws), "x", "upper(x)"), "''")),
            (f"filter_count_{i}", lambda d, ws=words: d.array_filter_count(
                _lit_arr(d, ws), "x", "length(x) >= 2")),
            (f"md5_{i}", lambda d, s=sent: d.md5(_lit_str(s))),
            (f"hash32_{i}", lambda d, s=sent: d.hash32(_lit_str(s))),
        ]:
            cases.append((label, fn))
    for i in range(8):
        a = rng.randint(-(2**40), 2**40)
        b = rng.randint(1, 2**20)
        sh = rng.randint(0, 20)
        cases += [
            (f"intdiv_{i}", lambda d, a=a, b=b: d.intdiv(str(a), str(b))),
            (f"shiftleft_{i}", lambda d, b=b, sh=sh: d.shiftleft(
                f"CAST({b} AS BIGINT)", str(sh))),
            (f"shiftright_{i}", lambda d, a=abs(a), sh=sh: d.shiftright(str(a), sh)),
            (f"xor_{i}", lambda d, a=abs(a), b=b: d.bit_xor2(str(a), str(b))),
            (f"seq_sum_{i}", lambda d, b=b % 50: d.array_sum_bigint(
                d.seq("0", str(b)))),
        ]
    cases += [
        ("regexp_count", lambda d: d.regexp_count(_lit_str("a1b22c333"), "'[0-9]+'")),
        ("regexp_replace_all", lambda d: d.regexp_replace_all(
            _lit_str("a1b22c333"), "'[0-9]+'", "'N'")),
        ("str_cast", lambda d: d.str_cast("12345")),
        ("hex32", lambda d: d.hex32_to_bigint(_lit_str("ffffffff"))),
        ("hex32_zero", lambda d: d.hex32_to_bigint(_lit_str("00000001"))),
        ("epoch", lambda d: d.epoch_seconds(
            "TIMESTAMP '2024-03-01 12:34:56'")),
        ("time_bucket", lambda d: d.str_cast(d.time_bucket(
            "TIMESTAMP '2024-03-01 12:34:56'", 21600))),
        ("shingles_short", lambda d: d.array_join(
            d.shingles(d.split(_lit_str("solo")), 2), "'#'")),
    ]
    return cases


@pytest.fixture(scope="module")
def evaluated(spark):
    cases = _cases()
    con = duckdb.connect()
    got = {}
    CHUNK = 40  # one SELECT per chunk keeps codegen small
    for lo in range(0, len(cases), CHUNK):
        chunk = cases[lo : lo + CHUNK]
        s_sql = "SELECT " + ", ".join(
            f"CAST(({fn(SPARK)}) AS STRING) AS {lbl}" for lbl, fn in chunk
        )
        d_sql = "SELECT " + ", ".join(
            f"CAST(({fn(DUCK)}) AS VARCHAR) AS {lbl}" for lbl, fn in chunk
        )
        srow = spark.sql(s_sql).collect()[0].asDict()
        drow = dict(zip([lbl for lbl, _ in chunk],
                        con.sql(d_sql).fetchall()[0]))
        for lbl, _ in chunk:
            got[lbl] = (srow[lbl], drow[lbl])
    return got


def test_dialect_primitives_cross_engine(evaluated):
    mismatches = {
        lbl: pair for lbl, pair in evaluated.items() if pair[0] != pair[1]
    }
    assert not mismatches, mismatches


def test_ordered_string_agg_cross_engine(spark):
    """The one aggregate helper: identical ordered join over a VALUES
    relation with a FILTER predicate, including the composite tie-break
    requirement (unique order keys at call sites)."""
    rows = [(3, "c"), (1, "a"), (2, "b"), (4, "dd"), (0, "z")]
    vals_s = ", ".join(f"({o}, '{v}')" for o, v in rows)
    s_sql = (
        "SELECT " + SPARK.ordered_string_agg("v", "o", "'-'", where="o >= 1")
        + f" AS agg FROM (VALUES {vals_s}) AS t(o, v)"
    )
    d_sql = (
        "SELECT " + DUCK.ordered_string_agg("v", "o", "'-'", where="o >= 1")
        + f" AS agg FROM (VALUES {vals_s}) AS t(o, v)"
    )
    import duckdb as dd

    a = spark.sql(s_sql).collect()[0]["agg"]
    b = dd.sql(d_sql).fetchall()[0][0]
    assert a == b == "a-b-c-dd"
