"""INDEPENDENT reference oracles for the web-curation family.

The driver gate proves Spark == DuckDB on the shared two-dialect template;
these tests prove the template's SEMANTICS against implementations that
share no code with it — urllib.parse-based URL canonicalization, a dict
first-occurrence pass for paragraph dedup, hashlib for the sampling
bucket, collections.Counter for the inverted index — the same differential
discipline as the boilerplate parser's stdlib oracle."""

import hashlib
import math
from collections import Counter
from urllib.parse import urlsplit

import duckdb
import pytest

from tests.conftest import SF_DIR
from usls_doc_spark.operators.web_curation import (
    PARA_WORDS,
    POSTINGS_CAP,
    STRATA_DEFAULT,
    STRATA_RATES,
)
from usls_doc_spark.queries import build_registry


@pytest.fixture(scope="module")
def docs_rows():
    return duckdb.sql(
        f"SELECT doc_id, text, lang FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()


@pytest.fixture(scope="module")
def registry():
    q, _ = build_registry()
    return q


def _raw_url(doc_id: int) -> str:
    """Re-state the synthesis spec (web_curation.q_url_canonicalize raw CTE)."""
    page_id = doc_id // 10
    site = f"site{page_id % 20}"
    scheme = "HTTPS" if doc_id % 2 == 0 else "https"
    host = [
        f"WWW.{site.upper()}.Example.COM",
        f"{site}.example.com:443",
        f"{site.upper()}.EXAMPLE.com",
    ][doc_id % 3]
    path = f"/Doc/{page_id}/" if doc_id % 5 == 0 else f"/Doc/{page_id}"
    utm = "utm_source=feed" if doc_id % 4 < 3 else ""
    ref = "ref=mail" if doc_id % 7 == 0 else ""
    iid = f"id={page_id}"
    # page-keyed NON-tracking param: 'utmx' lacks the underscore, so the
    # canonicalizer must KEEP it (regression probe for LIKE 'utm_%' whose
    # '_' is a single-char wildcard — round-4 ADVICE item 1)
    utmx = "utmx=1" if page_id % 2 == 0 else ""
    items = (
        [utm, iid, utmx, ref, "v=1"]
        if doc_id % 2 == 0
        else ["v=1", utmx, utm, iid, ref]
    )
    qs = "&".join(p for p in items if p)
    frag = f"#sec{doc_id % 7}" if doc_id % 6 == 0 else ""
    return f"{scheme}://{host}{path}" + (f"?{qs}" if qs else "") + frag


def _canonicalize(raw: str) -> tuple[str, str, str]:
    """Independent canonicalizer over urllib.parse."""
    sp = urlsplit(raw)
    host = sp.netloc.lower().split(":")[0]
    if host.startswith("www."):
        host = host[4:]
    reg_domain = ".".join(host.split(".")[-2:])
    path = sp.path.lower()
    if path.endswith("/") and len(path) > 1:
        path = path[:-1]
    kept = sorted(
        p
        for p in sp.query.split("&")
        if p and not p.startswith("utm_") and not p.startswith("ref=")
    )
    q = ("?" + "&".join(kept)) if kept else ""
    return f"{sp.scheme.lower()}://{host}{path}{q}", host, reg_domain


def test_url_canonicalize_vs_urllib(spark, registry, docs_rows):
    got = {
        r["doc_id"]: r
        for r in registry["url_canonicalize"](spark, SF_DIR).collect()
    }
    expected = {}
    groups: dict[str, list[int]] = {}
    for doc_id, _t, _l in docs_rows:
        raw = _raw_url(doc_id)
        canon, host, reg = _canonicalize(raw)
        expected[doc_id] = (raw, canon, host, reg)
        groups.setdefault(canon, []).append(doc_id)
    assert got.keys() == expected.keys()
    for doc_id, (raw, canon, host, reg) in expected.items():
        r = got[doc_id]
        assert r["raw_url"] == raw, doc_id
        assert r["canonical_url"] == canon, doc_id
        assert r["host"] == host and r["registered_domain"] == reg, doc_id
        members = sorted(groups[canon])
        assert r["dup_count"] == len(members)
        assert r["dup_rank"] == members.index(doc_id) + 1
        assert r["url_kept"] == (1 if members[0] == doc_id else 0)


def test_url_canonicalize_keeps_utmx_param(spark, registry, docs_rows):
    """The probe row must survive: canonical URLs of even pages carry
    utmx=1 (it is NOT a utm_* tracking param), and the independent
    urllib canonicalizer agrees — a LIKE-wildcard regression would strip
    it from the SQL side only."""
    got = registry["url_canonicalize"](spark, SF_DIR).collect()
    with_utmx = [r for r in got if "utmx=1" in r["canonical_url"]]
    assert with_utmx, "no canonical URL kept the utmx probe param"
    for r in with_utmx:
        assert (r["doc_id"] // 10) % 2 == 0


def test_url_canonicalize_agg_vs_urllib(spark, registry, docs_rows):
    """The aggregation (Zipf-head) form must pick exactly the windowed
    form's rank-1 row per canonical URL — verified against the
    independent urllib canonicalizer, not the shared template."""
    got = {
        r["canonical_url"]: r
        for r in registry["url_canonicalize_agg"](spark, SF_DIR).collect()
    }
    groups: dict[str, list[int]] = {}
    raws: dict[int, str] = {}
    hosts: dict[str, tuple[str, str]] = {}
    for doc_id, _t, _l in docs_rows:
        raw = _raw_url(doc_id)
        canon, host, reg = _canonicalize(raw)
        raws[doc_id] = raw
        groups.setdefault(canon, []).append(doc_id)
        hosts[canon] = (host, reg)
    assert got.keys() == groups.keys()
    for canon, members in groups.items():
        r = got[canon]
        first = min(members)
        assert r["first_doc_id"] == first
        assert r["first_raw_url"] == raws[first]
        assert r["dup_count"] == len(members)
        assert (r["host"], r["registered_domain"]) == hosts[canon]


def test_paragraph_dedup_vs_dict_pass(spark, registry, docs_rows):
    got = {
        r["doc_id"]: r for r in registry["paragraph_dedup"](spark, SF_DIR).collect()
    }
    seen: set[str] = set()
    for doc_id, text, _l in docs_rows:  # ordered by doc_id = global order
        ws = text.split(" ")
        n_ch = max(math.ceil(len(ws) / PARA_WORDS), 1)
        chunks = [
            " ".join(ws[i * PARA_WORDS : (i + 1) * PARA_WORDS]) for i in range(n_ch)
        ]
        kept = []
        for c in chunks:
            if c not in seen:
                seen.add(c)
                kept.append(c)
        r = got[doc_id]
        assert r["n_chunks"] == n_ch
        assert r["n_kept"] == len(kept), doc_id
        assert r["dedup_text"] == " ".join(kept), doc_id
        assert r["kept_fraction"] == len(kept) / n_ch


def test_stratified_sample_vs_hashlib(spark, registry, docs_rows):
    got = {
        r["doc_id"]: r for r in registry["stratified_sample"](spark, SF_DIR).collect()
    }
    for doc_id, _t, lang in docs_rows:
        bucket = int(hashlib.md5(f"{doc_id}:strat".encode()).hexdigest()[:8], 16) % 100
        rate = STRATA_RATES.get(lang, STRATA_DEFAULT)
        r = got[doc_id]
        assert r["bucket"] == bucket and r["rate_pct"] == rate
        assert r["sampled"] == (1 if bucket < rate else 0)


def test_inverted_index_vs_counter(spark, registry, docs_rows):
    got = {r["term"]: r for r in registry["inverted_index"](spark, SF_DIR).collect()}
    tf: Counter = Counter()
    postings: dict[str, set] = {}
    for doc_id, text, _l in docs_rows:
        words = text.split(" ")
        tf.update(words)
        for w in set(words):
            postings.setdefault(w, set()).add(doc_id)
    assert got.keys() == set(tf)
    total = len(docs_rows)
    for term, r in got.items():
        ids = sorted(postings[term])
        assert r["tf"] == tf[term] and r["df"] == len(ids)
        assert r["df_frac"] == len(ids) / total
        assert r["postings_head"] == ",".join(str(i) for i in ids[:POSTINGS_CAP])


def test_inverted_index_hot_term_head_is_exact(spark):
    """Round-4 VERDICT item 2 'done' criterion: a stopword present in
    EVERY doc (df >> POSTINGS_CAP, spread across all salt classes) must
    still yield the exact global head-16 postings from the two-level
    salted top-k, identical in both engines."""
    import pandas as pd

    from tests.oracle_utils import compare
    from usls_doc_spark.operators.dialect import DUCK, SPARK
    from usls_doc_spark.operators.text_queries import TEXT_QUERIES

    # scattered, non-contiguous ids so salt classes are uneven
    ids = [i * 7 + 3 for i in range(41)]
    rows = [(i, f"the w{i} x{i % 5}", "en") for i in ids]
    sdf = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    sdf.createOrReplaceTempView("documents")
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))

    got = spark.sql(TEXT_QUERIES["inverted_index"](SPARK))
    ok, msg = compare(got, con.sql(TEXT_QUERIES["inverted_index"](DUCK)))
    assert ok, msg
    hot = {r["term"]: r for r in got.collect()}["the"]
    assert hot["df"] == len(ids) and hot["tf"] == len(ids)
    assert hot["postings_head"] == ",".join(
        str(i) for i in sorted(ids)[:POSTINGS_CAP]
    )


def test_tfidf_top_terms_vs_counter(spark, registry, docs_rows):
    from usls_doc_spark.operators.web_curation import TOP_TERMS_K

    got: dict[int, list] = {}
    for r in registry["tfidf_top_terms"](spark, SF_DIR).collect():
        got.setdefault(r["doc_id"], []).append(r)
    df_map: dict[str, int] = Counter()
    per_doc: dict[int, Counter] = {}
    for doc_id, text, _l in docs_rows:
        words = text.split(" ")
        per_doc[doc_id] = Counter(words)
        df_map.update(set(words))
    total = len(docs_rows)
    for doc_id, tf_c in per_doc.items():
        scored = sorted(
            ((tf * total / df_map[t], t, tf) for t, tf in tf_c.items()),
            key=lambda x: (-x[0], x[1]),
        )[:TOP_TERMS_K]
        rows = sorted(got[doc_id], key=lambda r: r["rnk"])
        assert len(rows) == len(scored)
        for rnk, (score, term, tf) in enumerate(scored, 1):
            r = rows[rnk - 1]
            assert (r["term"], r["tf"], r["rnk"]) == (term, tf, rnk), doc_id
            assert r["df"] == df_map[term] and r["score"] == score


def test_pii_redact_vs_stdlib_re(spark, registry, docs_rows):
    """Independent oracle: python `re` over independently re-synthesized
    PII text — the augmentation algebra and the redaction semantics are
    restated here from the documented spec, sharing no code with the
    two-dialect template."""
    import re

    email_re = re.compile(r"[A-Za-z0-9._+-]+@[A-Za-z0-9.-]+\.[A-Za-z]+")
    phone_re = re.compile(r"(\+1 [0-9]{3} )?555[- ][0-9]{4}")
    ip_re = re.compile(r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}")

    expected = {}
    for doc_id, text, _lang in docs_rows:
        pii = (
            f"{text} Contact user.{doc_id}@mail-example.org or "
            f"admin-{doc_id}@corp.example.net, call 555-{doc_id % 10000:04d}"
            f" or +1 212 555 0199, host 10.{doc_id % 256}.{doc_id * 7 % 256}.7 now."
        )
        red = email_re.sub("<EMAIL>", pii)
        red = phone_re.sub("<PHONE>", red)
        red = ip_re.sub("<IP>", red)
        n_res = len(email_re.findall(red)) + len(phone_re.findall(red)) + len(
            ip_re.findall(red)
        )
        expected[doc_id] = (
            len(email_re.findall(pii)),
            len(phone_re.findall(pii)),
            len(ip_re.findall(pii)),
            n_res,
            red,
        )

    got = registry["pii_redact"](spark, SF_DIR).collect()
    assert len(got) == len(expected)
    for r in got:
        e = expected[r["doc_id"]]
        assert (
            r["n_emails"],
            r["n_phones"],
            r["n_ips"],
            r["n_residual"],
            r["redacted_text"],
        ) == e, f"doc {r['doc_id']}"
    # the synthetic PII is actually present and actually scrubbed
    assert all(e[0] == 2 and e[1] == 2 and e[2] == 1 and e[3] == 0 for e in expected.values())


def test_ngram_counts_vs_counter(spark, registry, docs_rows):
    """Independent oracle: collections.Counter over python-split bigrams,
    with the same (count desc, bigram asc) deterministic head."""
    from usls_doc_spark.operators.web_curation import NGRAM_TOP_K

    c = Counter()
    for _doc_id, text, _lang in docs_rows:
        ws = text.split(" ")
        if len(ws) >= 2:
            c.update(" ".join(ws[i : i + 2]) for i in range(len(ws) - 1))
    expected = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:NGRAM_TOP_K]

    got = registry["ngram_counts"](spark, SF_DIR).orderBy("rnk").collect()
    assert len(got) == min(NGRAM_TOP_K, len(expected))
    for rank, (r, (gram, cnt)) in enumerate(zip(got, expected), start=1):
        assert (r["gram"], r["cnt"], r["rnk"]) == (gram, cnt, rank)


def test_line_freq_filter_vs_counter(spark, registry, docs_rows):
    """Independent oracle: collections.Counter corpus frequencies + a
    plain per-doc list comprehension — no code shared with the
    two-dialect template."""
    from usls_doc_spark.operators.web_curation import LINE_FREQ_CAP

    def chunks_of(text):
        ws = text.split(" ")
        n_ch = max(math.ceil(len(ws) / PARA_WORDS), 1)
        return [
            " ".join(ws[i * PARA_WORDS : (i + 1) * PARA_WORDS]) for i in range(n_ch)
        ]

    freq = Counter()
    for _doc_id, text, _lang in docs_rows:
        freq.update(chunks_of(text))

    got = {r["doc_id"]: r for r in registry["line_freq_filter"](spark, SF_DIR).collect()}
    removed_somewhere = 0
    for doc_id, text, _lang in docs_rows:
        cs = chunks_of(text)
        kept = [c for c in cs if freq[c] < LINE_FREQ_CAP]
        r = got[doc_id]
        assert r["n_chunks"] == len(cs)
        assert r["n_kept"] == len(kept), doc_id
        assert r["n_removed"] == len(cs) - len(kept), doc_id
        assert r["max_chunk_freq"] == max(freq[c] for c in cs), doc_id
        assert r["filtered_text"] == " ".join(kept), doc_id
        removed_somewhere += len(cs) - len(kept)
    # the corpus actually exercises the removal branch (chunks at or above
    # the cap exist — otherwise this test proves nothing)
    assert removed_somewhere > 0


def test_hll_distinct_chunks_vs_hashlib(spark, registry, docs_rows):
    """Independent oracle: the HLL sketch rebuilt with hashlib + plain
    Python ints (bit_length for rho), plus the accuracy contract: the
    estimate lands within 2x the theoretical standard error (1.04/sqrt(m))
    of the true cardinality for every language."""
    from usls_doc_spark.operators.web_curation import (
        HLL_HASH_HEX,
        HLL_M,
        HLL_NUMER,
        HLL_RHO_MAX,
        HLL_SCALE_POW,
    )

    regs: dict[str, dict[int, int]] = {}
    exact: dict[str, set[int]] = {}
    for _doc_id, text, lang in docs_rows:
        ws = text.split(" ")
        n_ch = max(math.ceil(len(ws) / PARA_WORDS), 1)
        for i in range(n_ch):
            chunk = " ".join(ws[i * PARA_WORDS : (i + 1) * PARA_WORDS])
            h = int(hashlib.md5(chunk.encode()).hexdigest()[: HLL_HASH_HEX], 16)
            exact.setdefault(lang, set()).add(h)
            bucket, w = h % HLL_M, h // HLL_M
            rho = HLL_RHO_MAX - w.bit_length() if w else HLL_RHO_MAX
            r = regs.setdefault(lang, {})
            r[bucket] = max(r.get(bucket, 0), rho)

    got = {r["lang"]: r for r in registry["hll_distinct_chunks"](spark, SF_DIR).collect()}
    assert set(got) == set(regs)
    for lang, r in regs.items():
        sum_scaled = sum(
            1 << (HLL_SCALE_POW - r.get(b, 0)) for b in range(HLL_M)
        )
        est = float(HLL_NUMER) / float(sum_scaled)
        g = got[lang]
        assert g["m"] == HLL_M
        assert g["zero_registers"] == HLL_M - len(r), lang
        assert g["sum_scaled"] == sum_scaled, lang
        assert g["exact_distinct"] == len(exact[lang]), lang
        assert g["hll_estimate"] == est, lang  # bit-identical IEEE division
        # accuracy: within 2 standard errors of the raw-HLL estimator
        assert abs(est / len(exact[lang]) - 1) <= 2 * 1.04 / math.sqrt(HLL_M), lang


def test_robots_policy_filter_vs_stdlib_longest_match(spark, registry, docs_rows):
    """RFC 9309 longest-match replay in plain Python (startswith + max by
    prefix length) — no SQL shared with the template. Asserts both the
    per-doc winner rule and that the override structure is actually
    exercised (some docs re-allowed by a deep rule under a disallowed
    section, some disallowed, some only root-matched)."""
    rules = (
        [("/", 1)]
        + [(f"/s{k}/", 0) for k in range(10) if k % 3 == 0]
        + [
            (f"/s{k}/c{j}/", 1)
            for k in range(10)
            if k % 3 == 0
            for j in range(100)
            if j % 7 == 0
        ]
    )
    want = {}
    for doc_id, _text, _lang in docs_rows:
        path = f"/s{doc_id % 10}/c{doc_id % 100}/p{doc_id}"
        m = max(
            (r for r in rules if path.startswith(r[0])), key=lambda r: len(r[0])
        )
        want[doc_id] = (path, m[0], m[1])
    got = {
        r["doc_id"]: (r["path"], r["rule_prefix"], r["allowed"])
        for r in registry["robots_policy_filter"](spark, SF_DIR).collect()
    }
    assert got == want
    depths = Counter(v[1].count("/") for v in got.values())
    assert depths[1] > 0 and depths[2] > 0 and depths[3] > 0, depths
