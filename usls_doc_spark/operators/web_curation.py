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

from .dialect import Dialect

# ---------------------------------------------------------------------------
# URL canonicalization + URL-level dedup
# ---------------------------------------------------------------------------


def _sep(d: Dialect, ch: str) -> str:
    """Spark's split() takes a Java regex while DuckDB's string_split is
    literal: regex metacharacters need a per-dialect spelling."""
    if d.name == "spark" and ch in "?.|()[]{}^$*+":
        return "'[" + ch + "]'"
    return "'" + ch + "'"


def q_url_canonicalize(d: Dialect) -> str:
    """URL canonicalization + URL-level dedup — stage 1 of a crawl-curation
    pipeline (the reference consumes post-fetch documents; a 100 TB corpus
    first collapses the crawl frontier by canonical URL).

    Input construction: the crawl log's raw URLs are synthesized
    DETERMINISTICALLY per doc_id inside the query (mixed-case scheme/host,
    optional www. prefix and :443 default port, trailing slash, utm_*/ref
    tracking params, kept params in varying order, fragments), with the
    ten raw variants of page_id = doc_id div 10 all collapsing onto ONE
    canonical URL — the same rebuild-the-input pattern as the multimodal
    page-byte oracle. The OPERATOR then parses the raw URL STRING back
    apart (split on '://', '/', ':', '#', '?', '&' — no regex, no UDF) and
    canonicalizes: lowercase scheme/host/path, strip the default port,
    strip leading 'www.', drop the fragment, drop utm_*/ref params, sort
    the surviving params, strip the trailing slash; registered domain =
    last two host labels. Dedup rank = row_number per canonical_url
    ordered by doc_id (the crawl's "first fetch wins" rule).

    Scale shape: one scan; all parsing is per-row string/array work inside
    whole-stage codegen; ONE shuffle for the canonical_url window. Group
    size is bounded by the variant fan-in (here 10; real crawls are
    Zipf-ish — AQE skew-split covers the pathological head, and since the
    rank-1 row is the only downstream consumer a min_by aggregation is the
    drop-in alternative)."""
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
    # kept params appear in parity-dependent raw order; canonicalization
    # sorts them, so both orders collapse
    items_even = ", ".join([utm_item, id_item, ref_item, "'v=1'"])
    items_odd = ", ".join(["'v=1'", utm_item, id_item, ref_item])
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
    kept_params = d.array_filter(
        d.split("qs", "'&'"), "p", "NOT p LIKE 'utm_%' AND NOT p LIKE 'ref=%'"
    )
    labels = d.split("host", dot)
    n_labels = d.array_len(labels)
    return f"""
WITH raw AS (
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
)
SELECT doc_id, raw_url, canonical_url, host, registered_domain,
       CAST(row_number() OVER (PARTITION BY canonical_url ORDER BY doc_id)
            AS BIGINT) AS dup_rank,
       CAST(count(*) OVER (PARTITION BY canonical_url) AS BIGINT) AS dup_count,
       CASE WHEN row_number() OVER (PARTITION BY canonical_url ORDER BY doc_id) = 1
            THEN 1 ELSE 0 END AS url_kept
FROM canon
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

    Scale shape: explode to one row per chunk (corpus rows x ~n_words/16),
    ONE shuffle keyed on md5(chunk) for the first-occurrence window
    (high-cardinality key, tiny partitions; AQE skew-split covers
    degenerate boilerplate chunks that repeat corpus-wide), then ONE
    shuffle back on doc_id for the ordered re-assembly. No self-join, no
    pairwise term; per-group memory is bounded by per-doc chunk count on
    the re-assembly side and duplicate multiplicity on the hash side."""
    P = PARA_WORDS
    w = d.split("text")
    n_ch = f"greatest(CAST(ceil({d.array_len('ws')} / {P}.0) AS INT), 1)"
    if d.name == "spark":
        chunk_i = f"array_join(slice(ws, (idx - 1) * {P} + 1, {P}), ' ')"
    else:
        chunk_i = (
            f"array_to_string(ws[(idx - 1) * {P} + 1 : (idx - 1) * {P} + {P}], ' ')"
        )
    kept = "CASE WHEN occ = 1 THEN 1 END"
    return f"""
WITH docs AS (
  SELECT doc_id, {w} AS ws FROM documents
),
chunked AS (
  SELECT doc_id, idx, {chunk_i} AS chunk
  FROM docs {d.explode(d.seq("1", n_ch), "idx")}
),
ranked AS (
  SELECT doc_id, idx, chunk,
         row_number() OVER (PARTITION BY {d.md5("chunk")}
                            ORDER BY doc_id, idx) AS occ
  FROM chunked
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count({kept}) AS BIGINT) AS n_kept,
       COALESCE({d.ordered_string_agg("chunk", "idx", where="occ = 1")}, '')
         AS dedup_text,
       CAST(count({kept}) AS DOUBLE) / count(*) AS kept_fraction
FROM ranked
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


def q_inverted_index(d: Dialect) -> str:
    """Corpus inverted index: per term, the collection frequency (tf),
    document frequency (df), df fraction, and the first 16 doc_ids of the
    postings list (comma-joined ascending) — the audit index a curation
    pipeline builds over the kept set (which terms live where, how
    concentrated the corpus is).

    Scale shape: explode -> ONE hash aggregate with map-side partial
    aggregation for tf/df; the postings head is capped BEFORE aggregation
    (row_number over term on the distinct (term, doc) set, keep rank <=
    16) so no unbounded per-term list is ever materialized; the distinct,
    the window and the final groupBy all hash on the same term key so the
    ranked branch reuses one exchange. df_frac is a single division of two
    exact BIGINTs (bit-identical IEEE in both engines)."""
    w = d.split("text")
    postings = d.ordered_string_agg(d.str_cast("doc_id"), "doc_id", sep="','")
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
ranked AS (
  SELECT term, doc_id,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rk
  FROM (SELECT DISTINCT term, doc_id FROM tokens) td
),
heads AS (
  SELECT term, {postings} AS postings_head
  FROM ranked WHERE rk <= {POSTINGS_CAP}
  GROUP BY term
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


WEB_QUERIES = {
    "url_canonicalize": q_url_canonicalize,
    "paragraph_dedup": q_paragraph_dedup,
    "stratified_sample": q_stratified_sample,
    "inverted_index": q_inverted_index,
    "tfidf_top_terms": q_tfidf_top_terms,
}
