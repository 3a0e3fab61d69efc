"""Physical-plan assertions: the scale discipline (broadcast small dims,
push filters to the scan, prune columns through opaque UDF stages) must be
visible in the executed plan, not just hoped for (SURVEY.md §4)."""

import pytest

from tests.conftest import SF_DIR


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def analyzed_of(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def test_q3_no_fact_broadcast_hints(spark):
    """Inverse discipline (round-1 VERDICT item 3): orders/customer are
    fact-sized — NO forced broadcast; AQE decides from runtime stats."""
    from usls_doc_spark.operators.relational import q3_top_orders

    df = q3_top_orders(spark, SF_DIR)
    assert "ResolvedHint" not in analyzed_of(df)
    assert "CartesianProduct" not in plan_of(df)


def test_q5_broadcast_hints_only_on_true_dims(spark):
    from usls_doc_spark.operators.relational import q5_region_revenue

    df = q5_region_revenue(spark, SF_DIR)
    analyzed = analyzed_of(df)
    # exactly the two bounded-cardinality dims (region, nation) are hinted
    assert analyzed.count("ResolvedHint") == 2
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    # the hinted dims do become broadcast joins in the physical plan
    assert plan.count("BroadcastExchange") >= 2


def test_q1_pushes_shipdate_filter_and_prunes(spark):
    from usls_doc_spark.operators.relational import q1_pricing_summary

    plan = plan_of(q1_pricing_summary(spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # only the 7 needed columns reach the scan (no l_orderkey/partkey/suppkey)
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read and "l_partkey" not in read
    # partial aggregation (map-side combine) before the exchange
    assert plan.count("HashAggregate") >= 2


def test_extraction_scan_prunes_to_url_html(spark, tmp_path_factory):
    from usls_doc_spark.io.synth import pages_from_documents
    from usls_doc_spark.pipeline.extract import extract_pages

    out = str(tmp_path_factory.mktemp("pages_plan") / "pages")
    pages_from_documents(spark, SF_DIR).write.parquet(out)
    plan = plan_of(extract_pages(spark.read.parquet(out)))
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "url:string" in read and "html:binary" in read
    assert "warc_ts" not in read and "lang" not in read


def test_asof_join_has_no_join_and_one_shuffle(spark):
    """Union-of-streams as-of: NO join operator of any kind (the round-1
    broadcast-range-join fanned out every prior order per user), one
    user_id shuffle feeding the window."""
    from usls_doc_spark.operators.relational import asof_join_purchases

    plan = plan_of(asof_join_purchases(spark, SF_DIR))
    for op in ("Join", "CartesianProduct", "BroadcastExchange"):
        assert op not in plan, op
    assert plan.count("hashpartitioning(user_id") == 1
    assert "Window" in plan


def test_ann_topk_broadcasts_query_side(spark):
    from usls_doc_spark.operators.similarity import SIMILARITY_QUERIES
    from usls_doc_spark.operators.dialect import SPARK
    from usls_doc_spark.queries import _register_views

    _register_views(spark, SF_DIR)
    plan = plan_of(spark.sql(SIMILARITY_QUERIES["ann_topk_cosine"](SPARK)))
    # 10-row query set must be the broadcast side of the crossJoin
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_minhash_join_is_not_cartesian(spark):
    from usls_doc_spark.operators.text_queries import TEXT_QUERIES
    from usls_doc_spark.operators.dialect import SPARK
    from usls_doc_spark.queries import _register_views

    _register_views(spark, SF_DIR)
    plan = plan_of(spark.sql(TEXT_QUERIES["dedup_minhash_lsh"](SPARK)))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_extract_text_prunes_blocks_at_udf_boundary(spark):
    """Catalyst can't prune through mapInPandas; the columns= projection
    must keep the heavy blocks struct out of the UDF's Arrow output."""
    from usls_doc_spark.queries import extract_text

    df = extract_text(spark, SF_DIR)
    assert set(df.schema.fieldNames()) == {"url", "extracted_text"}
    assert "blocks" not in plan_of(df)


def test_layout_instances_scan_prunes_to_doc_id(spark):
    from usls_doc_spark.operators.instances_query import layout_instances

    plan = plan_of(layout_instances(spark, SF_DIR))
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read and "text" not in read and "lang" not in read


def test_table_cells_prefilters_before_arrow(spark):
    """The coarse '<table' predicate must sit JVM-side under the UDF so
    3/4 of pages never cross into python."""
    from usls_doc_spark.pipeline.tables import table_cells

    plan = plan_of(table_cells(spark, SF_DIR))
    ipos = plan.find("MapInPandas")
    fpos = plan.find("Contains")
    assert ipos != -1 and fpos != -1
    # physical plans print children BELOW their parents: the filter line
    # must appear after (= beneath) the MapInPandas operator
    assert fpos > ipos


def test_raster_queries_prune_scan_and_shuffle_once(spark):
    """The pixel-native family: scans prune to (doc_id, text); the ONLY
    exchange is the explicit pre-UDF repartition (zero shuffles after the
    Arrow crossing — the path is embarrassingly parallel)."""
    from usls_doc_spark.pipeline.raster_layout import raster_layout_blocks
    from usls_doc_spark.pipeline.raster_ocr import raster_extract_text, raster_ocr_spans

    for fn in (raster_ocr_spans, raster_layout_blocks, raster_extract_text):
        plan = plan_of(fn(spark, SF_DIR))
        read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
        assert "doc_id" in read and "text" in read and "lang" not in read, fn.__name__
        assert plan.count("Exchange") == 1, fn.__name__  # the repartition only


def test_decontaminate_no_cartesian_single_pass(spark):
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    plan = plan_of(qs["decontaminate_ngram_overlap"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "lang" not in read  # only doc_id + text reach the scan


def test_corpus_curation_anti_join_is_not_null_aware(spark):
    """Round-3 VERDICT item 2: `NOT IN (subquery)` planned as a null-aware
    anti join (NAAJ) — Spark can ONLY execute NAAJ as a broadcast of the
    full duplicate set (corpus-scale on a near-dup-heavy crawl). The NOT
    EXISTS rewrite must plan as an ordinary (shuffleable) LeftAnti: the
    BroadcastHashJoin NAAJ flag prints as a trailing `true`."""
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    plan = plan_of(qs["corpus_curation"](spark, SF_DIR))
    assert "LeftAnti" in plan
    assert "LeftAnti, BuildRight, true" not in plan  # isNullAwareAntiJoin
    assert "BroadcastNestedLoopJoin" not in plan


def test_split_and_pack_prefix_sum_is_distributed(spark):
    """Round-3 VERDICT item 3: the packing prefix sum must NOT be a single
    window per split (3 partitions, 96% in 'train' -> one sequential task
    at scale). The two-level scan shows as: the per-DOC window partitioned
    on (split, rng) — parallel — and a per-split window only over the tiny
    range_tot subtotals."""
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    plan = plan_of(qs["split_and_pack"](spark, SF_DIR))
    win_lines = [l for l in plan.splitlines() if "windowspecdefinition" in l]
    assert win_lines, "no Window operators found"
    doc_wins = [l for l in win_lines if "doc_id" in l]
    assert doc_wins, "per-doc window missing"
    # every window that orders over doc_id must partition on rng too
    for l in doc_wins:
        assert "rng" in l.split("windowspecdefinition")[1][:120], l
    # per-split-only windows may exist ONLY over the range subtotals
    for l in win_lines:
        if l not in doc_wins:
            assert "rng_tokens" in l, f"per-split window over doc rows: {l}"


def test_url_canonicalize_one_shuffle_no_join(spark):
    """URL canonicalization is per-row string work + ONE window shuffle on
    canonical_url — no join anywhere, and the scan reads only doc_id (the
    raw URLs are synthesized from it)."""
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    plan = plan_of(qs["url_canonicalize"](spark, SF_DIR))
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("hashpartitioning(canonical_url") == 1
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read and "text" not in read and "lang" not in read


def test_paragraph_dedup_first_occurrence_is_hash_agg_not_window(spark):
    """Round-4 VERDICT item 1: the global first-occurrence must be a
    min-key aggregate with MAP-SIDE PARTIAL aggregation (hot boilerplate
    chunks collapse to one row per mapper), never a row_number window on
    the chunk hash (a window partition is one task — the one shuffle
    shape AQE cannot split). The keep flag comes back via an equi-join."""
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    plan = plan_of(qs["paragraph_dedup"](spark, SF_DIR))
    assert "windowspecdefinition" not in plan and "row_number" not in plan
    assert "partial_min" in plan  # map-side combine on the chunk hash
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read and "text" in read and "lang" not in read


def test_stratified_sample_is_shuffle_free(spark):
    """Hash-bucket sampling is a pure map: zero exchanges at any scale."""
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    plan = plan_of(qs["stratified_sample"](spark, SF_DIR))
    assert "Exchange" not in plan
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "text" not in read and "source" not in read


def test_inverted_index_bounded_topk_no_window(spark):
    """Round-4 VERDICT item 2: the postings head must be the two-level
    salted top-k (per-(term, salt) sorted head arrays merged per term),
    never a row_number window over bare term — a stopword term would ship
    its whole posting list into one window task before the cap applied."""
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    plan = plan_of(qs["inverted_index"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "windowspecdefinition" not in plan and "row_number" not in plan
    # level-1 aggregate keys on (term, salt expression) with map-side combine
    assert "partial_collect_list" in plan
    assert "_groupingexpression" in plan  # the doc_id % SALTS grouping key


def test_url_canonicalize_agg_is_pure_hash_agg(spark):
    """The Zipf-head scale path: first-fetch-wins as min/min_by aggregate
    — one exchange with map-side combine, no window, no join."""
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    plan = plan_of(qs["url_canonicalize_agg"](spark, SF_DIR))
    assert "windowspecdefinition" not in plan and "Join" not in plan
    assert "partial_min_by" in plan and "partial_min(" in plan
    assert plan.count("Exchange") == 1
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read and "text" not in read and "lang" not in read


def test_tfidf_top_terms_equi_join_and_per_doc_window(spark):
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    plan = plan_of(qs["tfidf_top_terms"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the top-k window partitions per doc, never a global sort of all terms
    win = [l for l in plan.splitlines() if "windowspecdefinition" in l]
    assert win and all("doc_id" in l for l in win)


def test_components_edges_plan_is_equi_join(spark):
    from usls_doc_spark.operators.dialect import SPARK as SPARK_D
    from usls_doc_spark.operators.text_queries import build_verified_pairs
    from usls_doc_spark.queries import _register_views

    _register_views(spark, SF_DIR)
    plan = plan_of(spark.sql(build_verified_pairs(SPARK_D)))
    assert "CartesianProduct" not in plan


def test_pii_redact_is_shuffle_free_pruned_map(spark):
    """PII redaction is a single projection: zero exchanges, no window, no
    join, and the scan reads only (doc_id, text) — at 100 TB it is a pure
    map over the parquet scan, limited by I/O alone."""
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    plan = plan_of(qs["pii_redact"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "Window" not in plan and "Join" not in plan
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read and "text" in read and "lang" not in read


def test_host_graph_pagerank_aggregates_not_windows(spark):
    """Each PR iteration must be equi-joins + a hash aggregate with
    map-side partial combine on the hot dst key — never a window, never a
    cartesian; integer SUMs keep it bit-exact at any partitioning."""
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    plan = plan_of(qs["host_graph_pagerank"](spark, SF_DIR))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "partial_sum" in plan or "partial_merge" in plan


def test_ngram_counts_global_topk_is_take_ordered(spark):
    """The global bigram head must execute as TakeOrderedAndProject
    (per-partition bounded heap), never a full sort or a window over the
    unbounded vocabulary — the only Window sits above the LIMIT."""
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    plan = plan_of(qs["ngram_counts"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan  # map-side combine on the bigram agg
    # the one Window is fed by the TakeOrdered (bounded 100 rows), which
    # appears below it in the plan tree
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")


def test_line_freq_filter_counts_are_hash_agg_not_window(spark):
    """The C4-style corpus-frequency filter must count chunk frequencies
    as a hash aggregate with MAP-SIDE PARTIAL combine (a corpus-wide
    boilerplate chunk collapses to one row per mapper) and bring the keep
    flag back via an equi-join — never a count(*) OVER window on the
    chunk hash (one hot chunk = one window task, the shuffle shape AQE
    cannot split; skewed JOINS it can)."""
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    plan = plan_of(qs["line_freq_filter"](spark, SF_DIR))
    assert "windowspecdefinition" not in plan and "row_number" not in plan
    assert "partial_count" in plan  # map-side combine on md5(chunk)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the frequency side prunes to text alone (doc_id never reaches it)
    reads = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert any("text" in r and "doc_id" not in r for r in reads)
    assert all("lang" not in r for r in reads)


def test_hll_sketch_is_bounded_aggregates_only(spark):
    """The HLL register build must be pure hash aggregation: partial max
    per (lang, bucket) map-side (sketch state is langs x 32 rows total,
    independent of corpus size), no window, no join anywhere; the scan
    prunes to (text, lang)."""
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    plan = plan_of(qs["hll_distinct_chunks"](spark, SF_DIR))
    assert "windowspecdefinition" not in plan
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "partial_max" in plan  # register combine before the shuffle
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "text" in read and "lang" in read and "doc_id" not in read


def test_dup_char_kgram_is_hash_agg_not_window(spark):
    """The char-k-gram dedup signal must carry the word form's shape:
    window doc-frequencies as map-side-combinable hash aggregates (a
    corpus-wide boilerplate substring collapses per mapper), verdict via
    an AQE-splittable hash equi-join — never a count OVER window on the
    hash, and never a cartesian."""
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    plan = plan_of(qs["dup_char_kgram_fraction"](spark, SF_DIR))
    assert "windowspecdefinition" not in plan and "row_number" not in plan
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    reads = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert all("lang" not in r and "source" not in r for r in reads)


def test_lm_fluency_equi_joins_no_window(spark):
    """LM scoring must be pure count aggregates + hash equi-joins on the
    bigram/context/word keys (all AQE-splittable); the 1-row vocab-size
    side may ride a broadcast; never a window, never a cartesian against
    anything bigger than that 1-row side."""
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    plan = plan_of(qs["lm_bigram_fluency"](spark, SF_DIR))
    assert "windowspecdefinition" not in plan and "row_number" not in plan
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan
    # the only nested-loop join allowed is the 1-row vocab-size broadcast
    import re

    nlj = len(re.findall(r"BroadcastNestedLoopJoin", plan))
    assert nlj <= 1
    reads = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert all("lang" not in r and "source" not in r for r in reads)
