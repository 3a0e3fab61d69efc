"""Training-mix operators (round 6): independent stdlib/numpy oracles —
the same values the SQL templates compute, derived with NO shared code —
plus plan-shape assertions for the 100 TB arguments."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR
from usls_doc_spark.operators.text_queries import render_duck, render_spark
from usls_doc_spark.operators.training_mix import (
    BPE_TOP_K,
    KMEANS_DIMS,
    KMEANS_K,
    KMEANS_SCALE,
    MIX_LAMBDA_PPM,
)


@pytest.fixture(scope="module")
def docs():
    return duckdb.sql(
        f"SELECT doc_id, text, source FROM '{SF_DIR}/documents.parquet'"
    ).df()


def test_domain_mix_weights_matches_counter_reference(spark, docs):
    from collections import defaultdict

    tok = defaultdict(int)
    n_docs = defaultdict(int)
    for _, r in docs.iterrows():
        tok[r["source"]] += len(r["text"].split(" "))
        n_docs[r["source"]] += 1
    total = sum(tok.values())
    k = len(tok)
    want = {}
    for s in tok:
        w = MIX_LAMBDA_PPM // k + (1_000_000 - MIX_LAMBDA_PPM) * tok[s] // total
        want[s] = (n_docs[s], tok[s], w, w * total // tok[s])

    from usls_doc_spark.queries import _register_views

    _register_views(spark, SF_DIR)
    got = {
        r["source"]: (r["n_docs"], r["n_tokens"], r["weight_ppm"], r["rep_ppm"])
        for r in spark.sql(render_spark("domain_mix_weights")).collect()
    }
    assert got == want
    # smoothing sanity: weights form a (floor-rounded) distribution
    assert 1_000_000 - len(want) * 2 <= sum(v[2] for v in want.values()) <= 1_000_000


def test_bpe_merge_step_matches_counter_reference(spark, docs):
    from collections import Counter

    pairs = Counter()
    for t in docs["text"]:
        for w in t.split(" "):
            for i in range(len(w) - 1):
                pairs[w[i : i + 2]] += 1
    want = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP_K]

    from usls_doc_spark.queries import _register_views

    _register_views(spark, SF_DIR)
    got = [(r["pair"], r["n"]) for r in spark.sql(render_spark("bpe_merge_step")).collect()]
    assert got == want


def test_kmeans_lloyd_step_matches_numpy_reference(spark):
    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet' ORDER BY vec_id"
    ).df()
    vecs = np.stack(emb["embedding"].to_numpy())  # float32 [N, 64]
    # the SQL quantization: round(double(x) * 1e6), half away from zero
    q = np.floor(np.abs(vecs.astype(np.float64)) * KMEANS_SCALE + 0.5).astype(
        np.int64
    ) * np.sign(vecs).astype(np.int64)
    cents = q[:KMEANS_K]
    d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)  # [N, K]
    assign = (d2 * KMEANS_K + np.arange(KMEANS_K)).min(axis=1) % KMEANS_K
    want = {}
    for c in range(KMEANS_K):
        members = q[assign == c]
        if len(members) == 0:
            continue
        for dim in range(KMEANS_DIMS):
            want[(c, dim + 1)] = (
                members[:, dim].sum() / (len(members) * float(KMEANS_SCALE)),
                len(members),
            )

    from usls_doc_spark.queries import _register_views

    _register_views(spark, SF_DIR)
    got = {
        (r["cluster"], r["dim_idx"]): (r["centroid_val"], r["n_members"])
        for r in spark.sql(render_spark("kmeans_lloyd_step")).collect()
    }
    assert set(got) == set(want)
    for key in want:
        assert got[key][1] == want[key][1], key
        assert got[key][0] == pytest.approx(want[key][0], abs=0, rel=0), key


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bpe_merge_plan_bounded_topk_no_window(spark):
    from usls_doc_spark.queries import _register_views

    _register_views(spark, SF_DIR)
    plan = _plan(spark.sql(render_spark("bpe_merge_step")))
    assert "TakeOrderedAndProject" in plan  # bounded heap, no global sort
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 2  # map-side partial combine


def test_kmeans_plan_broadcasts_centroids_no_window(spark):
    from usls_doc_spark.queries import _register_views

    _register_views(spark, SF_DIR)
    plan = _plan(spark.sql(render_spark("kmeans_lloyd_step")))
    assert "Window" not in plan
    # the K-row centroid side reaches every mapper via broadcast, and the
    # assignment never cartesian-expands on the big side
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_domain_mix_plan_single_agg_no_window(spark):
    from usls_doc_spark.queries import _register_views

    _register_views(spark, SF_DIR)
    plan = _plan(spark.sql(render_spark("domain_mix_weights")))
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 2  # partial+final source agg


def test_duck_and_spark_renderings_agree_on_shape():
    for q in ("domain_mix_weights", "bpe_merge_step", "kmeans_lloyd_step"):
        assert render_duck(q) != render_spark(q)  # genuinely two dialects


def test_mix_arithmetic_exact_beyond_int64(spark):
    """r6 ADVICE item 3: the ppm products route through d.wide()
    (DECIMAL(38,0)/HUGEINT) so weight_ppm and rep_ppm stay exact past the
    ~1.3e13-token int64 ceiling — both engines must agree with exact
    python integer arithmetic at 2e15 tokens."""
    import duckdb

    from usls_doc_spark.operators.dialect import DUCK, SPARK
    from usls_doc_spark.operators.training_mix import MIX_LAMBDA_PPM

    n_tokens, total_tokens, n_sources = 2_000_000_000_000_000, 3_141_592_653_589_793, 7
    want_w = MIX_LAMBDA_PPM // n_sources + ((1_000_000 - MIX_LAMBDA_PPM) * n_tokens) // total_tokens
    want_rep = (want_w * total_tokens) // n_tokens

    def exprs(d):
        smooth = d.intdiv(str(MIX_LAMBDA_PPM), "t.n_sources")
        prop = d.intdiv(
            f"{1_000_000 - MIX_LAMBDA_PPM} * {d.wide('s.n_tokens')}",
            "t.total_tokens",
        )
        rep = d.intdiv(f"({smooth} + {prop}) * {d.wide('t.total_tokens')}",
                       "s.n_tokens")
        return (
            f"SELECT CAST({smooth} + {prop} AS BIGINT) AS w, CAST({rep} AS BIGINT) AS r "
            f"FROM (SELECT CAST({n_tokens} AS BIGINT) AS n_tokens) s "
            f"CROSS JOIN (SELECT CAST({total_tokens} AS BIGINT) AS total_tokens, "
            f"{n_sources} AS n_sources) t"
        )

    srow = spark.sql(exprs(SPARK)).collect()[0]
    con = duckdb.connect()
    drow = con.sql(exprs(DUCK)).fetchall()[0]
    assert (srow["w"], srow["r"]) == (want_w, want_rep), (srow, want_w, want_rep)
    assert tuple(drow) == (want_w, want_rep), (drow, want_w, want_rep)


def test_kmeans_ivf_build_matches_numpy_replay(spark):
    """Round-7: the trained-IVF chain (3 exact integer Lloyd iterations ->
    cell assignment -> own-cell top-3 probe) must equal an independent
    numpy replay of the same fixed-point algorithm, and Spark must equal
    DuckDB (the registry parity test re-checks the latter)."""
    from usls_doc_spark.operators.training_mix import KMEANS_ITERS
    from usls_doc_spark.queries import _register_views

    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'")
    emb = con.sql("SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchall()
    V = np.array([r[1] for r in emb], dtype=np.float32).astype(np.float64)
    ids = np.array([r[0] for r in emb])
    scaled = V * KMEANS_SCALE
    # SQL round() = half away from zero (not numpy banker's rounding)
    Q = np.copysign(np.floor(np.abs(scaled) + 0.5), scaled).astype(np.int64)
    C = Q[ids < KMEANS_K][np.argsort(ids[ids < KMEANS_K])]
    cids = np.arange(KMEANS_K)[None, :]

    def assign(cent):
        dist = ((Q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        return (dist * KMEANS_K + cids).min(axis=1) % KMEANS_K

    for _ in range(KMEANS_ITERS):
        cl = assign(C)
        newC = C.copy()
        for c in range(KMEANS_K):
            m = cl == c
            if m.sum():  # empty cluster keeps its previous centroid
                newC[c] = np.floor_divide(Q[m].sum(axis=0), int(m.sum()))
        C = newC
    cell = assign(C)
    expected = []
    for qi in range(10):
        cands = sorted(
            (int(((Q[qi] - Q[g]) ** 2).sum()), int(ids[g]))
            for g in range(len(ids))
            if cell[g] == cell[qi] and ids[g] != qi
        )
        expected += [(qi, nid, int(cell[qi]), dd) for dd, nid in cands[:3]]

    _register_views(spark, SF_DIR)
    got = sorted(
        (r["qid"], r["nid"], r["cell"], r["qdist"])
        for r in spark.sql(render_spark("kmeans_ivf_build")).collect()
    )
    assert got == sorted(expected)


def test_kmeans_ivf_build_plan_broadcasts_no_global_window(spark):
    from usls_doc_spark.queries import _register_views

    _register_views(spark, SF_DIR)
    plan = _plan(spark.sql(render_spark("kmeans_ivf_build")))
    # the K-row centroid sides reach mappers via broadcast each iteration
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the only Window EXEC is the per-query top-3 rank over own-cell
    # candidates (bounded by |G|/K per query) — and Spark's rank-limit
    # pushdown turns it into map-side WindowGroupLimit pruning; the Lloyd
    # iterations themselves are pure hash aggs
    assert plan.count("+- Window ") <= 1
    assert "WindowGroupLimit" in plan  # top-3 pruned before the shuffle
    assert plan.count("HashAggregate") >= 2  # partial+final combine


def test_dedup_semantic_cells_matches_numpy_replay(spark):
    """Round-7 SemDeDup: trained-cell assignment + within-cell cosine
    drops must equal an independent numpy replay (float64 cosine — the
    dot64 discipline makes Spark's doubles bitwise-stable, so exact
    comparison against numpy's differently-associated dot needs only a
    threshold margin check: no corpus pair sits within 1e-9 of the
    threshold, asserted)."""
    from usls_doc_spark.operators.training_mix import (
        KMEANS_ITERS,
        SEMDEDUP_COS,
    )
    from usls_doc_spark.queries import _register_views

    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'")
    emb = con.sql("SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchall()
    V = np.array([r[1] for r in emb], dtype=np.float32).astype(np.float64)
    ids = np.array([r[0] for r in emb])
    scaled = V * KMEANS_SCALE
    Q = np.copysign(np.floor(np.abs(scaled) + 0.5), scaled).astype(np.int64)
    C = Q[ids < KMEANS_K][np.argsort(ids[ids < KMEANS_K])]
    cids = np.arange(KMEANS_K)[None, :]

    def assign(cent):
        dist = ((Q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        return (dist * KMEANS_K + cids).min(axis=1) % KMEANS_K

    for _ in range(KMEANS_ITERS):
        cl = assign(C)
        newC = C.copy()
        for c in range(KMEANS_K):
            m = cl == c
            if m.sum():
                newC[c] = np.floor_divide(Q[m].sum(axis=0), int(m.sum()))
        C = newC
    cell = assign(C)

    nrm = np.sqrt((V * V).sum(axis=1))
    dropped = set()
    margin = []
    for c in range(KMEANS_K):
        mem = np.nonzero(cell == c)[0]
        for x in range(len(mem)):
            for y in range(x + 1, len(mem)):
                a, b = mem[x], mem[y]
                cos = float(V[a] @ V[b]) / (nrm[a] * nrm[b])
                margin.append(abs(cos - SEMDEDUP_COS))
                if cos >= SEMDEDUP_COS:
                    dropped.add(int(ids[max(a, b)]))
    assert min(margin) > 1e-9  # threshold is decision-stable across assoc.
    want = {(int(i), int(cell[k])) for k, i in enumerate(ids) if int(i) not in dropped}

    _register_views(spark, SF_DIR)
    got = {
        (r["vec_id"], r["cell"])
        for r in spark.sql(render_spark("dedup_semantic_cells")).collect()
    }
    assert got == want
    assert dropped  # the corpus genuinely exercises the drop branch
