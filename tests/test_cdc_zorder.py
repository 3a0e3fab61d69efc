"""Independent oracles for cdc_upsert_compact (dict replay of the change
log — no code shared with the two-dialect template) and zorder_cluster
(python bit-interleave replay + the 32x32 block-span data-skipping
property), plus plan-shape assertions for both."""

from hashlib import md5

import duckdb
import pytest

from tests.conftest import SF_DIR
from usls_doc_spark.operators.text_queries import (
    CDC_NEW_BASE,
    ZORDER_BUCKET_SHIFT,
)


@pytest.fixture(scope="module")
def docs_rows():
    return duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()


def test_cdc_upsert_vs_dict_replay(spark, docs_rows):
    from usls_doc_spark.queries import build_registry

    state = {}
    for doc_id, text in docs_rows:          # base snapshot, version 1
        state[doc_id] = (1, "I", text)
    for doc_id, text in docs_rows:          # v2 updates
        if doc_id % 3 == 0:
            state[doc_id] = (2, "U", "v2 " + text)
    for doc_id, _text in docs_rows:         # v3 tombstones win over updates
        if doc_id % 7 == 0:
            state[doc_id] = (3, "D", "")
    for doc_id, text in docs_rows:          # fresh inserts
        if doc_id % 11 == 0:
            state[doc_id + CDC_NEW_BASE] = (1, "I", "new " + text)
    expected = {
        k: (v, op, md5(t.encode()).hexdigest(), len(t.split(" ")))
        for k, (v, op, t) in state.items()
        if op != "D"
    }
    # every CDC branch is genuinely exercised by the corpus
    assert any(doc_id % 21 == 0 for doc_id, _ in docs_rows), "no update+delete overlap"
    assert any(v[1] == "U" for v in expected.values())
    assert any(k >= CDC_NEW_BASE for k in expected)
    assert len(expected) < len(state)  # tombstones dropped something

    qs, _ = build_registry()
    got = {
        r["doc_id"]: (r["version"], r["op"], r["text_hash"], r["n_tokens"])
        for r in qs["cdc_upsert_compact"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_cdc_upsert_plan_is_hash_agg_not_window(spark):
    """Latest-version-wins must be max/max_by with map-side partial
    aggregation — the compaction shape that survives hot keys — never a
    rank window over the key."""
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    df = qs["cdc_upsert_compact"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition" not in plan and "row_number" not in plan
    assert "partial_max_by" in plan and "partial_max(" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan


def _interleave(x, y):
    z = 0
    for i in range(8):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_vs_python_replay(spark):
    from usls_doc_spark.queries import build_registry

    rows = duckdb.sql(
        f"SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    buckets = {}
    for user_id, epoch_s in rows:
        x, y = user_id & 255, (epoch_s // 3600) & 255
        z = _interleave(x, y)
        b = buckets.setdefault(z >> ZORDER_BUCKET_SHIFT, [])
        b.append((z, x, y))
    expected = {}
    for k, zs in buckets.items():
        expected[k] = (
            len(zs),
            min(z for z, _, _ in zs), max(z for z, _, _ in zs),
            max(x for _, x, _ in zs) - min(x for _, x, _ in zs),
            max(y for _, _, y in zs) - min(y for _, _, y in zs),
        )
    assert len(expected) > 1

    qs, _ = build_registry()
    got = {
        r["bucket"]: (r["n_events"], r["z_min"], r["z_max"],
                      r["x_span"], r["y_span"])
        for r in qs["zorder_cluster"](spark, SF_DIR).collect()
    }
    assert got == expected
    # THE z-order guarantee: every bucket is one aligned 32x32 (x, y)
    # block, so BOTH dimensions' spans are bounded — the min/max pruning
    # property a lexicographic sort gives only its leading column
    assert all(v[3] <= 31 and v[4] <= 31 for v in got.values())


def test_zorder_plan_pure_map_plus_one_agg(spark):
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    df = qs["zorder_cluster"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition" not in plan
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "partial_count" in plan and "partial_min" in plan
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "user_id" in read and "ts" in read and "props" not in read
