"""Independent oracles for funnel_conversion (staged first-qualifying-
event replay with plain dicts) and cohort_retention (epoch-week replay) —
no code shared with the SQL templates."""

import datetime

import duckdb
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_rows():
    return duckdb.sql(
        f"SELECT user_id, event_type, ts FROM '{SF_DIR}/events.parquet' ORDER BY ts"
    ).fetchall()


def test_funnel_vs_staged_replay(spark, events_rows):
    from usls_doc_spark.queries import build_registry

    per_user = {}
    for user_id, etype, ts in events_rows:
        per_user.setdefault(user_id, []).append((etype, ts))
    expected = {}
    for user_id, evs in per_user.items():
        signups = [t for e, t in evs if e == "signup"]
        if not signups:
            continue
        signup = min(signups)
        views = [t for e, t in evs if e == "view" and t > signup]
        view = min(views) if views else None
        purchase = None
        if view is not None:
            purchases = [t for e, t in evs if e == "purchase" and t > view]
            purchase = min(purchases) if purchases else None
        converted = int(
            purchase is not None
            and purchase <= signup + datetime.timedelta(hours=48)
        )
        expected[user_id] = (signup, view, purchase, converted)

    qs, _ = build_registry()
    got = {
        r["user_id"]: (r["signup_ts"], r["view_ts"], r["purchase_ts"],
                       r["converted"])
        for r in qs["funnel_conversion"](spark, SF_DIR).collect()
    }
    assert got == expected
    # both verdict branches live on the real corpus
    assert any(v[3] == 1 for v in expected.values())
    assert any(v[3] == 0 for v in expected.values())


def test_retention_vs_epoch_week_replay(spark, events_rows):
    from usls_doc_spark.queries import build_registry

    first = {}
    for user_id, _e, ts in events_rows:
        if user_id not in first or ts < first[user_id]:
            first[user_id] = ts

    def week(ts):
        return int(ts.replace(tzinfo=datetime.timezone.utc).timestamp()) // 604800

    cells = {}
    for user_id, _e, ts in events_rows:
        key = (week(first[user_id]), week(ts) - week(first[user_id]))
        cells.setdefault(key, set()).add(user_id)
    expected = {k: len(v) for k, v in cells.items()}

    qs, _ = build_registry()
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_active"]
        for r in qs["cohort_retention"](spark, SF_DIR).collect()
    }
    assert got == expected
    assert all(off >= 0 for _, off in got)
    assert len({off for _, off in got}) > 1  # multi-week retention observed


def test_funnel_retention_plans_window_free(spark):
    """Both are hash-agg + equi-join shapes: no window function, no
    cartesian — the funnel is three chained per-user min aggregates, the
    retention one min agg + one distinct-count agg."""
    from usls_doc_spark.queries import build_registry

    qs, _ = build_registry()
    for name in ("funnel_conversion", "cohort_retention"):
        df = qs[name](spark, SF_DIR)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "windowspecdefinition" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "partial_min" in plan, name
