"""Driver-contract regression guard: __spark_entry__ must keep its shape
(entry smoke, queries/oracles dict contract, stable schema, plan-building
callables) — the exact interface the round driver exercises."""

from tests.conftest import SF_DIR


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert [f.name for f in df.schema.fields] == [
        "url",
        "extracted_text",
        "n_blocks",
        "extracted_bytes",
        "error",
    ]
    assert df.count() > 0

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)  # every oracle has a query
    assert len(qs) >= 37
    # column names in each oracle must appear aliased (spot syntax check):
    for name, sql in oracles.items():
        assert sql.strip().upper().startswith(("SELECT", "WITH")), name


def test_all_query_plans_build(spark):
    import __spark_entry__ as e

    qs = e.queries()
    for name, fn in qs.items():
        if name == "streaming_events_window":
            continue  # starts a real stream; covered by its own parity test
        df = fn(spark, SF_DIR)
        assert len(df.schema.fields) > 0, name
