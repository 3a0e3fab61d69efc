"""Every oracled query in the driver registry must match DuckDB exactly —
this is the same comparison the driver's CORRECTNESS gate performs
(row-count + schema + order-insensitive values), run at sf0.001 for speed
(the driver uses sf0.01)."""

import pytest

from tests.conftest import SF_DIR
from tests.oracle_utils import compare, duck_con


def _registry():
    from usls_doc_spark.queries import build_registry

    return build_registry()


QUERIES, ORACLES = _registry()


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_DIR)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, con, name):
    ok, msg = compare(QUERIES[name](spark, SF_DIR), con.sql(ORACLES[name]))
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


# DuckDB types pandas cannot materialize as int64: HUGEINT/UHUGEINT come
# back float64 and DECIMAL comes back object/float — either way the
# driver's type-sensitive hash diverges from Spark's integer result even
# when every value matches (round-5's host_graph_pagerank red row: DuckDB
# promotes SUM(BIGINT) to HUGEINT and the final projection shipped it
# uncast). Invariant 2 says cast exact aggregates at the end; this test
# enforces it REGISTRY-WIDE at the oracle-relation level so the class of
# bug can never reach the driver again.
_BANNED_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_types_driver_safe(con, name):
    rel = con.sql(ORACLES[name])
    offenders = [
        f"{col}:{dtype}"
        for col, dtype in zip(rel.columns, map(str, rel.types))
        if any(b in str(dtype).upper() for b in _BANNED_DUCK_TYPES)
    ]
    assert not offenders, (
        f"{name}: oracle output column(s) {offenders} would materialize as "
        "float64/object in pandas while Spark returns exact integers — add a "
        "terminal CAST (invariant 2)"
    )
