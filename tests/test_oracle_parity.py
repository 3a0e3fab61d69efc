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
