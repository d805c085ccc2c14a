"""The correctness gate, locally: every registered query with an
oracle must match DuckDB exactly at sf0.01 (the driver's comparison
scale). Queries without an oracle get a rows>=0 smoke run."""

from __future__ import annotations

import pytest

from gazelle_plugin_spark.plans import all_oracles, all_queries
from tests.compare import assert_same
from tests.conftest import SF_MED

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    df = QUERIES[name](spark, SF_MED)
    if name in ORACLES:
        assert_same(df, duck.sql(ORACLES[name]), name)
    else:
        assert df.count() >= 0


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_not_vacuous(name, duck):
    """A 0-row result passes the hash gate while verifying nothing
    (round-1 q22 lesson) — every oracled query must be non-empty at
    the comparison scale."""
    assert len(duck.sql(ORACLES[name]).fetchall()) >= 1, f"{name} is vacuous at sf0.01"
