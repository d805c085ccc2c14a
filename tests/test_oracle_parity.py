"""The correctness gate, locally: every registered query with an
oracle must match DuckDB exactly at sf0.01 (the driver's comparison
scale). Queries without an oracle get a rows>=0 smoke run."""

from __future__ import annotations

import pytest

from gazelle_plugin_spark.plans import all_oracles, all_queries
from tests.compare import assert_same_pdf
from tests.conftest import SF_MED

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="session")
def spark_results(spark):
    """Concurrent prewarm of every query's Spark-side result (guide
    2.6 overlap-independent-jobs: per-query wall at sf0.01 is mostly
    plan/JVM latency, which threads hide). Results are pandas frames
    (or the exception the query raised, re-raised in that query's own
    test). The DuckDB side stays serial inside each test — one shared
    connection, and it is not the bottleneck."""
    from concurrent.futures import ThreadPoolExecutor

    names = sorted(QUERIES)

    def run(name):
        try:
            df = QUERIES[name](spark, SF_MED)
            return df.toPandas() if name in ORACLES else df.count()
        except Exception as ex:  # noqa: BLE001 - surfaced in the query's test
            return ex

    with ThreadPoolExecutor(max_workers=6) as pool:
        return dict(zip(names, pool.map(run, names)))


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark_results, duck):
    res = spark_results[name]
    if isinstance(res, Exception):
        raise res
    if name in ORACLES:
        assert_same_pdf(res, duck.sql(ORACLES[name]), name)
    else:
        assert res >= 0


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_not_vacuous(name, duck):
    """A 0-row result passes the hash gate while verifying nothing
    (round-1 q22 lesson) — every oracled query must be non-empty at
    the comparison scale."""
    assert len(duck.sql(ORACLES[name]).fetchall()) >= 1, f"{name} is vacuous at sf0.01"
