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


#: Query families whose implementations RE-REGISTER the shared
#: compatibility temp views on every call (run_text /
#: run_tpcds_text / run_tpcds_full / run_tpcds_v27, and the tpch/ssb
#: view layers deliberately shadow each other): concurrent execution
#: races on createOrReplaceTempView (a view is briefly absent
#: mid-replacement — AnalysisException), so these replay SERIALLY.
_SERIAL_PREFIXES = ("sqltext_", "dstext_", "tpcdsfull_", "dsv27_")


@pytest.fixture(scope="session")
def spark_results(spark):
    """Prewarm of every query's Spark-side result: the independent
    ones concurrently (guide 2.6 overlap-independent-jobs: per-query
    wall at sf0.01 is mostly plan/JVM latency, which threads hide),
    the view-re-registering text replays serially (see
    _SERIAL_PREFIXES). Results are pandas frames (or the exception
    the query raised, re-raised in that query's own test). The DuckDB
    side stays serial inside each test — one shared connection, and
    it is not the bottleneck."""
    from concurrent.futures import ThreadPoolExecutor

    names = sorted(QUERIES)
    pooled = [n for n in names if not n.startswith(_SERIAL_PREFIXES)]
    serial = [n for n in names if n.startswith(_SERIAL_PREFIXES)]

    def run(name):
        try:
            df = QUERIES[name](spark, SF_MED)
            return df.toPandas() if name in ORACLES else df.count()
        except Exception as ex:  # noqa: BLE001 - surfaced in the query's test
            return ex

    with ThreadPoolExecutor(max_workers=6) as pool:
        results = dict(zip(pooled, pool.map(run, pooled)))
    for name in serial:
        results[name] = run(name)
    return results


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
