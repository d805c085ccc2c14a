"""Driver-session robustness: the correctness driver builds its OWN
SparkSession, which on Spark 4 defaults to ANSI mode — every
registered query must produce identical results with ANSI on (the
round-2 expr_conditional lesson: a non-ANSI-only cast fails the gate
even though the engine session sets ansi=false)."""

from __future__ import annotations

import pytest

from gazelle_plugin_spark.plans import all_queries
from tests.conftest import SF_MED

#: representative slice: decimal-heavy agg, div-in-agg, casts,
#: datetime, JSON, dedup hashing
ANSI_SENSITIVE = ["q1", "q14", "expr_conditional", "expr_math", "events_json_stats", "doc_quality"]


@pytest.fixture()
def ansi(spark):
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", old)


@pytest.mark.parametrize("name", ANSI_SENSITIVE)
def test_query_runs_identically_under_ansi(name, spark, ansi):
    q = all_queries()[name]
    with_ansi = [tuple(r) for r in q(ansi, SF_MED).collect()]
    ansi.conf.set("spark.sql.ansi.enabled", "false")
    without = [tuple(r) for r in q(spark, SF_MED).collect()]
    assert with_ansi == without
