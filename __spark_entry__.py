"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``gazelle_plugin_spark`` package; this
module only adapts its registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gazelle_plugin_spark.plans import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H q1 pricing summary) on sf0.001."""
    from gazelle_plugin_spark.catalog import assert_testdata_schema

    # tripwire: fail fast with the drifted column named if the driver
    # regenerated /root/testdata with a changed encoding (it happened
    # in round 4: events.ts NANOS -> MICROS)
    assert_testdata_schema(spark, "/root/testdata/sf0.001")
    return all_queries()["q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (where expressible)."""
    return all_oracles()
