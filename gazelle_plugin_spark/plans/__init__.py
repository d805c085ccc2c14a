"""Query-plan registry.

Every implemented operator/query from SURVEY.md §2 registers here as a
``(spark, sf_dir) -> DataFrame`` builder plus (where SQL-expressible)
a DuckDB oracle SQL string over the same tables. The driver contract
(__spark_entry__.py) re-exports these.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder and its (optional) DuckDB oracle SQL.

    Aggregate/computed columns must carry identical aliases on both
    sides — the driver's compare sorts columns by name before hashing.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import all plan modules so their @query registrations run."""
    from gazelle_plugin_spark.plans import (  # noqa: F401
        tpch,
        ssb,
        tpcds_patterns,
        relational,
        expressions,
        events,
        text_pipeline,
        similarity_queries,
        multimodal,
    )


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLE)
