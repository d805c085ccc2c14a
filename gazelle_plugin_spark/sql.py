"""SQL entry point (SURVEY.md §7 design item 3).

``engine.sql(query)`` == ``spark.sql`` over the registered testdata
views with the engine session profile — the analog of running SQL
through the reference plugin (which intercepts only the physical
plan; the SQL surface is stock Spark, SURVEY.md §3 entry point A).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gazelle_plugin_spark.catalog import ALL_TABLES, DEFAULT_SF_DIR, register_views


class SqlEngine:
    """Thin SQL facade: registers the catalog tables as views once and
    exposes ``sql``. Usage::

        eng = SqlEngine(spark, sf_dir)
        eng.sql("SELECT COUNT(*) FROM lineitem").show()
    """

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str = DEFAULT_SF_DIR,
        tables: tuple[str, ...] = ALL_TABLES,
    ) -> None:
        self.spark = spark
        self.sf_dir = sf_dir
        register_views(spark, sf_dir, tables)

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)
