"""Table catalog for the driver-generated test data (TESTDATA.md).

Parquet scan is the engine's primary source (reference:
arrow-data-source ArrowDataSourceV2 reads parquet/orc/csv through
Arrow Dataset; SURVEY.md §2.1). Spark's vectorized parquet reader is
the direct analog: columnar batches, predicate pushdown, column
pruning — verified by tests/test_sources.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)

EXTENSION_TABLES = ("events", "documents", "embeddings")

ALL_TABLES = TPCH_TABLES + EXTENSION_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


#: SQL conf required to read parquet TIMESTAMP(NANOS) columns (the
#: events table). Engine sessions get it from session.ENGINE_CONFS;
#: ``ensure_nanos_as_long`` covers foreign sessions (e.g. the driver's).
NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def ensure_nanos_as_long(spark: SparkSession) -> None:
    """Enable TIMESTAMP(NANOS)-as-long parquet reads when UNSET.

    Engine-built sessions already carry this conf (session.ENGINE_CONFS);
    for sessions built elsewhere this is the documented capability
    enable for the events table. Only an ABSENT conf is set — a session
    where the caller explicitly chose ``false`` is left alone (their
    other parquet reads keep their timestamp semantics; events reads
    will then surface Spark's native TIMESTAMP(NANOS) error).
    """
    if spark.conf.get(NANOS_CONF, None) is None:
        spark.conf.set(NANOS_CONF, "true")


def _load_one(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) which Spark rejects by
        # default; read it as a long and convert ns -> us with INTEGER
        # division (float division rounds at the 1.7e18 ns scale)
        ensure_nanos_as_long(spark)
        from pyspark.sql import functions as F

        df = spark.read.parquet(table_path(sf_dir, name))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = ALL_TABLES
) -> dict[str, DataFrame]:
    """Load the synthetic tables as DataFrames (lazy scans)."""
    return {name: _load_one(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = ALL_TABLES
) -> None:
    """Register each table as a temp view for ``spark.sql`` entry."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
