"""Shared helpers for query builders.

Exact-aggregation convention: the driver compares Spark vs DuckDB by
value-hash, so float aggregates must be bit-deterministic. Money-like
doubles (2 fractional digits) are cast to DECIMAL before SUM — decimal
addition is exact and associative in both engines — then the final
result is cast back to DOUBLE. Both sides of every oracle pair follow
the same convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gazelle_plugin_spark.catalog import table_path


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


def dec(col: str | Column, prec: int = 12, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def dsum(col: str | Column) -> Column:
    """Exact SUM of a money-like double, returned as double."""
    return F.sum(dec(col)).cast("double")


def davg(col: str | Column) -> Column:
    """Deterministic AVG: exact decimal sum divided by count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c)).cast("double") / F.count(c)


def one_minus(col: str) -> Column:
    """(1 - rate) as decimal(4,2) — rates have two fractional digits."""
    return (F.lit(1.0) - F.col(col)).cast("decimal(4,2)")


def one_plus(col: str) -> Column:
    return (F.lit(1.0) + F.col(col)).cast("decimal(4,2)")


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal product."""
    return dec("l_extendedprice") * one_minus("l_discount")


#: SQL fragments mirroring the helpers above (DuckDB side).
SQL_DISC_PRICE = "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))"
SQL_CHARGE = SQL_DISC_PRICE + " * CAST(1 + l_tax AS DECIMAL(4,2))"


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE)"


def sql_davg(col: str) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(12,2))) AS DOUBLE) / COUNT({col})"


def md5h60(col: str | Column) -> Column:
    """Deterministic cross-engine 60-bit hash: first 15 hex chars of
    md5, as a bigint. DuckDB twin: ``sql_md5h60``. Used wherever both
    engines must agree on hash VALUES (minhash, simhash) — Spark's
    murmur3 ``hash()`` and DuckDB's ``hash()`` differ, md5 doesn't."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def sql_md5h60(expr: str) -> str:
    """DuckDB twin of :func:`md5h60`."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"
