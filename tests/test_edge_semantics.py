"""Edge-semantics pins for the reference's documented divergences
(docs/Expressions-Compatibility.md rows 1-6) and SURVEY.md §7 "hard
parts": decimal CheckOverflow at precision limits (ANSI on/off),
cast-vs-try_cast of malformed strings, get_json_object quote/dup-key
handling, from_unixtime timezone, and the user-format datetime matrix
vs DuckDB. Where Gazelle deviated from vanilla Spark, these tests pin
the SPARK behavior (the reference rows are bugs we must NOT
reproduce)."""

from __future__ import annotations

from contextlib import contextmanager
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType, StructField, StructType


@contextmanager
def _conf(spark, key, value):
    old = spark.conf.get(key)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        spark.conf.set(key, old)


# --------------------------------------------------------------- row 1+§7:
# decimal CheckOverflow at the precision boundary, ANSI on/off

_NEAR_MAX = Decimal("9" * 36 + ".99")  # decimal(38,2) max


def _near_max_df(spark, n=2):
    schema = StructType([StructField("d", DecimalType(38, 2))])
    return spark.createDataFrame([(_NEAR_MAX,)] * n, schema)


def test_decimal_sum_overflow_nullifies_non_ansi(spark):
    """SUM over decimal(38,2) keeps precision 38 — adding two
    near-max values overflows; non-ANSI CheckOverflow yields NULL
    (never a wrong wrapped value)."""
    with _conf(spark, "spark.sql.ansi.enabled", "false"):
        assert _near_max_df(spark).agg(F.sum("d").alias("s")).collect()[0].s is None


def test_decimal_sum_overflow_raises_ansi(spark):
    with _conf(spark, "spark.sql.ansi.enabled", "true"):
        with pytest.raises(Exception, match="(?i)overflow|out_of_range|cannot be represented"):
            _near_max_df(spark).agg(F.sum("d")).collect()


def test_decimal_sum_at_boundary_is_exact(spark):
    """One near-max value (no overflow) survives exactly — no double
    rounding sneaks into the decimal path."""
    got = _near_max_df(spark, n=1).agg(F.sum("d").alias("s")).collect()[0].s
    assert got == _NEAR_MAX


def test_decimal_multiply_overflow_null_vs_ansi(spark):
    """CheckOverflow on multiply: (38,2) x (38,2) exceeds precision
    38 -> non-ANSI NULL, ANSI raises."""
    df = _near_max_df(spark, n=1)
    with _conf(spark, "spark.sql.ansi.enabled", "false"):
        assert df.select((F.col("d") * F.col("d")).alias("p")).collect()[0].p is None
    with _conf(spark, "spark.sql.ansi.enabled", "true"):
        with pytest.raises(Exception, match="(?i)overflow|out_of_range|cannot be represented"):
            df.select((F.col("d") * F.col("d")).alias("p")).collect()


# --------------------------------------------------------------- row 6:
# castINT of "123abc" — Gazelle returned the digit prefix in WSCG;
# Spark returns NULL (non-ANSI) / raises (ANSI) / try_cast NULL.


def test_cast_malformed_string_to_int(spark):
    df = spark.createDataFrame([("123abc",), ("42",)], "s string")
    with _conf(spark, "spark.sql.ansi.enabled", "false"):
        got = {r.s: r.i for r in df.select("s", F.col("s").cast("int").alias("i")).collect()}
        assert got == {"123abc": None, "42": 42}
    with _conf(spark, "spark.sql.ansi.enabled", "true"):
        with pytest.raises(Exception, match="(?i)cast|invalid"):
            df.select(F.col("s").cast("int")).collect()
        got = {r.s: r.i for r in df.select("s", F.col("s").try_cast("int").alias("i")).collect()}
        assert got == {"123abc": None, "42": 42}


# --------------------------------------------------------------- row 2:
# get_json_object quote and duplicate-key handling (Spark semantics)


def test_get_json_object_spark_edges(spark):
    df = spark.range(1)
    cases = {
        # single-quoted JSON: Spark tolerates (Gazelle returned null)
        "single_quote": ("{'k': 5}", "$.k", "5"),
        # duplicate keys: FIRST emerged key wins (Gazelle returned null)
        "dup_first": ('{"k": 1, "k": 2}', "$.k", "1"),
        # object extraction re-serializes compactly
        "obj": ('{"a": {"b": 7, "c": [1, 2]}}', "$.a", '{"b":7,"c":[1,2]}'),
        # wildcard over an array of objects
        "wild": ('{"a": [{"b":1},{"b":2}]}', "$.a[*].b", "[1,2]"),
        # JSON null -> SQL NULL
        "null_lit": ('{"a": null}', "$.a", None),
    }
    row = df.select(
        *[F.get_json_object(F.lit(doc), p).alias(n) for n, (doc, p, _) in cases.items()]
    ).collect()[0]
    for n, (_, _, expected) in cases.items():
        assert row[n] == expected, f"{n}: {row[n]!r} != {expected!r}"


# --------------------------------------------------------------- row 3:
# from_unixtime renders in the SESSION timezone (Gazelle always UTC)


def test_from_unixtime_respects_session_timezone(spark):
    df = spark.createDataFrame([(0,)], "t long")
    with _conf(spark, "spark.sql.session.timeZone", "UTC"):
        assert df.select(F.from_unixtime("t").alias("s")).collect()[0].s == "1970-01-01 00:00:00"
    with _conf(spark, "spark.sql.session.timeZone", "America/Los_Angeles"):
        assert df.select(F.from_unixtime("t").alias("s")).collect()[0].s == "1969-12-31 16:00:00"


# --------------------------------------------------------------- rows 4+5:
# user-specified datetime format matrix, cross-checked against DuckDB
# strftime on the same data (orders.o_orderdate)

_FORMAT_MATRIX = [
    ("yyyy-MM-dd", "%Y-%m-%d"),
    ("yyyy-MM-dd HH:mm:ss", "%Y-%m-%d %H:%M:%S"),
    ("MM/dd/yyyy", "%m/%d/%Y"),
    ("HH:mm", "%H:%M"),
    ("DDD", "%j"),  # zero-padded day-of-year
    ("EEEE", "%A"),  # full weekday name
]


@pytest.mark.parametrize("spark_fmt,duck_fmt", _FORMAT_MATRIX)
def test_date_format_matrix_vs_duckdb(spark, duck, spark_fmt, duck_fmt):
    got = {
        r.k: r.v
        for r in (
            spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
            .filter(F.col("o_orderkey") < 50)
            .select(
                F.col("o_orderkey").alias("k"),
                F.date_format("o_orderdate", spark_fmt).alias("v"),
            )
            .collect()
        )
    }
    expected = dict(
        duck.sql(
            f"SELECT o_orderkey, strftime(o_orderdate, '{duck_fmt}') FROM orders "
            "WHERE o_orderkey < 50"
        ).fetchall()
    )
    assert got == expected


def test_invalid_datetime_pattern_raises(spark):
    """Unsupported pattern letters fail FAST under the default
    CORRECTED parser policy (row 5: Gazelle mis-parsed user formats;
    Spark refuses loudly)."""
    df = spark.createDataFrame([("2020-01-01",)], "s string")
    with pytest.raises(Exception, match="(?i)illegal|unsupported|invalid|bad"):
        df.select(F.date_format(F.col("s").cast("timestamp"), "qqqq-ww")).collect()


def test_unix_timestamp_roundtrip_and_malformed(spark):
    df = spark.createDataFrame(
        [("2020-03-01 12:00:00",), ("not a date",)], "s string"
    )
    with _conf(spark, "spark.sql.ansi.enabled", "false"):
        got = {
            r.s: r.u
            for r in df.select(
                "s", F.unix_timestamp("s", "yyyy-MM-dd HH:mm:ss").alias("u")
            ).collect()
        }    # session TZ is UTC
    assert got == {"2020-03-01 12:00:00": 1583064000, "not a date": None}
