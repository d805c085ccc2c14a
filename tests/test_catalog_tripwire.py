"""Testdata schema tripwire + the schema-adaptive events ts loader.

Round-4 lesson: the driver regenerated /root/testdata and events.ts
changed parquet encoding (TIMESTAMP(NANOS) -> TIMESTAMP(MICROS)),
killing every events query at plan time with an opaque
DATATYPE_MISMATCH. The tripwire turns the next drift into a one-line
diagnosis; ts_us_expr keeps both encodings working.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gazelle_plugin_spark import catalog
from tests.conftest import SF_MED, SF_SMALL


def test_tripwire_green_on_current_testdata(spark):
    catalog.assert_testdata_schema(spark, SF_SMALL)
    catalog.assert_testdata_schema(spark, SF_MED)


def test_tripwire_names_drifted_column(spark, monkeypatch):
    """Perturb one expectation — the failure must name table.column
    and both the expected and observed dtypes."""
    perturbed = {**catalog.EXPECTED_SCHEMA}
    perturbed["events"] = {**perturbed["events"], "value": "decimal(10,2)"}
    monkeypatch.setattr(catalog, "EXPECTED_SCHEMA", perturbed)
    with pytest.raises(AssertionError, match=r"events\.value.*decimal\(10,2\).*'double'"):
        catalog.assert_testdata_schema(spark, SF_SMALL)


def test_tripwire_reports_missing_column(spark, monkeypatch):
    perturbed = {**catalog.EXPECTED_SCHEMA}
    perturbed["documents"] = {**perturbed["documents"], "ghost_col": "string"}
    monkeypatch.setattr(catalog, "EXPECTED_SCHEMA", perturbed)
    with pytest.raises(AssertionError, match=r"documents\.ghost_col.*None"):
        catalog.assert_testdata_schema(spark, SF_SMALL)


def test_ts_us_expr_timestamp_branch(spark):
    df = spark.sql(
        "SELECT CAST('2024-01-02 03:04:05.123456' AS TIMESTAMP_NTZ) AS ts"
    )
    [row] = df.select(catalog.ts_us_expr(df).alias("us")).collect()
    assert row.us == 1704164645123456  # naive-as-UTC, matches DuckDB epoch_us


def test_ts_us_expr_bigint_branch(spark):
    df = spark.sql("SELECT CAST(1704164645123456789 AS BIGINT) AS ts")
    [row] = df.select(catalog.ts_us_expr(df).alias("us")).collect()
    assert row.us == 1704164645123456  # integer ns->us division


def test_ts_us_expr_missing_column(spark):
    df = spark.range(1)
    with pytest.raises(KeyError, match="'ts'"):
        catalog.ts_us_expr(df)
