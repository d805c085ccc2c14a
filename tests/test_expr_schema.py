"""Expression-schema conformance: replay the reference's generated
function manifest (sql-functions/sql-expression-schema.md — written by
its forked ExpressionsSchemaSuite.scala) and compare every example's
OUTPUT TYPES against the pinned schema.

The manifest pins one query example per built-in expression (347 rows:
334 with examples, 13 type-constructor aliases documented upstream as
example-less). Output COLUMN NAMES are not compared — Spark renders
auto-generated names differently across versions (the same contract as
plans/sqlgolden.parse_schema) — but every field's data type is. This
is the strongest possible statement of function-surface parity: every
built-in expression the reference ships exists here and returns the
same types.
"""

from __future__ import annotations

import html
import os

import pytest

from gazelle_plugin_spark.plans.sqlgolden import parse_schema
from gazelle_plugin_spark.plans.sqltext import REF_SQL_ROOT

MANIFEST = os.path.join(REF_SQL_ROOT, "sql-functions", "sql-expression-schema.md")

#: Upstream documents these 13 rows as "missing example" (type
#: constructor aliases + the window marker); the manifest carries no
#: query for them, so the sweep checks registration instead.
NO_EXAMPLE = {
    "bigint", "binary", "boolean", "date", "decimal", "double", "float",
    "int", "smallint", "string", "timestamp", "tinyint", "window",
}


def _manifest_rows() -> list[tuple[str, str, str, str]]:
    rows = []
    for line in open(MANIFEST, encoding="utf-8"):
        line = line.strip()
        if not line.startswith("| org."):
            continue
        # cells are pipe-separated; literal pipes inside cells are
        # HTML-escaped by the generator (&#124;)
        cells = [html.unescape(c.strip()) for c in line.strip("|").split(" | ")]
        assert len(cells) == 4, line
        rows.append(tuple(cells))
    return rows


pytestmark = pytest.mark.skipif(
    not os.path.isfile(MANIFEST), reason="reference checkout unavailable"
)


def test_manifest_shape():
    rows = _manifest_rows()
    assert len(rows) == 347, len(rows)
    names = [r[1] for r in rows]
    assert NO_EXAMPLE <= set(names)


def test_every_example_type_exact(spark):
    """All 334 examples run and EVERY output column's data type equals
    the reference's pinned schema — zero divergences (measured round
    10: Spark 3.1 -> 4 changed many auto-generated column NAMES but
    not one of these result TYPES)."""
    rows = _manifest_rows()
    ran = 0
    failures = []
    for _cls, name, example, golden in rows:
        if name in NO_EXAMPLE:
            assert not example.startswith("SELECT"), name
            continue
        gtypes = parse_schema(golden)
        try:
            atypes = [
                f.dataType.simpleString().lower().replace("null", "void")
                for f in spark.sql(example).schema.fields
            ]
        except Exception as e:  # noqa: BLE001 — collected for the report
            failures.append((name, example, "ERROR", str(e).split("\n")[0]))
            continue
        if atypes != gtypes:
            failures.append((name, example, gtypes, atypes))
        ran += 1
    assert not failures, failures[:10]
    assert ran == 334, ran


def test_example_less_rows_are_registered(spark):
    """The 13 example-less rows (type-constructor aliases + window)
    still resolve in the function registry."""
    for name in sorted(NO_EXAMPLE):
        desc = spark.sql(f"DESCRIBE FUNCTION `{name}`").collect()
        assert desc, name


def test_type_constructor_aliases_return_their_type(spark):
    """Beyond registration: each type-constructor alias actually CASTS
    to the type it names (the reason upstream ships no example is only
    that the generator can't auto-derive one)."""
    samples = {
        "bigint": ("1", "bigint"),
        "binary": ("'a'", "binary"),
        "boolean": ("true", "boolean"),
        "date": ("'2016-08-31'", "date"),
        "decimal": ("1", "decimal(10,0)"),
        "double": ("1", "double"),
        "float": ("1", "float"),
        "int": ("1", "int"),
        "smallint": ("1", "smallint"),
        "string": ("1", "string"),
        "timestamp": ("'2016-08-31 00:00:00'", "timestamp"),
        "tinyint": ("1", "tinyint"),
    }
    for name, (arg, expected) in samples.items():
        got = spark.sql(f"SELECT {name}({arg})").schema.fields[0].dataType.simpleString()
        assert got == expected, (name, got, expected)
