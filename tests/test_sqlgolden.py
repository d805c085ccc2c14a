"""Golden-file SQL conformance sweep (plans/sqlgolden.py).

Replays 36 files of the reference's vendored Spark SQL query test
corpus (sql-tests/inputs + results; the reference validates its native
engine by replaying the same files through SQLQueryTestSuite /
NativeSQLConvertedSuite.scala) against the pinned expected outputs:
751 statements — every SELECT compared as typed values, setup DDL
executed, expected-error statements asserted to error.

SKIPS documents every known Spark 3.1 -> 4 behavior divergence — each
entry names the construct and why the golden no longer applies.  The
DuckDB cross-check re-runs the dialect-portable subset on DuckDB and
compares against the Spark results (pinned non-vacuity floor).
"""

from __future__ import annotations

import pytest

from gazelle_plugin_spark.plans import sqlgolden as g

pytestmark = pytest.mark.skipif(
    not g.corpus_available(),
    reason="reference sql-tests corpus not present on this machine",
)

FILES = [
    "group-by",
    "group-by-filter",
    "group-by-ordinal",
    "group-analytics",
    "grouping_set",
    "having",
    "inner-join",
    "outer-join",
    "natural-join",
    "cross-join",
    "join-empty-relation",
    "union",
    "except",
    "except-all",
    "intersect-all",
    "limit",
    "window",
    "predicate-functions",
    "operators",
    "like-all",
    "like-any",
    "inline-table",
    "order-by-ordinal",
    "cte",
    "count",
    "subquery/in-subquery/simple-in",
    "subquery/in-subquery/in-basic",
    "subquery/in-subquery/in-group-by",
    "subquery/in-subquery/not-in-unit-tests-single-column",
    "subquery/in-subquery/not-in-unit-tests-multi-column",
    "subquery/exists-subquery/exists-basic",
    "subquery/exists-subquery/exists-aggregate",
    "subquery/exists-subquery/exists-joins-and-set-ops",
    "subquery/scalar-subquery/scalar-subquery-select",
    "subquery/scalar-subquery/scalar-subquery-predicate",
    "subquery/subquery-in-from",
]

#: Documented Spark 3.1 -> 4 behavior divergences (golden no longer
#: applies on a current Spark).  Key = Case.key (70-char normalized SQL
#: prefix) -> reason.
SKIPS: dict[str, dict[str, str]] = {
    "group-by-filter": {
        # Spark 3.1 rejected aggregate FILTER clauses containing a
        # subquery or an outer-aggregate reference; Spark 4 supports
        # them (the golden pins the old AnalysisException).
        "SELECT emp.dept_id, avg(salary), avg(salary) FILTER (WHERE EXISTS (SEL": "Spark 4 supports EXISTS subqueries in aggregate FILTER (3.1 errored)",
        "SELECT emp.dept_id, Sum(salary), Sum(salary) FILTER (WHERE NOT EXISTS ": "Spark 4 supports NOT EXISTS subqueries in aggregate FILTER (3.1 errored)",
        "SELECT emp.dept_id, avg(salary), avg(salary) FILTER (WHERE emp.dept_id": "Spark 4 supports correlated references in aggregate FILTER (3.1 errored)",
        "SELECT emp.dept_id, Sum(salary), Sum(salary) FILTER (WHERE emp.dept_id": "Spark 4 supports correlated references in aggregate FILTER (3.1 errored)",
    },
    "count": {
        # SPARK-34199: count(tblName.*) is blocked since Spark 3.2
        # (ambiguous under outer joins); golden expects it to work.
        "SELECT count(a, b), count(b, a), count(testData.*) FROM testData": "Spark 4 disallows count(tblName.*) (SPARK-34199; 3.1 allowed it)",
        "SELECT count(DISTINCT a, b), count(DISTINCT b, a), count(DISTINCT *), ": "Spark 4 disallows count(tblName.*) (SPARK-34199; 3.1 allowed it)",
    },
}

#: Spark-vs-DuckDB known dialect divergences excluded from the
#: cross-check (the golden compare above still covers these queries —
#: Spark's behavior is reference-verified; these entries document where
#: DuckDB's dialect legitimately differs).
DUCK_SKIPS: dict[str, dict[str, str]] = {
    "group-by": {
        "SELECT SKEWNESS(a), KURTOSIS(a), MIN(a), MAX(a), AVG(a), VARIANCE(a), ": "DuckDB skewness/kurtosis are sample-based; Spark's are population-based",
        "SELECT 1 FROM range(10) HAVING true": "Spark: HAVING without GROUP BY implies a global aggregate (1 row); DuckDB treats it as WHERE",
        "SELECT k, v, bool_and(v) OVER (PARTITION BY k ORDER BY v) FROM test_ag": "window ORDER BY null placement differs (Spark NULLS FIRST asc, DuckDB NULLS LAST) -> different running frames",
        "SELECT k, v, bool_or(v) OVER (PARTITION BY k ORDER BY v) FROM test_agg": "window ORDER BY null placement differs -> different running frames",
    },
    "grouping_set": {
        "SELECT a + b, b, sum(c) FROM (VALUES (1,1,1),(2,2,2)) AS t(a,b,c) GROU": "GROUPING SETS over a projected expression: DuckDB binds the output column, Spark the input columns",
    },
    "intersect-all": {
        "SELECT * FROM tab1 EXCEPT SELECT * FROM tab2 UNION ALL SELECT * FROM t": "EXCEPT/UNION ALL chain associativity differs between the dialects",
    },
    "limit": {
        "SELECT * FROM mapdata LIMIT 2": "DuckDB renders Arrow maps as {'key': [...], 'value': [...]} structs",
    },
    "window": {
        "SELECT val, cate, sum(val) OVER(PARTITION BY cate ORDER BY val ROWS BE": "window ORDER BY null placement differs -> different ROWS frames",
    },
    "predicate-functions": {
        "select 1.5 = '1.51'": "decimal-vs-string comparison: Spark widens to double (false), DuckDB casts the string to the decimal's scale (true)",
    },
    "count": {
        "SELECT count() FROM testData": "zero-argument count(): Spark counts zero columns (0), DuckDB aliases count(*)",
    },
    "subquery/in-subquery/in-group-by": {
        "SELECT t1a, t1b FROM t1 WHERE t1c IN (SELECT t2c FROM t2 WHERE t1a = t": "correlated IN + GROUP BY resolution differs between the dialects",
    },
}


@pytest.mark.parametrize("rel", FILES)
def test_golden_file(spark, rel):
    results = g.run_file(spark, rel, SKIPS.get(rel, {}))
    bad = [r for r in results if r.status not in ("ok", "setup", "error_ok", "skipped")]
    assert not bad, [(r.status, r.case.key, r.detail) for r in bad]
    # non-vacuity: every file must actually compare values somewhere
    assert any(r.status == "ok" for r in results), f"{rel}: no value-compared case"


def test_golden_corpus_counts(spark):
    """Pin the sweep's aggregate shape so a silently-shrinking corpus
    or an over-eager skip list is caught: >=550 value-compared
    statements and <=10 skips across all 36 files."""
    ok = setup = err = skipped = 0
    for rel in FILES:
        for r in g.run_file(spark, rel, SKIPS.get(rel, {})):
            ok += r.status == "ok"
            setup += r.status == "setup"
            err += r.status == "error_ok"
            skipped += r.status == "skipped"
    assert ok >= 550, ok
    assert err >= 70, err
    assert skipped <= 10, skipped


def test_duckdb_cross_check(spark):
    """Independent-engine second opinion: every portable SELECT in the
    corpus re-runs on DuckDB over Arrow-exported views and must match
    the Spark result.  The floor pins non-vacuity (portable statements
    exist in quantity); unportable statements are dialect rejections,
    not failures."""
    total_checked = 0
    for rel in FILES:
        checked, unportable, failures = g.duck_check(
            spark, rel, SKIPS.get(rel, {}), DUCK_SKIPS.get(rel, {})
        )
        assert not failures, f"{rel}: {failures[:3]}"
        total_checked += checked
    assert total_checked >= 300, total_checked
