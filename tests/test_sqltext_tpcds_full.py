"""The reference's FULL TPC-DS corpus (103 files) vs DuckDB
(plans/sqltext_tpcds_full.py): every runnable text executes verbatim
on both engines over the same widened compatibility catalog. Same
compare policy as tests/test_sqltext_tpcds.py: positional columns,
exact non-numeric, 1e-6 tolerance on numerics.

Documented divergences (each pinned below, not silently skipped):

- EMPTY_ROLLUP_DIVERGENT (q14a/q27/q36 verbatim): over an EMPTY
  filtered input, DuckDB emits the SQL-standard grand-total row of a
  ROLLUP while Spark emits none. The fitted variants (non-empty
  input) agree exactly; the verbatim divergence is asserted so a
  behavior change in either engine surfaces.
- LIMIT_TIE (q75): ORDER BY on a heavily-tied key + LIMIT truncates
  an engine-dependent row SET; row count and tie-key totals are
  compared instead of the full frame.
"""

from __future__ import annotations

import re

import duckdb
import numpy as np
import pandas as pd
import pytest

from gazelle_plugin_spark.catalog import ALL_TABLES, table_path
from gazelle_plugin_spark.plans import sqltext_tpcds_full as fx

from .conftest import SF_MED

pytestmark = [
    pytest.mark.skipif(
        not fx.tpcds_full_corpus_available(),
        reason="reference TPC-DS SQL corpus not present on this machine",
    ),
    pytest.mark.conformance,
]

EMPTY_ROLLUP_DIVERGENT = frozenset({"q14a", "q27", "q36"})
LIMIT_TIE = frozenset({"q75"})

#: Per-query tolerance overrides. q18 averages columns the TEXT casts
#: to a LOWER decimal scale (avg(cast(cs_list_price as decimal(12,2)))
#: over a scale-3 column): on exact .005 boundaries Spark rounds
#: HALF_UP while DuckDB rounds HALF_EVEN, so individual rows differ by
#: 0.01 and group averages by up to 0.01 — a representation
#: divergence in the engines' CAST semantics, not a value bug.
TOL_OVERRIDE: dict[str, dict] = {"q18": {"rtol": 1e-6, "atol": 0.011}}


@pytest.fixture(scope="module")
def dsduck():
    """Module-private DuckDB session with Spark's null ordering (see
    tests/test_sqltext_tpcds.py::dsduck)."""
    con = duckdb.connect()
    con.execute("SET default_null_order='nulls_first_on_asc_last_on_desc'")
    for name in ALL_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{table_path(SF_MED, name)}')"
        )
    yield con
    con.close()


#: (name, fitted) -> pandas frame (or raised exception): the Spark
#: side of every compare, prewarmed CONCURRENTLY once per module (the
#: per-text wall is mostly plan latency, which threads hide — guide
#: 2.6). Views register once, serially, before the pool.
_SPARK_PDFS: dict[tuple[str, bool], object] = {}


@pytest.fixture(scope="module")
def spark_pdfs(spark):
    from concurrent.futures import ThreadPoolExecutor

    from gazelle_plugin_spark.plans.sqltext_tpcds import register_tpcds_views

    if not _SPARK_PDFS:
        register_tpcds_views(spark, SF_MED)
        combos = [
            (n, False) for n in fx.tpcds_full_names() if n not in fx.SKIP_SPARK
        ] + [(n, True) for n in sorted(fx.TPCDS_FULL_FITTED_SUBS)]

        def run(c):
            n, fitted = c
            try:
                return fx.run_tpcds_full(
                    spark, SF_MED, n, fitted=fitted, register=False
                ).toPandas()
            except Exception as ex:  # noqa: BLE001 - surfaced in the text's test
                return ex

        with ThreadPoolExecutor(max_workers=6) as pool:
            _SPARK_PDFS.update(zip(combos, pool.map(run, combos)))
    return _SPARK_PDFS


def _frames(spark_pdfs, duck, name: str, fitted: bool):
    s = spark_pdfs[(name, fitted)]
    if isinstance(s, Exception):
        raise s
    d = duck.sql(fx.tpcds_full_oracle_sql(name, fitted=fitted)).df()
    return s, d


def _compare(spark_pdfs, duck, name: str, fitted: bool) -> int:
    s, d = _frames(spark_pdfs, duck, name, fitted)
    assert len(s) == len(d), f"{name}: rows {len(s)} vs {len(d)}"
    assert len(s.columns) == len(d.columns)
    # positional labels on BOTH sides: q14b/q64 project both sides of
    # a self-join, so output names are duplicated and name-based
    # pandas ops reject them
    s = s.copy()
    d = d.copy()
    s.columns = [f"c{i}" for i in range(len(s.columns))]
    d.columns = list(s.columns)
    for frame in (s, d):
        for c in frame.columns:
            if pd.api.types.is_datetime64_any_dtype(frame[c]):
                frame[c] = frame[c].astype("datetime64[us]")
    key = list(s.columns)
    s = s.sort_values(key, kind="mergesort").reset_index(drop=True)
    d = d.sort_values(key, kind="mergesort").reset_index(drop=True)
    tol = TOL_OVERRIDE.get(name, {"rtol": 1e-6, "atol": 1e-6})
    for c in s.columns:
        if pd.api.types.is_numeric_dtype(s[c]) and pd.api.types.is_numeric_dtype(d[c]):
            a = s[c].astype(float).to_numpy()
            b = d[c].astype(float).to_numpy()
            both_nan = pd.isna(a) & pd.isna(b)
            assert bool(
                np.all(both_nan | np.isclose(a, b, **tol))
            ), f"{name}: numeric column {c!r} differs"
        else:
            assert s[c].equals(d[c]), f"{name}: column {c!r} differs"
    return len(s)


_SWEEP = [
    n
    for n in fx.tpcds_full_names()
    if n not in fx.SKIP_SPARK and n not in EMPTY_ROLLUP_DIVERGENT and n not in LIMIT_TIE
]


@pytest.mark.parametrize("name", _SWEEP)
def test_verbatim_tpcds_full_text(spark_pdfs, dsduck, name):
    _compare(spark_pdfs, dsduck, name, fitted=False)


@pytest.mark.parametrize("name", sorted(fx.TPCDS_FULL_FITTED_SUBS))
def test_fitted_tpcds_full_text(spark_pdfs, dsduck, name):
    if name in LIMIT_TIE:
        pytest.skip("LIMIT-tie row set divergence; see test_limit_tie_q75")
    rows = _compare(spark_pdfs, dsduck, name, fitted=True)
    assert rows > 0, f"{name}: fitted substitution is vacuous"


@pytest.mark.parametrize("name", sorted(EMPTY_ROLLUP_DIVERGENT))
def test_empty_rollup_divergence_pinned(spark_pdfs, dsduck, name):
    """Verbatim q14a/q27/q36 filter to an EMPTY input at this scale;
    DuckDB emits the SQL-standard grand-total ROLLUP row, Spark emits
    none. Pin the exact divergence so an engine behavior change (or a
    catalog change that un-empties the input) is caught, not hidden."""
    s, d = _frames(spark_pdfs, dsduck, name, fitted=False)
    assert len(s) == 0, f"{name}: Spark input no longer empty — re-examine"
    assert len(d) == 1, f"{name}: DuckDB grand-total row behavior changed"


def test_limit_tie_q75(spark_pdfs, dsduck):
    """q75 orders by a heavily-tied delta and LIMITs: the top-100 SET
    is engine-dependent at the tie boundary. Compare the stable parts:
    row count and the tie-key column totals."""
    s, d = _frames(spark_pdfs, dsduck, "q75", fitted=True)
    assert len(s) == len(d) > 0
    # sales_cnt_diff is the sort key: its multiset at the kept rows
    # must match (ties swap rows, not key values)
    sc = sorted(s.iloc[:, -2].astype(int))
    dc = sorted(d.iloc[:, -2].astype(int))
    assert sc == dc


def test_fitted_changes_only_literals():
    def strip(t: str) -> list[str]:
        return re.split(r"'[^']*'|\b\d+(?:\.\d+)?\b", t)

    for name in sorted(fx.TPCDS_FULL_FITTED_SUBS):
        a = fx.load_text(fx.TPCDS_FULL_FAMILY, name)
        b = fx.fitted_full_text(name)
        assert strip(a) == strip(b), f"{name}: non-literal drift"


def test_driver_tranche_is_registered_and_oracled():
    from gazelle_plugin_spark.plans import ORACLE, QUERIES, load_all

    load_all()
    for name, _fitted in fx.DRIVER_TRANCHE:
        q = f"tpcdsfull_{name}"
        assert q in QUERIES and q in ORACLE, q
