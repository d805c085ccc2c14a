"""Verbatim reference SQL-text corpus vs DuckDB (plans/sqltext.py).

Runs every reference query file — tpch/q1.sql..q22.sql (the
TPCHSuite.scala:42-120 entry path) and ssb/1.1.sql..4.3.sql
(SSBQuerySuite) — byte-identical through ``spark.sql`` over the
compatibility catalog, and the IDENTICAL text through DuckDB over the
same view definitions, in two variants:

- verbatim: the untouched reference text (some are empty on the
  synthetic 1995-2001 data — both engines must agree exactly).
- fitted: literal parameters re-substituted into this dataset's
  domains; required to be NON-empty (except q22, which is
  structurally empty here: every synthetic customer has orders, so
  its NOT EXISTS branch can never hold — both engines agree).

Compare policy: rows sorted, columns matched positionally (the texts
leave some aggregates unaliased; both engines name them almost — but
not always — identically, and names are not part of this surface),
exact on non-numeric columns, and tolerance 1e-6 (rel+abs) on numeric
columns: the two engines legitimately differ in decimal
division/average RESULT SCALE (Spark rounds a decimal avg/ratio at
scale >= 6, DuckDB computes it in double), which is representation,
not semantics. Sums stay decimal-exact by construction (the
compatibility views cast money to DECIMAL).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest

from gazelle_plugin_spark.plans import sqltext as sx

from .conftest import SF_MED

pytestmark = pytest.mark.skipif(
    not sx.corpus_available(),
    reason="reference SQL corpus not present on this machine",
)

#: fitted variants allowed to be empty (structural, documented above)
_EMPTY_OK = {"q22"}

_CASES = [("tpch", n) for n in sx.TPCH_NAMES] + [("ssb", n) for n in sx.SSB_NAMES]


#: (family, name, fitted) -> pandas frame or raised exception;
#: concurrent once-per-module prewarm of the Spark side (guide 2.6).
#: The tpch and ssb view layers intentionally SHADOW each other
#: (register_views docstring), so the two families prewarm in
#: sequential phases — registration once per phase, texts threaded
#: within the phase.
_SPARK_PDFS: dict[tuple[str, str, bool], object] = {}


@pytest.fixture(scope="module")
def spark_pdfs(spark):
    from concurrent.futures import ThreadPoolExecutor

    if not _SPARK_PDFS:
        for family in ("tpch", "ssb"):
            sx.register_views(spark, SF_MED, family)
            names = sx.TPCH_NAMES if family == "tpch" else sx.SSB_NAMES
            combos = [(family, n, f) for n in names for f in (False, True)]

            def run(c):
                fam, n, fitted = c
                try:
                    return sx.run_text(
                        spark, SF_MED, fam, n, fitted=fitted, register=False
                    ).toPandas()
                except Exception as ex:  # noqa: BLE001 - surfaced in the text's test
                    return ex

            with ThreadPoolExecutor(max_workers=6) as pool:
                _SPARK_PDFS.update(zip(combos, pool.map(run, combos)))
    return _SPARK_PDFS


def _compare(spark_pdfs, duck, family: str, name: str, fitted: bool) -> int:
    s = spark_pdfs[(family, name, fitted)]
    if isinstance(s, Exception):
        raise s
    s = s.copy()
    d = duck.sql(sx.oracle_sql_for(family, name, fitted=fitted)).df()
    assert len(s) == len(d), f"{family}/{name}: rows {len(s)} vs {len(d)}"
    assert len(s.columns) == len(d.columns)
    d = d.copy()
    d.columns = list(s.columns)
    for frame in (s, d):
        for c in frame.columns:
            if pd.api.types.is_datetime64_any_dtype(frame[c]):
                frame[c] = frame[c].astype("datetime64[us]")
    key = list(s.columns)
    s = s.sort_values(key, kind="mergesort").reset_index(drop=True)
    d = d.sort_values(key, kind="mergesort").reset_index(drop=True)
    for c in s.columns:
        if pd.api.types.is_numeric_dtype(s[c]) and pd.api.types.is_numeric_dtype(d[c]):
            assert np.allclose(
                s[c].astype(float), d[c].astype(float),
                rtol=1e-6, atol=1e-6, equal_nan=True,
            ), f"{family}/{name}: numeric column {c!r} differs"
        else:
            assert s[c].equals(d[c]), f"{family}/{name}: column {c!r} differs"
    return len(s)


@pytest.mark.parametrize("family,name", _CASES, ids=[f"{f}-{n}" for f, n in _CASES])
def test_verbatim_text(spark_pdfs, duck, family, name):
    _compare(spark_pdfs, duck, family, name, fitted=False)


@pytest.mark.parametrize("family,name", _CASES, ids=[f"{f}-{n}" for f, n in _CASES])
def test_fitted_text(spark_pdfs, duck, family, name):
    rows = _compare(spark_pdfs, duck, family, name, fitted=True)
    if name not in _EMPTY_OK:
        assert rows > 0, f"{family}/{name}: fitted substitution is vacuous"


def test_fitted_changes_only_literals():
    """The fitted variant must differ from the reference text ONLY in
    quoted literals / numbers — never in structure (keywords,
    identifiers, operators)."""
    def strip(t: str) -> list[str]:
        return re.split(r"'[^']*'|\b\d+\b", t)
    for family, name in _CASES:
        a, b = sx.load_text(family, name), sx.fitted_text(family, name)
        assert strip(a) == strip(b), f"{family}/{name}: non-literal drift"
