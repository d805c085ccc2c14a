"""The reference's FULL TPC-DS corpus (103 files) executed verbatim.

The reference ships the complete TPC-DS query set —
``native-sql-engine/core/src/test/resources/tpcds/q1.sql .. q99.sql``
(103 files: q14/q23/q24/q39 split into a/b variants; driven by its
TPCDSSuite.scala) — beyond the 21-file ``tpcds-modifiedQueries``
subset that plans/sqltext_tpcds.py runs. This module runs the full
corpus byte-identical through ``spark.sql`` over the SAME widened
compatibility catalog (sqltext_tpcds.tpcds_views: all 24 TPC-DS
tables synthesized deterministically from the driver's TPC-H-ish
parquet), with the identical text executed on DuckDB for the oracle.

Three adaptation layers, none of which touches the Spark-side text:

- **Catalog**: full-surface store/catalog/web sales + returns,
  inventory, warehouse, time_dim, ship_mode, income_band,
  call_center, web_site, web_page, catalog_page, reason (see
  sqltext_tpcds.tpcds_views).
- **Oracle dialect patches** (ORACLE_PATCHES): mechanical, value-
  preserving rewrites applied to the DuckDB side only, where the two
  SQL dialects genuinely diverge — backtick identifier quoting,
  DuckDB's reserved word ``returns``, and output-alias resolution in
  ORDER BY (Spark binds the SELECT alias, DuckDB calls the bare name
  ambiguous).
- **Fitted substitutions** (TPCDS_FULL_FITTED_SUBS): literal-only
  parameter remaps into this dataset's synthesized domains, exactly
  the sqltext.py contract (TPC-DS queries are parameterized by
  design; a fitted variant is a legal substitution set and must be
  non-empty).

All 103 files run (round 10 closed the last four: q14b/q39a/q39b/q64
project duplicate column names from self-join sides, which needed a
duplicate-safe normalize_output, not a catalog change). Documented
divergences that keep a query out of the strict driver gate but
inside the tolerance-compared pytest sweep are listed in
tests/test_sqltext_tpcds_full.py.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from gazelle_plugin_spark.plans import query
from gazelle_plugin_spark.plans.sqltext import (
    REF_SQL_ROOT,
    load_text,
    merge_prelude,
    normalize_output,
    sub_literals,
)
from gazelle_plugin_spark.plans.sqltext_tpcds import (
    register_tpcds_views,
    tpcds_prelude,
)

TPCDS_FULL_FAMILY = "tpcds"


def tpcds_full_corpus_available() -> bool:
    return os.path.isdir(os.path.join(REF_SQL_ROOT, TPCDS_FULL_FAMILY))


def tpcds_full_names() -> list[str]:
    root = os.path.join(REF_SQL_ROOT, TPCDS_FULL_FAMILY)
    return sorted(f[:-4] for f in os.listdir(root) if f.endswith(".sql"))


#: Empty since round 10. Rounds 9's q14b/q39a/q39b/q64 skip was a
#: MISDIAGNOSIS: the AMBIGUOUS_REFERENCE came from normalize_output's
#: name-based cast select over these texts' DUPLICATE output columns
#: (``select cs1.*, cs2.*``-style projections), not from Spark — the
#: texts run fine on Spark 4 now that normalize_output casts under
#: positional names (sqltext.py). All 103 files are runnable.
SKIP_SPARK: frozenset[str] = frozenset()

#: Mechanical oracle-side dialect patches (DuckDB text only; the Spark
#: text stays byte-identical). Each entry is (regex, replacement) and
#: must be value-preserving: identifier quoting or alias-resolution
#: only.
ORACLE_PATCHES: dict[str, list[tuple[str, str]]] = {
    # DuckDB resolves a bare ORDER BY column against the FROM scope
    # first and calls it ambiguous; Spark binds the SELECT alias.
    "q72": [
        (
            r"ORDER BY total_cnt DESC, i_item_desc, w_warehouse_name, d_week_seq",
            "ORDER BY total_cnt DESC, i_item_desc, w_warehouse_name, d1.d_week_seq",
        )
    ],
    "q58": [(r"ORDER BY item_id, ss_item_rev", "ORDER BY ss_items.item_id, ss_item_rev")],
    # ``returns`` is a DuckDB reserved word; quote it wherever the
    # text uses it as a column alias / reference.
    "q77": [(r"\breturns\b", '"returns"')],
    # Dialect DEFAULT null ordering: Spark sorts NULLS FIRST asc,
    # DuckDB NULLS LAST — these ROLLUPs emit NULL grouping rows that
    # straddle the LIMIT 100 boundary, so the oracle must pin Spark's
    # default (value-preserving: same rows, same order semantics).
    "q5": [(r"ORDER BY channel, id", "ORDER BY channel NULLS FIRST, id NULLS FIRST")],
    "q80": [(r"ORDER BY channel, id", "ORDER BY channel NULLS FIRST, id NULLS FIRST")],
    "q67": [(
        r"ORDER BY\s+i_category, i_class, i_brand, i_product_name, d_year,"
        r"\s+d_qoy, d_moy, s_store_id, sumsales, rk",
        "ORDER BY i_category NULLS FIRST, i_class NULLS FIRST, "
        "i_brand NULLS FIRST, i_product_name NULLS FIRST, "
        "d_year NULLS FIRST, d_qoy NULLS FIRST, d_moy NULLS FIRST, "
        "s_store_id NULLS FIRST, sumsales NULLS FIRST, rk NULLS FIRST",
    )],
}


def _oracle_dialect(name: str, text: str) -> str:
    """Apply the oracle-side dialect patches: global backtick->double
    quote (Spark identifier quoting), LEFT SEMI JOIN spelling, and the
    per-query resolution patches."""
    text = text.replace("`", '"')
    text = re.sub(r"(?i)\bleft\s+semi\s+join\b", "SEMI JOIN", text)
    for pat, rep in ORACLE_PATCHES.get(name, []):
        text = re.sub(pat, rep, text)
    return text


#: Literal-only fitted substitutions into the synthesized domains
#: (sqltext.sub_literals contract: quoted literals verbatim, bare
#: numbers word-boundary). Queries absent here run non-vacuous with
#: their default substitutions.
TPCDS_FULL_FITTED_SUBS: dict[str, dict[str, str]] = {
    # i_category / i_color: real TPC-DS domains -> the synthesized ones
    "q75": {"'Books'": "'ECONOMY'", "2002": "2000"},
    "q10": {"'Rush County'": "'CA_County_0'", "'Toole County'": "'CA_County_1'",
            "'Jefferson County'": "'CA_County_2'",
            "'Dona Ana County'": "'CA_County_3'",
            "'La Porte County'": "'CA_County_4'", "2002": "2000"},
    "q30": {"2002": "2000"},
    "q27": {"'TN'": "'ST_1'", "2002": "2000"},
    "q36": {"'TN'": "'ST_1'"},
    "q84": {"'Edgewood'": "'CA_City_1'"},
    # i_current_price literal band to the part table's ~900..2100
    "q21": {"0.99": "990", "1.49": "1040"},
    "q40": {"0.99": "990", "1.49": "1040"},
    "q33": {"'Electronics'": "'ECONOMY'"},
    "q56": {"'slate'": "'azure'", "'blanched'": "'beige'", "'burnished'": "'black'"},
    "q60": {"'Music'": "'MEDIUM'"},
    # store names / states to the synthesized domains
    "q88": {"'ese'": "'Store_1'"},
    # inventory price / manufact windows to the part table's domains
    # (i_current_price ~900..2100, i_manufact_id 1..5)
    "q37": {"68": "968", "677": "1", "940": "2", "694": "3", "808": "4"},
    "q82": {"62": "962", "129": "1", "270": "2", "821": "3", "423": "4"},
    # round-10 additions: store city/county names and the manufact id
    # to the synthesized domains (maps mirror the tpcds-modifiedQueries
    # fitted sets where the same parameter appears)
    "q3": {"128": "3"},
    "q34": {"'Williamson County'": "'County_1'", "15": "2", "20": "4"},
    "q46": {"'Fairview'": "'City_1'", "'Midway'": "'City_0'"},
    "q68": {"'Midway'": "'City_0'", "'Fairview'": "'City_1'"},
    # q73 subs ONLY the county names: its cnt band (1..5) shares bare
    # digits with the d_dom filter, so numeric subs would corrupt both
    "q73": {"'Williamson County'": "'County_0'", "'Franklin Parish'": "'County_1'",
            "'Bronx County'": "'County_2'", "'Orange County'": "'County_0'"},
}


#: Value-preserving OUTPUT casts applied to the DuckDB side only, as
#: an outer SELECT around the verbatim text (the established oracle
#: convention for physical-type divergence): DuckDB SUM(INTEGER)
#: returns HUGEINT (pandas float64) where Spark returns BIGINT, and
#: Spark types grouping()/rank() narrower (TINYINT/INT) than DuckDB.
#: (name -> ordered (column, duck_cast_type|None) list; None = pass
#: through unchanged.)
ORACLE_OUT_CASTS: dict[str, list[tuple[str, str | None]]] = {
    "q21": [
        ("w_warehouse_name", None),
        ("i_item_id", None),
        ("inv_before", "BIGINT"),
        ("inv_after", "BIGINT"),
    ],
    "q29": [
        ("i_item_id", None),
        ("i_item_desc", None),
        ("s_store_id", None),
        ("s_store_name", None),
        ("store_sales_quantity", "BIGINT"),
        ("store_returns_quantity", "BIGINT"),
        ("catalog_sales_quantity", "BIGINT"),
    ],
    "q50": [
        ("s_store_name", None),
        ("s_company_id", None),
        ("s_street_number", None),
        ("s_street_name", None),
        ("s_street_type", None),
        ("s_suite_number", None),
        ("s_city", None),
        ("s_county", None),
        ("s_state", None),
        ("s_zip", None),
        ("30 days ", "BIGINT"),
        ("31 - 60 days ", "BIGINT"),
        ("61 - 90 days ", "BIGINT"),
        ("91 - 120 days ", "BIGINT"),
        (">120 days ", "BIGINT"),
    ],
    "q62": [
        ("substr(w_warehouse_name, 1, 20)", None),
        ("sm_type", None),
        ("web_name", None),
        ("30 days ", "BIGINT"),
        ("31 - 60 days ", "BIGINT"),
        ("61 - 90 days ", "BIGINT"),
        ("91 - 120 days ", "BIGINT"),
        (">120 days ", "BIGINT"),
    ],
    "q86": [
        ("total_sum", None),
        ("i_category", None),
        ("i_class", None),
        ("lochierarchy", "TINYINT"),
        ("rank_within_parent", "INTEGER"),
    ],
    "q97": [
        ("store_only", "BIGINT"),
        ("catalog_only", "BIGINT"),
        ("store_and_catalog", "BIGINT"),
    ],
    "q67": [
        ("i_category", None),
        ("i_class", None),
        ("i_brand", None),
        ("i_product_name", None),
        ("d_year", None),
        ("d_qoy", None),
        ("d_moy", None),
        ("s_store_id", None),
        ("sumsales", None),
        ("rk", "INTEGER"),
    ],
    "q70": [
        ("total_sum", None),
        ("s_state", None),
        ("s_county", None),
        ("lochierarchy", "TINYINT"),
        ("rank_within_parent", "INTEGER"),
    ],
    "q99": [
        ("substr(w_warehouse_name, 1, 20)", None),
        ("sm_type", None),
        ("cc_name", None),
        ("30 days ", "BIGINT"),
        ("31 - 60 days ", "BIGINT"),
        ("61 - 90 days ", "BIGINT"),
        ("91 - 120 days ", "BIGINT"),
        (">120 days ", "BIGINT"),
    ],
}


#: Oracle-side output RENAMES: unaliased count(*) is named count(1) by
#: Spark but count_star() by DuckDB — alias the DuckDB column to the
#: Spark name (the driver compare pairs columns BY NAME).
#: name -> ordered (duck_name, spark_name) list for single-column
#: count outputs.
ORACLE_OUT_RENAMES: dict[str, list[tuple[str, str]]] = {
    "q38": [("count_star()", "count(1)")],
    "q87": [("count_star()", "count(1)")],
    "q96": [("count_star()", "count(1)")],
}


def _out_cast_wrap(name: str, text: str) -> str:
    spec = ORACLE_OUT_CASTS.get(name)
    renames = dict(ORACLE_OUT_RENAMES.get(name, ()))
    if not spec and not renames:
        return text
    if spec:
        # one merged projection: cast AND rename per column, so a query
        # appearing in both specs drops neither
        cols = ", ".join(
            (
                f'CAST("{c}" AS {t}) AS "{renames.pop(c, c)}"'
                if t
                else f'"{c}" AS "{renames.pop(c, c)}"'
            )
            for c, t in spec
        )
        assert not renames, (
            f"{name}: ORACLE_OUT_RENAMES columns {sorted(renames)} absent "
            "from its ORACLE_OUT_CASTS projection — merge them there"
        )
    else:
        cols = ", ".join(f'"{src}" AS "{out}"' for src, out in renames.items())
    return f"SELECT {cols} FROM (\n{text}\n) _out"


def fitted_full_text(name: str) -> str:
    text = load_text(TPCDS_FULL_FAMILY, name)
    return sub_literals(text, TPCDS_FULL_FITTED_SUBS.get(name) or {})


def run_tpcds_full(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    fitted: bool = False,
    register: bool = True,
) -> DataFrame:
    """Execute one full-corpus reference text over the compatibility
    catalog (byte-identical unless ``fitted``). ``register=False``:
    caller registered the (idempotent) views once up front — per-call
    re-registration would race in a threaded sweep."""
    if register:
        register_tpcds_views(spark, sf_dir)
    text = fitted_full_text(name) if fitted else load_text(TPCDS_FULL_FAMILY, name)
    return normalize_output(spark.sql(text))


def tpcds_full_oracle_sql(name: str, fitted: bool = False) -> str:
    text = fitted_full_text(name) if fitted else load_text(TPCDS_FULL_FAMILY, name)
    return merge_prelude(tpcds_prelude(), _out_cast_wrap(name, _oracle_dialect(name, text)))


def _register(qname: str, name: str, fitted: bool) -> None:
    def impl(spark: SparkSession, sf_dir: str) -> DataFrame:
        return run_tpcds_full(spark, sf_dir, name, fitted=fitted)

    impl.__name__ = qname
    impl.__doc__ = (
        f"Reference tpcds/{name}.sql executed VERBATIM through spark.sql "
        "over the full TPC-DS compatibility catalog "
        "(plans/sqltext_tpcds_full.py; the reference's TPCDSSuite.scala "
        "entry path)."
        + (
            " Fitted variant: literal-only substitutions into the "
            "synthesized domains."
            if fitted
            else ""
        )
    )
    query(qname, oracle=tpcds_full_oracle_sql(name, fitted=fitted))(impl)


#: Driver-registered tranche: the VALUE-SAFE subset of the corpus —
#: outputs are exact sums/counts/attributes (decimal-exact on both
#: engines; no avg/ratio output columns, per the round-8 registration
#: policy), verified MATCH in the round-9 two-engine sweep. (name,
#: fitted) — fitted only where the default substitutions are vacuous
#: on this data's domains.
DRIVER_TRANCHE: tuple[tuple[str, bool], ...] = (
    # round-9 late additions (never in a DRIVER_WINDOW yet — rotation
    # stock for round 10): verbatim-non-vacuous, value-safe outputs
    # (sums of exact decimals / counts / attributes; no avg-threshold
    # dependence), dtype-parity vetted against DuckDB.
    ("q5", False),
    ("q19", False),
    ("q38", False),
    ("q87", False),
    ("q94", False),
    ("q95", False),
    ("q96", False),
    ("q10", True),
    ("q15", False),
    ("q16", False),
    ("q21", True),
    ("q23a", False),
    ("q25", False),
    ("q29", False),
    ("q30", True),
    ("q33", True),
    ("q37", True),
    ("q40", True),
    ("q45", False),
    ("q48", False),
    ("q50", False),
    ("q56", True),
    ("q60", True),
    ("q62", False),
    ("q69", False),
    ("q71", False),
    ("q72", False),
    ("q81", False),
    ("q82", True),
    ("q84", True),
    ("q86", False),
    ("q88", True),
    ("q93", False),
    ("q97", False),
    ("q99", False),
    # round-10 additions (rotation stock): value-safe outputs (exact
    # decimal sums / counts / attributes / rank), each verified
    # hash-exact against a PLAIN DuckDB session (= the driver's null
    # ordering) this round. q67/q80 needed only the q5-class NULLS
    # FIRST oracle pin; q3/q34/q46/q68/q73 run fitted into the
    # synthesized store-city/county/manufact domains.
    ("q42", False),
    ("q43", False),
    ("q52", False),
    ("q55", False),
    ("q65", False),
    ("q67", False),
    ("q70", False),
    ("q77", False),
    ("q79", False),
    ("q80", False),
    ("q92", False),
    ("q3", True),
    ("q34", True),
    ("q46", True),
    ("q68", True),
    ("q73", True),
)


if tpcds_full_corpus_available():
    for _name, _fitted in DRIVER_TRANCHE:
        _register(f"tpcdsfull_{_name}", _name, _fitted)
