"""The reference's TPC-DS v2.7.0 variant corpus (32 files) executed
verbatim.

Beyond the full v1.4 corpus (plans/sqltext_tpcds_full.py), the
reference vendors the TPC-DS v2.7.0 VARIANT queries —
``native-sql-engine/core/src/test/resources/tpcds-v2.7.0/*.sql``
(32 files; driven by the same TPCDSSuite.scala machinery): the queries
whose text changed between TPC-DS v1.4 and v2.7 (new ORDER BY columns,
LIMIT placement, rewritten set operations) plus the ``qNa`` rewrite
variants (e.g. q5a/q10a/q18a/q22a/q27a/q36a/q51a/q67a/q70a/q77a/q80a/
q86a) that re-express ROLLUP queries as explicit UNIONed aggregates.
Running these completes the reference's entire SQL entry surface.

The adaptation machinery is identical to the full corpus: the widened
star catalog (sqltext_tpcds.register_tpcds_views / tpcds_prelude), the
oracle-side mechanical dialect patches, and literal-only fitted
substitutions into the synthesized value domains. The Spark-side text
stays byte-identical in the verbatim variant.
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

TPCDS_V27_FAMILY = "tpcds-v2.7.0"


def tpcds_v27_corpus_available() -> bool:
    return os.path.isdir(os.path.join(REF_SQL_ROOT, TPCDS_V27_FAMILY))


def tpcds_v27_names() -> list[str]:
    root = os.path.join(REF_SQL_ROOT, TPCDS_V27_FAMILY)
    return sorted(f[:-4] for f in os.listdir(root) if f.endswith(".sql"))


#: Empty: every vendored v2.7.0 text runs on Spark 4. q14/q64 project
#: both sides of a self-join (duplicate output column names), which
#: requires the duplicate-safe normalize_output (sqltext.py) — the
#: same round-10 fix that revived the full corpus's q14b/q39a/q39b/
#: q64.
SKIP_SPARK: frozenset[str] = frozenset()

#: Mechanical oracle-side dialect patches (DuckDB text only; value-
#: preserving identifier-quoting / alias-resolution rewrites — the
#: same two divergences the full corpus pins for its q72/q77).
ORACLE_PATCHES: dict[str, list[tuple[str, str]]] = {
    # DuckDB resolves the bare ORDER BY column against the FROM scope
    # and calls it ambiguous; Spark binds it per its scoping rules.
    "q72": [
        (
            r"ORDER BY total_cnt DESC, i_item_desc, w_warehouse_name, d_week_seq",
            "ORDER BY total_cnt DESC, i_item_desc, w_warehouse_name, d1.d_week_seq",
        )
    ],
    # ``returns`` is a DuckDB reserved word; quote it wherever the
    # text uses it as a column alias / reference.
    "q77a": [(r"\breturns\b", '"returns"')],
    # Dialect DEFAULT null ordering (full-corpus q5 precedent): Spark
    # sorts NULLS FIRST asc, DuckDB NULLS LAST — these UNION-rewrites
    # emit NULL grouping columns that straddle the LIMIT 100 boundary,
    # so the oracle pins Spark's default (value-preserving: same rows,
    # same order semantics; a no-op on non-null columns).
    "q5a": [(r"order by channel, id",
             "order by channel NULLS FIRST, id NULLS FIRST")],
    "q80a": [(r"order by\s+channel, id",
              "order by channel NULLS FIRST, id NULLS FIRST")],
    "q14a": [(r"order by\s+channel,\s+i_brand_id,\s+i_class_id,\s+i_category_id",
              "order by channel NULLS FIRST, i_brand_id NULLS FIRST, "
              "i_class_id NULLS FIRST, i_category_id NULLS FIRST")],
    "q67a": [(r"order by\s+i_category,\s+i_class,\s+i_brand,\s+i_product_name,"
              r"\s+d_year,\s+d_qoy,\s+d_moy,\s+s_store_id,\s+sumsales,\s+rk",
              "order by i_category NULLS FIRST, i_class NULLS FIRST, "
              "i_brand NULLS FIRST, i_product_name NULLS FIRST, "
              "d_year NULLS FIRST, d_qoy NULLS FIRST, d_moy NULLS FIRST, "
              "s_store_id NULLS FIRST, sumsales NULLS FIRST, rk NULLS FIRST")],
}


def _oracle_dialect(name: str, text: str) -> str:
    text = text.replace("`", '"')
    text = re.sub(r"(?i)\bleft\s+semi\s+join\b", "SEMI JOIN", text)
    for pat, rep in ORACLE_PATCHES.get(name, []):
        text = re.sub(pat, rep, text)
    return text


#: Literal-only fitted substitutions into the synthesized domains
#: (sqltext.sub_literals contract; same value maps as the base/full
#: corpora where the same parameter appears). Queries absent here run
#: non-vacuous with their default substitutions.
TPCDS_V27_FITTED_SUBS: dict[str, dict[str, str]] = {
    # county names / years to the synthesized domains (q10 base map)
    "q10a": {"'Walker County'": "'CA_County_0'",
             "'Richland County'": "'CA_County_1'",
             "'Gaines County'": "'CA_County_2'",
             "'Douglas County'": "'CA_County_3'",
             "'Dona Ana County'": "'CA_County_4'", "2002": "2000"},
    # the synthesized i_current_price band (900..999.9) never exceeds
    # 1.2x its category average — relax to the average itself
    "q6": {"1.2": "1.0"},
    # 2001+1 = 2002 is outside the 1995..2001 date_dim span
    "q11": {"2001": "2000"},
    "q74": {"2001": "2000"},
    # i_category / i_color real TPC-DS domains -> synthesized ones
    "q12": {"'Sports'": "'ECONOMY'", "'Books'": "'LARGE'", "'Home'": "'MEDIUM'"},
    "q20": {"'Sports'": "'ECONOMY'", "'Books'": "'LARGE'", "'Home'": "'MEDIUM'"},
    "q98": {"'Sports'": "'ECONOMY'", "'Books'": "'LARGE'", "'Home'": "'MEDIUM'"},
    # q24 is NOT fitted: its s_zip = ca_zip equi-join has ~1 matching
    # pair in the synthesized catalog (zips are structurally disjoint),
    # so no literal substitution can un-empty it — it stays a verbatim
    # both-engines-agree-on-empty check.
    # q49 is NOT fitted: its rank() orders by DECIMAL/DECIMAL division
    # ratios whose result scale differs between engines, so tie
    # boundaries at rank<=10 select different row sets (the documented
    # decimal-division-scale class) — verbatim empty-agree only.
    # store county names + the ticket-count band (q34 base map)
    "q34": {"'Saginaw County'": "'County_0'", "'Sumner County'": "'County_1'",
            "'Appanoose County'": "'County_2'", "'Daviess County'": "'County_0'",
            "'Fairfield County'": "'County_1'", "'Raleigh County'": "'County_2'",
            "'Ziebach County'": "'County_0'", "'Williamson County'": "'County_1'",
            "15": "2", "20": "4"},
    "q35": {"2002": "2000"},
    "q75": {"'Books'": "'ECONOMY'", "2002": "2000"},
}


#: Value-preserving OUTPUT casts applied to the DuckDB side only
#: (outer SELECT), for physical-type divergence: DuckDB SUM(INTEGER)
#: -> HUGEINT vs Spark BIGINT, rank() width INT vs BIGINT.
ORACLE_OUT_CASTS: dict[str, list[tuple[str, str | None]]] = {
    "q14a": [
        ("channel", None),
        ("i_brand_id", None),
        ("i_class_id", None),
        ("i_category_id", None),
        ("sum_sales", None),
        ("number_sales", "BIGINT"),
    ],
    "q75": [
        ("prev_year", None),
        ("year", None),
        ("i_brand_id", None),
        ("i_class_id", None),
        ("i_category_id", None),
        ("i_manufact_id", None),
        ("prev_yr_cnt", "BIGINT"),
        ("curr_yr_cnt", "BIGINT"),
        ("sales_cnt_diff", "BIGINT"),
        ("sales_amt_diff", None),
    ],
    "q67a": [
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
    "q70a": [
        ("total_sum", None),
        ("s_state", None),
        ("s_county", None),
        ("lochierarchy", None),
        ("rank_within_parent", "INTEGER"),
    ],
    "q86a": [
        ("total_sum", None),
        ("i_category", None),
        ("i_class", None),
        ("lochierarchy", None),
        ("rank_within_parent", "INTEGER"),
    ],
}


def _out_cast_wrap(name: str, text: str) -> str:
    spec = ORACLE_OUT_CASTS.get(name)
    if not spec:
        return text
    cols = ", ".join(
        f'CAST("{c}" AS {t}) AS "{c}"' if t else f'"{c}"' for c, t in spec
    )
    return f"SELECT {cols} FROM (\n{text}\n) _out"


def fitted_v27_text(name: str) -> str:
    text = load_text(TPCDS_V27_FAMILY, name)
    return sub_literals(text, TPCDS_V27_FITTED_SUBS.get(name) or {})


def run_tpcds_v27(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    fitted: bool = False,
    register: bool = True,
) -> DataFrame:
    """Execute one v2.7.0 reference text over the compatibility catalog
    (byte-identical unless ``fitted``). ``register=False``: caller
    registered the (idempotent) views once up front — per-call
    re-registration would race in a threaded sweep."""
    if register:
        register_tpcds_views(spark, sf_dir)
    text = fitted_v27_text(name) if fitted else load_text(TPCDS_V27_FAMILY, name)
    return normalize_output(spark.sql(text))


def tpcds_v27_oracle_sql(name: str, fitted: bool = False) -> str:
    text = fitted_v27_text(name) if fitted else load_text(TPCDS_V27_FAMILY, name)
    return merge_prelude(
        tpcds_prelude(), _out_cast_wrap(name, _oracle_dialect(name, text))
    )


def _register(qname: str, name: str, fitted: bool) -> None:
    def impl(spark: SparkSession, sf_dir: str) -> DataFrame:
        return run_tpcds_v27(spark, sf_dir, name, fitted=fitted)

    impl.__name__ = qname
    impl.__doc__ = (
        f"Reference tpcds-v2.7.0/{name}.sql executed VERBATIM through "
        "spark.sql over the full TPC-DS compatibility catalog "
        "(plans/sqltext_tpcds_v27.py; the reference's TPCDSSuite.scala "
        "entry path, v2.7.0 variant corpus)."
        + (
            " Fitted variant: literal-only substitutions into the "
            "synthesized domains."
            if fitted
            else ""
        )
    )
    query(qname, oracle=tpcds_v27_oracle_sql(name, fitted=fitted))(impl)


#: Driver-registered tranche: the VALUE-SAFE subset (exact sums/counts/
#: attributes on both engines; no avg/ratio output columns — the
#: round-8 registration policy). Excluded by that policy: q22/q22a/
#: q27a/q35/q35a (avg outputs), q36a/q78 (ratio outputs), q47/q57
#: (moving-average outputs), q12/q20/q98 (revenueratio), q18a (the
#: q18-class avg CAST rounding divergence, pinned in the test sweep),
#: q49 (rank over decimal-division ratios), q24/q51a (structurally
#: empty here — verbatim both-engines-agree checks only), q14/q64
#: (duplicate output column names from two-sided self-join projections
#: — the driver compare sorts columns by name, so dup names cannot
#: hash stably; pytest-compared via the positional normalizer).
DRIVER_TRANCHE: tuple[tuple[str, bool], ...] = (
    ("q5a", False),
    ("q6", True),
    ("q10a", True),
    ("q11", True),
    ("q14a", False),
    ("q34", True),
    ("q67a", False),
    ("q70a", False),
    ("q74", True),
    ("q75", True),
    ("q80a", False),
    ("q86a", False),
    # round-11 additions: count outputs (q72) and exact-sum channel
    # report (q77a) — verbatim non-empty, verified against a PLAIN
    # DuckDB connection (driver null-order semantics) before
    # registration per the round-10 tranche policy.
    ("q72", False),
    ("q77a", False),
)


if tpcds_v27_corpus_available():
    for _name, _fitted in DRIVER_TRANCHE:
        _register(f"dsv27_{_name}", _name, _fitted)
