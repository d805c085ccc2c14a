"""The reference's modified-TPC-DS corpus executed VERBATIM.

The reference curates a 21-file TPC-DS subset —
``native-sql-engine/core/src/test/resources/tpcds-modifiedQueries/``
(q3,q7,q10,q19,q27,q34,q42,q43,q46,q52,q53,q55,q59,q63,q65,q68,q73,
q79,q89,q98,ss_max; driven by its Decision Support Benchmark2 suites)
— and this module runs those texts byte-identical through
``spark.sql``, the same discipline as plans/sqltext.py for TPC-H/SSB:
the adaptation lives in a COMPATIBILITY CATALOG, never in the query
text.

The TPC-DS star schema is synthesized deterministically from the
driver's TPC-H-ish tables:

- ``store_sales``   <- lineitem x orders (one row per line item);
  date/time/demo/address/store/promo surrogate keys derived from the
  TPC-H keys by modular arithmetic; money columns are exact DECIMALs
  (the repo's exact-aggregation convention, applied at the catalog
  layer because a verbatim text cannot cast); ``ss_sold_date_sk`` is
  the REAL Julian day number of o_orderdate, so the texts' raw
  partition-key windows (``ss_sold_date_sk between 2451181 and ...``)
  select genuine date ranges.
- ``date_dim``      <- a generated 1995-2001 calendar (the data's
  span) with real Julian day sks, ISO weekday names, and
  d_week_seq/d_month_seq/d_qoy sequence attributes.
- ``item``          <- part (brand id parsed out of 'Brand#NN',
  category = p_type, class = the noun of p_name).
- ``store``         <- 12 stores derived from nation keys.
- ``customer`` / ``customer_address`` / ``customer_demographics`` /
  ``household_demographics`` / ``promotion`` <- customer-key
  arithmetic, using the REAL TPC-DS value domains for
  education/marital/buy-potential/credit-rating so most demographic
  literals bind verbatim. ``ss_addr_sk`` rotates away from the
  buyer's own ``c_current_addr_sk`` on odd orderkeys so q46/q68's
  ``current_addr.ca_city <> bought_city`` predicate is satisfiable
  (with ss_addr_sk == o_custkey it was structurally vacuous).
- ``catalog_sales`` / ``web_sales`` <- channel split of lineitem by
  line number (q10's EXISTS shapes only).

Variants, as for TPC-H/SSB: ``verbatim`` (byte-identical; may be
empty where a literal names a domain this data lacks — both engines
must agree exactly) and ``fitted`` (literal-only substitutions into
this dataset's domains, pinned by tests to change nothing but quoted
literals/numbers; must be non-empty). Both run the IDENTICAL text on
Spark and on DuckDB over the same view definitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gazelle_plugin_spark.catalog import table_path
from gazelle_plugin_spark.plans import query
from gazelle_plugin_spark.plans.sqltext import (
    _DUCK,
    _SPARK,
    REF_SQL_ROOT,
    _Dialect,
    load_text,
    merge_prelude,
    normalize_output,
    sub_literals,
)

TPCDS_FAMILY = "tpcds-modifiedQueries"


def tpcds_corpus_available() -> bool:
    import os

    return os.path.isdir(os.path.join(REF_SQL_ROOT, TPCDS_FAMILY))

TPCDS_NAMES = (
    "q3", "q7", "q10", "q19", "q27", "q34", "q42", "q43", "q46",
    "q52", "q53", "q55", "q59", "q63", "q65", "q68", "q73", "q79",
    "q89", "q98", "ss_max",
)

#: data span of the synthetic orders table
_CAL_START, _CAL_END = "1995-01-01", "2001-12-31"

#: Julian day number of 1970-01-01 (epoch anchor for *_date_sk)
_JULIAN_EPOCH = 2440588


def _julian(d: _Dialect, expr: str) -> str:
    """Julian day number of a date expression, as INT, identically in
    both dialects (day-diff from epoch + epoch's Julian number)."""
    if d is _SPARK:
        return f"CAST(datediff(CAST({expr} AS DATE), DATE '1970-01-01') + {_JULIAN_EPOCH} AS INT)"
    return f"CAST(datediff('day', DATE '1970-01-01', CAST({expr} AS DATE)) + {_JULIAN_EPOCH} AS INT)"


def _dow(d: _Dialect, expr: str) -> str:
    """0=Sunday..6=Saturday in both dialects (Spark dayofweek is
    1-based, DuckDB's is 0-based)."""
    if d is _SPARK:
        return f"CAST(dayofweek({expr}) - 1 AS INT)"
    return f"CAST(dayofweek({expr}) AS INT)"


def _dayname(d: _Dialect, expr: str) -> str:
    if d is _SPARK:
        return f"date_format({expr}, 'EEEE')"
    return f"dayname({expr})"


def _word2(d: _Dialect, expr: str) -> str:
    """Second word of a two-word string (p_name -> i_class)."""
    if d is _SPARK:
        return f"element_at(split({expr}, ' '), 2)"
    return f"string_split({expr}, ' ')[2]"


def _idiv(d: _Dialect, expr: str, n: int) -> str:
    """Integer division, identical in both dialects (Spark DIV vs
    DuckDB //; a plain / would be exact division in DuckDB)."""
    if d is _SPARK:
        return f"(({expr}) DIV {n})"
    return f"(({expr}) // {n})"


def _seconds(d: _Dialect) -> str:
    """A one-column (t) relation of every second-of-day 0..86399."""
    if d is _SPARK:
        return "SELECT explode(sequence(0, 86399)) AS t"
    return "SELECT unnest(generate_series(0, 86399)) AS t"


def _pick(expr: str, *vals: str) -> str:
    """CASE expr % len(vals) -> literal list (deterministic domain)."""
    arms = " ".join(f"WHEN {i} THEN '{v}'" for i, v in enumerate(vals))
    return f"CASE CAST(({expr}) % {len(vals)} AS INT) {arms} END"


def _calendar(d: _Dialect) -> str:
    """A one-column (d) relation of every DATE in the data span."""
    if d is _SPARK:
        return (
            f"SELECT explode(sequence(DATE '{_CAL_START}', DATE '{_CAL_END}')) AS d"
        )
    return (
        f"SELECT CAST(unnest(generate_series(DATE '{_CAL_START}',"
        f" DATE '{_CAL_END}', INTERVAL 1 DAY)) AS DATE) AS d"
    )


def _money(col: str) -> str:
    return f"CAST({col} AS DECIMAL(14,2))"


def tpcds_views(d: _Dialect, src) -> dict[str, str]:
    """TPC-DS-surface view bodies over the TPC-H-ish tables.
    ``src(name)`` renders the raw-table reference for the dialect."""
    s = d.s
    one_minus = "CAST(1 - l.l_discount AS DECIMAL(6,4))"
    ext_sales = f"{_money('l.l_extendedprice')} * {one_minus}"
    fact_cols = f"""
  {_julian(d, 'o.o_orderdate')} AS ss_sold_date_sk,
  CAST((l.l_orderkey * 181 + l.l_linenumber * 7) % 86400 AS INT) AS ss_sold_time_sk,
  l.l_partkey AS ss_item_sk,
  o.o_custkey AS ss_customer_sk,
  (o.o_custkey * 11 + l.l_orderkey) % 720 AS ss_cdemo_sk,
  (o.o_custkey * 13 + l.l_linenumber) % 144 AS ss_hdemo_sk,
  CASE WHEN o.o_orderkey % 2 = 0 THEN o.o_custkey
       ELSE (o.o_custkey % 100) + 1 END AS ss_addr_sk,
  l.l_suppkey % 12 AS ss_store_sk,
  l.l_partkey % 30 AS ss_promo_sk,
  l.l_orderkey AS ss_ticket_number,
  CAST(l.l_quantity AS INT) AS ss_quantity,
  {_money('l.l_extendedprice')} * CAST(0.1 AS DECIMAL(2,1)) AS ss_list_price,
  {_money('l.l_extendedprice')} * CAST(0.1 AS DECIMAL(2,1)) * {one_minus} AS ss_sales_price,
  {_money('l.l_extendedprice')} AS ss_ext_list_price,
  {ext_sales} AS ss_ext_sales_price,
  {_money('l.l_extendedprice')} * CAST(l.l_tax AS DECIMAL(6,4)) AS ss_ext_tax,
  {_money('l.l_extendedprice')} * CAST(l.l_discount AS DECIMAL(6,4)) AS ss_coupon_amt,
  {ext_sales} - CAST(l.l_quantity * 100 AS DECIMAL(14,2)) AS ss_net_profit,
  {_money('l.l_extendedprice')} * CAST(0.01 AS DECIMAL(4,2)) AS ss_wholesale_cost,
  {_money('l.l_extendedprice')} * CAST(0.6 AS DECIMAL(2,1)) AS ss_ext_wholesale_cost,
  {_money('l.l_extendedprice')} * CAST(l.l_discount AS DECIMAL(6,4)) AS ss_ext_discount_amt,
  {ext_sales} AS ss_net_paid"""
    return {
        "store_sales": f"""
SELECT {fact_cols}
FROM {src('lineitem')} l JOIN {src('orders')} o
  ON l.l_orderkey = o.o_orderkey""",
        "catalog_sales": f"""
SELECT {_julian(d, 'o.o_orderdate')} AS cs_sold_date_sk,
  o.o_custkey AS cs_ship_customer_sk,
  CAST((l.l_orderkey * 181 + l.l_linenumber * 7) % 86400 AS INT) AS cs_sold_time_sk,
  CAST({_julian(d, 'o.o_orderdate')} + (l.l_orderkey * 3 + l.l_linenumber) % 60 + 2 AS INT) AS cs_ship_date_sk,
  l.l_partkey AS cs_item_sk,
  l.l_orderkey AS cs_order_number,
  o.o_custkey AS cs_bill_customer_sk,
  (o.o_custkey * 11 + l.l_orderkey) % 720 AS cs_bill_cdemo_sk,
  (o.o_custkey * 13 + l.l_linenumber) % 144 AS cs_bill_hdemo_sk,
  CASE WHEN o.o_orderkey % 2 = 0 THEN o.o_custkey
       ELSE (o.o_custkey % 100) + 1 END AS cs_bill_addr_sk,
  ((o.o_custkey * 3 + l.l_orderkey) % 100) + 1 AS cs_ship_addr_sk,
  l.l_suppkey % 6 AS cs_call_center_sk,
  (l.l_partkey * 3) % 100 AS cs_catalog_page_sk,
  (l.l_orderkey * 13 + l.l_linenumber) % 20 AS cs_ship_mode_sk,
  l.l_suppkey % 5 AS cs_warehouse_sk,
  l.l_partkey % 30 AS cs_promo_sk,
  CAST(l.l_quantity AS INT) AS cs_quantity,
  {_money('l.l_extendedprice')} * CAST(0.01 AS DECIMAL(4,2)) AS cs_wholesale_cost,
  {_money('l.l_extendedprice')} * CAST(0.1 AS DECIMAL(2,1)) AS cs_list_price,
  {_money('l.l_extendedprice')} * CAST(0.1 AS DECIMAL(2,1)) * {one_minus} AS cs_sales_price,
  {_money('l.l_extendedprice')} AS cs_ext_list_price,
  {ext_sales} AS cs_ext_sales_price,
  {_money('l.l_extendedprice')} * CAST(l.l_discount AS DECIMAL(6,4)) AS cs_ext_discount_amt,
  {_money('l.l_extendedprice')} * CAST(0.6 AS DECIMAL(2,1)) AS cs_ext_wholesale_cost,
  {_money('l.l_extendedprice')} * CAST(l.l_tax AS DECIMAL(6,4)) AS cs_ext_tax,
  {_money('l.l_extendedprice')} * CAST(l.l_discount AS DECIMAL(6,4)) AS cs_coupon_amt,
  {_money('l.l_extendedprice')} * CAST(0.02 AS DECIMAL(4,2)) AS cs_ext_ship_cost,
  {ext_sales} AS cs_net_paid,
  {ext_sales} + {_money('l.l_extendedprice')} * CAST(l.l_tax AS DECIMAL(6,4)) AS cs_net_paid_inc_tax,
  {ext_sales} - CAST(l.l_quantity * 100 AS DECIMAL(14,2)) AS cs_net_profit
FROM {src('lineitem')} l JOIN {src('orders')} o
  ON l.l_orderkey = o.o_orderkey
WHERE l.l_linenumber % 3 = 1""",
        "web_sales": f"""
SELECT {_julian(d, 'o.o_orderdate')} AS ws_sold_date_sk,
  o.o_custkey AS ws_bill_customer_sk,
  CAST((l.l_orderkey * 181 + l.l_linenumber * 7) % 86400 AS INT) AS ws_sold_time_sk,
  CAST({_julian(d, 'o.o_orderdate')} + (l.l_orderkey * 3 + l.l_linenumber) % 60 + 2 AS INT) AS ws_ship_date_sk,
  l.l_partkey AS ws_item_sk,
  l.l_orderkey AS ws_order_number,
  CASE WHEN o.o_orderkey % 2 = 0 THEN o.o_custkey
       ELSE (o.o_custkey % 100) + 1 END AS ws_ship_customer_sk,
  (o.o_custkey * 17 + l.l_linenumber) % 144 AS ws_ship_hdemo_sk,
  CASE WHEN o.o_orderkey % 2 = 0 THEN o.o_custkey
       ELSE (o.o_custkey % 100) + 1 END AS ws_bill_addr_sk,
  ((o.o_custkey * 7 + l.l_orderkey) % 100) + 1 AS ws_ship_addr_sk,
  l.l_suppkey % 12 AS ws_web_site_sk,
  (l.l_orderkey * 7 + l.l_linenumber) % 60 AS ws_web_page_sk,
  (l.l_orderkey * 13 + l.l_linenumber) % 20 AS ws_ship_mode_sk,
  l.l_suppkey % 5 AS ws_warehouse_sk,
  l.l_partkey % 30 AS ws_promo_sk,
  CAST(l.l_quantity AS INT) AS ws_quantity,
  {_money('l.l_extendedprice')} * CAST(0.01 AS DECIMAL(4,2)) AS ws_wholesale_cost,
  {_money('l.l_extendedprice')} * CAST(0.1 AS DECIMAL(2,1)) AS ws_list_price,
  {_money('l.l_extendedprice')} * CAST(0.1 AS DECIMAL(2,1)) * {one_minus} AS ws_sales_price,
  {_money('l.l_extendedprice')} AS ws_ext_list_price,
  {ext_sales} AS ws_ext_sales_price,
  {_money('l.l_extendedprice')} * CAST(l.l_discount AS DECIMAL(6,4)) AS ws_ext_discount_amt,
  {_money('l.l_extendedprice')} * CAST(0.6 AS DECIMAL(2,1)) AS ws_ext_wholesale_cost,
  {_money('l.l_extendedprice')} * CAST(l.l_tax AS DECIMAL(6,4)) AS ws_ext_tax,
  {_money('l.l_extendedprice')} * CAST(l.l_discount AS DECIMAL(6,4)) AS ws_coupon_amt,
  {_money('l.l_extendedprice')} * CAST(0.02 AS DECIMAL(4,2)) AS ws_ext_ship_cost,
  {ext_sales} AS ws_net_paid,
  {ext_sales} + {_money('l.l_extendedprice')} * CAST(l.l_tax AS DECIMAL(6,4)) AS ws_net_paid_inc_tax,
  {ext_sales} - CAST(l.l_quantity * 100 AS DECIMAL(14,2)) AS ws_net_profit
FROM {src('lineitem')} l JOIN {src('orders')} o
  ON l.l_orderkey = o.o_orderkey
WHERE l.l_linenumber % 3 = 2""",
        "store_returns": f"""
SELECT CAST({_julian(d, 'o.o_orderdate')} + (l.l_orderkey % 90) + 3 AS INT) AS sr_returned_date_sk,
  l.l_partkey AS sr_item_sk,
  l.l_orderkey AS sr_ticket_number,
  o.o_custkey AS sr_customer_sk,
  (o.o_custkey * 11 + l.l_orderkey) % 720 AS sr_cdemo_sk,
  l.l_suppkey % 12 AS sr_store_sk,
  (l.l_orderkey * 3 + l.l_linenumber) % 35 AS sr_reason_sk,
  {_idiv(d, 'CAST(l.l_quantity AS INT)', 2)} + 1 AS sr_return_quantity,
  {_money('l.l_extendedprice')} * CAST(0.5 AS DECIMAL(2,1)) AS sr_return_amt,
  {_money('l.l_extendedprice')} * CAST(0.1 AS DECIMAL(2,1)) AS sr_net_loss
FROM {src('lineitem')} l JOIN {src('orders')} o
  ON l.l_orderkey = o.o_orderkey
WHERE (l.l_orderkey + l.l_linenumber) % 4 = 0""",
        "catalog_returns": f"""
SELECT CAST({_julian(d, 'o.o_orderdate')} + (l.l_orderkey % 90) + 3 AS INT) AS cr_returned_date_sk,
  l.l_partkey AS cr_item_sk,
  l.l_orderkey AS cr_order_number,
  o.o_custkey AS cr_returning_customer_sk,
  CASE WHEN o.o_orderkey % 2 = 0 THEN o.o_custkey
       ELSE (o.o_custkey % 100) + 1 END AS cr_returning_addr_sk,
  l.l_suppkey % 6 AS cr_call_center_sk,
  (l.l_partkey * 3) % 100 AS cr_catalog_page_sk,
  (l.l_orderkey * 3 + l.l_linenumber) % 35 AS cr_reason_sk,
  {_idiv(d, 'CAST(l.l_quantity AS INT)', 2)} + 1 AS cr_return_quantity,
  {_money('l.l_extendedprice')} * CAST(0.5 AS DECIMAL(2,1)) AS cr_return_amount,
  {_money('l.l_extendedprice')} * CAST(0.5 AS DECIMAL(2,1))
    + {_money('l.l_extendedprice')} * CAST(l.l_tax AS DECIMAL(6,4)) AS cr_return_amt_inc_tax,
  {_money('l.l_extendedprice')} * CAST(0.3 AS DECIMAL(2,1)) AS cr_refunded_cash,
  {_money('l.l_extendedprice')} * CAST(0.1 AS DECIMAL(2,1)) AS cr_reversed_charge,
  {_money('l.l_extendedprice')} * CAST(0.1 AS DECIMAL(2,1)) AS cr_store_credit,
  {_money('l.l_extendedprice')} * CAST(0.1 AS DECIMAL(2,1)) AS cr_net_loss
FROM {src('lineitem')} l JOIN {src('orders')} o
  ON l.l_orderkey = o.o_orderkey
WHERE l.l_linenumber % 3 = 1 AND (l.l_orderkey + l.l_linenumber) % 4 = 0""",
        "web_returns": f"""
SELECT CAST({_julian(d, 'o.o_orderdate')} + (l.l_orderkey % 90) + 3 AS INT) AS wr_returned_date_sk,
  l.l_partkey AS wr_item_sk,
  l.l_orderkey AS wr_order_number,
  o.o_custkey AS wr_returning_customer_sk,
  (o.o_custkey * 11 + l.l_orderkey) % 720 AS wr_refunded_cdemo_sk,
  (o.o_custkey * 19 + l.l_orderkey) % 720 AS wr_returning_cdemo_sk,
  CASE WHEN o.o_orderkey % 2 = 0 THEN o.o_custkey
       ELSE (o.o_custkey % 100) + 1 END AS wr_refunded_addr_sk,
  ((o.o_custkey * 7 + l.l_orderkey) % 100) + 1 AS wr_returning_addr_sk,
  (l.l_orderkey * 7 + l.l_linenumber) % 60 AS wr_web_page_sk,
  (l.l_orderkey * 3 + l.l_linenumber) % 35 AS wr_reason_sk,
  {_idiv(d, 'CAST(l.l_quantity AS INT)', 2)} + 1 AS wr_return_quantity,
  {_money('l.l_extendedprice')} * CAST(0.5 AS DECIMAL(2,1)) AS wr_return_amt,
  {_money('l.l_extendedprice')} * CAST(0.3 AS DECIMAL(2,1)) AS wr_refunded_cash,
  CAST((l.l_orderkey % 90) + 10 AS DECIMAL(7,2)) AS wr_fee,
  {_money('l.l_extendedprice')} * CAST(0.1 AS DECIMAL(2,1)) AS wr_net_loss
FROM {src('lineitem')} l JOIN {src('orders')} o
  ON l.l_orderkey = o.o_orderkey
WHERE l.l_linenumber % 3 = 2 AND (l.l_orderkey + l.l_linenumber) % 4 = 0""",
        "inventory": f"""
SELECT DISTINCT
  CAST({_julian(d, 'o.o_orderdate')} - {_dow(d, 'o.o_orderdate')} AS INT) AS inv_date_sk,
  l.l_partkey AS inv_item_sk,
  l.l_suppkey % 5 AS inv_warehouse_sk,
  CAST((l.l_partkey * 7 + (l.l_suppkey % 5) * 13
        + {_julian(d, 'o.o_orderdate')} - {_dow(d, 'o.o_orderdate')}) % 200 AS INT)
    AS inv_quantity_on_hand
FROM {src('lineitem')} l JOIN {src('orders')} o
  ON l.l_orderkey = o.o_orderkey""",
        "date_dim": f"""
SELECT {_julian(d, 'd')} AS d_date_sk,
  d AS d_date,
  CAST(year(d) AS INT) AS d_year,
  CAST(month(d) AS INT) AS d_moy,
  CAST(day(d) AS INT) AS d_dom,
  {_dow(d, 'd')} AS d_dow,
  {_dayname(d, 'd')} AS d_day_name,
  CAST(FLOOR(({_julian(d, 'd')} - 2415021) / 7) AS INT) AS d_week_seq,
  CAST((year(d) - 1900) * 12 + month(d) - 1 AS INT) AS d_month_seq,
  CAST(quarter(d) AS INT) AS d_qoy,
  {s('year(d)')} || 'Q' || {s('quarter(d)')} AS d_quarter_name
FROM ({_calendar(d)})""",
        "time_dim": f"""
SELECT CAST(t AS INT) AS t_time_sk,
  CAST(t AS INT) AS t_time,
  CAST({_idiv(d, 't', 3600)} AS INT) AS t_hour,
  CAST({_idiv(d, 't % 3600', 60)} AS INT) AS t_minute,
  CAST(t % 60 AS INT) AS t_second,
  CASE WHEN {_idiv(d, 't', 3600)} BETWEEN 6 AND 8 THEN 'breakfast'
       WHEN {_idiv(d, 't', 3600)} BETWEEN 11 AND 13 THEN 'lunch'
       WHEN {_idiv(d, 't', 3600)} BETWEEN 17 AND 19 THEN 'dinner'
       ELSE NULL END AS t_meal_time
FROM ({_seconds(d)})""",
        "warehouse": f"""
SELECT n_nationkey AS w_warehouse_sk,
  'Warehouse_' || {s('n_nationkey')} AS w_warehouse_name,
  CAST(500000 + n_nationkey * 37131 AS INT) AS w_warehouse_sq_ft,
  'City_' || {s('n_nationkey % 5')} AS w_city,
  'County_' || {s('n_nationkey % 3')} AS w_county,
  'ST_' || {s('n_nationkey % 4')} AS w_state,
  'United States' AS w_country
FROM {src('nation')} WHERE n_nationkey < 5""",
        "ship_mode": f"""
SELECT n_nationkey AS sm_ship_mode_sk,
  {_pick('n_nationkey', 'EXPRESS', 'NEXT DAY', 'OVERNIGHT', 'REGULAR', 'LIBRARY')} AS sm_type,
  {_pick('n_nationkey * 7', 'UPS', 'FEDEX', 'AIRBORNE', 'USPS', 'DHL', 'TBS', 'ZHOU', 'LATVIAN', 'MSC', 'ORIENTAL')} AS sm_carrier
FROM {src('nation')} WHERE n_nationkey < 20""",
        "income_band": f"""
SELECT n_nationkey + 1 AS ib_income_band_sk,
  CAST(n_nationkey * 10000 AS INT) AS ib_lower_bound,
  CAST((n_nationkey + 1) * 10000 - 1 AS INT) AS ib_upper_bound
FROM {src('nation')} WHERE n_nationkey < 20""",
        "call_center": f"""
SELECT n_nationkey AS cc_call_center_sk,
  'CC_' || lpad({s('n_nationkey')}, 2, '0') AS cc_call_center_id,
  'CallCenter_' || {s('n_nationkey')} AS cc_name,
  'Manager_' || {s('n_nationkey % 4')} AS cc_manager,
  'County_' || {s('n_nationkey % 3')} AS cc_county
FROM {src('nation')} WHERE n_nationkey < 6""",
        "web_site": f"""
SELECT n_nationkey AS web_site_sk,
  'WEB_' || lpad({s('n_nationkey')}, 2, '0') AS web_site_id,
  'site_' || {s('n_nationkey % 6')} AS web_name,
  {_pick('n_nationkey', 'pri', 'ally', 'able', 'ese', 'anti', 'cally')} AS web_company_name
FROM {src('nation')} WHERE n_nationkey < 12""",
        "web_page": f"""
SELECT c_custkey - 1 AS wp_web_page_sk,
  CAST(100 + (c_custkey * 97) % 7900 AS INT) AS wp_char_count
FROM {src('customer')} WHERE c_custkey <= 60""",
        "catalog_page": f"""
SELECT c_custkey - 1 AS cp_catalog_page_sk,
  'CP_' || lpad({s('c_custkey - 1')}, 4, '0') AS cp_catalog_page_id
FROM {src('customer')} WHERE c_custkey <= 100""",
        "reason": f"""
SELECT c_custkey - 1 AS r_reason_sk,
  'reason ' || {s('c_custkey - 1')} AS r_reason_desc
FROM {src('customer')} WHERE c_custkey <= 35""",
        "item": f"""
SELECT p_partkey AS i_item_sk,
  'ITEM_' || lpad({s('p_partkey')}, 8, '0') AS i_item_id,
  p_name AS i_item_desc,
  p_brand AS i_brand,
  CAST(substr(p_brand, 7) AS INT) AS i_brand_id,
  p_type AS i_category,
  CASE p_type WHEN 'ECONOMY' THEN 1 WHEN 'LARGE' THEN 2
    WHEN 'MEDIUM' THEN 3 WHEN 'PROMO' THEN 4 WHEN 'SMALL' THEN 5
    ELSE 6 END AS i_category_id,
  {_word2(d, 'p_name')} AS i_class,
  CAST(p_partkey % 5 + 1 AS INT) AS i_manufact_id,
  'Manufacturer#' || {s('p_partkey % 5 + 1')} AS i_manufact,
  CAST(p_partkey % 40 + 1 AS INT) AS i_manager_id,
  CAST(p_retailprice AS DECIMAL(12,2)) AS i_current_price,
  CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.6 AS DECIMAL(2,1)) AS i_wholesale_cost,
  CAST((p_partkey % 16) + 1 AS INT) AS i_class_id,
  p_name AS i_product_name,
  {_pick('p_partkey * 3',
         'aquamarine', 'azure', 'beige', 'black', 'blue', 'brown',
         'chartreuse', 'chiffon', 'coral', 'cream', 'cyan', 'firebrick',
         'gainsboro', 'ghost', 'goldenrod', 'honeydew')} AS i_color,
  {_pick('p_size', 'small', 'medium', 'large', 'extra large', 'economy', 'N/A', 'petite')} AS i_size,
  {_pick('p_partkey * 7', 'Each', 'Dozen', 'Case', 'Pound', 'Ounce',
         'Gram', 'Ton', 'Box', 'Bundle', 'Pallet')} AS i_units
FROM {src('part')}""",
        "store": f"""
SELECT n_nationkey AS s_store_sk,
  'STORE_' || lpad({s('n_nationkey')}, 2, '0') AS s_store_id,
  'Store_' || {s('n_nationkey')} AS s_store_name,
  'City_' || {s('n_nationkey % 5')} AS s_city,
  'County_' || {s('n_nationkey % 3')} AS s_county,
  'ST_' || {s('n_nationkey % 4')} AS s_state,
  'Unknown' AS s_company_name,
  CAST(200 + n_nationkey * 7 AS INT) AS s_number_employees,
  CAST(-5 AS DECIMAL(5,2)) AS s_gmt_offset,
  lpad({s('10000 + n_nationkey * 137')}, 5, '0') AS s_zip,
  CAST(1 AS INT) AS s_company_id,
  CAST(n_nationkey % 10 + 1 AS INT) AS s_market_id,
  {s('100 + n_nationkey')} AS s_street_number,
  'StoreSt_' || {s('n_nationkey % 5')} AS s_street_name,
  'Street' AS s_street_type,
  'Suite ' || {s('n_nationkey')} AS s_suite_number
FROM {src('nation')} WHERE n_nationkey < 12""",
        "customer": f"""
SELECT c_custkey AS c_customer_sk,
  'First' || {s('c_custkey % 97')} AS c_first_name,
  'Last' || {s('c_custkey % 89')} AS c_last_name,
  CASE CAST(c_custkey % 6 AS INT) WHEN 0 THEN 'Mr.' WHEN 1 THEN 'Ms.'
    WHEN 2 THEN 'Dr.' WHEN 3 THEN 'Miss' WHEN 4 THEN 'Sir'
    ELSE 'Mrs.' END AS c_salutation,
  CASE WHEN c_custkey % 3 = 0 THEN 'Y' ELSE 'N' END AS c_preferred_cust_flag,
  c_custkey AS c_current_addr_sk,
  (c_custkey * 17) % 720 AS c_current_cdemo_sk,
  (c_custkey * 23) % 144 AS c_current_hdemo_sk,
  'ID_' || lpad({s('c_custkey')}, 12, '0') AS c_customer_id,
  CAST(1924 + c_custkey % 69 AS INT) AS c_birth_year,
  CAST(c_custkey % 12 + 1 AS INT) AS c_birth_month,
  CAST(c_custkey % 28 + 1 AS INT) AS c_birth_day,
  {_pick('c_custkey * 13', 'UNITED STATES', 'CANADA', 'GERMANY', 'JAPAN',
         'BRAZIL', 'FRANCE', 'INDIA', 'CHINA')} AS c_birth_country,
  'login_' || {s('c_custkey % 50')} AS c_login,
  'First' || {s('c_custkey % 97')} || '.Last' || {s('c_custkey % 89')}
    || '@example.com' AS c_email_address,
  CAST({_JULIAN_EPOCH} + 9131 + c_custkey % 2557 AS INT) AS c_first_sales_date_sk,
  CAST({_JULIAN_EPOCH} + 9161 + c_custkey % 2500 AS INT) AS c_first_shipto_date_sk,
  CAST({_JULIAN_EPOCH} + 10000 + c_custkey % 1500 AS INT) AS c_last_review_date
FROM {src('customer')}""",
        "customer_address": f"""
SELECT c_custkey AS ca_address_sk,
  'CA_City_' || {s('c_custkey % 40')} AS ca_city,
  'CA_County_' || {s('c_custkey % 8')} AS ca_county,
  lpad({s('(10000 + c_custkey * 31) % 100000')}, 5, '0') AS ca_zip,
  {_pick('c_custkey', 'AL', 'GA', 'KY', 'TN', 'TX', 'CA', 'OH', 'IL', 'MI',
         'VA', 'NC', 'FL', 'IN', 'WI', 'MN', 'MO', 'LA', 'OK', 'IA', 'KS')} AS ca_state,
  'United States' AS ca_country,
  CAST(CASE CAST(c_custkey % 4 AS INT) WHEN 0 THEN -5 WHEN 1 THEN -6
    WHEN 2 THEN -7 ELSE -8 END AS DECIMAL(5,2)) AS ca_gmt_offset,
  {s('c_custkey % 1000')} AS ca_street_number,
  'St_' || {s('c_custkey % 30')} AS ca_street_name,
  {_pick('c_custkey * 3', 'Street', 'Ave', 'Blvd', 'Way', 'Ct')} AS ca_street_type,
  'Suite ' || {s('(c_custkey * 7) % 100')} AS ca_suite_number,
  {_pick('c_custkey * 11', 'apartment', 'condo', 'single family')} AS ca_location_type
FROM {src('customer')}""",
        "customer_demographics": f"""
SELECT c_custkey AS cd_demo_sk,
  CASE WHEN c_custkey % 2 = 0 THEN 'M' ELSE 'F' END AS cd_gender,
  CASE CAST(c_custkey % 5 AS INT) WHEN 0 THEN 'M' WHEN 1 THEN 'S'
    WHEN 2 THEN 'D' WHEN 3 THEN 'W' ELSE 'U' END AS cd_marital_status,
  CASE CAST(c_custkey % 7 AS INT) WHEN 0 THEN 'Primary'
    WHEN 1 THEN 'Secondary' WHEN 2 THEN 'College'
    WHEN 3 THEN '2 yr Degree' WHEN 4 THEN '4 yr Degree'
    WHEN 5 THEN 'Advanced Degree' ELSE 'Unknown' END AS cd_education_status,
  CAST((c_custkey % 20) * 500 + 500 AS INT) AS cd_purchase_estimate,
  CASE CAST(c_custkey % 4 AS INT) WHEN 0 THEN 'Low Risk'
    WHEN 1 THEN 'High Risk' WHEN 2 THEN 'Good'
    ELSE 'Unknown' END AS cd_credit_rating,
  CAST(c_custkey % 7 AS INT) AS cd_dep_count,
  CAST((c_custkey * 3) % 7 AS INT) AS cd_dep_employed_count,
  CAST((c_custkey * 5) % 7 AS INT) AS cd_dep_college_count
FROM {src('customer')} WHERE c_custkey < 720""",
        "household_demographics": f"""
SELECT c_custkey AS hd_demo_sk,
  CAST((c_custkey * 3) % 10 AS INT) AS hd_dep_count,
  CAST(c_custkey % 6 AS INT) AS hd_vehicle_count,
  CASE CAST(c_custkey % 6 AS INT) WHEN 0 THEN '0-500'
    WHEN 1 THEN '501-1000' WHEN 2 THEN '1001-5000'
    WHEN 3 THEN '5001-10000' WHEN 4 THEN '>10000'
    ELSE 'Unknown' END AS hd_buy_potential,
  CAST(c_custkey % 20 + 1 AS INT) AS hd_income_band_sk
FROM {src('customer')} WHERE c_custkey < 144""",
        "promotion": f"""
SELECT c_custkey AS p_promo_sk,
  CASE WHEN c_custkey % 2 = 0 THEN 'N' ELSE 'Y' END AS p_channel_email,
  CASE WHEN c_custkey % 3 = 0 THEN 'N' ELSE 'Y' END AS p_channel_event,
  CASE WHEN c_custkey % 5 = 0 THEN 'Y' ELSE 'N' END AS p_channel_dmail,
  CASE WHEN c_custkey % 7 = 0 THEN 'Y' ELSE 'N' END AS p_channel_tv
FROM {src('customer')} WHERE c_custkey < 30""",
    }


def register_tpcds_views(spark: SparkSession, sf_dir: str) -> None:
    """Create the TPC-DS compatibility temp views (idempotent)."""
    raws: dict[str, str] = {}

    def src(name: str) -> str:
        if name not in raws:
            view = f"dstext_raw_{name}"
            spark.read.parquet(table_path(sf_dir, name)).createOrReplaceTempView(view)
            raws[name] = view
        return raws[name]

    for name, body in tpcds_views(_SPARK, src).items():
        spark.sql(body).createOrReplaceTempView(name)


def tpcds_prelude() -> str:
    views = tpcds_views(_DUCK, lambda n: f"main.{n}")
    ctes = ",\n".join(f'"{name}" AS ({body})' for name, body in views.items())
    return f"WITH {ctes}"


#: Literal-only fitted substitutions (same contract as
#: sqltext.FITTED_SUBS: quoted literals / bare numbers only, pinned by
#: tests/test_sqltext_tpcds.py). Queries absent here run non-vacuous
#: with their DEFAULT substitutions against the synthetic domains.
TPCDS_FITTED_SUBS: dict[str, dict[str, str]] = {
    "q3": {"436": "3"},
    "q10": {"2002": "2000",
            "'Walker County'": "'CA_County_0'",
            "'Richland County'": "'CA_County_1'",
            "'Gaines County'": "'CA_County_2'",
            "'Douglas County'": "'CA_County_3'",
            "'Dona Ana County'": "'CA_County_4'"},
    "q27": {"'TN'": "'ST_1'", "'AL'": "'ST_2'", "'SD'": "'ST_3'"},
    "q34": {"'Saginaw County'": "'County_0'", "'Sumner County'": "'County_1'",
            "'Appanoose County'": "'County_2'", "'Daviess County'": "'County_0'",
            "'Fairfield County'": "'County_1'", "'Raleigh County'": "'County_2'",
            "'Ziebach County'": "'County_0'", "'Williamson County'": "'County_1'",
            "15": "2", "20": "4"},
    "q46": {"'Midway'": "'City_0'", "'Concord'": "'City_1'",
            "'Spring Hill'": "'City_2'", "'Brownsville'": "'City_3'",
            "'Greenville'": "'City_4'"},
    "q53": {"'Books'": "'ECONOMY'", "'Children'": "'LARGE'",
            "'Electronics'": "'MEDIUM'", "'Women'": "'PROMO'",
            "'Music'": "'SMALL'", "'Men'": "'STANDARD'",
            "'personal'": "'bolt'", "'portable'": "'ring'",
            "'reference'": "'gear'", "'self-help'": "'widget'",
            "'accessories'": "'rod'", "'classical'": "'anvil'",
            "'fragrances'": "'plate'", "'pants'": "'gizmo'",
            "'scholaramalgamalg #14'": "'Brand#1'",
            "'scholaramalgamalg #7'": "'Brand#2'",
            "'exportiunivamalg #9'": "'Brand#3'",
            "'scholaramalgamalg #9'": "'Brand#4'",
            "'amalgimporto #1'": "'Brand#5'",
            "'edu packscholar #1'": "'Brand#6'",
            "'exportiimporto #1'": "'Brand#7'",
            "'importoamalg #1'": "'Brand#8'"},
    # q55/q63 as written select Nov-2001 / Aug-2001..Jul-2002 — past the
    # data's 2001-08-01 end. Shift the julian partition windows (and
    # q63's month_seq base) back one year to land on populated months.
    "q55": {"48": "8", "2001": "2000",
            "2452215": "2451850", "2452244": "2451879"},
    "q63": None,  # q53's literal family + the date shift; filled below
    "q65": {},
    "q68": {"'Midway'": "'City_0'", "'Fairview'": "'City_1'"},
    "q73": {"'Fairfield County'": "'County_0'", "'Ziebach County'": "'County_1'",
            "'Bronx County'": "'County_2'", "'Barrow County'": "'County_0'"},
    "q89": {"'Home'": "'ECONOMY'", "'Books'": "'LARGE'",
            "'Electronics'": "'MEDIUM'", "'Shoes'": "'PROMO'",
            "'Jewelry'": "'SMALL'", "'Men'": "'STANDARD'",
            "'wallpaper'": "'bolt'", "'parenting'": "'ring'",
            "'musical'": "'gear'", "'womens'": "'rod'",
            "'birdal'": "'anvil'", "'pants'": "'gizmo'"},
    "q98": {"'Jewelry'": "'ECONOMY'", "'Sports'": "'LARGE'",
            "'Books'": "'MEDIUM'"},
}
TPCDS_FITTED_SUBS["q63"] = dict(
    TPCDS_FITTED_SUBS["q53"],
    **{"1219": "1207", "2452123": "2451758", "2452487": "2452122"},
)


def tpcds_fitted_text(name: str) -> str:
    text = load_text(TPCDS_FAMILY, name)
    return sub_literals(text, TPCDS_FITTED_SUBS.get(name) or {})


def run_tpcds_text(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    fitted: bool = False,
    register: bool = True,
) -> DataFrame:
    # register=False: caller registered the (idempotent) views once up
    # front — per-call re-registration would race in a threaded sweep
    if register:
        register_tpcds_views(spark, sf_dir)
    text = tpcds_fitted_text(name) if fitted else load_text(TPCDS_FAMILY, name)
    return normalize_output(spark.sql(text))


def tpcds_oracle_sql(name: str, fitted: bool = False) -> str:
    text = tpcds_fitted_text(name) if fitted else load_text(TPCDS_FAMILY, name)
    # oracle-side dialect patch only (the Spark text stays verbatim):
    # DuckDB spells LEFT SEMI JOIN as SEMI JOIN (q10)
    import re as _re

    text = _re.sub(r"(?i)\bleft\s+semi\s+join\b", "SEMI JOIN", text)
    return merge_prelude(tpcds_prelude(), text)


def _register(qname: str, name: str, fitted: bool, doc: str) -> None:
    def impl(spark: SparkSession, sf_dir: str) -> DataFrame:
        return run_tpcds_text(spark, sf_dir, name, fitted=fitted)

    impl.__name__ = qname
    impl.__doc__ = doc
    query(qname, oracle=tpcds_oracle_sql(name, fitted=fitted))(impl)


if tpcds_corpus_available():
    _V = " (fitted: literal-only substitutions into the synthetic domains)"
    _D = (
        "Reference tpcds-modifiedQueries/%s.sql executed VERBATIM through "
        "spark.sql over the TPC-DS compatibility catalog "
        "(plans/sqltext_tpcds.py; the reference's Decision Support "
        "Benchmark2 entry path)."
    )
    _register("dstext_q3", "q3", True, _D % "q3" + _V)
    _register("dstext_q10", "q10", True, _D % "q10" + _V)
    _register("dstext_q19", "q19", False, _D % "q19")
    _register("dstext_q42", "q42", False, _D % "q42")
    _register("dstext_q43", "q43", False, _D % "q43")
    _register("dstext_ss_max", "ss_max", False, _D % "ss_max")
    # Registered = the value-safe subset: texts whose OUTPUT columns are
    # sums/counts/attributes only (exact DECIMAL/INT cross-engine).
    # Texts with avg/ratio outputs or avg-threshold filters (q7, q27,
    # q53, q59, q63, q65, q89, q98) are pytest-verified with 1e-6
    # numeric tolerance instead (tests/test_sqltext_tpcds.py): Spark
    # avg(DECIMAL) rounds at scale+4 while DuckDB computes in double,
    # so an exact value-hash gate on them would be representation luck.
    _register("dstext_q34", "q34", True, _D % "q34" + _V)
    _register("dstext_q46", "q46", True, _D % "q46" + _V)
    _register("dstext_q52", "q52", True, _D % "q52" + _V)
    _register("dstext_q55", "q55", True, _D % "q55" + _V)
    _register("dstext_q68", "q68", True, _D % "q68" + _V)
    _register("dstext_q73", "q73", True, _D % "q73" + _V)
    _register("dstext_q79", "q79", True, _D % "q79" + _V)
