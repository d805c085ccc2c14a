"""Expression parity sweep (SURVEY.md §2.9, build-plan slice 3).

The reference converts ~80 Catalyst expressions to Gandiva/native
code (reference: expression/ColumnarExpressionConverter.scala:35-497;
string ops in ColumnarUnaryOperator.scala/ColumnarTernaryOperator.scala;
datetime in ColumnarDateTimeExpressions.scala:60-801; hash in
ColumnarHashExpression.scala; arithmetic in ColumnarArithmetic.scala/
ColumnarBinaryOperator.scala). Here each category is one registered
query evaluating the whole expression table against the DuckDB oracle
— per docs/Expressions-Compatibility.md the reference *deviated* from
Spark on some datetime/cast semantics; we follow Spark (those rows
were reference bugs, SURVEY.md slice-3 note).

Cross-dialect gotchas handled: DuckDB float->int CAST rounds while
Spark truncates (mirror with trunc()); DuckDB has no pmod (emulate
((x%y)+y)%y); Spark date parts return INT32 while DuckDB returns
BIGINT (CAST in the oracle); DuckDB dayofweek is 0=Sunday vs Spark
1=Sunday.

All queries filter to a bounded key range (parity needs coverage, not
volume) and are pure per-row projections — whole-stage codegen, no
shuffle except the final sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gazelle_plugin_spark.plans import query
from gazelle_plugin_spark.plans._util import t


@query(
    "expr_string",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS up, lower(p_name) AS lo,
       CAST(length(p_name) AS INT) AS len,
       substring(p_name, 3, 5) AS sub,
       p_name || '-' || p_brand AS cat,
       concat_ws('/', p_name, p_type, p_brand) AS catws,
       lpad(p_brand, 12, '*') AS lp, rpad(p_brand, 12, '*') AS rp,
       trim(lpad(p_name, 30, ' ')) AS trm,
       replace(p_name, 'a', '@') AS rep,
       translate(p_name, 'aeiou', '12345') AS tra,
       CAST(instr(p_name, 'a') AS INT) AS ins,
       left(p_name, 4) AS lft, right(p_name, 4) AS rgt,
       reverse(p_name) AS rev, repeat(p_brand, 2) AS rpt,
       p_name LIKE '%a%' AS lk,
       starts_with(p_name, 'p') AS sw, ends_with(p_name, 's') AS ew,
       contains(p_name, 'ar') AS cont,
       regexp_extract(p_name, '([a-z]+)', 1) AS rex,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS rre,
       hex(p_partkey) AS hx, bin(p_partkey) AS bn,
       CAST(len(string_split(p_name, 'a')) AS INT) AS spl,
       CAST(position('r' in p_name) AS INT) AS loc,
       array_to_string((string_split(p_name, 'a'))[1:2], 'a') AS sidx,
       CAST(ascii(p_name) AS INT) AS asc,
       chr(65 + CAST(p_partkey % 26 AS INT)) AS chr
FROM part WHERE p_partkey < 200 ORDER BY p_partkey
""",
)
def expr_string(spark, sf_dir):
    """String expression table: upper/lower/length/substring/concat/
    concat_ws/lpad/rpad/trim/replace/translate/instr/left/right/
    reverse/repeat/like/startswith/endswith/contains/regexp_extract/
    regexp_replace (ColumnarUnaryOperator.scala + TernaryOperator
    parity rows)."""
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    n = F.col("p_name")
    return p.select(
        "p_partkey",
        F.upper(n).alias("up"),
        F.lower(n).alias("lo"),
        F.length(n).alias("len"),
        F.substring(n, 3, 5).alias("sub"),
        F.concat(n, F.lit("-"), F.col("p_brand")).alias("cat"),
        F.concat_ws("/", n, F.col("p_type"), F.col("p_brand")).alias("catws"),
        F.lpad(F.col("p_brand"), 12, "*").alias("lp"),
        F.rpad(F.col("p_brand"), 12, "*").alias("rp"),
        F.trim(F.lpad(n, 30, " ")).alias("trm"),
        F.replace(n, F.lit("a"), F.lit("@")).alias("rep"),
        F.translate(n, "aeiou", "12345").alias("tra"),
        F.instr(n, "a").alias("ins"),
        F.expr("left(p_name, 4)").alias("lft"),
        F.expr("right(p_name, 4)").alias("rgt"),
        F.reverse(n).alias("rev"),
        F.repeat(F.col("p_brand"), 2).alias("rpt"),
        n.like("%a%").alias("lk"),
        F.startswith(n, F.lit("p")).alias("sw"),
        F.endswith(n, F.lit("s")).alias("ew"),
        F.contains(n, F.lit("ar")).alias("cont"),
        F.regexp_extract(n, "([a-z]+)", 1).alias("rex"),
        F.regexp_replace(n, "[aeiou]", "_").alias("rre"),
        F.hex(F.col("p_partkey")).alias("hx"),
        F.bin(F.col("p_partkey")).alias("bn"),
        F.size(F.split(n, "a")).alias("spl"),
        F.locate("r", n).alias("loc"),
        F.substring_index(n, "a", 2).alias("sidx"),
        F.ascii(n).alias("asc"),
        F.expr("char(65 + pmod(p_partkey, 26))").alias("chr"),
    ).orderBy("p_partkey")


@query(
    "expr_datetime",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mo,
       CAST(day(o_orderdate) AS INT) AS dy,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
       CAST(dayofyear(o_orderdate) AS INT) AS doy,
       CAST(weekofyear(o_orderdate) AS INT) AS woy,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mstart,
       CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3m,
       CAST(CAST(o_orderdate AS DATE) + 10 AS TIMESTAMP) AS plus10d,
       CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INT) AS dd,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS ld,
       CAST(epoch_us(o_orderdate) // 1000000 AS BIGINT) AS epoch_s,
       strftime(o_orderdate, '%Y-%m-%d') AS fmt,
       CAST(make_date(CAST(year(o_orderdate) AS INT), 6, 15) AS TIMESTAMP) AS md,
       make_timestamp((800000000 + o_orderkey * 3600) * 1000000) AS ts_s,
       make_timestamp(((800000000 + o_orderkey * 3600) * 1000 + 123) * 1000) AS ts_ms,
       make_timestamp((800000000 + o_orderkey * 3600) * 1000000 + 456789) AS ts_us,
       make_timestamp(CAST(year(o_orderdate) AS BIGINT), 6, 15, 12, 30, 45.5) AS mk_ts
FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey
""",
)
def expr_datetime(spark, sf_dir):
    """Datetime expression table: year/month/day/quarter/dayofweek/
    dayofyear/weekofyear/date_trunc/add_months/date_add/datediff/
    last_day/unix seconds/date_format/make_date, plus the epoch
    conversion tail: timestamp_seconds / timestamp_millis /
    timestamp_micros / make_timestamp
    (ColumnarDateTimeExpressions.scala:60-801 parity incl. the
    SecondsToTimestamp/MillisToTimestamp/MicrosToTimestamp/
    MakeTimestamp cases; Spark semantics kept where the reference
    deviated)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    d = F.col("o_orderdate")
    dt = F.to_date(d)
    secs = (F.lit(800000000) + F.col("o_orderkey") * 3600).cast("long")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dy"),
        F.quarter(d).alias("qtr"),
        F.dayofweek(d).alias("dow"),
        F.dayofyear(d).alias("doy"),
        F.weekofyear(d).alias("woy"),
        F.trunc(dt, "month").cast("timestamp").alias("mstart"),
        F.add_months(dt, 3).cast("timestamp").alias("plus3m"),
        F.date_add(dt, 10).cast("timestamp").alias("plus10d"),
        F.datediff(dt, F.lit("1995-01-01").cast("date")).alias("dd"),
        F.last_day(dt).cast("timestamp").alias("ld"),
        F.expr("unix_micros(cast(o_orderdate as timestamp_ltz)) div 1000000").alias(
            "epoch_s"
        ),
        F.date_format(d, "yyyy-MM-dd").alias("fmt"),
        F.make_date(F.year(d), F.lit(6), F.lit(15)).cast("timestamp").alias("md"),
        F.timestamp_seconds(secs).alias("ts_s"),
        F.timestamp_millis(secs * 1000 + 123).alias("ts_ms"),
        F.timestamp_micros(secs * 1000000 + 456789).alias("ts_us"),
        F.expr(
            "make_timestamp(year(o_orderdate), 6, 15, 12, 30, 45.5)"
        ).alias("mk_ts"),
    ).orderBy("o_orderkey")


@query(
    "expr_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(l_extendedprice - 2000.0) AS ab,
       CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
       CAST(floor(l_extendedprice) AS BIGINT) AS fl,
       round(l_extendedprice, 1) AS rnd,
       pow(l_quantity, 2) AS pw,
       sqrt(l_quantity) AS sq,
       round(exp(l_discount), 6) AS ex,
       round(ln(l_quantity + 1), 6) AS lg,
       ((l_orderkey * 7919) % 13 + 13) % 13 AS pm,
       ((2 - l_orderkey) % 5 + 5) % 5 AS pmneg,
       l_orderkey & 255 AS ba, l_orderkey | 4096 AS bo,
       xor(l_orderkey, 255) AS bx,
       (l_orderkey & 15) << 2 AS shl, l_orderkey >> 3 AS shr,
       greatest(l_quantity, l_discount * 100, l_tax * 100) AS gr,
       least(l_quantity, l_discount * 100, l_tax * 100) AS le,
       CAST(sign(l_extendedprice - 2000.0) AS DOUBLE) AS sg
FROM lineitem WHERE l_orderkey < 60 ORDER BY l_orderkey, l_linenumber
""",
)
def expr_math(spark, sf_dir):
    """Arithmetic/bitwise expression table: abs/ceil/floor/round/pow/
    sqrt/exp/ln/pmod/bitwise and-or-xor/shifts/greatest/least/sign
    (ColumnarArithmetic.scala + ColumnarBinaryOperator.scala parity).
    Transcendentals rounded to 6 decimals — libm vs JVM last-ulp."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 60)
    price, qty = F.col("l_extendedprice"), F.col("l_quantity")
    k = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(price - 2000.0).alias("ab"),
        F.ceil(price).alias("ce"),
        F.floor(price).alias("fl"),
        F.round(price, 1).alias("rnd"),
        F.pow(qty, 2).alias("pw"),
        F.sqrt(qty).alias("sq"),
        F.round(F.exp(F.col("l_discount")), 6).alias("ex"),
        F.round(F.log(qty + 1), 6).alias("lg"),
        F.pmod(k * 7919, F.lit(13)).alias("pm"),
        F.pmod(F.lit(2) - k, F.lit(5)).alias("pmneg"),
        k.bitwiseAND(255).alias("ba"),
        k.bitwiseOR(4096).alias("bo"),
        k.bitwiseXOR(255).alias("bx"),
        F.expr("shiftleft(l_orderkey & 15, 2)").alias("shl"),
        F.expr("shiftright(l_orderkey, 3)").alias("shr"),
        F.greatest(qty, F.col("l_discount") * 100, F.col("l_tax") * 100).alias("gr"),
        F.least(qty, F.col("l_discount") * 100, F.col("l_tax") * 100).alias("le"),
        F.signum(price - 2000.0).alias("sg"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "expr_conditional",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal >= 5000 THEN 'high'
            WHEN c_acctbal >= 0 THEN 'mid'
            ELSE 'neg' END AS tier,
       CASE WHEN c_acctbal > 0 THEN 'pos' ELSE 'nonpos' END AS iff,
       coalesce(nullif(c_mktsegment, 'SEG0'), 'defaulted') AS co,
       CAST(trunc(c_acctbal) AS INT) AS ci,
       CAST(c_custkey AS VARCHAR) AS cs,
       CAST(c_custkey AS DOUBLE) AS cd,
       TRY_CAST(c_mktsegment AS INT) AS bad_int,
       CAST(TRY_CAST(c_acctbal AS DECIMAL(6,1)) AS DOUBLE) AS dec_ok
FROM customer WHERE c_custkey < 300 ORDER BY c_custkey
""",
)
def expr_conditional(spark, sf_dir):
    """Conditional + cast table: CaseWhen/If/Coalesce/NullIf, numeric
    and string casts, and the CheckOverflow discipline — Spark's
    non-ANSI cast yields NULL where DuckDB needs TRY_CAST, and Spark
    float->int truncates where DuckDB's CAST rounds
    (ColumnarIfOperator/CaseWhenOperator/CoalesceOperator +
    ColumnarUnaryOperator cast cases)."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal >= 5000, "high").when(bal >= 0, "mid").otherwise("neg").alias("tier"),
        F.when(bal > 0, "pos").otherwise("nonpos").alias("iff"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("SEG0")), F.lit("defaulted")).alias("co"),
        bal.cast("int").alias("ci"),
        F.col("c_custkey").cast("string").alias("cs"),
        F.col("c_custkey").cast("double").alias("cd"),
        # try_cast, not cast: the driver's session may run ANSI mode
        # (Spark 4 default) where a malformed cast throws
        F.col("c_mktsegment").try_cast("int").alias("bad_int"),
        bal.cast("decimal(6,1)").cast("double").alias("dec_ok"),
    ).orderBy("c_custkey")


@query(
    "expr_hash",
    oracle="""
SELECT c_custkey,
       md5(c_name) AS h_md5,
       sha256(c_name) AS h_sha256,
       upper(md5(c_name || '#salt')) AS h_salted
FROM customer WHERE c_custkey < 300 ORDER BY c_custkey
""",
)
def expr_hash(spark, sf_dir):
    """Hash expression table, oracle-comparable part: md5 / sha2-256
    (ColumnarHashExpression.scala parity). Spark-only murmur3/xxhash64/
    crc32 live in expr_hash_native (rows-only gate + pytest pins)."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("h_md5"),
        F.sha2("c_name", 256).alias("h_sha256"),
        F.upper(F.md5(F.concat(F.col("c_name"), F.lit("#salt")))).alias("h_salted"),
    ).orderBy("c_custkey")


@query(
    "expr_nested",
    oracle="""
SELECT l_orderkey,
       CAST(len(ql) AS INT) AS n,
       ql[1] AS first_qty,
       ql[len(ql)] AS last_qty,
       array_to_string(ql[1:3], ',') AS head3,
       list_max(ql) AS mx,
       list_min(ql) AS mn,
       list_contains(ql, 10.0) AS has10,
       array_to_string(list_reverse(ql), ',') AS rev,
       CAST(len(list_distinct(ql)) AS INT) AS n_uniq,
       st.flag AS s_flag, st.qty AS s_qty
FROM (
  SELECT l_orderkey,
         list_sort(array_agg(l_quantity)) AS ql,
         struct_pack(flag := MIN(l_returnflag), qty := MIN(l_quantity)) AS st
  FROM lineitem WHERE l_orderkey < 100
  GROUP BY l_orderkey
)
ORDER BY l_orderkey
""",
)
def expr_nested(spark, sf_dir):
    """Nested-type expression sweep: arrays (size/element_at/slice/
    max/min/contains/reverse/distinct) and struct field access — the
    reference's explicit weak spot (docs/operators.md type matrix:
    ARRAY/MAP/STRUCT blank = row fallback, complex types behind an
    experimental flag, GazellePluginConfig.scala:177-179). Built-in
    and codegen'd here. Array columns leave the query as joined
    strings/scalars — raw array/struct outputs hash differently
    across engines' pandas conversions."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    g = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_quantity")).alias("ql"),
        F.struct(
            F.min("l_returnflag").alias("flag"), F.min("l_quantity").alias("qty")
        ).alias("st"),
    )
    ql = F.col("ql")
    return g.select(
        "l_orderkey",
        F.size(ql).alias("n"),
        F.element_at(ql, 1).alias("first_qty"),
        F.element_at(ql, F.size(ql)).alias("last_qty"),
        F.array_join(F.slice(ql, 1, 3), ",").alias("head3"),
        F.array_max(ql).alias("mx"),
        F.array_min(ql).alias("mn"),
        F.array_contains(ql, 10.0).alias("has10"),
        F.array_join(F.reverse(ql), ",").alias("rev"),
        F.size(F.array_distinct(ql)).alias("n_uniq"),
        F.col("st.flag").alias("s_flag"),
        F.col("st.qty").alias("s_qty"),
    ).orderBy("l_orderkey")


def _hash_native_oracle() -> str:
    """External value oracle for expr_hash_native: DuckDB has no
    murmur3/xxhash64/sha1 analogs, so the expected values are
    materialized as a VALUES list from the pure-Python public-spec
    implementations (functions/hash_reference.py + hashlib/zlib) over
    the deterministic customer names, then JOINed to the real table —
    an exact 300-row hash-match instead of the old rows-only check.
    If the synthetic names ever drift, the Spark side mismatches and
    the row goes red (the correct signal)."""
    import hashlib
    import zlib

    from gazelle_plugin_spark.functions.hash_reference import (
        murmur3_spark,
        xxhash64_spark,
    )

    rows = []
    for k in range(300):
        b = f"Customer#{k:09d}".encode()
        rows.append(
            f"({k}, {murmur3_spark(b)}, {xxhash64_spark(b)},"
            f" {zlib.crc32(b)}, '{hashlib.sha1(b).hexdigest()}')"
        )
    vals = ",\n".join(rows)
    return f"""
SELECT c.c_custkey, CAST(v.h_murmur3 AS INT) AS h_murmur3,
       CAST(v.h_xxhash64 AS BIGINT) AS h_xxhash64,
       CAST(v.h_crc32 AS BIGINT) AS h_crc32, v.h_sha1
FROM (VALUES {vals}) AS v(c_custkey, h_murmur3, h_xxhash64, h_crc32, h_sha1)
JOIN customer c ON c.c_custkey = v.c_custkey
ORDER BY c.c_custkey"""


@query("expr_hash_native", oracle=_hash_native_oracle())
def expr_hash_native(spark, sf_dir):
    """Spark-native hashes: murmur3 (`hash`), xxhash64, crc32, sha1 —
    the reference's Murmur3Hash/Sha1 cases
    (ColumnarExpressionConverter.scala:484-493,
    ColumnarUnaryOperator.scala). DuckDB has none of these (its sha1
    is absent, its hash() is a different algorithm), so the oracle is
    a VALUES list pinned from the pure-Python reference
    implementations (see _hash_native_oracle); test_functions
    additionally re-derives sha1/crc32 with hashlib/zlib."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    return c.select(
        "c_custkey",
        F.hash("c_name").alias("h_murmur3"),
        F.xxhash64("c_name").alias("h_xxhash64"),
        F.crc32(F.col("c_name").cast("binary")).alias("h_crc32"),
        F.sha1(F.col("c_name").cast("binary")).alias("h_sha1"),
    ).orderBy("c_custkey")


@query(
    "expr_misc",
    oracle="""
SELECT s_suppkey,
       CAST(COALESCE(list_position(string_split('FURNITURE,AUTOMOBILE,BUILDING', ','),
                              c_mktsegment), 0) AS INT) AS fis,
       (NULLIF(s_nationkey, 5) IS NOT DISTINCT FROM NULLIF(c_nationkey, 5))
         AS null_safe_eq,
       CASE WHEN s_suppkey % 3 = 0 THEN -1.0 ELSE s_acctbal END AS nan_guard,
       CASE WHEN NULLIF(s_nationkey, 5) IS NOT NULL
            THEN 'have' ELSE 'none' END AS nv2,
       COALESCE(CAST(NULLIF(s_nationkey, 5) AS VARCHAR), 'missing') AS nvl_s,
       to_hex(s_suppkey * 1000 + 48879) AS conv_hex,
       CAST(('0x' || to_hex(s_suppkey * 1000 + 48879)) AS BIGINT) AS conv_dec,
       regexp_matches(c_mktsegment, '^(AUTO|BUILD)') AS rx
FROM supplier JOIN customer ON s_suppkey = c_custkey
WHERE s_suppkey < 150
ORDER BY s_suppkey
""",
)
def expr_misc(spark, sf_dir):
    """Remaining §2.9 converter cases: FindInSet (find_in_set),
    EqualNullSafe (equal_null / <=>), NaN handling (nanvl via a
    constructed NaN), nvl2, nvl, Conv (base 10->16 and the 16->10
    round-trip), RLike — each with a DuckDB twin built from
    list_position / IS NOT DISTINCT FROM / isnan-CASE / to_hex /
    '0x'-cast / regexp_matches (reference converter cases:
    ColumnarExpressionConverter.scala:484-493,
    ColumnarUnaryOperator.scala). NULLIF(nk, 5) manufactures NULLs so
    the null-safe paths are actually exercised; Spark's conv()
    uppercase output matches DuckDB's to_hex."""
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    j = s.join(c, s.s_suppkey == c.c_custkey).filter(F.col("s_suppkey") < 150)
    nk_s = F.nullif(F.col("s_nationkey"), F.lit(5))
    nk_c = F.nullif(F.col("c_nationkey"), F.lit(5))
    # NaN for suppkey%3==0, else the real acctbal — so nanvl's NaN
    # branch is genuinely exercised
    maybe_nan = F.when(
        F.col("s_suppkey") % 3 == 0, F.lit(float("nan"))
    ).otherwise(F.col("s_acctbal"))
    return j.select(
        "s_suppkey",
        F.find_in_set(
            F.col("c_mktsegment"), F.lit("FURNITURE,AUTOMOBILE,BUILDING")
        ).alias("fis"),
        F.equal_null(nk_s, nk_c).alias("null_safe_eq"),
        F.nanvl(maybe_nan, F.lit(-1.0)).alias("nan_guard"),
        F.nvl2(nk_s, F.lit("have"), F.lit("none")).alias("nv2"),
        F.nvl(nk_s.cast("string"), F.lit("missing")).alias("nvl_s"),
        F.conv(
            (F.col("s_suppkey") * 1000 + 48879).cast("string"), 10, 16
        ).alias("conv_hex"),
        F.conv(
            F.conv((F.col("s_suppkey") * 1000 + 48879).cast("string"), 10, 16),
            16,
            10,
        )
        .cast("bigint")
        .alias("conv_dec"),
        F.col("c_mktsegment").rlike("^(AUTO|BUILD)").alias("rx"),
    ).orderBy("s_suppkey")


@query(
    "expr_map",
    oracle="""
WITH per_flag AS (
  SELECT l_orderkey, l_returnflag AS flag, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem WHERE l_orderkey < 100
  GROUP BY l_orderkey, l_returnflag
)
SELECT l_orderkey,
       CAST(COUNT(*) AS INT) AS n_keys,
       string_agg(flag, ',' ORDER BY flag) AS keys_csv,
       COALESCE(MAX(CASE WHEN flag = 'R' THEN cnt END), 0) AS r_cnt,
       MAX(CASE WHEN flag = 'A' THEN cnt * 2 END) AS a_doubled,
       CAST(COUNT(*) FILTER (cnt > 5) AS INT) AS n_big,
       CAST(SUM(cnt) AS BIGINT) AS total
FROM per_flag
GROUP BY l_orderkey
ORDER BY l_orderkey
""",
)
def expr_map(spark, sf_dir):
    """MAP-type expression sweep: map_from_entries / map_keys /
    map_values / element_at / transform_values / map_filter /
    higher-order aggregate over map values. Like ARRAY/STRUCT
    (expr_nested), MAP is a reference weak spot — the operator type
    matrix leaves it blank (docs/operators.md) and complex types sit
    behind the experimental flag (GazellePluginConfig.scala:177-179);
    all codegen'd built-ins here. The oracle never constructs a map:
    it derives the SAME scalar outputs relationally from the
    (orderkey, flag, cnt) grain, proving the map pipeline computes
    the relation it claims. Map columns never leave the query —
    outputs are ints/strings (cross-engine map rendering differs)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    per_flag = li.groupBy("l_orderkey", "l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    g = per_flag.groupBy("l_orderkey").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("l_returnflag", "cnt")))
        ).alias("m")
    )
    m = F.col("m")
    return g.select(
        "l_orderkey",
        F.size(m).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        F.coalesce(F.element_at(m, F.lit("R")), F.lit(0)).alias("r_cnt"),
        F.element_at(
            F.transform_values(m, lambda k, v: v * 2), F.lit("A")
        ).alias("a_doubled"),
        F.size(F.map_filter(m, lambda k, v: v > 5)).alias("n_big"),
        F.aggregate(
            F.map_values(m), F.lit(0).cast("bigint"), lambda acc, v: acc + v
        ).alias("total"),
    ).orderBy("l_orderkey")


#: URL payload injected per document (the corpus has no organic URLs;
#: inject-then-parse, like doc_pii_scrub): deterministic, well-formed,
#: column-derived. Both engines build the IDENTICAL string.
_SQL_URL = (
    "'https://' || source || '.example.com/docs/' || lang || '/'"
    " || CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&page='"
    " || CAST(doc_id % 7 AS VARCHAR) || '#sec' || CAST(doc_id % 3 AS VARCHAR)"
)


@query(
    "expr_url",
    oracle=f"""
SELECT doc_id,
       regexp_extract(u, '^([a-z]+)://', 1) AS proto,
       regexp_extract(u, '^[a-z]+://([^/?#]+)', 1) AS host,
       regexp_extract(u, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
       regexp_extract(u, '[?]([^#]*)', 1) AS query,
       regexp_extract(u, '[?&]page=([^&#]*)', 1) AS q_page,
       regexp_extract(u, '#(.*)$', 1) AS fragment
FROM (SELECT doc_id, {_SQL_URL} AS u FROM documents) p
ORDER BY doc_id
""",
)
def expr_url(spark, sf_dir):
    """parse_url expression family (reference: the URL cases of
    ColumnarExpressionConverter's string-expression support;
    Spark-native parse_url is JVM-side codegen) — PROTOCOL / HOST /
    PATH / QUERY / keyed QUERY / REF over an injected well-formed URL
    column. DuckDB has no parse_url, so the oracle re-derives each
    component with RE2-subset regexes over the identical string —
    cross-engine agreement proves Spark's java.net.URI-based parsing
    matches the grammar for well-formed URLs.

    Scale shape: pure per-row projection, zero shuffles, codegen
    end-to-end (the one ORDER BY is the driver-compare convention).
    """
    d = t(spark, sf_dir, "documents")
    u = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&page="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("#sec"),
        (F.col("doc_id") % 3).cast("string"),
    )
    p = d.select("doc_id", u.alias("u"))
    return p.select(
        "doc_id",
        F.parse_url("u", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("u", F.lit("HOST")).alias("host"),
        F.parse_url("u", F.lit("PATH")).alias("path"),
        F.parse_url("u", F.lit("QUERY")).alias("query"),
        F.parse_url("u", F.lit("QUERY"), F.lit("page")).alias("q_page"),
        F.parse_url("u", F.lit("REF")).alias("fragment"),
    ).orderBy("doc_id")
