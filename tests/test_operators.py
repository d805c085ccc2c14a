"""Unit tests for the operator surface (gazelle_plugin_spark.operators).

Patterned after the reference's forked Spark suites (SURVEY.md §5
layer 1): small literal DataFrames, exact expected answers, edge
cases the reference calls out (null-aware anti join three-case
semantics, ColumnarOverrides.scala:260; EXCEPT distinctness;
two-phase skewed aggregation; WindowGroupLimit rank-limit pushdown,
OptimizerOverrides.scala:39-218 analog).
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from gazelle_plugin_spark.operators import aggregates, joins, setops, window


def rows(df):
    return sorted(
        [tuple(r) for r in df.collect()],
        key=lambda t: tuple((v is None, v) for v in t),
    )


# ---------------------------------------------------------------- joins

def _lr(spark):
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (None, "d")], "k int, v string"
    )
    return left


def test_null_aware_anti_right_plain(spark):
    left = _lr(spark)
    right = spark.createDataFrame([(1,), (5,)], "rk int")
    out = joins.null_aware_anti_join(left, right, "k", "rk")
    # non-null left keys not in {1,5}; null left key dropped (NOT IN
    # with a null probe is UNKNOWN)
    assert rows(out.select("k", "v")) == [(2, "b"), (3, "c")]


def test_null_aware_anti_right_has_null(spark):
    left = _lr(spark)
    right = spark.createDataFrame([(1,), (None,)], "rk int")
    out = joins.null_aware_anti_join(left, right, "k", "rk")
    assert out.count() == 0


def test_null_aware_anti_right_empty(spark):
    left = _lr(spark)
    right = spark.createDataFrame([], "rk int")
    out = joins.null_aware_anti_join(left, right, "k", "rk")
    # empty right: NOT IN () is true for every row, null keys included
    assert out.count() == 4


def test_null_aware_anti_matches_spark_not_in(spark):
    """Cross-check against Spark's own null-aware anti planning."""
    left = _lr(spark)
    right = spark.createDataFrame([(1,), (5,)], "rk int")
    left.createOrReplaceTempView("naaj_left")
    right.createOrReplaceTempView("naaj_right")
    expected = spark.sql(
        "SELECT k, v FROM naaj_left WHERE k NOT IN (SELECT rk FROM naaj_right)"
    )
    got = joins.null_aware_anti_join(left, right, "k", "rk").select("k", "v")
    assert rows(got) == rows(expected)


def test_existence_join(spark):
    left = _lr(spark)
    right = spark.createDataFrame([(1,), (3,), (None,)], "rk int")
    out = joins.existence_join(left, right, "k", "rk")
    got = {(r["k"], r["exists"]) for r in out.collect()}
    assert got == {(1, True), (2, False), (3, True), (None, False)}


# -------------------------------------------------------------- set ops

def test_except_is_distinct(spark):
    left = spark.createDataFrame([(1,), (1,), (2,)], "x int")
    right = spark.createDataFrame([(1,)], "x int")
    assert rows(setops.except_(left, right)) == [(2,)]
    assert rows(setops.except_all(left, right)) == [(1,), (2,)]


def test_union_intersect(spark):
    a = spark.createDataFrame([(1,), (2,), (2,)], "x int")
    b = spark.createDataFrame([(2,), (3,)], "x int")
    assert rows(setops.union_all(a, b)) == [(1,), (2,), (2,), (2,), (3,)]
    assert rows(setops.union_distinct(a, b)) == [(1,), (2,), (3,)]
    assert rows(setops.intersect(a, b)) == [(2,)]
    assert rows(setops.intersect_all(a, b)) == [(2,)]


# ------------------------------------------------------------ aggregates

def test_skew_safe_aggregate_matches_direct(spark):
    # skewed: one key owns 90% of rows
    data = [("hot", float(i % 7)) for i in range(900)] + [
        (f"k{i % 10}", float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(data, "k string, x double")
    got = aggregates.skew_safe_aggregate(
        df,
        ["k"],
        partial_aggs=[F.sum("x").alias("px"), F.count("x").alias("pc")],
        final_aggs=[
            F.sum("px").alias("sum_x"),
            F.sum("pc").alias("cnt_x"),
            (F.sum("px") / F.sum("pc")).alias("avg_x"),
        ],
        salt_buckets=8,
    )
    expected = df.groupBy("k").agg(
        F.sum("x").alias("sum_x"),
        F.count("x").alias("cnt_x"),
        F.avg("x").alias("avg_x"),
    )
    assert rows(got) == rows(expected)


def test_rollup_cube_grouping_sets(spark):
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 3)], "g1 string, g2 string, v int"
    )
    aggs = [F.sum("v").alias("s")]
    assert aggregates.rollup_aggregate(df, ["g1", "g2"], aggs).count() == 6
    assert aggregates.cube_aggregate(df, ["g1", "g2"], aggs).count() == 8
    gs = aggregates.grouping_sets_aggregate(df, [["g1"], ["g2"]], ["g1", "g2"], aggs)
    assert rows(gs) == rows(
        df.groupBy("g1").agg(*aggs).withColumn("g2", F.lit(None).cast("string"))
        .select("g1", "g2", "s")
        .union(
            df.groupBy("g2").agg(*aggs)
            .withColumn("g1", F.lit(None).cast("string"))
            .select("g1", "g2", "s")
        )
    )


def test_hash_aggregate_global_and_grouped(spark):
    df = spark.createDataFrame([(1, 2.0), (1, 4.0), (2, 6.0)], "k int, x double")
    assert rows(aggregates.hash_aggregate(df, [], [F.sum("x").alias("s")])) == [(12.0,)]
    assert rows(aggregates.hash_aggregate(df, ["k"], [F.avg("x").alias("a")])) == [
        (1, 3.0),
        (2, 6.0),
    ]


def test_join_strategy_hints(spark):
    """The SMJ/SHJ wrappers must actually pin the physical strategy
    (the session profile prefers hash joins, so SMJ only appears when
    hinted — StrategyOverrides.scala:39-78 analog, inverted)."""
    left = spark.range(0, 1000).withColumnRenamed("id", "k")
    right = spark.range(0, 500).withColumnRenamed("id", "k")
    smj = joins.sort_merge_join(left, right, "k")
    assert "SortMergeJoin" in smj._jdf.queryExecution().executedPlan().toString()
    shj = joins.shuffled_hash_join(left, right, "k")
    assert "ShuffledHashJoin" in shj._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------------- window

def test_window_topk_plan_has_window_group_limit(spark):
    """The declarative rank()+filter form must trigger Spark's
    WindowGroupLimit (the reference's LocalWindowExec rewrite,
    OptimizerOverrides.scala:39-218)."""
    df = spark.createDataFrame(
        [(g, i, float(i * g)) for g in (1, 2) for i in range(10)],
        "g int, i int, x double",
    )
    out = window.window_topk(df, ["g"], [F.desc("x")], k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    got = {(r["g"], r["i"]) for r in out.collect()}
    assert got == {(1, 9), (1, 8), (1, 7), (2, 9), (2, 8), (2, 7)}


def test_window_agg_frames(spark):
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0), (2, 1, 5.0)],
        "g int, seq int, x double",
    )
    spec = window.window_spec(["g"], ["seq"], rows_between=(window.Window.unboundedPreceding, window.Window.currentRow))
    out = window.window_agg(df, spec, {"running": F.sum("x")})
    got = {(r["g"], r["seq"], r["running"]) for r in out.collect()}
    assert got == {(1, 1, 10.0), (1, 2, 30.0), (1, 3, 60.0), (2, 1, 5.0)}
