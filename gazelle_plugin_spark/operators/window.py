"""Window operators.

Analog of ColumnarWindowExec (reference:
com/intel/oap/execution/ColumnarWindowExec.scala:176-297) which
supported sum/avg/min/max/count over a partition, rank asc/desc,
row_number, lag — and ONLY the UnboundedPreceding->CurrentRow frame
(ColumnarWindowExec.scala:141-150). Spark's WindowExec supports the
full frame grammar and the functions the reference lacked
(dense_rank, percent_rank, ntile, lead, first/last_value, cume_dist)
— all exposed here.

``window_topk`` is the rank-limit pushdown: the reference invented
LocalWindowExec + a RankFilterPattern optimizer rule to pre-rank and
filter per partition-chunk before the global shuffle (reference:
org/apache/spark/sql/LocalWindowExec.scala;
extension/OptimizerOverrides.scala:39-218). Spark >=3.5 ships the
same optimization as InferWindowGroupLimit / WindowGroupLimitExec, so
expressing rank()+filter declaratively gets the partial top-k for
free — tests assert WindowGroupLimit appears in the physical plan.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from gazelle_plugin_spark.operators.errors import UnsupportedOperationError

RANK_FUNCTIONS = {
    "rank": F.rank,
    "dense_rank": F.dense_rank,
    "row_number": F.row_number,
}


def window_spec(
    partition_by: Sequence[str | Column],
    order_by: Sequence[str | Column] | None = None,
    rows_between: tuple[int, int] | None = None,
    range_between: tuple[int, int] | None = None,
) -> WindowSpec:
    spec = Window.partitionBy(*partition_by)
    if order_by:
        spec = spec.orderBy(*order_by)
    if rows_between is not None and range_between is not None:
        raise UnsupportedOperationError(
            "both rows_between and range_between", "pick one frame kind"
        )
    if rows_between is not None:
        spec = spec.rowsBetween(*rows_between)
    if range_between is not None:
        spec = spec.rangeBetween(*range_between)
    return spec


def window_agg(df: DataFrame, spec: WindowSpec, cols: Mapping[str, Column]) -> DataFrame:
    """Attach window-computed columns: {alias: F.fn(...)} evaluated
    over ``spec``."""
    out = df
    for name, col in cols.items():
        out = out.withColumn(name, col.over(spec))
    return out


def window_topk(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_by: Sequence[Column],
    k: int,
    rank_function: str = "rank",
    rank_col: str = "rk",
    keep_rank: bool = True,
) -> DataFrame:
    """Top-k rows per group via rank()/row_number() + filter(rk <= k).

    Declarative form of the reference's LocalWindow rewrite; Spark
    plans a WindowGroupLimit partial top-k before the shuffle."""
    fn = RANK_FUNCTIONS.get(rank_function)
    if fn is None:
        raise UnsupportedOperationError(
            f"rank function {rank_function!r}", f"one of {sorted(RANK_FUNCTIONS)}"
        )
    spec = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, fn().over(spec)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)
