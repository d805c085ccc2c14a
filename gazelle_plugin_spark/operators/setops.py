"""Set operations.

The reference implements only UNION ALL natively (ColumnarUnionExec,
reference: ColumnarBasicPhysicalOperators.scala:296); UNION DISTINCT /
INTERSECT / EXCEPT lower to union+aggregate or semi/anti joins that
then hit its columnar agg/join operators (SURVEY.md §2.7). Spark does
the same lowering, so these wrappers complete the surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(left: DataFrame, right: DataFrame) -> DataFrame:
    """UNION ALL by position — no shuffle, pure concatenation."""
    return left.union(right)


def union_distinct(left: DataFrame, right: DataFrame) -> DataFrame:
    """UNION DISTINCT = union + hash-dedup (one shuffle)."""
    return left.union(right).distinct()


def intersect(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.intersect(right)


def intersect_all(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.intersectAll(right)


def except_(left: DataFrame, right: DataFrame) -> DataFrame:
    """EXCEPT DISTINCT: rows of left not present in right, deduped.
    (`exceptAll().distinct()` would be wrong: with left=[x,x],
    right=[x] it keeps x, but EXCEPT must drop it.)"""
    return left.subtract(right)


def except_all(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.exceptAll(right)
