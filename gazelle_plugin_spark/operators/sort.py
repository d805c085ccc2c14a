"""Sort / limit / top-k operators.

Analog of ColumnarSortExec + native sort kernels with spill
(reference: com/intel/oap/execution/ColumnarSortExec.scala:54;
cpp/codegen/arrow_compute/ext/sort_kernel.cc:57-196) and
ColumnarLocalLimitExec / ColumnarGlobalLimitExec
(ColumnarBasicPhysicalOperators.scala:342,417). Spark's SortExec
performs the same range-partitioned global sort with disk spill;
``orderBy().limit(n)`` plans TakeOrderedAndProject — the top-k path
the reference left on row fallback (docs/operators.md:12).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def sort(df: DataFrame, by: Sequence[str | Column]) -> DataFrame:
    """Global (range-partitioned) sort — ColumnarSortExec analog."""
    return df.orderBy(*by)


def sort_within_partitions(df: DataFrame, by: Sequence[str | Column]) -> DataFrame:
    """Local per-partition sort — no exchange (the reference's local
    sort mode)."""
    return df.sortWithinPartitions(*by)


def limit(df: DataFrame, n: int) -> DataFrame:
    """LocalLimit + GlobalLimit pair, planned by Spark from one call."""
    return df.limit(n)


def top_k(df: DataFrame, by: Sequence[str | Column], k: int) -> DataFrame:
    """orderBy + limit -> TakeOrderedAndProject: per-partition heap
    top-k then single merge — no global sort shuffle. The scale-safe
    way to take small k from 100 TB."""
    return df.orderBy(*by).limit(k)
