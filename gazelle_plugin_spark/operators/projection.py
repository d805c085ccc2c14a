"""Fused filter + project.

Analog of ColumnarConditionProjectExec (reference:
com/intel/oap/execution/ColumnarBasicPhysicalOperators.scala:45 and
expression/ColumnarConditionProjector.scala:54) which fuses a Gandiva
filter + projector over a selection vector. In Spark, ``filter``
followed by ``select`` is fused by whole-stage codegen into one stage
and both are eligible for scan pushdown, so the fusion is free — the
helper exists to present the same single-operator surface.

Unlike the reference there is no sub-65536-row selection-vector limit
(docs/limitations.md:10-11) — batch sizing is Tungsten's concern.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame


def condition_project(
    df: DataFrame,
    condition: Column | str | None = None,
    projections: Mapping[str, Column] | Sequence[Column | str] | None = None,
) -> DataFrame:
    """filter(condition) + select(projections) as one logical op.

    ``projections`` may be a mapping alias -> Column (every computed
    column gets a stable name, per the engine's aliasing convention)
    or a plain sequence of columns/names. Either part may be omitted.
    """
    out = df
    if condition is not None:
        out = out.filter(condition)
    if projections is not None:
        if isinstance(projections, Mapping):
            out = out.select(*(col.alias(name) for name, col in projections.items()))
        else:
            out = out.select(*projections)
    return out


def coalesce_partitions(df: DataFrame, num_partitions: int) -> DataFrame:
    """ColumnarCoalesceExec analog (reference:
    com/intel/oap/execution/ColumnarCoalesceExec.scala): shrink
    partition count without a shuffle. The reference's
    CoalesceBatchesExec (small-batch concatenation after shuffle) is
    covered by AQE's coalescePartitions, enabled in session.py."""
    return df.coalesce(num_partitions)
