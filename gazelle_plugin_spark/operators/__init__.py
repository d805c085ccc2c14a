"""Operator surface of the engine (SURVEY.md §2).

Each module re-expresses one family of the reference's Columnar*Exec
operators as composable DataFrame transformations. The reference's
fallback discipline (ColumnarGuardRule wrapping unsupported nodes in
RowGuard) becomes: helpers validate inputs and raise
``UnsupportedOperationError`` naming the vanilla-Spark escape hatch —
never silent wrong answers.
"""

from gazelle_plugin_spark.operators.errors import UnsupportedOperationError
from gazelle_plugin_spark.operators.projection import condition_project, coalesce_partitions
from gazelle_plugin_spark.operators.joins import (
    hash_join,
    broadcast_hash_join,
    shuffled_hash_join,
    sort_merge_join,
    null_aware_anti_join,
    existence_join,
    cross_join,
)
from gazelle_plugin_spark.operators.aggregates import (
    hash_aggregate,
    rollup_aggregate,
    cube_aggregate,
    grouping_sets_aggregate,
)
from gazelle_plugin_spark.operators.window import window_agg, window_topk
from gazelle_plugin_spark.operators.sort import sort, sort_within_partitions, limit, top_k
from gazelle_plugin_spark.operators.setops import (
    union_all,
    union_distinct,
    intersect,
    intersect_all,
    except_,
    except_all,
)
from gazelle_plugin_spark.operators.exchange import (
    repartition_hash,
    repartition_range,
    repartition_round_robin,
    single_partition,
)

__all__ = [
    "UnsupportedOperationError",
    "condition_project",
    "coalesce_partitions",
    "hash_join",
    "broadcast_hash_join",
    "shuffled_hash_join",
    "sort_merge_join",
    "null_aware_anti_join",
    "existence_join",
    "cross_join",
    "hash_aggregate",
    "rollup_aggregate",
    "cube_aggregate",
    "grouping_sets_aggregate",
    "window_agg",
    "window_topk",
    "sort",
    "sort_within_partitions",
    "limit",
    "top_k",
    "union_all",
    "union_distinct",
    "intersect",
    "intersect_all",
    "except_",
    "except_all",
    "repartition_hash",
    "repartition_range",
    "repartition_round_robin",
    "single_partition",
]
