"""Sources and sinks.

The reference reads parquet, ORC and CSV through one Arrow Dataset
facade (reference: arrow-data-source/standard/.../v2/arrow/
ArrowUtils.scala:212-218, ``case "parquet"/"orc"/"csv"``), pushes
filters/column pruning into the scan (ArrowFilters.scala:28-48), and
writes via ArrowFileFormat + ArrowWriteExtension (ArrowWriteExtension.
scala:43-108). Spark's own DSv2 readers/writers are the direct analog
— vectorized, pushdown-capable, columnar.

The cache helper mirrors ColumnarInMemoryTableScanExec +
ArrowColumnarCachedBatchSerializer (ColumnarInMemoryTableScanExec.
scala:31; ColumnarInMemoryRelation.scala:113): Spark's
CachedBatchSerializer is already columnar.

Verified by tests/test_sources.py (round-trips, pushdown plan
assertions, cache plan assertion).
"""

from gazelle_plugin_spark.sources.io import (
    SUPPORTED_FORMATS,
    cache_columnar,
    read,
    write,
)

__all__ = ["SUPPORTED_FORMATS", "read", "write", "cache_columnar"]
