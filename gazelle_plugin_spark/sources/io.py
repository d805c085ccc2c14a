"""Unified read/write/cache facade over Spark's DSv2 sources.

Scale notes (100 TB): reads rely on Catalyst pushdown — predicate
pushdown and column pruning reach the parquet/ORC row groups
(`PushedFilters` / pruned `ReadSchema` in the plan, asserted in
tests/test_sources.py); `spark.sql.files.maxPartitionBytes` (session
profile, 128 MB) bounds scan-task size. Writes partition by the
columns a downstream reader prunes on; CSV/JSON are interchange
formats, not the scale path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType
from pyspark import StorageLevel

from gazelle_plugin_spark.operators.errors import UnsupportedOperationError

#: Reference parity (ArrowUtils.scala:212-218) is parquet/orc/csv;
#: json is beyond-reference (free in Spark).
SUPPORTED_FORMATS = ("parquet", "orc", "csv", "json")


def _check_format(fmt: str) -> str:
    fmt = fmt.lower()
    if fmt not in SUPPORTED_FORMATS:
        raise UnsupportedOperationError(
            f"format {fmt!r}",
            f"one of {SUPPORTED_FORMATS} (spark.read.format(...) for others)",
        )
    return fmt


def read(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` as ``fmt``. CSV defaults to header+non-inferring
    (pass an explicit schema for type fidelity — schema inference
    costs an extra full scan at 100 TB)."""
    fmt = _check_format(fmt)
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
    if schema is not None:
        reader = reader.schema(schema)
    if options:
        reader = reader.options(**options)
    return reader.load(path)


def write(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    **options: str,
) -> None:
    """Write ``df`` to ``path`` as ``fmt`` (ArrowFileFormat sink
    analog). ``partition_by`` produces the hive-style layout partition
    pruning needs."""
    fmt = _check_format(fmt)
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", options.pop("header", "true"))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if options:
        writer = writer.options(**options)
    writer.save(path)


def cache_columnar(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Columnar cache (ColumnarInMemoryTableScanExec analog): Spark's
    CachedBatchSerializer stores compressed columnar batches; repeat
    scans replay them without re-reading the source."""
    return df.persist(level)
