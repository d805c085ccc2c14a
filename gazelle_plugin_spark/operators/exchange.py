"""Exchange / shuffle / broadcast operators.

Analog of ColumnarShuffleExchangeExec's partitioning modes —
SinglePartition, RoundRobin, Hash, Range (reference:
org/apache/spark/sql/execution/ColumnarShuffleExchangeExec.scala:
114,247,304-344; native splitters cpp/shuffle/splitter.h:297-344).
The reference's custom shuffle manager, Arrow IPC serialization and
per-column lz4/fastpfor compression are replaced wholesale by Spark's
sort shuffle + `spark.io.compression.codec` (SURVEY.md §2.8).

Scale notes: every call below is a full shuffle of the input — at
100 TB use them to SET UP co-location (repartition on join/agg keys
once, reuse across stages), not casually. AQE's coalescing fixes
over-partitioning on the way out.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def repartition_hash(df: DataFrame, num_partitions: int, keys: Sequence[str | Column]) -> DataFrame:
    """HashPartitioning — co-locates equal keys; pre-shuffling both
    join sides on the same keys lets the join reuse the exchange."""
    return df.repartition(num_partitions, *keys)


def repartition_range(df: DataFrame, num_partitions: int, keys: Sequence[str | Column]) -> DataFrame:
    """RangePartitioning (the reference falls back to a row-computed
    partition-id column for this — FallbackRangeSplitter); Spark
    samples ranges natively."""
    return df.repartitionByRange(num_partitions, *keys)


def repartition_round_robin(df: DataFrame, num_partitions: int) -> DataFrame:
    """RoundRobinPartitioning — rebalance without keys."""
    return df.repartition(num_partitions)


def single_partition(df: DataFrame) -> DataFrame:
    """SinglePartition — everything to one task; only for tiny finals."""
    return df.coalesce(1)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with explicit key salting for EXTREME skew — the
    manual fallback when AQE's skew-join splitting isn't enough (AQE
    splits oversized partitions, but a single hot KEY still lands in
    one task; salting splits the key itself).

    The left (skewed) side gets a deterministic salt in [0, salt)
    derived from row content via xxhash64 on all columns — no rand(),
    so the plan stays deterministic/retry-safe. The right side is
    replicated ``salt`` times via explode, so every (key, salt) bucket
    finds its match. Cost: right side x salt — use for fact-x-dim
    joins where dim replication is cheap, never fact-x-fact.

    Reference contrast: Gazelle leaned on AQE partition resize before
    SHJ (ShufflePartitionUtils.reoptimizeShuffledHashJoinInput); key
    salting was out of scope. Supported how: inner / left_outer.

    The salt column name is reserved: inputs that already carry it are
    rejected (a silent ``withColumn`` replace would corrupt caller
    data and make the join condition ambiguous). Salt derivation hashes
    only hashable-typed left columns — map columns (xxhash64 rejects
    MapType) are excluded; the join key is always included.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import MapType

    SALT = "__gazelle_salt"
    if how not in ("inner", "left_outer"):
        raise ValueError("salted_join supports how='inner'|'left_outer'")
    for side, df in (("left", left), ("right", right)):
        if SALT in df.columns:
            raise ValueError(
                f"salted_join: {side} input already has reserved column {SALT!r}"
            )

    def _hashable(dt) -> bool:
        if isinstance(dt, MapType):
            return False
        # nested containers can smuggle a map in
        if hasattr(dt, "elementType"):
            return _hashable(dt.elementType)
        if hasattr(dt, "fields"):
            return all(_hashable(f.dataType) for f in dt.fields)
        return True

    if left_key not in left.columns:
        raise ValueError(
            f"salted_join: left key {left_key!r} is not a column of the left "
            f"input (has: {left.columns})"
        )
    hash_cols = [f.name for f in left.schema.fields if _hashable(f.dataType)]
    if left_key not in hash_cols:
        raise ValueError(f"salted_join: left key {left_key!r} is not hashable")
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in hash_cols]), F.lit(salt))
    l = left.withColumn(SALT, lsalt)
    r = right.withColumn(SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = l.join(
        r,
        (l[left_key] == r[right_key]) & (l[SALT] == r[SALT]),
        how,
    )
    return out.drop(SALT)
