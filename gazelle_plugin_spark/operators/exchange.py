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


def choose_join_strategy(
    dim_bytes: int,
    fact_bytes: int,
    hot_key_share: float,
    *,
    broadcast_threshold: int = 10 * 2**20,
    aqe_skew_threshold: int = 256 * 2**20,
    aqe_skew_factor: float = 5.0,
    shuffle_partitions: int = 32,
    salt_floor_bytes: int = 30 * 2**20,
) -> str:
    """The measured skew operating rule (SCALE.md round-13, measured
    on measurements/skew_r13.jsonl's result-hash-identical 3-variant
    hot-key study), as code instead of prose. Returns one of
    ``"broadcast"`` / ``"plain"`` / ``"salted"`` for an equi-join of a
    skewed fact against a dim.

    Decision order:

    1. **broadcast** when the dim fits the broadcast threshold (hint
       it with ``F.broadcast`` — with no shuffled build side the
       salted shape is moot). Same pick-smaller-side intent as the
       reference's JoinSelectionOverrides (reference:
       StrategyOverrides.scala:39-78), with Spark's own 10 MB default
       as the fence (the raised 64 MB profile measurably regressed
       sf1 stars — SCALE.md round-13).
    2. **plain** when the hot key's partition meets BOTH of AQE's
       skew-split preconditions — ``skewedPartitionThresholdInBytes``
       (256 MB default) AND ``skewedPartitionFactor`` (5x) times the
       median partition size (estimated here as the even 1/partitions
       share): only then does OptimizeSkewedJoin split at runtime, and
       salting would just add dim-replication shuffle on top. A large
       hot partition among uniformly large partitions fails the 5x
       factor and falls through (round-14 ADVICE: size alone never
       triggers the split). Caveat the caller owns: AQE skew split
       applies to sort-merge/shuffled-hash joins only — for a shape
       AQE cannot split (e.g. a BNLJ), pass ``aqe_skew_threshold``
       high enough to disable this branch.
    3. **salted** in the measured in-between band: the hot partition
       is big enough to dominate the stage's critical path (above
       ``salt_floor_bytes`` and materially above the even-spread
       share) but UNDER the AQE threshold, where the study showed
       OptimizeSkewedJoin never fires (90 MB hot partition: max/p50
       task spread 10.5x plain vs 1.28x salted at 9.4x shuffle cost —
       on a 1000-executor cluster stage time IS max-task time).
    4. **plain** otherwise — healthy spread; salting's dim
       replication buys nothing.

    ``hot_key_share`` is the hottest key's fraction of fact rows (a
    cheap ``groupBy(key).count`` top-1 estimate, or a prior). The hot
    partition estimate is ``fact_bytes * hot_key_share``: one key
    always hashes to one partition regardless of partition count.
    """
    if not 0.0 <= hot_key_share <= 1.0:
        raise ValueError(f"hot_key_share must be in [0, 1], got {hot_key_share}")
    if dim_bytes <= broadcast_threshold:
        return "broadcast"
    hot_partition = fact_bytes * hot_key_share
    even_share = 1.0 / max(shuffle_partitions, 1)
    if (
        hot_partition >= aqe_skew_threshold
        and hot_key_share >= aqe_skew_factor * even_share
    ):
        return "plain"
    if hot_partition >= salt_floor_bytes and hot_key_share >= 4 * even_share:
        return "salted"
    return "plain"


def skew_aware_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    *,
    dim_bytes: int,
    fact_bytes: int,
    hot_key_share: float,
    salt: int = 16,
    how: str = "inner",
    **rule_kwargs,
) -> DataFrame:
    """The live caller of :func:`choose_join_strategy` (round-14
    verdict task 5): an equi-join of a skewed ``left`` (fact) against
    ``right`` (dim) that consults the measured skew rule instead of
    leaving regime choice to the caller's judgment — the analog of the
    reference's JoinSelectionOverrides being a live strategy, not
    documentation (reference: StrategyOverrides.scala:39-78).

    ``dim_bytes`` / ``fact_bytes`` / ``hot_key_share`` are the caller's
    size estimates (catalog stats, a prior, or a cheap top-1 key
    count); ``rule_kwargs`` pass through to choose_join_strategy.
    Dispatch:

    - ``"broadcast"`` → plain join with an explicit ``F.broadcast``
      hint on the dim (threshold-independent — the r13 lesson).
    - ``"plain"`` → plain shuffled join; AQE owns any runtime split.
    - ``"salted"`` → :func:`salted_join` with ``salt`` buckets.

    The chosen regime is observable in the physical plan (broadcast →
    BroadcastHashJoin; salted → the explode+salt shape); tests pin the
    regime transitions on planted-skew fixtures.
    """
    from pyspark.sql import functions as F

    strategy = choose_join_strategy(
        dim_bytes, fact_bytes, hot_key_share, **rule_kwargs
    )
    if strategy == "salted":
        return salted_join(left, right, left_key, right_key, salt=salt, how=how)
    if how not in ("inner", "left_outer"):
        raise ValueError("skew_aware_join supports how='inner'|'left_outer'")
    dim = F.broadcast(right) if strategy == "broadcast" else right
    return left.join(dim, left[left_key] == right[right_key], how)


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
