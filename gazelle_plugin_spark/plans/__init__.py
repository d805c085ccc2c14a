"""Query-plan registry.

Every implemented operator/query from SURVEY.md §2 registers here as a
``(spark, sf_dir) -> DataFrame`` builder plus (where SQL-expressible)
a DuckDB oracle SQL string over the same tables. The driver contract
(__spark_entry__.py) re-exports these.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder and its (optional) DuckDB oracle SQL.

    Aggregate/computed columns must carry identical aliases on both
    sides — the driver's compare sorts columns by name before hashing.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import all plan modules so their @query registrations run."""
    from gazelle_plugin_spark.plans import (  # noqa: F401
        tpch,
        ssb,
        tpcds_patterns,
        relational,
        expressions,
        events,
        text_pipeline,
        similarity_queries,
        multimodal,
        sqltext,
    )


#: The driver's CORRECTNESS gate verifies the FIRST 50 registered
#: queries (round-2 verdict), so the export order is curated as a
#: cross-section of every operator family rather than import order.
#: Rotation policy (round-4 verdict item 4): rows proven green in
#: ≥1 prior CORRECTNESS_r* rotate OUT to the local oracle gate (which
#: runs the identical compare at the same scale — demotion ≠ removal);
#: never-driver-verified rows rotate IN; freshly-FIXED rows stay in
#: for at least one more round (the 9 events_* rows this round). q1
#: stays first: entry() depends on it. Every window entry has a
#: DuckDB oracle except ROWS_ONLY_WINDOW (driver records its weaker
#: rows-only check for those — better than no external evidence).
DRIVER_WINDOW: tuple[str, ...] = (
    # flagship
    "q1",
    # round-7 rotation (round-6 verdict item 1): the 12 queries added
    # late in round 6 that have never had a driver-side CORRECTNESS
    # row rotate IN (all were green under the identical local oracle
    # compare); with these verified, every registered query has been
    # driver-green at least once.
    "doc_cluster_dedup",
    "doc_mixture_sample",
    "doc_pack_sequences",
    "doc_pii_scrub",
    "doc_rarity",
    "events_decay",
    "rel_bitmap_distinct",
    "rel_hll_union",
    "rel_merge_upsert",
    "rel_open_intervals",
    "rel_regression",
    "rel_trade_pagerank",
    # NEW in round 7, never driver-verified:
    "ds_multichannel_profit",  # q5/q77 union-channel rollup report
    "ds_growth_chain",         # q31 six-way growth-ratio chain
    "ds_demo_exists",          # q35/q69 EXISTS+NOT EXISTS combo
    "ds_join_chain",           # q64 chained multi-round join
    "ds_or_bands",             # q13/q48 disjunctive band residual
    "ds_best_worst",           # q44 dual-end rank join
    "expr_url",                # parse_url family vs regex oracle
    "orc_ssb2_1",              # ORC scan path vs the parquet oracle
    # Rows below are green-once (r6) second confirmations filling the
    # remaining slots; rows green in >=1 earlier round (the 13
    # round-5-debt rows verified r6, q2, doc_simhash_neardup,
    # expr_datetime, rel_approx_agg, the whole SSB flight, ...) rotate
    # out to the local oracle gate (demotion != removal).
    "mm_byte_features",
    "ds_cum_fullouter",    # q51 cumulative full-outer
    "ds_channel_anti",     # q78 channel anti chain
    "ds_returns_adjust",   # q93 returns correction
    "ds_time_bands",       # q88 banded counts
    # full VALUES-list oracle since round 8 (generated from the
    # pure-Python murmur3/xxhash64 implementations in
    # functions/hash_reference.py) — stays in for the driver to
    # confirm the upgraded row
    "expr_hash_native",
    "emb_semdedup",     # new r7: semantic dedup (cluster-bucketed)
    "events_scd2",      # new r7: SCD-2 validity-interval history
    "doc_cms_heavyhitters",     # new r7: count-min frequency sketch
    "doc_bloom_contamination",  # new r7: Bloom-filter decontamination
    "doc_hash_embed",
    "emb_kmeans",
    "bkt_colocated_join",  # new r7: bucketed zero-exchange join
    "ds_lochierarchy",  # new: q36 rank-within-rollup-level
    "ds_dual_rank",     # new: q49 dual rank filter
    "emb_hard_negatives",  # new r7: contrastive hard-negative mining
    "rel_exact_percentiles",  # new r7: exact quantiles grade the sketch
    "events_rfm",       # new: RFM quartile segmentation
    "events_streak",    # new: gaps-and-islands day streaks
    "emb_pq",           # new: product quantization codes
    "ds_channel_overlap",  # new: q97 full-outer overlap counts
    "ds_rev_histogram",    # new: q54 revenue-segment histogram
    "ds_band_distinct",    # new: q28 multi-distinct band aggregates
    "ds_latency_pivot",    # new: q62/q99 latency band pivot
    "doc_chunk_dedup",     # new: CCNet chunk-grain keep-first dedup
    "doc_dup_ngram_coverage",  # new: FineWeb dup-ngram diagnostic
    "rel_window_cntd",     # new: COUNT(DISTINCT) OVER rewrite
    "events_gapfill",      # new: hourly grid densify + forward fill
    "events_ohlc",         # new: OHLC resample via min_by/max_by
)

#: Window entries with NO DuckDB oracle. Empty since round 8:
#: expr_hash_native — the last rows-only entry — now carries a VALUES
#: list oracle generated from the pure-Python hash implementations
#: (plans/expressions.py:_hash_native_oracle), so every window entry
#: has a full hash-match oracle. rel_approx_agg and mm_byte_features
#: graduated in round 6.
ROWS_ONLY_WINDOW: frozenset[str] = frozenset()


def _curated(reg: dict[str, str | QueryFn]) -> dict:
    missing = [n for n in DRIVER_WINDOW if n not in QUERIES]
    if missing:
        raise ValueError(f"DRIVER_WINDOW names not registered: {missing}")
    out = {n: reg[n] for n in DRIVER_WINDOW if n in reg}
    out.update((n, f) for n, f in reg.items() if n not in out)
    return out


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return _curated(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return _curated(ORACLE)
