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
        sqltext_tpcds,
        sqltext_tpcds_full,
        layout,
    )


#: The driver's CORRECTNESS gate verifies the FIRST 50 registered
#: queries (round-2 verdict), so the export order is curated as a
#: cross-section of every operator family rather than import order.
#: Rotation policy (round-4 verdict item 4): rows proven green in
#: ≥1 prior CORRECTNESS_r* rotate OUT to the local oracle gate (which
#: runs the identical compare at the same scale — demotion ≠ removal);
#: never-driver-verified rows rotate IN; freshly-FIXED rows stay in
#: for at least one more round. Stalest-evidence rows also rotate back
#: in so driver evidence ages out within ~2 rounds (round-7 verdict
#: item 7). q1 stays first: entry() depends on it. Every window entry
#: carries a full DuckDB hash oracle (ROWS_ONLY_WINDOW is empty since
#: round 8).
DRIVER_WINDOW: tuple[str, ...] = (
    # flagship
    "q1",
    # NEW in round 9, never driver-verified: the reference's FULL
    # TPC-DS corpus tranche (plans/sqltext_tpcds_full.py) — 28
    # value-safe texts executed verbatim over the widened star catalog
    "tpcdsfull_q10",
    "tpcdsfull_q15",
    "tpcdsfull_q16",
    "tpcdsfull_q21",
    "tpcdsfull_q23a",
    "tpcdsfull_q25",
    "tpcdsfull_q29",
    "tpcdsfull_q30",
    "tpcdsfull_q33",
    "tpcdsfull_q37",
    "tpcdsfull_q40",
    "tpcdsfull_q45",
    "tpcdsfull_q48",
    "tpcdsfull_q50",
    "tpcdsfull_q56",
    "tpcdsfull_q60",
    "tpcdsfull_q62",
    "tpcdsfull_q69",
    "tpcdsfull_q71",
    "tpcdsfull_q72",
    "tpcdsfull_q81",
    "tpcdsfull_q82",
    "tpcdsfull_q84",
    "tpcdsfull_q86",
    "tpcdsfull_q88",
    "tpcdsfull_q93",
    "tpcdsfull_q97",
    "tpcdsfull_q99",
    # PLAN/IMPL CHANGED in round 9 — need fresh driver evidence:
    "doc_incremental_dedup",  # asymmetric hot-bucket guard (cap_bucket_probe)
    "doc_simhash_neardup",    # band self-join hot-bucket guard
    "mm_byte_features",       # chunk-bounded byte-stat kernel (mm_ slot)
    # stalest per-family evidence refresh (emb_ r04, events_/expr_ r05)
    "emb_centroid_assign",
    "events_frames",
    "expr_conditional",
    # STALE-EVIDENCE refresh: every remaining slot goes to rows whose
    # last driver green was r02 — all 10 r02 ds_ rows, the r02 rel_
    # rollup family, and the head of the r02 TPC-H/SSB list. The 12
    # r02 stragglers (q7/q10/q12/q13/q14/q15/q17/q20,
    # ssb2_2/3_2/3_3/4_2) rotate in r10 — never-verified beat
    # second-confirmation for this round's slots.
    "ds_class_share", "ds_dow_pivot", "ds_exists_disjunction",
    "ds_freq_buyers", "ds_rev_fraction", "ds_rollup_star",
    "ds_ss_max", "ds_trip_mismatch", "ds_week_compare", "ds_window_dev",
    "rel_cube", "rel_grouping_sets", "rel_union_all",
    "q4", "ssb1_2",
)

#: Window entries with NO DuckDB oracle. Empty since round 8:
#: expr_hash_native — the last rows-only entry — now carries a VALUES
#: list oracle generated from the pure-Python hash implementations
#: (plans/expressions.py:_hash_native_oracle), so every window entry
#: has a full hash-match oracle. rel_approx_agg and mm_byte_features
#: graduated in round 6.
ROWS_ONLY_WINDOW: frozenset[str] = frozenset()


def _conditionally_absent() -> frozenset[str]:
    """Window names whose registration is corpus-gated AND whose corpus
    is unavailable on this machine. The sqltext_*/dstext_* entries run
    the reference's literal SQL files, so they only register when the
    read-only reference checkout exists (plans/sqltext.py REF_SQL_ROOT);
    everywhere else the registry must degrade gracefully rather than
    hard-fail on the curated window."""
    from gazelle_plugin_spark.plans import sqltext, sqltext_tpcds, sqltext_tpcds_full

    absent: set[str] = set()
    if not sqltext.corpus_available():
        absent.update(n for n in DRIVER_WINDOW if n.startswith("sqltext_"))
    if not sqltext_tpcds.tpcds_corpus_available():
        absent.update(n for n in DRIVER_WINDOW if n.startswith("dstext_"))
    if not sqltext_tpcds_full.tpcds_full_corpus_available():
        absent.update(n for n in DRIVER_WINDOW if n.startswith("tpcdsfull_"))
    return frozenset(absent)


def _curated(reg: dict[str, str | QueryFn]) -> dict:
    skip = _conditionally_absent()
    missing = [n for n in DRIVER_WINDOW if n not in QUERIES and n not in skip]
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
