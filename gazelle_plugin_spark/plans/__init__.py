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
        sqltext_tpcds_v27,
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
#: CHANGED-PLAN RULE (round-14 verdict item 1): any query whose plan
#: function changed materially in-round is auto-FRONTED into the next
#: window regardless of its staleness turn — the driver's own hash gate
#: must see the new plan before the round that shipped it is judged
#: done. (Round 14 shipped doc_ngram_jaccard's in-plan DF cap + ppjoin
#: filter while its newest driver evidence was r11; round 15 fronts it.)
DRIVER_WINDOW: tuple[str, ...] = (
    # flagship
    "q1",
    # FRONTED per the changed-plan rule: doc_ngram_jaccard's plan
    # gained the scaled DF cap + ppjoin length filter in round 14
    # (text_pipeline.py:637-680) but its newest driver-oracle row is
    # r11, pre-change. Changed plans jump the rotation queue.
    "doc_ngram_jaccard",
    # STALEST evidence next: the 27 remaining r09 tpcdsfull rows —
    # exactly the rotation precomputed at r14 close. After this window
    # no tpcdsfull row's newest green is older than r10.
    "tpcdsfull_q15", "tpcdsfull_q16", "tpcdsfull_q21",
    "tpcdsfull_q23a", "tpcdsfull_q25", "tpcdsfull_q29",
    "tpcdsfull_q30", "tpcdsfull_q33", "tpcdsfull_q37",
    "tpcdsfull_q40", "tpcdsfull_q45", "tpcdsfull_q48",
    "tpcdsfull_q50", "tpcdsfull_q56", "tpcdsfull_q60",
    "tpcdsfull_q62", "tpcdsfull_q69", "tpcdsfull_q71",
    "tpcdsfull_q72", "tpcdsfull_q81", "tpcdsfull_q82",
    "tpcdsfull_q84", "tpcdsfull_q86", "tpcdsfull_q88",
    "tpcdsfull_q93", "tpcdsfull_q97", "tpcdsfull_q99",
    # ... then 21 of the 46-row r10 cohort, curated as a family
    # cross-section (the 7 r10 tpcdsfull rows finish that family's
    # refresh; doc_/emb_/events_/expr_/q*/rel_/ssb keep the window
    # representative). The remaining 25 r10 rows front the r16 window.
    "tpcdsfull_q19", "tpcdsfull_q38", "tpcdsfull_q5",
    "tpcdsfull_q87", "tpcdsfull_q94", "tpcdsfull_q95",
    "tpcdsfull_q96",
    "doc_lang_id", "doc_quality", "doc_simhash",
    "doc_text_stats", "doc_token_counts",
    "emb_topk_cosine", "events_lag_lead", "events_sessionize",
    "expr_math", "expr_string", "q10",
    "rel_cross_join",
    # ds_double_exists is the stalest ds_ row (r10) and
    # mm_byte_features the stalest mm_ row (r11): they keep the window
    # a full family cross-section (test_sql_entry pins it).
    "ds_double_exists", "mm_byte_features",
)
# Round-16 rotation plan (computed at r15 close): assuming this window
# goes green, the stalest cohort is the 26 remaining r10 rows — front
# them (plus any plan changed in round 15, per the changed-plan rule),
# then fill with the stalest r11 rows:
#   dsv27_q10a dsv27_q11 dsv27_q14a dsv27_q34 dsv27_q5a dsv27_q6
#   dsv27_q67a dsv27_q70a dsv27_q74 dsv27_q75 dsv27_q80a dsv27_q86a
#   q12 q13 q14 q15 q17 q20 rel_collect rel_except rel_intersect
#   rel_union_distinct ssb2_2 ssb3_2 ssb3_3 ssb4_2
#   (+ 22 stalest r11 rows, recompute at close)

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
    from gazelle_plugin_spark.plans import (
        sqltext,
        sqltext_tpcds,
        sqltext_tpcds_full,
        sqltext_tpcds_v27,
    )

    absent: set[str] = set()
    if not sqltext.corpus_available():
        absent.update(n for n in DRIVER_WINDOW if n.startswith("sqltext_"))
    if not sqltext_tpcds.tpcds_corpus_available():
        absent.update(n for n in DRIVER_WINDOW if n.startswith("dstext_"))
    if not sqltext_tpcds_full.tpcds_full_corpus_available():
        absent.update(n for n in DRIVER_WINDOW if n.startswith("tpcdsfull_"))
    if not sqltext_tpcds_v27.tpcds_v27_corpus_available():
        absent.update(n for n in DRIVER_WINDOW if n.startswith("dsv27_"))
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
