"""Scaling measurement for the dedup/ANN/curation families (SCALE.md).

Runs the doc_*/emb_* pipeline queries against a generated scale dir
(tools/scale_fixtures.py) and records, per query:
  - median-of-reps wall time (same protocol as bench.py), and
  - shuffle write bytes + records, summed over the stages each query
    executed (Spark UI REST API — ground truth from the scheduler,
    not an estimate).

Shuffle bytes are the scale-evidence number wall time cannot give:
superlinear candidate growth in a dedup family shows up as
shuffle-bytes growth even when small-scale wall time hides it under
fixed overheads.

One invocation = one scale dir in one fresh JVM (invoke per dir so
later scale points don't ride earlier JIT warm-up). Appends one JSON
line to the output file.

Usage: python tools/scale_bench.py <out.jsonl> <scale_dir> [reps]
       python tools/scale_bench.py --report <out.jsonl>

Vacuity guard (round-14 verdict task 2): every measurement row records
the query's RESULT ROW COUNT, and the --report mode refuses to issue a
wall/bytes growth verdict for any query whose output is empty at any
scale point — the exact trap that manufactured the r13 "x5.16
superlinear" diagnosis for doc_ngram_jaccard (the fixed-vocab fixture
saturated the shingle universe and the candidate side was vacuously
empty beyond ~15k docs; SCALE.md round-14 CORRECTION). Rows measured
before the guard existed carry no row count and are refused too — old
evidence cannot prove it measured real work.

The scale dir comes from tools/scale_fixtures.py (documents/
embeddings/events) plus, for the relational star families,
tools/scale_star_fixtures.py (same dir, adds the 7 star tables).
$SPARK_GRAFT_SCALE_QUERIES (comma-separated) restricts the query set
— any registered query name works, e.g. the r12 star study ran
"ds_lochierarchy,...,ssb3_1" over star-augmented dirs.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: doc_/emb_/events_ subset of bench.py's PIPELINE_BENCH (scale dirs
#: carry documents/embeddings/events — tools/scale_fixtures.py
#: generates all three) + the ANN recall baseline and the iterative
#: k-means build.
SCALE_QUERIES = [
    "doc_exact_dedup",
    "doc_minhash_neardup",
    "doc_ngram_jaccard",
    "doc_simhash_neardup",
    "doc_curation_pipeline",
    "doc_neardup_components",
    "doc_chunks",
    "doc_chunk_dedup",
    "doc_dup_ngram_coverage",
    "doc_pii_scrub",
    "doc_pack_sequences",
    "doc_cms_heavyhitters",
    "doc_bloom_contamination",
    "doc_incremental_dedup",
    "emb_topk_cosine",
    "emb_lsh_topk",
    "emb_ivf_search",
    "emb_pq",
    "emb_semdedup",
    "emb_ivfpq_search",
    "emb_kmeans",
    # events/temporal family (all read only events.parquet)
    "events_sessionize",
    "events_asof_join",
    "events_user_topk",
    "events_funnel",
    "events_rfm",
    "events_gapfill",
    "events_markov",
    "events_streak",
]


def _ui_stages(spark) -> list[dict]:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _shuffle_totals(stages: list[dict], seen: set) -> tuple[int, int]:
    """Sum shuffle WRITE bytes/records over stages not yet attributed
    to an earlier query (write side only — read re-counts the same
    bytes on the consuming stage)."""
    b = r = 0
    for s in stages:
        key = (s["stageId"], s["attemptId"])
        if key in seen:
            continue
        seen.add(key)
        b += s.get("shuffleWriteBytes", 0)
        r += s.get("shuffleWriteRecords", 0)
    return b, r


def growth_report(lines: list[dict]) -> dict:
    """Per-query growth verdicts across the jsonl's scale points,
    smallest corpus first. A verdict is REFUSED — not computed — when
    any scale point's output was empty ("refused: vacuous-at ...") or
    predates the row-count schema ("refused: no-rowcount ..."): an
    empty candidate relation measures window machinery, not the
    operator (SCALE.md round-14 CORRECTION). With a verdict, the entry
    carries first->last growth factors for docs / wall / shuffle bytes
    / result rows so linearity is read off directly."""
    pts = sorted((l for l in lines if l.get("queries")), key=lambda l: l.get("docs", 0))
    names: list[str] = []
    for p in pts:
        names.extend(n for n in p["queries"] if n not in names)
    out: dict[str, dict] = {}
    for n in names:
        series = [
            (p["docs"], p["sf_dir"], p["queries"][n])
            for p in pts
            if "sec" in p["queries"].get(n, {})
        ]
        if len(series) < 2:
            out[n] = {"verdict": "refused: <2 scale points"}
            continue
        vacuous = [d for _, d, q in series if q.get("rows") == 0]
        no_count = [d for _, d, q in series if "rows" not in q]
        if vacuous:
            out[n] = {"verdict": f"refused: vacuous-at {','.join(vacuous)}"}
            continue
        if no_count:
            out[n] = {"verdict": f"refused: no-rowcount {','.join(no_count)}"}
            continue
        (d0, _, q0), (d1, _, q1) = series[0], series[-1]

        def x(a, b):
            return round(b / a, 2) if a else None

        out[n] = {
            "verdict": "ok",
            "docs_x": x(d0, d1),
            "wall_x": x(q0["sec"], q1["sec"]),
            "bytes_x": x(q0["shuffle_bytes"], q1["shuffle_bytes"]),
            "rows_x": x(q0["rows"], q1["rows"]),
        }
    return out


def main() -> None:
    if sys.argv[1] == "--report":
        with open(sys.argv[2]) as f:
            lines = [json.loads(ln) for ln in f if ln.strip()]
        print(json.dumps(growth_report(lines), indent=1))
        return
    out_path, sf_dir = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    from gazelle_plugin_spark.session import get_spark
    from gazelle_plugin_spark.plans import all_queries

    # bench.py's JVM profile: real heap (Spark's 1g local default OOMs
    # a 21-query session at sf1) + the 512m code cache that keeps JIT
    # alive across the session's thousands of generated classes
    mem = os.environ.get("SPARK_GRAFT_BENCH_MEM", "8g")
    spark = get_spark(
        app_name="scale-bench",
        extra_confs={
            "spark.driver.memory": mem,
            "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=512m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    # untimed warm pass: JVM/JIT + parquet footer caches (bench.py's
    # _warm discipline) so the first measured query isn't startup
    try:
        queries["doc_exact_dedup"](spark, sf_dir).collect()
    except Exception:  # noqa: BLE001 - warm-up is best-effort
        pass
    seen: set = set()
    _shuffle_totals(_ui_stages(spark), seen)  # absorb warm-up stages
    results: dict[str, dict] = {}
    # optional comma-separated subset (re-measuring one family after a
    # plan change shouldn't cost the full 29-query session)
    subset = os.environ.get("SPARK_GRAFT_SCALE_QUERIES", "")
    names = [n for n in subset.split(",") if n] or SCALE_QUERIES
    for name in names:
        try:
            spark.sparkContext._jvm.System.gc()
            times = []
            n_rows = 0
            for _ in range(reps):
                t0 = time.perf_counter()
                n_rows = len(queries[name](spark, sf_dir).collect())
                times.append(time.perf_counter() - t0)
            sb, sr = _shuffle_totals(_ui_stages(spark), seen)
            results[name] = {
                "sec": round(statistics.median(times), 4),
                # reps identical plans: per-execution shuffle = total/reps
                "shuffle_bytes": sb // reps,
                "shuffle_records": sr // reps,
                # the vacuity guard's evidence: a 0-row output means the
                # measurement exercised none of the operator's real work
                "rows": n_rows,
            }
        except Exception as exc:  # noqa: BLE001 - record and continue
            results[name] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
        print(f"  {name}: {results[name]}", file=sys.stderr)
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    n_vecs = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    line = {"sf_dir": sf_dir, "docs": n_docs, "vecs": n_vecs, "reps": reps, "queries": results}
    with open(out_path, "a") as f:
        f.write(json.dumps(line) + "\n")
    print(json.dumps({k: v.get("sec") for k, v in results.items()}))


if __name__ == "__main__":
    main()
