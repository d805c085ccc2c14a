"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Modes:
  python bench.py [names...]            compare (default): engine in
      this process, vanilla Spark in ONE persistent subprocess,
      INTERLEAVED per query — engine median-of-R then vanilla
      median-of-R for the same query back-to-back, so sandbox load
      shifts hit both sides alike (round-3/4 verdict item). R =
      $SPARK_GRAFT_BENCH_REPS (default 3, median); a first rep under
      $SPARK_GRAFT_BENCH_WARM_UNDER sec (default 2.0) is an untimed
      warm-up on BOTH sides (r11: first-plan codegen dominated
      sub-second medians).
  python bench.py --no-compare [names...]  engine only
  python bench.py --vanilla [names...]     default-conf Spark session only
  python bench.py --worker                 internal: vanilla-session
      subprocess; reads query names from stdin, answers one JSON line
      per name on stdout.

Crash isolation (round-4 lesson: one broken query zeroed the whole
artifact): every query runs under try/except; failures land in
"errors": {name: message} and the run continues. The JSON always
prints.

Self-adjudication (round-13 verdict task 2; band widened round 15):
after a compare run, suspect ratios are re-measured in isolated fresh
JVMs — one side at a time, never co-tenant — and the verdict
(machine-state / borderline / confirmed-weak) is recorded in an
"adjudications" block. Suspects = every ratio under
$SPARK_GRAFT_BENCH_ADJ_UNDER (default 0.7) PLUS rows in
[ADJ_UNDER, $SPARK_GRAFT_BENCH_ADJ_BAND=0.9) whose engine rep array
is NOT warm-up-shaped (round-14 verdict task 3: ds_month_flag_pivot
at 0.733 left the r14 artifact unexplained). Band rows whose engine
reps DO decay and whose steady-state ratio (first rep dropped, both
sides) is parity-band are recorded as "rep-decay" without spending
JVMs. Fresh-JVM re-measurement is bounded at the worst
$SPARK_GRAFT_BENCH_ADJ_MAX=4 rows; anything past the cap is listed in
"adjudications_skipped" so the artifact never silently claims full
coverage.

The headline set is the 22 TPC-H-derived queries (matching
BENCH_r01.json and the reference's Decision Support Benchmark1) PLUS
the LLM-pipeline operators (PIPELINE_BENCH) — the ops whose 100 TB
posture the brief grades are measured every round, not argued.
Other queries run through the same harness when named explicitly.
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

#: LLM-pipeline representatives benched by default alongside TPC-H:
#: one per dedup family, both ANN paths, sessionization, as-of join.
PIPELINE_BENCH = [
    "doc_exact_dedup",
    "doc_minhash_neardup",
    "doc_ngram_jaccard",
    "doc_simhash_neardup",
    "emb_lsh_topk",
    "emb_ivf_search",
    "events_sessionize",
    "events_asof_join",
    "doc_curation_pipeline",
    "doc_neardup_components",
    "doc_chunks",
    "emb_pq",
    "doc_chunk_dedup",
    "doc_dup_ngram_coverage",
    "doc_pii_scrub",
    "doc_pack_sequences",
    "emb_semdedup",
    "events_scd2",
    "doc_cms_heavyhitters",
    "doc_bloom_contamination",
    "doc_incremental_dedup",
    "emb_ivfpq_search",
]

REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

#: First-rep cutoff (seconds) below which the first execution is
#: treated as an UNTIMED warm-up and excluded from the median. The
#: r11 per-rep profiling showed ~3x first-to-last-rep decay on BOTH
#: engines for sub-second queries — the first rep is dominated by
#: that query's own whole-stage-codegen compilation, not by the
#: engine — so median-of-3 including it measured codegen, and a new
#: sub-1.0 "perf-weak" entry had to be hand-re-benched every round.
#: Long queries keep all reps (the warm-up share is negligible and an
#: extra execution is expensive). Symmetric: both workers time
#: through this same function.
WARM_EXCLUDE_UNDER = float(os.environ.get("SPARK_GRAFT_BENCH_WARM_UNDER", "2.0"))

#: Queries whose timed median lands under WARM_EXCLUDE_UNDER extend to
#: this many timed reps (round-12 verdict task 2): the sub-2s class is
#: exactly where median-of-3 was repeatedly too noisy for the driver
#: artifact to adjudicate (ds_dow_pivot 0.437, doc_incremental_dedup
#: 0.598 — both clean on manual re-bench), so short queries buy more
#: reps (cheap) and every rep is EMITTED, not just the median.
SHORT_QUERY_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_SHORT_REPS", "5"))


def _time_one(spark, fn, sf_dir: str, reps: int = REPS) -> dict:
    """One query's measurement: ``{"sec": median, "t": [timed reps],
    "w": warm-up rep or None}`` — the per-rep data makes the artifact
    SELF-certifying (a weak median carries the rep class that caused
    it: first-plan codegen spike, one GC outlier, or uniform).

    An explicit (untimed) JVM GC ahead of the reps keeps heap debt
    from earlier queries out of this query's measurement — over an
    80+-query session, deferred collections otherwise land inside a
    random later query's reps and show up as a spurious 2-4x outlier
    on ONE side (both sides of the compare run this same path).

    The FIRST execution is kept in the median only when it ran at
    least WARM_EXCLUDE_UNDER seconds; a shorter first rep is warm-up
    (first-plan codegen) and further timed reps follow — `reps` of
    them, extended to SHORT_QUERY_REPS when the timed median is under
    the same threshold."""
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001 - a GC nudge is best-effort
        pass
    start = time.perf_counter()
    fn(spark, sf_dir).collect()
    first = time.perf_counter() - start
    warm = round(first, 4) if first < WARM_EXCLUDE_UNDER else None
    times = [] if warm is not None else [first]
    target = reps
    while len(times) < target:
        start = time.perf_counter()
        fn(spark, sf_dir).collect()
        times.append(time.perf_counter() - start)
        if (
            len(times) == target
            and target < SHORT_QUERY_REPS
            and statistics.median(times) < WARM_EXCLUDE_UNDER
        ):
            target = SHORT_QUERY_REPS
    return {
        "sec": round(statistics.median(times), 4),
        "t": [round(x, 4) for x in times],
        "w": warm,
    }


def _warm(spark, queries, sf_dir) -> None:
    """Warm the JVM + parquet footer caches with the cheapest query."""
    try:
        queries["q6"](spark, sf_dir).collect()
    except Exception:
        pass


def _run_queries(spark, names, queries, sf_dir):
    """(timings, errors, reps) — crash-isolated per query."""
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    reps: dict[str, dict] = {}
    for name in names:
        try:
            ans = _time_one(spark, queries[name], sf_dir)
            timings[name] = ans["sec"]
            reps[name] = {"t": ans["t"], "w": ans["w"]}
        except Exception as exc:  # noqa: BLE001 - record and continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
    return timings, errors, reps


def _machine_state() -> dict:
    """Best-effort host-state snapshot recorded into the artifact so
    cross-round absolute-total swings stop needing manual explanation
    (round-12 verdict task 8): load average, live java process count
    (a concurrent pytest/driver-sim JVM corrupts ratios 3-8x), and
    host uptime."""
    m: dict = {}
    try:
        m["load1"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    try:
        n = 0
        for p in os.listdir("/proc"):
            if p.isdigit():
                try:
                    with open(f"/proc/{p}/comm") as fh:
                        n += fh.read().strip() == "java"
                except OSError:
                    continue
        m["java_procs"] = n
    except OSError:
        pass
    try:
        with open("/proc/uptime") as fh:
            m["uptime_h"] = round(float(fh.read().split()[0]) / 3600, 1)
    except (OSError, ValueError):
        pass
    return m


#: Identical JVM heap on BOTH sides — the comparison must not hinge on
#: one side having more memory. 4g headroom stops the round-6 failure
#: mode (vanilla worker OOM'd mid-run at default 1g, taking the
#: remaining comparisons with it).
DRIVER_MEM = os.environ.get("SPARK_GRAFT_BENCH_MEM", "4g")

#: An 84-query session compiles thousands of generated classes; the
#: JVM's default 240 MB code cache fills mid-run and HotSpot silently
#: stops JIT-compiling — later queries then run partially interpreted
#: and show 2x+ one-sided "regressions" that vanish on a clean subset
#: run. Both sides get the same enlarged cache.
JVM_OPTS = "-XX:ReservedCodeCacheSize=512m"


def _check_jvm_opts(spark) -> None:
    """Warn if the enlarged code cache did not take effect.

    driver.extraJavaOptions only applies when this session launches the
    process's FIRST JVM; if another JVM already started in-process (e.g.
    the harness imported from pytest), the 512m setting is silently
    ignored and the code-cache outlier problem returns undetected
    (ADVICE round 6). Verify against the live JVM, not just the conf."""
    try:
        beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory
        args = beans.getRuntimeMXBean().getInputArguments()
        live = any("ReservedCodeCacheSize=512m" in str(a) for a in args)
    except Exception:  # noqa: BLE001 - introspection is best-effort
        return
    if not live:
        print(
            "WARNING: ReservedCodeCacheSize=512m not live in this JVM; "
            "long-session timings may show code-cache outliers",
            file=sys.stderr,
        )


def _engine_session(cpus: str):
    from gazelle_plugin_spark import get_spark

    spark = get_spark(
        app_name="gazelle-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_confs={
            "spark.driver.memory": DRIVER_MEM,
            "spark.driver.extraJavaOptions": JVM_OPTS,
        },
    )
    _check_jvm_opts(spark)
    return spark


def _vanilla_session(cpus: str):
    """Stock Spark: no engine confs, default shuffle partitions (200),
    default ANSI/broadcast/AQE settings — the BASELINE.md comparator.
    (UTC timezone only, for result identity; same heap as the engine
    side, see DRIVER_MEM.)"""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("vanilla-bench")
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", DRIVER_MEM)
        .config("spark.driver.extraJavaOptions", JVM_OPTS)
        .getOrCreate()
    )
    _check_jvm_opts(spark)
    return spark


def _worker(cpus: str, sf_dir: str, kind: str) -> None:
    """Measurement subprocess (engine OR vanilla session): one query
    name per stdin line, one JSON answer per stdout line. Keeping the
    session alive across queries lets the parent interleave the two
    sides per query without paying ~10 s of JVM startup per
    measurement; the parent recycles workers periodically so neither
    side's timings ride a JVM aged by dozens of earlier queries."""
    from gazelle_plugin_spark.plans import all_queries

    spark = _engine_session(cpus) if kind == "engine" else _vanilla_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    _warm(spark, queries, sf_dir)
    print(json.dumps({"ready": True}), flush=True)
    for line in sys.stdin:
        name = line.strip()
        if not name:
            continue
        try:
            out = {"name": name, **_time_one(spark, queries[name], sf_dir)}
        except Exception as exc:  # noqa: BLE001
            out = {"name": name, "err": f"{type(exc).__name__}: {exc}"[:500]}
        print(json.dumps(out), flush=True)
    spark.stop()


class _WorkerHandle:
    """Parent-side handle: spawn / ask / recycle one measurement
    worker, with a bounded crash-respawn budget shared per side."""

    MAX_RESPAWNS = 3

    def __init__(self, kind: str):
        import subprocess

        self._subprocess = subprocess
        self.kind = kind
        self.respawns = 0
        self.dead = False
        self.proc = None
        try:
            self.proc = self._spawn()
        except Exception:  # noqa: BLE001 - a side that cannot start
            self.dead = True

    def _spawn(self):
        p = self._subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), f"--worker={self.kind}"],
            stdin=self._subprocess.PIPE,
            stdout=self._subprocess.PIPE,
            stderr=self._subprocess.DEVNULL,
            text=True,
            env=os.environ,
        )
        try:
            ready = json.loads(p.stdout.readline())
            assert ready.get("ready"), f"{self.kind} worker failed: {ready}"
        except Exception:
            # never leak a half-started JVM: callers only mark the
            # side dead, so the orphan would keep its 4g heap and add
            # noise to every remaining measurement
            p.kill()
            raise
        return p

    def stop(self):
        if self.proc is None:
            return
        try:
            self.proc.stdin.close()
            self.proc.wait(timeout=60)
        except Exception:  # noqa: BLE001 - hung worker: kill
            self.proc.kill()
        self.proc = None

    def recycle(self):
        """Planned fresh-JVM swap (not charged to the crash budget)."""
        if self.dead:
            return
        self.stop()
        try:
            self.proc = self._spawn()
        except Exception:  # noqa: BLE001
            self.dead = True

    def ask(self, name: str) -> dict:
        """(sec|err) for one query; respawns once on a dead pipe."""
        if self.dead:
            return {"err": "worker died"}
        for _attempt in (1, 2):
            try:
                self.proc.stdin.write(name + "\n")
                self.proc.stdin.flush()
                return json.loads(self.proc.stdout.readline())
            except (BrokenPipeError, OSError, json.JSONDecodeError) as exc:
                err = f"worker died: {type(exc).__name__}"
                self.stop()
                if self.respawns >= self.MAX_RESPAWNS:
                    self.dead = True
                    return {"err": err}
                self.respawns += 1
                try:
                    self.proc = self._spawn()
                except Exception:  # noqa: BLE001
                    self.dead = True
                    return {"err": err}
        return {"err": err}


#: Compare-mode ratios below this trigger END-OF-RUN self-adjudication
#: (round-13 verdict task 2): the r13 driver artifact carried q7 at
#: 0.548 with uniform reps that fresh-JVM re-measurement refuted
#: (machine-state: load1=1.85 at record time). Now the artifact
#: adjudicates itself — each sub-threshold query is re-measured in
#: ISOLATED fresh JVMs (one per side, sequential, never co-tenant)
#: and the verdict lands in an "adjudications" block.
ADJUDICATE_UNDER = float(os.environ.get("SPARK_GRAFT_BENCH_ADJ_UNDER", "0.7"))
ADJUDICATE_MAX = int(os.environ.get("SPARK_GRAFT_BENCH_ADJ_MAX", "4"))

#: Upper edge of the adjudication BAND (round-14 verdict task 3): rows
#: in [ADJUDICATE_UNDER, ADJUDICATE_BAND) were previously a blind spot
#: — sub-0.9 but over the fresh-JVM trigger, so the artifact shipped
#: them unexplained (r14's ds_month_flag_pivot at 0.733). Band rows
#: whose engine reps are uniform (no warm-up decay to blame) now join
#: the fresh-JVM queue; warm-up-shaped band rows self-explain via the
#: steady-state ratio instead.
ADJUDICATE_BAND = float(os.environ.get("SPARK_GRAFT_BENCH_ADJ_BAND", "0.9"))

#: A rep array is warm-up-shaped ("decaying") when its FIRST timed rep
#: runs at least this factor over the median of the remaining reps —
#: the residue of first-plan codegen/JIT that WARM_EXCLUDE_UNDER only
#:  catches for sub-2s queries. r14's ds_month_flag_pivot engine reps
#: [4.99, 3.91, 2.89]: 4.99 >= 1.25 * median(3.91, 2.89) -> decaying.
REP_DECAY_FACTOR = float(os.environ.get("SPARK_GRAFT_BENCH_DECAY_FACTOR", "1.25"))


def _reps_decaying(t: list[float] | None) -> bool:
    """True when a timed rep array has warm-up shape (see
    REP_DECAY_FACTOR). Arrays of fewer than 2 reps carry no shape
    evidence and classify as NOT decaying, i.e. they stay eligible for
    fresh-JVM adjudication rather than self-explaining."""
    if not t or len(t) < 2:
        return False
    return t[0] >= REP_DECAY_FACTOR * statistics.median(t[1:])


def _steady_ratio(et: list[float] | None, vt: list[float] | None) -> float | None:
    """Steady-state ratio: drop the FIRST rep on BOTH sides (the
    decay residue) and compare medians over the same number of leading
    remaining reps. None when either side lacks 2+ reps."""
    if not et or not vt or len(et) < 2 or len(vt) < 2:
        return None
    k = min(len(et), len(vt))
    return round(statistics.median(vt[1:k]) / statistics.median(et[1:k]), 3)


def _select_suspects(
    rd: dict[str, float],
    ereps: dict[str, dict],
    vreps: dict[str, dict],
) -> tuple[dict[str, dict], list[str], list[str]]:
    """Partition compare-run ratios into (self-explained rep-decay
    entries, fresh-JVM queue, skipped-past-cap names), worst ratio
    first. Sub-ADJUDICATE_UNDER rows always queue; band rows
    [ADJUDICATE_UNDER, ADJUDICATE_BAND) self-explain as "rep-decay"
    only when the engine rep array is warm-up-shaped AND the
    steady-state ratio (first rep dropped both sides) is back in the
    parity band — otherwise they queue too. The fresh-JVM queue is
    capped at ADJUDICATE_MAX; the overflow is RETURNED, not dropped,
    so the artifact records what it did not re-measure."""
    explained: dict[str, dict] = {}
    queue: list[str] = []
    for n, r in sorted(rd.items(), key=lambda kv: kv[1]):
        if r < ADJUDICATE_UNDER:
            queue.append(n)
        elif r < ADJUDICATE_BAND:
            et = (ereps.get(n) or {}).get("t")
            vt = (vreps.get(n) or {}).get("t")
            steady = _steady_ratio(et, vt)
            if _reps_decaying(et) and steady is not None and steady >= ADJUDICATE_BAND:
                explained[n] = {
                    "ratio": r,
                    "verdict": "rep-decay",
                    "steady_ratio": steady,
                }
            else:
                queue.append(n)
    return explained, queue[:ADJUDICATE_MAX], queue[ADJUDICATE_MAX:]


def _adjudicate(names: list[str], rd: dict[str, float]) -> dict:
    """Re-measure each suspect query pair in fresh, isolated JVMs
    (engine then vanilla, sequentially — the interleaved session's
    worker-JVM aging and host load are exactly what's on trial) and
    classify: machine-state (fresh ratio >= 0.9), confirmed-weak
    (still < threshold), or borderline."""
    out: dict[str, dict] = {}
    for name in names:
        entry: dict = {"ratio": rd[name]}
        sides: dict[str, dict] = {}
        for kind in ("engine", "vanilla"):
            h = _WorkerHandle(kind)
            sides[kind] = h.ask(name)
            h.stop()
        e, v = sides["engine"], sides["vanilla"]
        if "sec" in e and "sec" in v:
            et, vt = e.get("t") or [], v.get("t") or []
            # like-for-like: the SHORT_QUERY_REPS extension can fire on
            # ONE side only (its median crossed the 2s threshold),
            # handing that side extra warmed reps — compare medians
            # over the same number of leading reps on both sides
            k = min(len(et), len(vt))
            if k:
                fr = round(statistics.median(vt[:k]) / statistics.median(et[:k]), 3)
            else:
                fr = round(v["sec"] / e["sec"], 3)
            entry["fresh_ratio"] = fr
            entry["e"] = [round(x, 2) for x in et]
            entry["v"] = [round(x, 2) for x in vt]
            # confirmed-weak FIRST: with a raised threshold (env), a
            # fresh ratio under it must never read as refuted
            entry["verdict"] = (
                "confirmed-weak"
                if fr < ADJUDICATE_UNDER
                else "machine-state"
                if fr >= 0.9
                else "borderline"
            )
        else:
            entry["err"] = (e.get("err") or v.get("err") or "no measurement")[:200]
        out[name] = entry
    return out


USAGE = """usage: python bench.py [--no-compare | --vanilla] [query ...]

Runs the headline query set (TPC-H + SSB + ds_ patterns + the
LLM-pipeline ops) at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON result line. Default mode compares the engine
against a vanilla-Spark measurement subprocess, interleaved per query.

  --no-compare     engine-only run
  --vanilla        default-conf Spark session only
  --worker[=kind]  internal measurement subprocess (engine|vanilla)
  -h, --help       this message

Positional args name specific registered queries (e.g. q1 q6
doc_minhash_neardup); unknown flags are an error — a typo must not
silently launch a full default compare run (round-14 verdict task 4).
"""

KNOWN_FLAGS = {"--no-compare", "--vanilla", "--worker"}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    args = sys.argv[1:]
    if "-h" in args or "--help" in args:
        print(USAGE, end="")
        return
    unknown = [
        a
        for a in args
        if a.startswith("-") and a.split("=", 1)[0] not in KNOWN_FLAGS
    ]
    if unknown:
        print(f"bench.py: unknown flag(s): {' '.join(unknown)}\n{USAGE}", file=sys.stderr, end="")
        sys.exit(2)
    for a in args:
        if a.startswith("--worker"):
            kind = a.split("=", 1)[1] if "=" in a else "vanilla"
            _worker(cpus, sf_dir, kind)
            return
    vanilla = "--vanilla" in args
    compare = "--no-compare" not in args and not vanilla
    args = [a for a in args if not a.startswith("--")]

    from gazelle_plugin_spark.plans import all_queries

    queries = all_queries()
    # TPC-H q1-q22 + SSB 1.1-4.3 (BASELINE.md's promised sets) + the
    # TPC-DS patterns (the reference's Decision Support Benchmark2
    # analog, README.md:37-39) + the LLM-pipeline representatives.
    default_names = (
        sorted(n for n in queries if n.startswith("q"))
        + sorted(n for n in queries if n.startswith("ssb"))
        + sorted(n for n in queries if n.startswith("ds_"))
        + PIPELINE_BENCH
    )
    names = args or default_names

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "total_query_wall_time",
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "reps": REPS,
        "short_query_reps": SHORT_QUERY_REPS,
        "machine": _machine_state(),
    }
    ereps: dict[str, dict] = {}
    vreps: dict[str, dict] = {}

    if vanilla:
        spark = _vanilla_session(cpus)
        spark.sparkContext.setLogLevel("ERROR")
        _warm(spark, queries, sf_dir)
        # reps land in vreps so rep_detail labels them "vanilla", not
        # "engine" (round-13 advice: a vanilla-only artifact must not
        # mislabel its side)
        timings, errors, vreps = _run_queries(spark, names, queries, sf_dir)
        spark.stop()
    elif not compare:
        spark = _engine_session(cpus)
        spark.sparkContext.setLogLevel("ERROR")
        _warm(spark, queries, sf_dir)
        timings, errors, ereps = _run_queries(spark, names, queries, sf_dir)
        spark.stop()
    else:
        # Interleaved SYMMETRIC compare: engine AND vanilla each live
        # in their own measurement subprocess, asked back-to-back per
        # query, and BOTH are recycled to fresh JVMs every
        # RESPAWN_EVERY queries — in a 90+-query session a single
        # long-lived JVM accumulates code-cache/GC aging that shows up
        # as random 2-4x ONE-SIDED per-query outliers (round-6/7
        # lesson: every full-set "regression" vanished on a clean
        # subset re-run). Bounded-budget crash respawns are per side.
        RESPAWN_EVERY = int(os.environ.get("SPARK_GRAFT_BENCH_RESPAWN", "24"))

        eng = _WorkerHandle("engine")
        van = _WorkerHandle("vanilla")
        timings, errors = {}, {}
        vtimings, verrors = {}, {}
        for i, name in enumerate(names):
            if i and i % RESPAWN_EVERY == 0:
                eng.recycle()
                van.recycle()
            ans = eng.ask(name)
            if "sec" in ans:
                timings[name] = ans["sec"]
                ereps[name] = {"t": ans.get("t"), "w": ans.get("w")}
            else:
                errors[name] = ans["err"]
            ans = van.ask(name)
            if "sec" in ans:
                vtimings[name] = ans["sec"]
                vreps[name] = {"t": ans.get("t"), "w": ans.get("w")}
            else:
                verrors[name] = ans["err"]
        eng.stop()
        van.stop()
        if eng.respawns or van.respawns:
            result["worker_respawns"] = eng.respawns + van.respawns

        # like-for-like totals: only queries BOTH sides completed
        both = [n for n in names if timings.get(n) and vtimings.get(n)]
        ratios = [vtimings[n] / timings[n] for n in both]
        result["compared_queries"] = len(both)
        result["engine_total_compared"] = round(sum(timings[n] for n in both), 4)
        result["vanilla_total"] = round(sum(vtimings[n] for n in both), 4)
        result["vanilla_queries"] = vtimings
        if verrors:
            result["vanilla_errors"] = verrors
        if ratios:
            result["geomean_speedup_vs_vanilla"] = round(
                math.exp(sum(map(math.log, ratios)) / len(ratios)), 4
            )

    result["value"] = round(sum(timings.values()), 4)
    result["queries"] = timings
    # full per-rep record (side file): every timed rep + the excluded
    # warm-up on both sides — the artifact itself shows WHICH rep
    # class (first-plan spike, single GC outlier, uniform shift)
    # produced any weak median, no manual re-bench needed
    result["rep_detail"] = {
        n: {
            **({"engine": ereps[n]} if n in ereps else {}),
            **({"vanilla": vreps[n]} if n in vreps else {}),
        }
        for n in sorted(set(ereps) | set(vreps))
    }
    if errors:
        result["errors"] = errors
    if compare:
        # >1.0 = engine faster. Ratios are emitted BEST-FIRST so tail
        # truncation (if it ever happens again) drops the healthy
        # queries and the weak ones survive.
        rd = {
            n: round(vtimings[n] / timings[n], 3)
            for n in names
            if timings.get(n) and vtimings.get(n)
        }
        result["ratios"] = dict(
            sorted(rd.items(), key=lambda kv: kv[1], reverse=True)
        )
        # End-of-run self-adjudication (worst first, bounded): sub-0.7
        # rows always queue for fresh JVMs; band rows [0.7, 0.9) queue
        # only when their engine reps are uniform — a warm-up-shaped
        # band row whose steady-state ratio is parity self-explains as
        # "rep-decay" without spending JVMs (round-14 verdict task 3).
        adjudications, fresh_queue, skipped = _select_suspects(rd, ereps, vreps)
        if skipped:
            result["adjudications_skipped"] = skipped
        if fresh_queue:
            adjudications.update(_adjudicate(fresh_queue, rd))
        if adjudications:
            result["adjudications"] = adjudications
        if rd:
            gm = round(math.exp(sum(math.log(r) for r in rd.values()) / len(rd)), 4)
            worst = sorted(rd.items(), key=lambda kv: kv[1])[:10]

            def _worst_entry(n: str, r: float) -> dict:
                out = {"q": n, "ratio": r}
                # sub-0.9 entries carry BOTH sides' raw reps in the
                # compact line: the driver artifact adjudicates its
                # own weak rows (round-12 verdict task 2)
                if r < 0.9 and n in ereps and n in vreps:
                    out["e"] = [round(x, 2) for x in ereps[n]["t"] or []]
                    out["v"] = [round(x, 2) for x in vreps[n]["t"] or []]
                    if ereps[n].get("w") is not None:
                        out["ew"] = round(ereps[n]["w"], 2)
                    if vreps[n].get("w") is not None:
                        out["vw"] = round(vreps[n]["w"], 2)
                return out

            result["summary"] = {
                "geomean": gm,
                "worst": [_worst_entry(n, r) for n, r in worst],
            }

    # Full-precision per-query detail goes to a SIDE file; stdout gets
    # ONE compact line sized to survive the driver's ~2000-char tail
    # capture, so BENCH_r{N}.json parses end-to-end (round-9 verdict
    # item 1: every prior round's artifact had "parsed": null).
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
    )
    try:
        with open(detail_path, "w") as fh:
            json.dump(result, fh, indent=1)
    except OSError:
        detail_path = None
    line_cap = int(os.environ.get("SPARK_GRAFT_BENCH_LINECAP", "1900"))

    compact = {
        k: result[k]
        for k in (
            "metric",
            "unit",
            "sf",
            "reps",
            "value",
            "compared_queries",
            "engine_total_compared",
            "vanilla_total",
            "geomean_speedup_vs_vanilla",
            "worker_respawns",
            "short_query_reps",
            "machine",
            "adjudications",
            "adjudications_skipped",
        )
        if k in result
    }
    if detail_path:
        compact["detail_file"] = detail_path
    if errors:
        compact["errors"] = {n: e[:120] for n, e in errors.items()}
    if result.get("vanilla_errors"):
        compact["vanilla_errors"] = {
            n: e[:120] for n, e in result["vanilla_errors"].items()
        }

    def _line(n_queries: int | None, full_summary: bool = True) -> str:
        c = dict(compact)
        qnames = sorted(timings, key=timings.get, reverse=True)
        if n_queries is not None and len(qnames) > n_queries:
            qnames = qnames[:n_queries]
            c["queries_truncated_to_slowest"] = n_queries
        c["queries"] = {n: round(timings[n], 2) for n in qnames}
        if result.get("ratios"):
            # worst-first here (opposite of the side file): with the
            # summary these are the entries worth a compact line's bytes
            rnames = sorted(result["ratios"], key=result["ratios"].get)
            if n_queries is not None and len(rnames) > n_queries:
                rnames = rnames[:n_queries]
            c["ratios_worst_first"] = {n: result["ratios"][n] for n in rnames}
        if "summary" in result:
            c["summary"] = result["summary"]
            if not full_summary:  # last-resort trim: drop rep arrays
                c["summary"] = {
                    "geomean": result["summary"]["geomean"],
                    "worst": [
                        {"q": w["q"], "ratio": w["ratio"]}
                        for w in result["summary"]["worst"]
                    ],
                }
        if not full_summary and "adjudications" in c:
            c["adjudications"] = {
                n: {k: v for k, v in a.items() if k not in ("e", "v")}
                for n, a in c["adjudications"].items()
            }
        return json.dumps(c, separators=(",", ":"))

    for budget, full in ((None, True), (30, True), (12, True), (12, False), (0, False)):
        line = _line(budget, full)
        if len(line) <= line_cap:
            break
    print(line)


if __name__ == "__main__":
    main()
