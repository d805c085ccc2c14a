"""Pins for the measurement/report tooling (round-13 advice)."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")


def _load(name: str):
    spec = importlib.util.spec_from_file_location(name, os.path.join(_TOOLS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_sf1_report_disjoint_sides(tmp_path, monkeypatch, capsys):
    """Two detail files sharing NO query names (one side errored
    wholesale) must still render the table and emit the flagged JSON
    line instead of dying on a zero-division in the geomean block."""
    a = tmp_path / "sf1.json"
    b = tmp_path / "sf01.json"
    a.write_text(json.dumps({"ratios": {"q1": 1.2}, "queries": {"q1": 3.0}}))
    b.write_text(json.dumps({"ratios": {"q6": 1.1}, "queries": {"q6": 0.5}}))
    monkeypatch.setattr(sys, "argv", ["sf1_report.py", str(a), str(b)])
    _load("sf1_report").main()
    out = capsys.readouterr().out
    assert '{"flagged": []}' in out
    assert "uncompared" in out


def test_bench_adjudicate_classifies_verdicts(monkeypatch):
    """bench._adjudicate re-measures suspects and classifies: fresh
    ratio >= 0.9 -> machine-state, < threshold -> confirmed-weak, else
    borderline; a side that errors records err instead of a verdict.
    Pinned with a fake worker so no JVMs spawn."""
    import bench

    fresh = {
        ("engine", "qa"): {"sec": 1.0, "t": [1.0, 1.0]},
        ("vanilla", "qa"): {"sec": 1.2, "t": [1.2, 1.2]},
        ("engine", "qb"): {"sec": 2.0, "t": [2.0, 2.0]},
        ("vanilla", "qb"): {"sec": 1.0, "t": [1.0, 1.0]},
        ("engine", "qc"): {"sec": 1.0, "t": [1.0]},
        ("vanilla", "qc"): {"sec": 0.8, "t": [0.8]},
        ("engine", "qd"): {"err": "boom"},
        ("vanilla", "qd"): {"sec": 1.0, "t": [1.0]},
    }

    class FakeHandle:
        def __init__(self, kind):
            self.kind = kind

        def ask(self, name):
            return dict(fresh[(self.kind, name)])

        def stop(self):
            pass

    monkeypatch.setattr(bench, "_WorkerHandle", FakeHandle)
    rd = {"qa": 0.5, "qb": 0.6, "qc": 0.65, "qd": 0.69}
    out = bench._adjudicate(list(rd), rd)
    assert out["qa"]["verdict"] == "machine-state" and out["qa"]["fresh_ratio"] == 1.2
    assert out["qb"]["verdict"] == "confirmed-weak" and out["qb"]["fresh_ratio"] == 0.5
    assert out["qc"]["verdict"] == "borderline"
    assert "err" in out["qd"] and "verdict" not in out["qd"]
    # original interleaved ratio is preserved for the artifact reader
    assert out["qa"]["ratio"] == 0.5

    # like-for-like reps: one side's SHORT_QUERY_REPS extension (extra
    # warmed reps) must not skew the ratio — compare medians over the
    # same number of LEADING reps
    fresh[("engine", "qe")] = {"sec": 1.0, "t": [2.0, 2.0, 2.0, 1.0, 1.0]}
    fresh[("vanilla", "qe")] = {"sec": 2.0, "t": [2.0, 2.0, 2.0]}
    out = bench._adjudicate(["qe"], {"qe": 0.5})
    assert out["qe"]["fresh_ratio"] == 1.0  # not 2.0/1.0 from the medians

    # a raised threshold must never let 'machine-state' swallow a
    # fresh ratio still under it (confirmed-weak wins the precedence)
    monkeypatch.setattr(bench, "ADJUDICATE_UNDER", 0.95)
    fresh[("engine", "qf")] = {"sec": 1.0, "t": [1.0]}
    fresh[("vanilla", "qf")] = {"sec": 0.92, "t": [0.92]}
    out = bench._adjudicate(["qf"], {"qf": 0.5})
    assert out["qf"]["verdict"] == "confirmed-weak"


def test_sf1_report_flags_degraded(tmp_path, monkeypatch, capsys):
    a = tmp_path / "sf1.json"
    b = tmp_path / "sf01.json"
    a.write_text(json.dumps({"ratios": {"q1": 0.6}, "queries": {"q1": 3.0}}))
    b.write_text(json.dumps({"ratios": {"q1": 1.0}, "queries": {"q1": 0.5}}))
    monkeypatch.setattr(sys, "argv", ["sf1_report.py", str(a), str(b)])
    _load("sf1_report").main()
    out = capsys.readouterr().out
    assert '{"flagged": ["q1"]}' in out
    assert "geomean" in out


def test_bench_rep_shape_classifier_boundaries():
    """Pin the warm-up-shape classifier (round-14 verdict task 3):
    decaying iff first timed rep >= 1.25x the median of the rest;
    short arrays carry no shape evidence and stay adjudicable."""
    import bench

    # r14's ds_month_flag_pivot engine reps: the motivating example
    assert bench._reps_decaying([4.99, 3.91, 2.89])
    # exactly at the factor boundary counts as decaying (>=)
    assert bench._reps_decaying([1.25, 1.0, 1.0])
    assert not bench._reps_decaying([1.24, 1.0, 1.0])
    # uniform gap = not decaying = needs fresh JVMs
    assert not bench._reps_decaying([2.0, 2.0, 2.0])
    # no shape evidence: empty / single-rep arrays
    assert not bench._reps_decaying(None)
    assert not bench._reps_decaying([3.0])

    # steady ratio drops the first rep on BOTH sides, like-for-like:
    # median(2.73, 2.87) / median(3.91, 2.89). With r14's real
    # ds_month_flag_pivot arrays this is 0.824 < 0.9, so that row
    # would still QUEUE for fresh JVMs — decay alone never excuses a
    # row whose steady state is below the band.
    assert bench._steady_ratio([4.99, 3.91, 2.89], [3.83, 2.73, 2.87]) == round(
        2.80 / 3.4, 3
    )
    assert bench._steady_ratio([1.0], [1.0, 1.0]) is None


def test_bench_select_suspects_band_and_cap(monkeypatch):
    """The adjudication blind band is closed: [0.7, 0.9) rows with
    uniform engine reps queue for fresh JVMs; warm-up-shaped band rows
    with parity steady-state self-explain as rep-decay; sub-0.7 rows
    always queue; overflow past ADJUDICATE_MAX is RETURNED as skipped,
    never silently dropped (round-14 ADVICE item 1)."""
    import bench

    monkeypatch.setattr(bench, "ADJUDICATE_MAX", 2)
    rd = {
        "low1": 0.5,          # sub-0.7: always queue (worst first)
        "low2": 0.65,         # sub-0.7: queue -> cap reached
        "band_uniform": 0.8,  # uniform reps: queue -> skipped past cap
        "band_decay": 0.85,   # warm-up shape + parity steady: explained
        "band_decay_still_weak": 0.85,  # decay but steady < 0.9: queue
        "healthy": 1.1,       # over the band: untouched
    }
    ereps = {
        "band_uniform": {"t": [2.0, 2.0, 2.0]},
        "band_decay": {"t": [4.99, 3.91, 2.89]},
        "band_decay_still_weak": {"t": [4.0, 2.0, 2.0]},
        "healthy": {"t": [1.0, 1.0]},
    }
    vreps = {
        "band_uniform": {"t": [1.6, 1.6, 1.6]},
        "band_decay": {"t": [3.83, 3.2, 3.3]},
        "band_decay_still_weak": {"t": [1.5, 1.5, 1.5]},
        "healthy": {"t": [1.1, 1.1]},
    }
    explained, queue, skipped = bench._select_suspects(rd, ereps, vreps)
    assert list(explained) == ["band_decay"]
    assert explained["band_decay"]["verdict"] == "rep-decay"
    assert explained["band_decay"]["steady_ratio"] >= 0.9
    assert queue == ["low1", "low2"]
    assert skipped == ["band_uniform", "band_decay_still_weak"]

    # a band row with NO rep arrays (e.g. worker err on one side's
    # reps) has no shape evidence -> queues rather than self-explains
    explained, queue, _ = bench._select_suspects({"bare": 0.8}, {}, {})
    assert not explained and queue == ["bare"]


def test_bench_rejects_unknown_flags(monkeypatch, capsys):
    """A typo'd flag must not silently launch a full default compare
    run (round-14 verdict task 4): unknown --* exits 2 with usage;
    -h/--help prints usage and exits 0."""
    import pytest

    import bench

    monkeypatch.setattr(sys, "argv", ["bench.py", "--help"])
    bench.main()
    assert "usage:" in capsys.readouterr().out

    monkeypatch.setattr(sys, "argv", ["bench.py", "--helpp"])
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 2
    assert "unknown flag" in capsys.readouterr().err

    monkeypatch.setattr(sys, "argv", ["bench.py", "-x", "q1"])
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 2


def test_scale_bench_growth_report_refuses_vacuous():
    """The vacuity guard (round-14 verdict task 2): growth verdicts
    are refused — not computed — when any scale point's output was
    empty or predates the row-count schema; healthy series carry
    first->last growth factors."""
    sb = _load("scale_bench")

    def pt(docs, name_rows):
        return {
            "sf_dir": f"d{docs}",
            "docs": docs,
            "queries": {
                n: {"sec": docs / 1000, "shuffle_bytes": docs * 10, **extra}
                for n, extra in name_rows.items()
            },
        }

    lines = [
        pt(1000, {"ok_q": {"rows": 5}, "vac_q": {"rows": 7}, "old_q": {}}),
        pt(3000, {"ok_q": {"rows": 15}, "vac_q": {"rows": 0}, "old_q": {}}),
    ]
    rep = sb.growth_report(lines)
    assert rep["ok_q"]["verdict"] == "ok"
    assert rep["ok_q"]["docs_x"] == 3.0
    assert rep["ok_q"]["bytes_x"] == 3.0
    assert rep["ok_q"]["rows_x"] == 3.0
    # empty output at ANY point -> refused, naming the dir
    assert rep["vac_q"]["verdict"] == "refused: vacuous-at d3000"
    # pre-guard rows can't prove non-vacuity -> refused as well
    assert rep["old_q"]["verdict"].startswith("refused: no-rowcount")
    # a single scale point is never a growth verdict
    rep = sb.growth_report(lines[:1])
    assert rep["ok_q"]["verdict"] == "refused: <2 scale points"
