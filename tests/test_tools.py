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
