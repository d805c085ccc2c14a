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
