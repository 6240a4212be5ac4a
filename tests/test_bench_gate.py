"""bench.py load-gate behavior (VERDICT r5 item 3): the artifact of
record must never start on a loaded host silently, and the wait is
bounded so a driver-side timeout can't starve the round of a BENCH
file.  No SparkSession needed — the gate is pure loadavg polling."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", _REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_gate_passes_immediately_on_quiet_host(monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (0.5, 1.0, 1.0))
    out = bench._wait_for_quiet_host()
    assert out["quiet"] is True
    assert out["waited_sec"] == 0.0
    assert out["samples"] == [(0.5, 1.0)]


def test_gate_waits_then_proceeds_when_load_drops(monkeypatch):
    # final sample 0.8 < the round-12 default gate of 1.0 (the fixture
    # read 1.2 when the gate default was 2.0)
    bench = _load_bench()
    loads = iter([9.0, 7.0, 0.8])
    monkeypatch.setattr(
        bench.os, "getloadavg", lambda: (next(loads), 0.0, 0.0)
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    out = bench._wait_for_quiet_host()
    assert out["quiet"] is True
    assert out["samples"][-1] == (0.8, 0.0)
    assert out["waited_sec"] > 0


def test_gate_holds_for_five_minute_residue(monkeypatch):
    """A just-finished heavy job: 1-min quiet, 5-min still high — the
    gate must keep waiting (measured +56% headline inflation when it
    didn't)."""
    # 1-min 0.9 is quiet under the round-12 gate of 1.0; the 5-min
    # residue must decay below 1.5x the gate (3.8 -> 1.2) before the
    # gate opens (fixture was 1.1 / final 2.2 under the old 2.0 gate)
    bench = _load_bench()
    fives = iter([3.8, 3.1, 1.2])
    monkeypatch.setattr(
        bench.os, "getloadavg", lambda: (0.9, next(fives), 4.0)
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    out = bench._wait_for_quiet_host()
    assert out["quiet"] is True
    assert out["samples"][-1] == (0.9, 1.2)
    assert out["waited_sec"] > 0


def test_gate_gives_up_at_max_wait_and_says_so(monkeypatch):
    bench = _load_bench()
    monkeypatch.setenv("SPARK_GRAFT_LOAD_WAIT_MAX", "30")
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (50.0, 50.0, 50.0))
    slept = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
    out = bench._wait_for_quiet_host()
    assert out["quiet"] is False  # contaminated run is self-describing
    assert out["waited_sec"] == 30.0
    assert sum(slept) == 30.0


def test_gate_threshold_env_override(monkeypatch):
    bench = _load_bench()
    monkeypatch.setenv("SPARK_GRAFT_LOAD_GATE", "10.0")
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (5.0, 5.0, 5.0))
    out = bench._wait_for_quiet_host()
    assert out["quiet"] is True and out["waited_sec"] == 0.0
