"""Unit tests for the coverage audit's pure ranking core
(tools/coverage_audit.py::prescribe) — the function that mechanically
prescribes the driver's 50-slot correctness window, which _PRIORITY is
required to mirror (test_plans.py::test_priority_matches_audit_prescription).
No Spark, no git: synthetic audit entries only.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from coverage_audit import prescribe  # noqa: E402


def _e(checked: int, change: int | None = None) -> dict:
    entry: dict = {"last_checked_round": checked}
    if change is not None:
        entry["touched_since"] = ["pkg/mod.py:fn"]
        entry["newest_change_round"] = change
    return entry


def test_never_checked_lead_the_window():
    audit = {
        "old_green": _e(1),
        "brand_new": _e(0),
        "stale_r6": _e(5, change=6),
    }
    never, stale, suggested, overflow = prescribe(audit, window=3)
    assert never == ["brand_new"]
    assert suggested[0] == "brand_new"
    assert suggested[1] == "stale_r6"  # unverified code before refresh
    assert suggested[2] == "old_green"
    assert overflow == []


def test_stale_ranked_by_change_recency_then_oldest_evidence():
    audit = {
        "loader_drift": _e(1, change=2),   # round-2 shared-loader drift
        "perf_rewrite": _e(5, change=6),   # round-6 operator rewrite
        "this_round": _e(6, change=7),     # changed this round
        "also_drift": _e(2, change=2),     # drift, newer evidence
    }
    _, stale, suggested, _ = prescribe(audit, window=4)
    # most recent invalidating change first; within the same change
    # round, the oldest driver evidence first
    assert stale == ["this_round", "perf_rewrite", "loader_drift", "also_drift"]
    assert suggested == stale


def test_overflow_is_the_unverified_tail_not_the_refresh_cohort():
    audit = {f"stale{i}": _e(1, change=2) for i in range(5)}
    audit["green"] = _e(6)
    never, stale, suggested, overflow = prescribe(audit, window=3)
    assert len(suggested) == 3
    # overflow = stale queries that missed the window; the green
    # refresh cohort never counts as overflow
    assert overflow == sorted(stale[3:])
    assert "green" not in overflow


def test_refresh_cohort_ordered_oldest_evidence_first():
    audit = {"r5": _e(5), "r1": _e(1), "r3": _e(3)}
    _, _, suggested, _ = prescribe(audit, window=3)
    assert suggested == ["r1", "r3", "r5"]


def test_window_bound_respected():
    audit = {f"q{i:03d}": _e(1, change=2) for i in range(100)}
    _, _, suggested, overflow = prescribe(audit, window=50)
    assert len(suggested) == 50
    assert len(overflow) == 50
    assert not set(suggested) & set(overflow)
