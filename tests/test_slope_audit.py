"""Pure classification core of tools/slope_audit.py — the calibration
that distinguishes "growing faster than the data" (flag) from
"consistent with linear compute" (watch) from overhead-dominated
noise.  No Spark needed."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent


def _load():
    spec = importlib.util.spec_from_file_location(
        "slope_audit", _REPO / "tools" / "slope_audit.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_linear_operator_at_the_linear_line_is_watch_not_flag():
    sa = _load()
    out = sa.classify("some_query", 1.0, 9.0)  # slope 9 ~ linear at 10x
    assert out["slope"] == 9.0
    assert not out["flagged"] and out["watch"]


def test_true_quadratic_flags():
    sa = _load()
    # fuzzy_levenshtein's pre-fix measurement: 0.28 s -> 7.3 s = 26x
    out = sa.classify("some_query", 0.28, 7.3)
    assert out["flagged"] and not out["watch"]


def test_subsecond_timings_never_flag_at_any_slope():
    sa = _load()
    out = sa.classify("some_query", 0.02, 0.9)  # slope 45, noise regime
    assert not out["flagged"] and not out["watch"]


def test_documented_cost_models_are_exempt_with_reasons():
    sa = _load()
    for name in sa.EXPECTED_SUPERLINEAR:
        out = sa.classify(name, 0.5, 20.0)  # slope 40: would flag anyone
        assert not out["flagged"] and not out["watch"], name
        # the exemption must carry a specific reason, not a bare listing
        assert len(sa.EXPECTED_SUPERLINEAR[name]) > 40, name


def test_sub_linear_is_clean():
    sa = _load()
    out = sa.classify("some_query", 1.0, 1.9)
    assert not out["flagged"] and not out["watch"]
