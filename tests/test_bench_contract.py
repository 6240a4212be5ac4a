"""bench.py artifact-shape contract (VERDICT r10 item 4): the LAST
line of bench output must be a compact one-line JSON summary carrying
the headline numbers, because the driver's artifact capture is a
bounded TAIL of stdout — BENCH_r10.json lost the total and q1 to
front-truncation when the growing load_context block pushed them out
of the window.  No SparkSession needed — the summary is a pure
function of the record dict."""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", _REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_record() -> dict:
    return {
        "metric": "headline_query_set_warm_total",
        "value": 8.66,
        "unit": "sec",
        "headline_valid": True,
        "queries": {"q1_pricing_summary": 0.87, "q3_topk_join": 0.865},
        "sf": 0.1,
        "cpus": 32,
        "method": "3 runs per query in one session; min of runs 2-3",
        "load_context": {
            "paired_ratios": {"q1_pricing_summary": 1.338},
            "paired_rounds_measured": {"q1_pricing_summary": 3},
            "paired_engine_samples": {"q1_pricing_summary": 3},
            "paired_ratio_errors": {},
            "q1_paired_ratio": 1.338,
            "load_gate": {"quiet": True},
            "loadavg_before": [0.5, 0.5, 0.5],
            "loadavg_after": [1.0, 0.7, 0.5],
            "ncpus": 32,
            "registry_load_sec": 0.2,
            "session_start_sec": 3.0,
        },
    }


def test_compact_summary_is_one_line_valid_json():
    bench = _load_bench()
    line = bench.compact_summary_line(_fake_record())
    assert "\n" not in line
    parsed = json.loads(line)
    assert parsed["bench_summary"] is True


def test_compact_summary_carries_the_headline_numbers():
    """Exactly the fields a tail capture must never lose: total,
    per-query seconds, sf, validity, and the in-session paired ratios
    (the only cross-session-comparable perf metric on this host)."""
    bench = _load_bench()
    parsed = json.loads(bench.compact_summary_line(_fake_record()))
    assert parsed["total"] == 8.66
    assert parsed["sf"] == 0.1
    assert parsed["headline_valid"] is True
    assert parsed["queries"]["q1_pricing_summary"] == 0.87
    assert parsed["paired_ratios"]["q1_pricing_summary"] == 1.338
    # fixed shape: no unbounded blocks (load_gate samples, errors) that
    # could re-grow the line past a tail window
    assert set(parsed) == {
        "bench_summary",
        "total",
        "sf",
        "headline_valid",
        "queries",
        "paired_ratios",
    }


def test_compact_summary_stays_small():
    """The whole point is surviving a bounded tail capture: with the
    full 10-query headline set the line must stay well under 2 KiB."""
    bench = _load_bench()
    rec = _fake_record()
    rec["queries"] = {f"q{i}_some_query_name": 1.2345 for i in range(10)}
    rec["load_context"]["paired_ratios"] = {
        f"q{i}_some_query_name": 1.234 for i in range(10)
    }
    assert len(bench.compact_summary_line(rec)) < 2048


def test_pinned_paired_bounds_shape():
    """The drift-alarm ceilings exist PER REGIME (VERDICT r11 item 5),
    q1's are tighter than the global 2.0 judgment bound, the
    local-cluster ceiling is tighter than local[32]'s (the lc pairing
    measured 1.217 post-rewrite vs a 1.05-1.50 local[32] noise band),
    and the breach logic fires only above the pinned value (pure dict
    logic, mirrored from main())."""
    bench = _load_bench()
    assert bench._PAIR_BOUND_DEFAULT == 2.0
    q1_local = bench.pair_bound("q1_pricing_summary", "local")
    q1_lc = bench.pair_bound("q1_pricing_summary", "local-cluster")
    assert 1.49 < q1_local < 2.0
    assert q1_lc < q1_local  # the scale-faithful regime is the canary
    assert 1.3 < q1_lc < 1.5
    # unpinned (query, regime) combinations fall back to the default
    assert bench.pair_bound("q3_topk_join", "local") == 2.0
    assert bench.pair_bound("q1_pricing_summary", "weird") == 2.0
    assert bench._regime("local-cluster[2,4,4096]") == "local-cluster"
    assert bench._regime("local[32]") == "local"
    for regime in ("local", "local-cluster"):
        ratios = {"q1_pricing_summary": 1.66, "q3_topk_join": 1.9,
                  "q5_multi_join": 1.5, "cosine_topk": 0.02}
        breaches = {
            n: r for n, r in ratios.items()
            if r > bench.pair_bound(n, regime)
        }
        # q5 has no pinned lc bound, so it must NOT breach at 1.5 in
        # either regime; only q1 crosses its per-regime ceilings
        assert breaches == {"q1_pricing_summary": 1.66}, (regime, breaches)
