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

from coverage_audit import (  # noqa: E402
    _MODULE_PRELUDE,
    certified_pair_set,
    normalized_func_hashes,
    prescribe,
    recorded_stale_pairs,
    referenced_kernels,
    split_stale,
)


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


def test_specific_rewrite_outranks_infra_drift():
    """A targeted operator rewrite (stale fn traced by few queries)
    must take a window slot before queries invalidated only by
    infrastructure drift (stale fn traced by everything) — even when
    the infra change is more recent."""
    audit = {
        "infra_only": {**_e(1, change=7), "most_specific_share": 0.99},
        "op_rewrite": {**_e(5, change=6), "most_specific_share": 0.01},
        "file_prelude": {**_e(3, change=6), "most_specific_share": 0.15},
    }
    _, stale, suggested, _ = prescribe(audit, window=3)
    assert stale == ["op_rewrite", "file_prelude", "infra_only"]
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


# --- normalized_func_hashes: SEMANTIC staleness, not line churn ------

_V1 = '''
ORACLE = "SELECT 1 AS x"

def q(spark, sf):
    """doc v1"""
    # comment v1
    return spark.range(1)
'''


def test_docstring_and_comment_edits_do_not_invalidate():
    v2 = _V1.replace("doc v1", "doc v2 — recorded a rejected A/B here")
    v2 = v2.replace("# comment v1", "# totally different commentary")
    h1, h2 = normalized_func_hashes(_V1), normalized_func_hashes(v2)
    assert h1["q"] == h2["q"]
    assert h1[_MODULE_PRELUDE] == h2[_MODULE_PRELUDE]


def test_body_change_invalidates_function_only():
    v2 = _V1.replace("spark.range(1)", "spark.range(2)")
    h1, h2 = normalized_func_hashes(_V1), normalized_func_hashes(v2)
    assert h1["q"] != h2["q"]
    assert h1[_MODULE_PRELUDE] == h2[_MODULE_PRELUDE]


def test_module_constant_change_invalidates_prelude():
    # shared oracle SQL constants (e.g. _SESSION_ORACLE) live at module
    # level — a change there must mark the file's queries stale even
    # though no function body changed
    v2 = _V1.replace("SELECT 1", "SELECT 2")
    h1, h2 = normalized_func_hashes(_V1), normalized_func_hashes(v2)
    assert h1["q"] == h2["q"]
    assert h1[_MODULE_PRELUDE] != h2[_MODULE_PRELUDE]


def test_decorator_oracle_change_invalidates_function():
    v1 = "@reg('q', oracle='SELECT 1')\ndef q(s):\n    return s\n"
    v2 = "@reg('q', oracle='SELECT 2')\ndef q(s):\n    return s\n"
    assert normalized_func_hashes(v1)["q"] != normalized_func_hashes(v2)["q"]


def test_nested_kernel_docstring_stripped_and_hashed():
    v1 = "def outer(s):\n    def kern(b):\n        '''k doc'''\n        return b\n    return kern\n"
    v2 = v1.replace("k doc", "k doc changed")
    v3 = v1.replace("return b", "return b + 1")
    h1, h2, h3 = map(normalized_func_hashes, (v1, v2, v3))
    assert h1["outer"] == h2["outer"]
    assert h1["outer"] != h3["outer"]
    # the nested kernel also gets its own entry
    assert h1["kern"] == h2["kern"] != h3["kern"]


# --- transitive infra-drift certification (VERDICT r7 item 2) --------

_INFRA = ("pkg/session.py", "ensure_confs")  # traced by everything
_KERNEL = ("pkg/op.py", "kern")              # traced by 2 queries


def _cert_fixture():
    traced = {f"q{i}": {_INFRA} for i in range(10)}
    traced["q0"].add(_KERNEL)
    traced["q1"].add(_KERNEL)
    last = {f"q{i}": 5 for i in range(10)}
    last["q9"] = 7  # q9 got a fresh round-7 green row
    passed = {f"q{i}": True for i in range(10)}
    bounds = {5: "sha5", 6: "sha6", 7: "sha7"}
    # both pairs changed after round 5's boundary but before round 6's
    # — so they already had their current form when round 7 STARTED,
    # which is what lets q9's round-7 row certify them (ADVICE r8:
    # certification requires the pair unchanged at both of round R's
    # endpoints, R-1 and R)
    touch_after = {_INFRA: {5}, _KERNEL: {5}}
    trace_count = {_INFRA: 10, _KERNEL: 2}
    return traced, last, passed, bounds, touch_after, trace_count


def test_infra_drift_certified_by_any_fresh_green_row():
    traced, last, passed, bounds, touch_after, trace_count = _cert_fixture()
    cert = certified_pair_set(traced, last, passed, bounds, touch_after)
    assert _INFRA in cert  # q9's r7 row postdates the change
    certified, specific = split_stale(
        [_INFRA], trace_count, 10, cert)
    assert certified == [_INFRA] and specific == []


def test_kernel_rewrite_never_certified_even_with_fresh_row():
    """q1 tracing the rewritten kernel got a green r7 row; q0 must
    STILL be function-specific stale — a targeted rewrite earns a row
    per query, certification is infra-only (trace-share gate)."""
    traced, last, passed, bounds, touch_after, trace_count = _cert_fixture()
    last["q1"] = 7
    cert = certified_pair_set(traced, last, passed, bounds, touch_after)
    assert _KERNEL in cert  # evidence exists...
    certified, specific = split_stale(
        [_INFRA, _KERNEL], trace_count, 10, cert)
    assert specific == [_KERNEL]  # ...but share 2/10 < 0.25 blocks it
    assert certified == [_INFRA]


def test_failed_or_stale_rows_do_not_certify():
    traced, last, passed, bounds, touch_after, trace_count = _cert_fixture()
    passed["q9"] = False  # the only fresh row failed
    cert = certified_pair_set(traced, last, passed, bounds, touch_after)
    assert _INFRA not in cert
    # a green row from BEFORE the change certifies nothing either
    passed["q9"] = True
    touch_after[_INFRA] = {5, 7}  # changed again after round 7
    cert = certified_pair_set(traced, last, passed, bounds, touch_after)
    assert _INFRA not in cert


def test_row_with_missing_boundary_round_does_not_certify():
    traced, last, passed, bounds, touch_after, trace_count = _cert_fixture()
    del bounds[7]  # q9's round has no discovered boundary commit
    cert = certified_pair_set(traced, last, passed, bounds, touch_after)
    assert _INFRA not in cert


def test_mid_round_edit_after_sweep_does_not_certify():
    """ADVICE r8 (medium): the correctness sweep runs BEFORE the
    end-of-round boundary commit.  A pair whose change landed DURING
    round 7 (differs from round 6's boundary, matches round 7's) may
    postdate the round-7 sweep — a round-7 green row must not certify
    it."""
    traced, last, passed, bounds, touch_after, trace_count = _cert_fixture()
    touch_after[_INFRA] = {5, 6}  # landed mid-round-7
    cert = certified_pair_set(traced, last, passed, bounds, touch_after)
    assert _INFRA not in cert


def test_missing_start_of_round_boundary_does_not_certify():
    """Without a discovered round R-1 boundary, the code state the
    round-R sweep saw cannot be bounded — certify nothing."""
    traced, last, passed, bounds, touch_after, trace_count = _cert_fixture()
    del bounds[6]  # round 7's START boundary is undiscoverable
    cert = certified_pair_set(traced, last, passed, bounds, touch_after)
    assert _INFRA not in cert


# --- recorded per-run traces (VERDICT r9 item 4) ----------------------
#
# TRACES_r*.json (written by tools/driver_emulator.py --traces-out)
# records, per green run, exactly which (file, func) pairs each query
# executed and their normalized-AST hashes at run time.  Both staleness
# and certification must PREFER a recorded trace over the bounded
# boundary-commit reconstruction, and fall back when a round has none.

_SESS = ("pkg/session.py", "ensure_confs")
_OP = ("pkg/op.py", "kern")


def _hashes_fixture(current):
    """current: {relpath: {func: [hashes]}} -> the current_hashes
    callable the audit passes around."""
    return lambda relpath: current.get(relpath, {})


def test_recorded_stale_none_without_a_trace_for_that_round():
    assert recorded_stale_pairs(
        "q0", 7, {}, {_SESS}, _hashes_fixture({})) is None
    # a trace for a DIFFERENT round does not apply either
    recorded = {8: {"queries": {"q0": {"pkg/session.py:ensure_confs": ["h"]}}}}
    assert recorded_stale_pairs(
        "q0", 7, recorded, {_SESS}, _hashes_fixture({})) is None


def test_recorded_trace_exact_staleness():
    recorded = {7: {"queries": {"q0": {
        "pkg/session.py:ensure_confs": ["h_sess"],
        "pkg/op.py:kern": ["h_kern_old"],
    }}}}
    current = _hashes_fixture({
        "pkg/session.py": {"ensure_confs": ["h_sess"]},   # unchanged
        "pkg/op.py": {"kern": ["h_kern_new"]},            # rewritten
    })
    stale = recorded_stale_pairs("q0", 7, recorded, {_SESS, _OP}, current)
    assert stale == {_OP}


def test_recorded_trace_flags_new_call_edges():
    """A pair the CURRENT trace executes but the recorded run never did
    is stale — the green row cannot vouch for code it never ran.  This
    is the exact class the bounded rule's documented residual caveat
    could only approximate."""
    recorded = {7: {"queries": {"q0": {
        "pkg/session.py:ensure_confs": ["h_sess"],
    }}}}
    current = _hashes_fixture({
        "pkg/session.py": {"ensure_confs": ["h_sess"]},
        "pkg/op.py": {"kern": ["h_kern"]},
    })
    stale = recorded_stale_pairs("q0", 7, recorded, {_SESS, _OP}, current)
    assert stale == {_OP}
    # and a fully-matching trace is fully fresh
    recorded[7]["queries"]["q0"]["pkg/op.py:kern"] = ["h_kern"]
    assert recorded_stale_pairs("q0", 7, recorded, {_SESS, _OP},
                                current) == set()


def test_recorded_trace_certifies_exactly_what_it_ran():
    """certified_pair_set must prefer the recorded trace: a pair whose
    recorded hash equals the working tree is certified even where the
    bounded rule would refuse (here: no round-6 boundary commit at
    all), and a changed pair is NOT certified even though the bounded
    rule would have passed it (touch_after says untouched)."""
    traced = {"q9": {_SESS, _OP}}
    last, passed = {"q9": 7}, {"q9": True}
    bounds = {7: "sha7"}  # round 6 missing: bounded rule certifies nothing
    touch_after = {}      # bounded rule would call both pairs untouched
    recorded = {7: {"queries": {"q9": {
        "pkg/session.py:ensure_confs": ["h_sess"],
        "pkg/op.py:kern": ["h_kern_old"],
    }}}}
    current = _hashes_fixture({
        "pkg/session.py": {"ensure_confs": ["h_sess"]},
        "pkg/op.py": {"kern": ["h_kern_new"]},
    })
    cert = certified_pair_set(traced, last, passed, bounds, touch_after,
                              recorded=recorded, current_hashes=current)
    assert _SESS in cert       # recorded == current: exact evidence
    assert _OP not in cert     # changed since the run: no evidence
    # without the trace the bounded rule takes over and certifies
    # nothing (missing start-of-round boundary)
    assert certified_pair_set(traced, last, passed, bounds, touch_after,
                              recorded={}, current_hashes=current) == set()


def test_unhashable_class_body_pair_is_neither_stale_nor_evidence():
    """A profiled class body has no def for the AST hasher to see —
    its hash list is empty on both sides.  [] == [] must not read as
    freshness evidence (certification) nor as staleness (it would churn
    the window forever); class-body edits are caught by the file's
    <module-prelude> pair."""
    klass = ("pkg/op.py", "SomeClass")
    recorded = {7: {"queries": {"q0": {
        "pkg/session.py:ensure_confs": ["h_sess"],
        "pkg/op.py:SomeClass": [],
    }}}}
    current = _hashes_fixture({
        "pkg/session.py": {"ensure_confs": ["h_sess"]},
        "pkg/op.py": {},  # class bodies never appear in func hashes
    })
    stale = recorded_stale_pairs("q0", 7, recorded, {_SESS, klass}, current)
    assert stale == set()  # not stale...
    cert = certified_pair_set({"q0": {_SESS, klass}}, {"q0": 7},
                              {"q0": True}, {}, {},
                              recorded=recorded, current_hashes=current)
    assert klass not in cert  # ...and not evidence either
    assert _SESS in cert
    # an unhashable pair that only shows up in the CURRENT trace (e.g.
    # after the emulator started dropping them at record time) is not a
    # "new call edge" — the prelude covers it
    recorded[7]["queries"]["q0"].pop("pkg/op.py:SomeClass")
    assert recorded_stale_pairs("q0", 7, recorded, {_SESS, klass},
                                current) == set()


def test_recorded_trace_failed_row_still_certifies_nothing():
    traced = {"q9": {_SESS}}
    recorded = {7: {"queries": {"q9": {
        "pkg/session.py:ensure_confs": ["h_sess"]}}}}
    current = _hashes_fixture({"pkg/session.py": {"ensure_confs": ["h_sess"]}})
    cert = certified_pair_set(traced, {"q9": 7}, {"q9": False},
                              {6: "sha6", 7: "sha7"}, {},
                              recorded=recorded, current_hashes=current)
    assert cert == set()


# --- transitive (multi-hop) executor-kernel tracing (r7 stretch 7) ---

_KERNEL_MODULE = '''
def hop2_helper(x):
    return x + 1

def hop1_kernel(x):
    return hop2_helper(x) * 2

def entry_plan(s):
    f = lambda b: hop1_kernel(b)
    return f(s)
'''


def test_two_hop_kernel_is_traced(tmp_path):
    """entry_plan references hop1_kernel only from inside a lambda
    (nested code object), and hop1_kernel calls hop2_helper — a second
    module-level hop the one-hop r7 tracer could not see.  Both must
    appear in the kernel closure."""
    import importlib.util

    mod_path = tmp_path / "fake_kernels.py"
    mod_path.write_text(_KERNEL_MODULE)
    spec = importlib.util.spec_from_file_location("fake_kernels", mod_path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["fake_kernels"] = mod
    try:
        spec.loader.exec_module(mod)
        pairs = referenced_kernels(
            {mod.entry_plan.__code__}, pkg_prefix=str(tmp_path)
        )
        names = {func for _, func in pairs}
        assert "hop1_kernel" in names  # via the nested lambda
        assert "hop2_helper" in names  # the second hop
    finally:
        del sys.modules["fake_kernels"]
