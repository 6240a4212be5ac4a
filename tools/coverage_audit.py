#!/usr/bin/env python
"""Driver-coverage staleness audit (VERDICT r5 item 4, r6 item 2).

For every registered query, reports:
  - ``last_checked_round``: the latest CORRECTNESS_r*.json containing a
    row for it (0 = never driver-checked), and whether that row passed;
  - ``touched_since``: engine functions the query EXECUTES (discovered
    by profiling its plan construction at sf0.001, not just the
    registered wrapper — the round-6 perf campaign changed operator
    modules under unchanged wrappers, which a wrapper-only check would
    miss) that are MATERIALLY different now from the end of the
    query's last-checked round.  "Materially" = normalized-AST
    comparison (docstrings/comments stripped, module-level constants
    included via a prelude hash) — a docstring-only edit does not
    invalidate a driver row, an executable or oracle-SQL change does.

The audit is MECHANICAL, not prose (VERDICT r6 item 2): it emits
``summary.suggested_priority`` — code-touched-since-check queries
first (never-checked before touched), then the oldest-evidence cohort
— which is exactly what ``plans/registry.py``'s ``_PRIORITY`` should
be set to each round.  ``--check`` exits non-zero when any stale query
is NOT covered by the front-of-registry driver window, so an unpinned
stale query fails loudly in ``tools/verify.py`` instead of hiding in
JSON.

Round boundaries are discovered from git log ("round N: verdict..."
commits written by the driver), so no manual table needs updating.

Executor-side kernels: a module-level function invoked ONLY inside an
executor-side pandas UDF never runs on the driver, so the profiler
alone can't see it.  The trace therefore also resolves, for every
traced function, the module-level functions its code object REFERENCES
(``co_names``, including names referenced from nested lambdas/closures
via ``co_consts``) against the defining module's globals — which is
how such kernels are passed to ``applyInPandas``/``mapInPandas`` —
and follows those references TRANSITIVELY to a fixpoint within the
package (VERDICT r7 stretch item 7: a kernel calling a second
module-level helper was previously invisible at one hop).

Transitive infra-drift certification (VERDICT r7 item 2): a stale
(file, func) pair is INFRA when it is traced by >= 25% of the whole
registry (session confs ~269/271, catalog.load_table; calibrated so
``materialize`` at ~15/271 and any operator kernel stay
function-specific — a targeted rewrite must be re-checked per query,
because different queries exercise different semantics of the same
kernel, while infra is the identical call pattern everywhere).  An
infra pair's drift is CERTIFIED when ANY query with a passing driver
row from round R traces the same pair and the pair's normalized AST at
round R's boundary equals the working tree — i.e. the driver has
already validated the pair's current form through some window slot.
A query whose every stale pair is certified infra is NOT ranked in
the stale cohort (it joins the oldest-evidence rotation instead);
without this rule one session-conf edit marks all 271 queries stale
and the 50-slot window takes 4+ rounds to drain pure infra echo
(exactly what happened in rounds 6-7).

Per-run recorded traces (VERDICT r9 item 4): ``tools/driver_emulator.py
--traces-out`` persists, per round, every query's traced (file, func)
pairs with their normalized-AST hashes AT RUN TIME (``TRACES_r*.json``
at the repo root).  When a query's latest green round has a recorded
trace, this audit uses it EXACTLY instead of the bounded two-endpoint
reconstruction: the row is stale iff a recorded pair's hash differs
from the working tree or the current trace executes a pair the
recorded run never did, and the row certifies exactly the pairs it
recorded at their recorded hashes.  This closes the previously
documented residual hole (a call edge added after round R routing
certification through a row that never executed the pair) for every
round that carries a trace artifact; pre-r10 rounds fall back to the
bounded rule.

Writes COVERAGE_AUDIT.json at the repo root and prints a summary.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from etl_data_pipeline_spark.plans import QUERIES, load_all_plans  # noqa: E402

#: Size of the driver's correctness window (first N registry entries).
_WINDOW = 50

#: A stale (file, func) pair counts as INFRA — eligible for transitive
#: certification by any other query's green row — only when traced by
#: at least this share of the registry.  0.25 keeps session confs
#: (~269/271) and catalog.load_table (>=0.3) infra while leaving
#: ``materialize`` (~15/271) and every operator kernel
#: function-specific: a targeted rewrite must earn a fresh row per
#: query, because each query exercises different semantics of it.
_INFRA_MIN_SHARE = 0.25

_PKG = str(_REPO / "etl_data_pipeline_spark")


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", str(_REPO), *args],
        capture_output=True,
        text=True,
    ).stdout


def _round_boundaries() -> dict[int, str]:
    """Map round number -> end-of-round marker commit, from git log."""
    bounds: dict[int, str] = {}
    for line in _git("log", "--format=%h %s").splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): verdict", subject)
        if m:
            bounds.setdefault(int(m.group(1)), sha)  # newest-first log
    return bounds


def _row_passed(row) -> bool:
    if isinstance(row, dict):
        for key in ("match", "hash_match", "ok", "pass"):
            if key in row:
                return bool(row[key])
        return not row.get("error")
    return bool(row)


def _pair(co) -> tuple[str, str]:
    return (os.path.relpath(co.co_filename, _REPO), co.co_name)


def _names_incl_nested(co) -> set[str]:
    """co_names of a code object AND of every code object nested in
    its co_consts (lambdas/comprehensions/closures) — a kernel is
    often referenced only from inside the lambda handed to a
    higher-order helper."""
    names: set[str] = set()
    stack = [co]
    while stack:
        c = stack.pop()
        names.update(c.co_names)
        for k in c.co_consts:
            if hasattr(k, "co_names"):
                stack.append(k)
    return names


def referenced_kernels(cos, pkg_prefix: str = _PKG) -> set[tuple[str, str]]:
    """Module-level functions under ``pkg_prefix`` REFERENCED by the
    given code objects, followed TRANSITIVELY (BFS to a fixpoint) —
    the executor-side-kernel closure (see module docstring; VERDICT r7
    item 7 made this multi-hop, so a kernel calling a second module-
    level helper is audited too).  Module-level for unit-testability
    (tests/test_coverage_audit.py names a two-hop kernel)."""
    import inspect

    def _module_for(co):
        return next(
            (m for m in list(sys.modules.values())
             if getattr(m, "__file__", None) == co.co_filename),
            None,
        )

    out: set[tuple[str, str]] = set()
    visited_codes: set = set()
    work = [(co, _module_for(co)) for co in cos]
    while work:
        co, mod = work.pop()
        if mod is None or co in visited_codes:
            continue
        visited_codes.add(co)
        for ref in sorted(_names_incl_nested(co)):
            obj = getattr(mod, ref, None)
            if (
                inspect.isfunction(obj)
                and getattr(obj.__code__, "co_filename", "").startswith(
                    pkg_prefix)
                and not obj.__name__.startswith("<")
            ):
                out.add(_pair(obj.__code__))
                work.append(
                    (obj.__code__, sys.modules.get(obj.__module__))
                )
    return out


def trace_query_pairs(fn, spark, sf_dir: str) -> set[tuple[str, str]]:
    """Profile ONE query's plan construction and return the engine
    (relpath, func) pairs it executed on the driver, plus the
    transitive executor-kernel closure and the module preludes of every
    traced file.  This is THE trace definition: shared by the audit's
    ``_trace_functions`` below and the emulator's ``--traces-out``
    recording (tools/driver_emulator.py), so recorded traces and
    current-tree traces can never diverge by construction (round-10
    review finding: the loop used to be duplicated in both files)."""
    raw: set = set()

    def prof(frame, event, arg):
        if event == "call":
            co = frame.f_code
            if co.co_filename.startswith(_PKG) and not co.co_name.startswith("<"):
                raw.add(co)

    sys.setprofile(prof)
    try:
        fn(spark, sf_dir)
    finally:
        sys.setprofile(None)
    pairs = {_pair(co) for co in raw} | referenced_kernels(raw)
    pairs |= {(relpath, _MODULE_PRELUDE) for relpath, _ in pairs}
    return pairs


def _trace_functions() -> dict[str, set[tuple[str, str]]]:
    """Profile each query's plan construction; return the set of engine
    (relpath, function) pairs it executed on the driver (incl. kernel
    closure and module preludes — see trace_query_pairs)."""
    from etl_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_TRACE_SF", "/root/testdata/sf0.001")
    spark = get_spark(app_name="coverage-audit-trace")
    spark.sparkContext.setLogLevel("ERROR")

    traced: dict[str, set[tuple[str, str]]] = {}
    for name, fn in QUERIES.items():
        try:
            traced[name] = trace_query_pairs(fn, spark, sf_dir)
        except Exception as exc:  # plan construction must not fail
            print(f"TRACE FAILURE for {name}: {exc!r}", file=sys.stderr)
            raise
    spark.stop()
    return traced


#: Pseudo-function key under which ``normalized_func_hashes`` reports
#: the module-prelude hash (illegal as a Python identifier, so it can
#: never collide with a real function name).
_MODULE_PRELUDE = "<module-prelude>"


def normalized_func_hashes(source: str) -> dict[str, list[str]]:
    """Map function name -> sorted list of SEMANTIC hashes of every
    def/async-def with that name in ``source`` (methods and nested defs
    included).

    The hash is over ``ast.dump`` with all docstrings stripped from the
    subtree, so comment-only and docstring-only edits — e.g. recording
    a rejected-A/B note in a query's docstring — do NOT change it,
    while any executable change (including decorator arguments, where
    the registry's oracle SQL lives) does.  This is what makes the
    staleness audit mean "the code the driver checked has materially
    changed", not "someone touched these lines" (the former ``git log
    -L`` check flagged 269/271 queries after a round of docstring
    edits, crowding the genuinely-rewritten queries out of the driver
    window).
    """
    import ast
    import hashlib

    def _strip_docstrings(node) -> None:
        for sub in ast.walk(node):
            body = getattr(sub, "body", None)
            if (
                isinstance(body, list)
                and body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                del body[0]
                if not body:
                    body.append(ast.Pass())

    def _hash(node) -> str:
        dump = ast.dump(node, include_attributes=False)
        return hashlib.sha256(dump.encode()).hexdigest()[:16]

    tree = ast.parse(source)
    out: dict[str, list[str]] = {}
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            clone = ast.parse(ast.unparse(node)).body[0]
            _strip_docstrings(clone)
            out.setdefault(node.name, []).append(_hash(clone))
    # Module prelude: everything OUTSIDE function bodies (module-level
    # constants such as shared oracle SQL, imports, class/def
    # signatures).  A change here marks every traced function in the
    # file stale — coarse, but module-level edits are material by
    # definition (comments/docstrings are already excluded).
    prelude = ast.parse(ast.unparse(tree))
    for node in ast.walk(prelude):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            node.body = [ast.Pass()]
            node.decorator_list = []  # covered by the per-function hash
    _strip_docstrings(prelude)
    out[_MODULE_PRELUDE] = [_hash(prelude)]
    return {name: sorted(hs) for name, hs in out.items()}


def _func_touches(pairs: set[tuple[str, str]],
                  boundaries: dict[int, str]) -> dict[tuple[str, str], set[int]]:
    """For each (file, func), the set of rounds R such that the function
    is MATERIALLY different now (working tree) from round R's boundary
    commit — i.e. a round-R driver row is stale for any query executing
    this function.  "Materially" = normalized-AST inequality (see
    ``normalized_func_hashes``): docstring/comment edits don't count."""
    rounds = sorted(boundaries)
    files = {relpath for relpath, _ in pairs}

    # One parse per (file, version): working tree + each round boundary.
    now_hashes: dict[str, dict[str, list[str]]] = {}
    old_hashes: dict[tuple[str, int], dict[str, list[str]]] = {}
    for relpath in sorted(files):
        now_hashes[relpath] = normalized_func_hashes(
            (Path(_REPO) / relpath).read_text()
        )
        for rnd in rounds:
            src = _git("show", f"{boundaries[rnd]}:{relpath}")
            # file absent at that boundary -> every func in it is new
            old_hashes[(relpath, rnd)] = (
                normalized_func_hashes(src) if src else {}
            )

    touch_after: dict[tuple[str, str], set[int]] = {}
    # Prelude invalidation is reported as its own (file, <module-prelude>)
    # pair — NOT smeared over every function in the file, which would
    # make a file-wide import edit look like a per-function rewrite and
    # destroy the specificity signal prescribe() ranks by.
    for relpath in sorted(files):
        now_prelude = now_hashes[relpath][_MODULE_PRELUDE]
        stale_for = {
            rnd for rnd in rounds
            if old_hashes[(relpath, rnd)].get(_MODULE_PRELUDE) != now_prelude
        }
        if stale_for:
            touch_after[(relpath, _MODULE_PRELUDE)] = stale_for
    for pair in sorted(pairs):
        relpath, func = pair
        now = now_hashes[relpath].get(func)
        stale_for = {
            rnd for rnd in rounds
            if old_hashes[(relpath, rnd)].get(func) != now
        }
        if stale_for:
            touch_after[pair] = stale_for
    return touch_after


def _load_recorded_traces() -> dict[int, dict]:
    """Load every TRACES_r*.json at the repo root: round -> the trace
    payload written by ``tools/driver_emulator.py --traces-out``
    ({"round", "head_sha", "queries": {name: {"file:func": [hashes]}}}).
    Malformed files are skipped loudly rather than failing the audit —
    a bad trace must degrade to the bounded rule, never block it."""
    out: dict[int, dict] = {}
    for f in sorted(glob.glob(str(_REPO / "TRACES_r*.json"))):
        try:
            payload = json.load(open(f))
            out[int(payload["round"])] = payload
        except (ValueError, KeyError, TypeError, OSError,
                json.JSONDecodeError) as exc:
            # TypeError: valid JSON of the wrong shape (array/string
            # top level); OSError: unreadable file — both must degrade
            # to the bounded rule, never crash the audit (round-10
            # review finding).
            print(f"warning: skipping malformed trace {f}: {exc!r}",
                  file=sys.stderr)
    return out


def _split_pair_str(pair_str: str) -> tuple[str, str]:
    relpath, _, func = pair_str.rpartition(":")
    return relpath, func


def recorded_stale_pairs(name, rnd, recorded, current_pairs, current_hashes):
    """EXACT staleness from a recorded per-run trace (pure; unit-tested).

    Returns the set of (file, func) pairs for which query ``name``'s
    round-``rnd`` green row is NOT evidence under the current working
    tree, or None when no trace was recorded for (rnd, name) — the
    caller then falls back to the bounded boundary-commit rule.  A pair
    is stale when its recorded normalized-AST hashes differ from the
    working tree's (the code the row validated has changed), or when
    the CURRENT trace executes a pair the recorded run never did (a new
    call edge the row cannot vouch for — the exact class the bounded
    rule could only approximate)."""
    rec = recorded.get(rnd, {}).get("queries", {}).get(name)
    if rec is None:
        return None
    stale: set[tuple[str, str]] = set()
    rec_pairs: set[tuple[str, str]] = set()
    for pair_str, hashes in rec.items():
        pair = _split_pair_str(pair_str)
        rec_pairs.add(pair)
        now = current_hashes(pair[0]).get(pair[1], [])
        if not hashes and not now:
            # Unhashable pair (a profiled class body — the AST hasher
            # only sees defs): [] == [] is vacuous, never evidence and
            # never staleness; edits to a class body are caught by its
            # file's <module-prelude> pair (round-10 review finding).
            continue
        if now != hashes:
            stale.add(pair)
    # A pair the CURRENT trace executes but the recorded run never did
    # is stale — unless it is unhashable (class body), which the
    # prelude covers.
    stale |= {
        p for p in current_pairs
        if p not in rec_pairs and current_hashes(p[0]).get(p[1], [])
    }
    return stale


def certified_pair_set(traced, last, passed, bounds, touch_after,
                       recorded=None, current_hashes=None):
    """Transitive infra-drift certification core (pure; unit-tested).

    Returns the set of (file, func) pairs whose CURRENT normalized AST
    some passing driver row has already executed — i.e. there is a
    round-R green row for a query tracing the pair, and the pair is
    unchanged at BOTH of round R's endpoints: since round R-1's
    boundary (R-1 in bounds, R-1 not in touch_after[pair]) AND since
    round R's own boundary (R not in touch_after[pair]).  The R-1
    requirement is the ADVICE r8 fix: the correctness sweep runs
    BEFORE the end-of-round boundary commit, so "unchanged since round
    R's boundary" alone admits an infra edit landing mid-round after
    the sweep (a common fix-then-snapshot flow) — requiring the pair
    unchanged since the round STARTED bounds the code state the
    round-R sweep could actually have seen.  Residual caveat (also
    ADVICE r8): traces come from the CURRENT working tree, so a call
    edge added after round R could still route certification through a
    row that never executed the pair — but adding that edge changes
    the adding function, which the R-1/R endpoint pair catches for any
    same-file change; full closure would need per-run trace
    persistence in CORRECTNESS_r*.json, which past artifacts lack.
    Whether a pair is ELIGIBLE for certification (infra, traced by
    >= _INFRA_MIN_SHARE of the registry) is decided separately in
    ``split_stale`` — eligibility is about trace share, certification
    about evidence.

    Recorded-trace preference (VERDICT r9 item 4): when ``recorded``
    carries a per-run trace for (r2, q2) and ``current_hashes`` is
    given, the row certifies EXACTLY the pairs whose recorded
    normalized-AST hashes equal the working tree's — no boundary
    bounding needed, because the trace states what the run executed and
    at which code state.  Rounds without traces keep the bounded rule
    below."""
    certified: set[tuple[str, str]] = set()
    for q2, pairs in traced.items():
        r2 = last.get(q2, 0)
        if not r2 or not passed.get(q2):
            continue
        rec = (recorded or {}).get(r2, {}).get("queries", {}).get(q2)
        if rec is not None and current_hashes is not None:
            for pair_str, hashes in rec.items():
                pair = _split_pair_str(pair_str)
                # truthy hashes required: an unhashable class-body pair
                # ([] == []) must never certify anything (round-10
                # review finding)
                if hashes and current_hashes(pair[0]).get(pair[1], []) == hashes:
                    certified.add(pair)
            continue
        if r2 not in bounds:
            continue
        if (r2 - 1) not in bounds:
            # No discovered start-of-round boundary (e.g. a round-1
            # row): the sweep's code state cannot be bounded, so the
            # row certifies nothing.  Conservative by design.
            continue
        for pair in pairs:
            stale_rounds = touch_after.get(pair, ())
            if r2 not in stale_rounds and (r2 - 1) not in stale_rounds:
                certified.add(pair)
    return certified


def split_stale(stale_pairs, trace_count, n_queries, certified_pairs):
    """Split a query's stale pairs into (certified-infra, function-
    specific).  Pure; unit-tested.  A pair is certified infra only when
    BOTH conditions hold: traced by >= _INFRA_MIN_SHARE of the registry
    (same call pattern everywhere — one fresh green row re-validates
    all) AND present in ``certified_pairs`` (some green row postdates
    the change).  Everything else stays function-specific and must earn
    its own driver row."""
    certified = [
        p for p in stale_pairs
        if trace_count.get(p, 0) >= _INFRA_MIN_SHARE * n_queries
        and p in certified_pairs
    ]
    specific = [p for p in stale_pairs if p not in set(certified)]
    return certified, specific


def prescribe(audit: dict, window: int = _WINDOW):
    """Pure ranking core (unit-tested in tests/test_coverage_audit.py).

    Input: {name: {last_checked_round, touched_since?,
    newest_change_round?, most_specific_share?}}.  Returns (never,
    stale, suggested, overflow): never-checked queries first, then
    stale queries ranked by SPECIFICITY of the invalidating change
    (``most_specific_share`` = fraction of all queries tracing the
    most-targeted stale function — a rewrite of one operator's kernel,
    traced by 3 queries, outranks a session-conf edit traced by all
    271, because the targeted query has effectively never been
    driver-checked in its current form while infra drift is re-covered
    by any slot that executes it), then by RECENCY of the change,
    tie-broken by oldest driver evidence; then the oldest-evidence
    refresh cohort.  ``suggested`` is the first ``window`` names,
    ``overflow`` the unverified names that did not fit and must lead
    the next round.
    """
    never = sorted(n for n, e in audit.items() if not e["last_checked_round"])
    stale = sorted(
        (n for n, e in audit.items()
         if e["last_checked_round"] and e.get("touched_since")),
        key=lambda n: (audit[n].get("most_specific_share", 1.0),
                       -audit[n]["newest_change_round"],
                       audit[n]["last_checked_round"], n),
    )
    oldest = sorted(
        (n for n, e in audit.items()
         if e["last_checked_round"] and n not in set(stale)),
        key=lambda n: (audit[n]["last_checked_round"], n),
    )
    suggested = (never + stale + oldest)[:window]
    overflow = [n for n in never + stale if n not in set(suggested)]
    return never, stale, suggested, overflow


def build_audit(trace: bool = True) -> dict:
    load_all_plans()
    bounds = _round_boundaries()
    last: dict[str, int] = {}
    passed: dict[str, bool] = {}
    # r* not r0*: the artifact names are zero-padded two digits only up
    # to round 9 — CORRECTNESS_r10.json must not silently fall out of
    # the evidence base (caught in round 10, one round before it would
    # have aged every window row back to its pre-r10 evidence).
    for f in sorted(glob.glob(str(_REPO / "CORRECTNESS_r*.json"))):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        for name, row in json.load(open(f)).items():
            if rnd >= last.get(name, 0):
                last[name] = rnd
                passed[name] = _row_passed(row)

    traced = _trace_functions() if trace else {}
    # trace_query_pairs already includes the module preludes of every
    # traced file (module-level constants such as shared oracle SQL or
    # the session's RUNTIME_CONFS invalidate their file's queries).
    all_pairs: set[tuple[str, str]] = set()
    for pairs in traced.values():
        all_pairs |= pairs
    touch_after = _func_touches(all_pairs, bounds) if trace else {}

    # Specificity: how many queries does each (file, func) invalidate?
    # A change traced by 3 queries is a targeted rewrite; one traced by
    # all 271 (e.g. session confs) is infrastructure drift.  prescribe()
    # ranks the targeted ones first — they have effectively never been
    # driver-checked in their current form, while infra drift is
    # re-covered by ANY window slot that executes it.
    trace_count: dict[tuple[str, str], int] = {}
    for pairs in traced.values():
        for pair in pairs:
            trace_count[pair] = trace_count.get(pair, 0) + 1
    n_queries = max(len(traced), 1)

    recorded = _load_recorded_traces() if trace else {}
    _cur_cache: dict[str, dict] = {}

    def _current_hashes(relpath: str) -> dict:
        if relpath not in _cur_cache:
            p = Path(_REPO) / relpath
            _cur_cache[relpath] = (
                normalized_func_hashes(p.read_text()) if p.exists() else {}
            )
        return _cur_cache[relpath]

    certified_pairs = certified_pair_set(traced, last, passed, bounds,
                                         touch_after, recorded=recorded,
                                         current_hashes=_current_hashes)

    audit = {}
    for name, fn in QUERIES.items():
        rnd = last.get(name, 0)
        entry: dict = {
            "last_checked_round": rnd,
            "last_check_passed": passed.get(name),
        }
        rec_stale = (
            recorded_stale_pairs(name, rnd, recorded, traced.get(name, ()),
                                 _current_hashes)
            if rnd else None
        )
        if rnd and rnd not in bounds and rec_stale is None:
            # ADVICE r7: a last-checked round with no discovered
            # boundary commit previously skipped the staleness
            # comparison SILENTLY, treating the query as fresh.  Mark
            # it so --check can fail loudly instead.  A recorded trace
            # supersedes the boundary commit: staleness is then exact
            # regardless of git history (VERDICT r9 item 4).
            entry["round_boundary_missing"] = True
        if rnd and (rnd in bounds or rec_stale is not None):
            if rec_stale is not None:
                entry["trace_recorded"] = True
                stale_pairs = sorted(rec_stale)
            else:
                stale_pairs = sorted(
                    pair for pair in traced.get(name, ())
                    if rnd in touch_after.get(pair, ())
                )
            certified, specific = split_stale(
                stale_pairs, trace_count, n_queries, certified_pairs
            )
            if certified:
                entry["infra_certified_since"] = [
                    f"{relpath}:{func}" for relpath, func in certified
                ]
            if specific:
                entry["touched_since"] = [
                    f"{relpath}:{func}" for relpath, func in specific
                ]
                # In which round did the newest invalidating change
                # land?  stale_for = rounds whose boundary predates
                # the change, so the change landed in max(stale_for)+1.
                # Recorded-trace stale pairs may be absent from
                # touch_after (e.g. a pair no longer traced from the
                # current tree) — attribute those to the checked round
                # itself — and from trace_count (count 0 = maximally
                # specific, which is the right priority for a pair
                # whose call edge vanished in a rewrite).
                entry["newest_change_round"] = max(
                    max(touch_after.get(pair, {rnd})) for pair in specific
                ) + 1
                entry["most_specific_share"] = round(
                    min(trace_count.get(pair, 0) for pair in specific)
                    / n_queries,
                    4,
                )
        audit[name] = entry

    never, stale, suggested, overflow = prescribe(audit, _WINDOW)
    boundary_missing = sorted(
        n for n, e in audit.items() if e.get("round_boundary_missing")
    )
    summary = {
        "n_queries": len(audit),
        "n_never_checked": len(never),
        "never_checked": never,
        "n_touched_since_last_check": len(stale),
        "touched_since_last_check": sorted(stale),
        "n_infra_certified_only": sum(
            1 for e in audit.values()
            if e.get("infra_certified_since") and not e.get("touched_since")
        ),
        "round_boundary_missing": boundary_missing,
        "stale_overflow_next_round": overflow,
        "round_boundaries": bounds,
        "suggested_priority": suggested,
    }
    return {"summary": summary, "queries": audit}


def main() -> None:
    check = "--check" in sys.argv
    trace = "--no-trace" not in sys.argv
    result = build_audit(trace=trace)
    summary = result["summary"]
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "round_boundaries"}, indent=2))
    if trace:
        out_path = _REPO / "COVERAGE_AUDIT.json"
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=1)
        print(f"wrote {out_path}")
    else:
        # without the trace there is no staleness info — never overwrite
        # the committed audit with a degraded prescription
        print("--no-trace: COVERAGE_AUDIT.json NOT written (no staleness info)")
    if check:
        missing_bounds = summary.get("round_boundary_missing") or []
        if missing_bounds:
            # ADVICE r7: silently treating these as fresh weakened the
            # staleness gate — fail loudly instead.
            print(
                f"ROUND-BOUNDARY-MISSING: {len(missing_bounds)} queries "
                f"have a last_checked_round with no 'round N: verdict' "
                f"boundary commit in git log (regex miss or history "
                f"rewrite) — staleness cannot be assessed for: "
                f"{missing_bounds}",
                file=sys.stderr,
            )
            sys.exit(1)
        # The actionable invariant: the registry's driver window (front
        # _WINDOW entries after load_all_plans ordering) is exactly the
        # set the audit prescribes — so the most-urgent stale queries
        # get fresh driver rows this round, mechanically not by prose.
        window = set(list(QUERIES)[:_WINDOW])
        prescribed = set(summary["suggested_priority"])
        missing = sorted(prescribed - window)
        if missing:
            print(
                f"WINDOW-DESYNC: registry _PRIORITY omits {len(missing)} "
                f"queries the audit prescribes for the driver window — "
                f"set _PRIORITY to summary.suggested_priority: {missing}",
                file=sys.stderr,
            )
            sys.exit(1)
        # Same invariant the exact-order test pins
        # (tests/test_plans.py::test_priority_matches_audit_prescription):
        # _PRIORITY is set VERBATIM, not just as a set — otherwise this
        # gate passes while the test fails, which costs a sync cycle.
        from etl_data_pipeline_spark.plans.registry import _PRIORITY

        if _PRIORITY != summary["suggested_priority"]:
            print(
                "WINDOW-ORDER-DESYNC: _PRIORITY covers the prescribed set "
                "but not in the audit's order — set it verbatim from "
                "summary.suggested_priority",
                file=sys.stderr,
            )
            sys.exit(1)
        overflow = summary["stale_overflow_next_round"]
        if overflow:
            print(
                f"note: {len(overflow)} stale queries overflow this "
                f"round's {_WINDOW}-slot window and rotate next round: "
                f"{overflow}"
            )
        print("coverage audit clean: driver window matches the prescription")


if __name__ == "__main__":
    main()
