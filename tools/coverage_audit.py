#!/usr/bin/env python
"""Driver-coverage staleness audit (VERDICT r5 item 4, r6 item 2).

For every registered query, reports:
  - ``last_checked_round``: the latest CORRECTNESS_r*.json containing a
    row for it (0 = never driver-checked), and whether that row passed;
  - ``touched_since``: engine functions the query EXECUTES (discovered
    by profiling its plan construction at sf0.001, not just the
    registered wrapper — the round-6 perf campaign changed operator
    modules under unchanged wrappers, which the old wrapper-only ``git
    log -L`` check missed) that have commits after the end of the
    query's last-checked round.

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
(``co_names`` against the defining module's globals, one hop) — which
is how such kernels are passed to ``applyInPandas``/``mapInPandas`` —
and audits those too.  Kernels defined inside a traced function are
already covered by the enclosing ``-L`` range.

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


def _trace_functions() -> dict[str, set[tuple[str, str]]]:
    """Profile each query's plan construction; return the set of engine
    (relpath, function) pairs it executed on the driver."""
    from etl_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_TRACE_SF", "/root/testdata/sf0.001")
    spark = get_spark(app_name="coverage-audit-trace")
    spark.sparkContext.setLogLevel("ERROR")
    hits: set[tuple[str, str]] = set()

    raw: set = set()  # code objects, resolved to pairs after the loop

    def prof(frame, event, arg):
        if event == "call":
            co = frame.f_code
            if co.co_filename.startswith(_PKG) and not co.co_name.startswith("<"):
                raw.add(co)

    def _pair(co) -> tuple[str, str]:
        return (os.path.relpath(co.co_filename, _REPO), co.co_name)

    def _referenced_kernels(cos) -> set[tuple[str, str]]:
        """Module-level engine functions REFERENCED by the traced code
        objects (one hop through the defining module's globals) — the
        executor-side-kernel closure (see module docstring)."""
        import inspect

        out: set[tuple[str, str]] = set()
        for co in cos:
            mod = next(
                (m for m in list(sys.modules.values())
                 if getattr(m, "__file__", None) == co.co_filename),
                None,
            )
            if mod is None:
                continue
            for ref in co.co_names:
                obj = getattr(mod, ref, None)
                if (
                    inspect.isfunction(obj)
                    and getattr(obj.__code__, "co_filename", "").startswith(_PKG)
                    and not obj.__name__.startswith("<")
                ):
                    out.add(_pair(obj.__code__))
        return out

    traced: dict[str, set[tuple[str, str]]] = {}
    for name, fn in QUERIES.items():
        raw.clear()
        sys.setprofile(prof)
        try:
            fn(spark, sf_dir)
        except Exception as exc:  # plan construction must not fail
            sys.setprofile(None)
            print(f"TRACE FAILURE for {name}: {exc!r}", file=sys.stderr)
            raise
        finally:
            sys.setprofile(None)
        traced[name] = {_pair(co) for co in raw} | _referenced_kernels(raw)
    spark.stop()
    return traced


def _func_touches(pairs: set[tuple[str, str]],
                  boundaries: dict[int, str]) -> dict[tuple[str, str], set[int]]:
    """For each (file, func), the set of rounds R such that the function
    body has commits AFTER round R's boundary (i.e. a round-R check is
    stale for any query executing this function)."""
    rounds = sorted(boundaries)
    touch_after: dict[tuple[str, str], set[int]] = {}
    for pair in sorted(pairs):
        relpath, func = pair
        stale_for: set[int] = set()
        # Newest commit touching the function body; compare against each
        # boundary via ancestry (one -L walk per function, not per round).
        out = _git("log", "--format=%H", "--no-patch",
                   "-L", f":{func}:{relpath}")
        commits = [c for c in out.splitlines() if c]
        if not commits:
            continue  # git couldn't locate the function; wrapper check still applies
        newest = commits[0]
        for rnd in rounds:
            # stale for round `rnd` iff newest touch is NOT an ancestor
            # of the round boundary (i.e. it landed after the round).
            anc = subprocess.run(
                ["git", "-C", str(_REPO), "merge-base", "--is-ancestor",
                 newest, boundaries[rnd]],
            )
            if anc.returncode != 0:
                stale_for.add(rnd)
        if stale_for:
            touch_after[pair] = stale_for
    return touch_after


def prescribe(audit: dict, window: int = _WINDOW):
    """Pure ranking core (unit-tested in tests/test_coverage_audit.py).

    Input: {name: {last_checked_round, touched_since?,
    newest_change_round?}}.  Returns (never, stale, suggested,
    overflow): never-checked queries first, then stale queries ranked
    by RECENCY of the invalidating change (a round-6 operator rewrite
    outranks round-2 shared-loader drift), tie-broken by oldest driver
    evidence, then the oldest-evidence refresh cohort; ``suggested`` is
    the first ``window`` names, ``overflow`` the unverified names that
    did not fit and must lead the next round.
    """
    never = sorted(n for n, e in audit.items() if not e["last_checked_round"])
    stale = sorted(
        (n for n, e in audit.items()
         if e["last_checked_round"] and e.get("touched_since")),
        key=lambda n: (-audit[n]["newest_change_round"],
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
    for f in sorted(glob.glob(str(_REPO / "CORRECTNESS_r0*.json"))):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        for name, row in json.load(open(f)).items():
            if rnd >= last.get(name, 0):
                last[name] = rnd
                passed[name] = _row_passed(row)

    traced = _trace_functions() if trace else {}
    all_pairs: set[tuple[str, str]] = set()
    for pairs in traced.values():
        all_pairs |= pairs
    touch_after = _func_touches(all_pairs, bounds) if trace else {}

    audit = {}
    for name, fn in QUERIES.items():
        rnd = last.get(name, 0)
        entry: dict = {
            "last_checked_round": rnd,
            "last_check_passed": passed.get(name),
        }
        if rnd and rnd in bounds:
            stale_fns = sorted(
                f"{relpath}:{func}"
                for (relpath, func) in traced.get(name, ())
                if rnd in touch_after.get((relpath, func), ())
            )
            if stale_fns:
                entry["touched_since"] = stale_fns
                # In which round did the newest invalidating change
                # land?  stale_for = rounds whose boundary predates
                # the change, so the change landed in max(stale_for)+1.
                entry["newest_change_round"] = max(
                    max(touch_after[(p.split(":")[0], p.split(":")[1])])
                    for p in stale_fns
                ) + 1
        audit[name] = entry

    never, stale, suggested, overflow = prescribe(audit, _WINDOW)
    summary = {
        "n_queries": len(audit),
        "n_never_checked": len(never),
        "never_checked": never,
        "n_touched_since_last_check": len(stale),
        "touched_since_last_check": sorted(stale),
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
