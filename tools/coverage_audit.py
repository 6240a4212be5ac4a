#!/usr/bin/env python
"""Driver-coverage staleness audit (VERDICT r5 item 4).

For every registered query, reports:
  - ``last_checked_round``: the latest CORRECTNESS_r*.json containing a
    row for it (0 = never driver-checked), and whether that row passed;
  - ``touched_since``: commits since the end of that round whose diff
    changed the query's implementing FUNCTION body (via ``git log -L
    :func:file``) — adjacency shifts can over-trigger, so treat hits as
    candidates for re-check, not proof of change.

Writes COVERAGE_AUDIT.json at the repo root and prints a summary.  A
query that is both code-touched and stale-checked belongs in the next
round's _PRIORITY slack.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from etl_data_pipeline_spark.plans import QUERIES, load_all_plans  # noqa: E402

#: End-of-round marker commits ("round N: verdict/..." in git log).
_ROUND_BOUNDARY = {
    1: "9eebbaf",
    2: "57fa53b",
    3: "750fd73",
    4: "d249957",
    5: "e9ebf48",
}


def _row_passed(row) -> bool:
    if isinstance(row, dict):
        for key in ("match", "hash_match", "ok", "pass"):
            if key in row:
                return bool(row[key])
        return not row.get("error")
    return bool(row)


def main() -> None:
    load_all_plans()
    last: dict[str, int] = {}
    passed: dict[str, bool] = {}
    for f in sorted(glob.glob(str(_REPO / "CORRECTNESS_r0*.json"))):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        for name, row in json.load(open(f)).items():
            if rnd >= last.get(name, 0):
                last[name] = rnd
                passed[name] = _row_passed(row)

    audit = {}
    for name, fn in QUERIES.items():
        rnd = last.get(name, 0)
        entry = {
            "last_checked_round": rnd,
            "last_check_passed": passed.get(name),
        }
        if rnd:
            src = os.path.relpath(fn.__code__.co_filename, _REPO)
            func = fn.__name__
            out = subprocess.run(
                [
                    "git", "-C", str(_REPO), "log", "--format=%h %s",
                    f"{_ROUND_BOUNDARY[rnd]}..HEAD",
                    "-L", f":{func}:{src}", "--no-patch",
                ],
                capture_output=True,
                text=True,
            )
            touched = [l for l in out.stdout.strip().splitlines() if l]
            if touched:
                entry["touched_since"] = touched
        audit[name] = entry

    never = sorted(n for n, e in audit.items() if not e["last_checked_round"])
    stale = sorted(
        n
        for n, e in audit.items()
        if e["last_checked_round"] and e.get("touched_since")
    )
    summary = {
        "n_queries": len(audit),
        "n_never_checked": len(never),
        "never_checked": never,
        "n_touched_since_last_check": len(stale),
        "touched_since_last_check": stale,
    }
    out_path = _REPO / "COVERAGE_AUDIT.json"
    with open(out_path, "w") as fh:
        json.dump({"summary": summary, "queries": audit}, fh, indent=1)
    print(json.dumps(summary, indent=2))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
