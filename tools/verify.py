#!/usr/bin/env python
"""Single verification entry point (VERDICT r6 item 5).

Runs, in order, the four gates that previously ran ad hoc, plus the
coverage-window sync check, and exits non-zero on the first failure:

  1. driver emulator  — sf0.01, plain local[8] session without engine
     confs (catches loaders that forget ensure_engine_confs): 271
     queries vs their DuckDB oracles, rows + schema + value-hash;
  2. small-SF stress  — every query at sf0.001 with 32 shuffle
     partitions (empty-partition / partitioning-determinism regime);
  3. pytest           — the full unit/property/plan suite;
  4. bench smoke      — bench.py at sf0.01 with the load gate enabled
     (proves the artifact path runs end-to-end; NOT a timing claim);
  5. coverage window  — tools/coverage_audit.py --check: the registry's
     driver window must match the audit's mechanical prescription.

Usage::

    python tools/verify.py            # all gates
    python tools/verify.py --fast     # skip bench + coverage (1-3 only)

Each gate streams its tail on failure.  Wall-clock is ~20 min for the
full run on a quiet local[32] host.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent


def _run(name: str, cmd: list[str], env: dict | None = None,
         timeout: int = 900) -> None:
    print(f"=== {name}: {' '.join(cmd)}", flush=True)
    t0 = time.perf_counter()
    proc = subprocess.run(
        cmd,
        cwd=_REPO,
        env={**os.environ, **(env or {})},
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    dt = time.perf_counter() - t0
    if proc.returncode != 0:
        print(proc.stdout[-4000:])
        print(proc.stderr[-4000:], file=sys.stderr)
        print(f"FAIL {name} (exit {proc.returncode}, {dt:.0f}s)")
        sys.exit(proc.returncode or 1)
    tail = [l for l in proc.stdout.strip().splitlines() if l][-2:]
    for l in tail:
        print(f"    {l}")
    print(f"PASS {name} ({dt:.0f}s)", flush=True)


def main() -> None:
    fast = "--fast" in sys.argv
    py = sys.executable
    _run("emulator sf0.01", [py, str(_REPO / ".scratch" / "driver_emulator.py")])
    _run("stress sf0.001x32", [py, str(_REPO / "tools" / "stress_small_sf.py")])
    _run("pytest", [py, "-m", "pytest", "tests/", "-q"])
    if not fast:
        _run(
            "bench smoke sf0.01",
            [py, str(_REPO / "bench.py")],
            env={
                "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.01",
                "SPARK_GRAFT_NO_SCALING": "1",
            },
        )
        _run(
            "coverage window",
            [py, str(_REPO / "tools" / "coverage_audit.py"), "--check"],
        )
    print("ALL GATES GREEN")


if __name__ == "__main__":
    main()
