"""Corrected round-15 plan audit (continuation session).

The first audit (.scratch/r15_plan_audit.py) detected global windows by
searching for the literal ``windowspecdefinition()`` — a pattern that
never occurs (the spec always carries its order columns), so its
``global_window: []`` was a FALSE NEGATIVE: the emulator log shows
Spark's own `WindowExec: No Partition Defined` warning firing.

Correct detection: a physical-plan ``Window``/``WindowGroupLimit`` line
prints ``Window [exprs], [partitionSpec], [orderSpec]`` when
partitioned and ``Window [exprs], [orderSpec]`` when global — count the
top-level bracket groups.  Everything else re-checked identically.
"""
import json
import sys

sys.path.insert(0, "/root/repo")

from etl_data_pipeline_spark.plans import QUERIES, load_all_plans
from etl_data_pipeline_spark.session import get_spark

SF = "/root/testdata/sf0.1"
load_all_plans()
spark = get_spark(app_name="plan-audit2")
spark.sparkContext.setLogLevel("ERROR")


def top_level_groups(s: str) -> int:
    """Count top-level [...] groups in a plan line after the node name."""
    depth = 0
    groups = 0
    for ch in s:
        if ch == "[":
            if depth == 0:
                groups += 1
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
    return groups


smells = {
    "BatchEvalPython": [],
    "CartesianProduct": [],
    "global_window": [],
    "global_sort": [],
}
errors = {}
for name, fn in QUERIES.items():
    try:
        df = fn(spark, SF)
        p = df._jdf.queryExecution().executedPlan().toString()
    except Exception as e:
        errors[name] = repr(e)[:120]
        continue
    if "BatchEvalPython" in p:
        smells["BatchEvalPython"].append(name)
    if "CartesianProduct" in p:
        smells["CartesianProduct"].append(name)
    for line in p.splitlines():
        t = line.strip().lstrip("+-:* ").strip()
        if t.startswith("Window ") and top_level_groups(t) == 2:
            # 2 groups = [exprs], [X]: X is an ORDER spec (global window,
            # flagged) iff it carries ASC/DESC; a partition-only window
            # ([exprs], [partitionSpec]) moves nothing globally
            depth = 0; start = None; grp2 = None; seen = 0
            for j, ch in enumerate(t):
                if ch == "[":
                    if depth == 0:
                        seen += 1
                        start = j
                    depth += 1
                elif ch == "]":
                    depth -= 1
                    if depth == 0 and seen == 2:
                        grp2 = t[start:j]
                        break
            if grp2 is not None and (" ASC" in grp2 or " DESC" in grp2):
                if name not in smells["global_window"]:
                    smells["global_window"].append(name)
    for line in p.splitlines():
        if line.strip().startswith(("Sort ", "+- Sort ", ":- Sort ")) and "true, 0" in line:
            smells["global_sort"].append(name)
            break

print(json.dumps({"smells": smells, "errors": errors}, indent=1))
spark.stop()
