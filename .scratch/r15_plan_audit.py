"""Round-15 plan audit: scan every registered query's ANALYZED physical
plan for smells (guide §7.2): row-at-a-time Python (BatchEvalPython),
CartesianProduct, global no-partition Window, unbounded global Sort.
Prints one JSON with per-smell query lists + exchange counts.

Queries whose build executes jobs (ANN builds etc.) still only plan
here — .explain is driver-side; eager operators run their bounded pins.
"""
import json
import sys
import traceback

sys.path.insert(0, "/root/repo")

from etl_data_pipeline_spark.plans import QUERIES, load_all_plans
from etl_data_pipeline_spark.session import get_spark

SF = "/root/testdata/sf0.1"
load_all_plans()
spark = get_spark(app_name="plan-audit")
spark.sparkContext.setLogLevel("ERROR")

smells = {
    "BatchEvalPython": [],
    "CartesianProduct": [],
    "global_window": [],   # Window with no partition spec is warned by Spark
    "global_sort": [],     # Sort global=true not under TakeOrdered
}
exchanges = {}
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
    if "windowspecdefinition()" in p.replace(" ", ""):
        smells["global_window"].append(name)
    for line in p.splitlines():
        if line.strip().startswith(("Sort ", "+- Sort ", ":- Sort ")) and "true, 0" in line:
            smells["global_sort"].append(name)
            break
    exchanges[name] = p.count("Exchange")

top_ex = sorted(exchanges.items(), key=lambda kv: -kv[1])[:15]
print(json.dumps({"smells": smells, "errors": errors,
                  "top_exchange_counts": top_ex}, indent=1))
spark.stop()
