"""Audit: duplicated Python-eval nodes (guide §4.4) + eval-node census.

For every registered query's executed plan, count ArrowEvalPython /
BatchEvalPython / MapInPandas / FlatMapGroupsInPandas /
FlatMapCoGroupsInPandas nodes and flag any query where the SAME udf
name appears in more than one eval node (the filter-pushdown
duplication §4.4 describes).
"""
import json
import re
import sys

sys.path.insert(0, "/root/repo")

from etl_data_pipeline_spark.plans import QUERIES, load_all_plans
from etl_data_pipeline_spark.session import get_spark

SF = "/root/testdata/sf0.1"
load_all_plans()
spark = get_spark(app_name="pyeval-audit")
spark.sparkContext.setLogLevel("ERROR")

NODES = (
    "ArrowEvalPython",
    "BatchEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "MapInArrow",
)

census = {}
dups = {}
errors = {}
for name, fn in QUERIES.items():
    try:
        p = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    except Exception as e:
        errors[name] = repr(e)[:120]
        continue
    counts = {n: p.count(n + " ") + p.count(n + "[") for n in NODES}
    total = sum(counts.values())
    if total:
        census[name] = {k: v for k, v in counts.items() if v}
    # udf-name duplication: pythonUDF invocations like  foo(...)#123
    calls = re.findall(r"(\w+)\(.*?\)#\d+", "".join(
        ln for ln in p.splitlines() if any(n in ln for n in NODES)
    ))
    from collections import Counter
    c = Counter(calls)
    d = {k: v for k, v in c.items() if v > 1 and k not in (
        "cast", "isnotnull", "coalesce")}
    if d:
        dups[name] = d

print(json.dumps({"n_with_python_nodes": len(census),
                  "duplicated_udf_calls": dups,
                  "errors": errors,
                  "census": census}, indent=1))
spark.stop()
