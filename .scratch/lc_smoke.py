"""Minimal local-cluster smoke: one session, three representative
queries (plain agg, applyInPandas kernel, broadcast join), clean stop.

Run as a DEDICATED subprocess (the r8 attempt died because the session
was being built while the parent interpreter was already tearing down:
'Shutdown hooks cannot be modified during shutdown')."""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("PYTHONPATH", "/root/repo")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local-cluster[2,4,4096]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.executorEnv.PYTHONPATH", "/root/repo")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
print("session up, defaultParallelism =", spark.sparkContext.defaultParallelism)

from etl_data_pipeline_spark.plans import QUERIES, load_all_plans

load_all_plans()
SF = "/root/testdata/sf0.001"
for name in ("d1_pricing_summary" if "d1_pricing_summary" in QUERIES else "q1_pricing_summary",
             "cosine_topk", "q3_topk_join"):
    rows = QUERIES[name](spark, SF).collect()
    print(f"{name}: {len(rows)} rows OK")
spark.stop()
print("SMOKE GREEN")
