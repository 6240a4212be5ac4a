"""Warm (min-of-2, cache cleared per run) timings for named queries."""
import sys
import time

sys.path.insert(0, "/root/repo")
from etl_data_pipeline_spark.plans import QUERIES, load_all_plans
from etl_data_pipeline_spark.session import get_spark

SF = "/root/testdata/sf0.1"
names = sys.argv[1:] or [
    "incremental_neardup",
    "ivf2_ann",
    "kmeans_lloyd",
    "pagerank_neardup",
    "a9_python_datasource",
    "neardup_link_predict",
    "dpp_partition_pruned_join",
    "kcore_peel",
    "neardup_clusters",
    "decontaminate_bloom",
    "bucketed_join",
    "ivf2_recall",
]

load_all_plans()
spark = get_spark("r15b-warm")
spark.sparkContext.setLogLevel("ERROR")

out = {}
for name in names:
    fn = QUERIES[name]
    runs = []
    for i in range(3):  # run 0 = warmup, runs 1-2 timed
        spark.catalog.clearCache()
        t0 = time.monotonic()
        n = fn(spark, SF).count()
        dt = time.monotonic() - t0
        runs.append(dt)
    out[name] = (round(min(runs[1:]), 2), n)
    print(f"{min(runs[1:]):7.2f}  {name}  (runs {['%.2f' % r for r in runs]})  rows={n}", flush=True)
spark.stop()
