import os, sys, time
sys.path.insert(0, "/root/repo")
from etl_data_pipeline_spark.plans import QUERIES, load_all_plans
from etl_data_pipeline_spark.session import get_spark
load_all_plans()
spark = get_spark(app_name="sf1-ann")
spark.sparkContext.setLogLevel("ERROR")
SF1 = "/root/repo/.scratch/sf1"
SF01 = "/root/testdata/sf0.1"
for name in ("ivf_recall", "ann_recall", "ann_multiprobe_recall", "pq_recall"):
    t0 = time.monotonic()
    rows = QUERIES[name](spark, SF1).collect()
    print(name, "sf1", rows[0].asDict(), f"{time.monotonic()-t0:.1f}s", flush=True)
    spark.catalog.clearCache()
for name in ("ivf_ann", "ann_lsh", "ann_multiprobe", "pq_ann"):
    secs = {}
    for sf, d in (("sf0.1", SF01), ("sf1", SF1)):
        QUERIES[name](spark, d).count()
        t0 = time.monotonic()
        n = QUERIES[name](spark, d).count()
        secs[sf] = round(time.monotonic()-t0, 2)
        spark.catalog.clearCache()
    print(name, secs, "slope", round(secs["sf1"]/max(secs["sf0.1"],0.01),2), "rows", n, flush=True)
spark.stop()
