import sys, time
sys.path.insert(0, "/root/repo")
from etl_data_pipeline_spark.plans import QUERIES, load_all_plans
from etl_data_pipeline_spark.session import get_spark
load_all_plans()
spark = get_spark(app_name="sf1-ann2")
spark.sparkContext.setLogLevel("ERROR")
SF1 = "/root/repo/.scratch/sf1"
t0=time.monotonic()
r = QUERIES["ann_multiprobe_recall"](spark, SF1).collect()[0].asDict()
print("ann_multiprobe_recall(H<=2) sf1:", r, f"{time.monotonic()-t0:.1f}s", flush=True)
spark.catalog.clearCache()
# timing for the H<=2 multiprobe at both scales (slope with new probe set)
for sf, d in (("sf0.1","/root/testdata/sf0.1"), ("sf1",SF1)):
    QUERIES["ann_multiprobe"](spark, d).count()
    t0=time.monotonic(); QUERIES["ann_multiprobe"](spark, d).count()
    print("ann_multiprobe", sf, round(time.monotonic()-t0,2), flush=True)
    spark.catalog.clearCache()
# PQ fixed-16 vs adaptive-160 codebook at sf1: recall A/B
from etl_data_pipeline_spark.catalog import load_table
from etl_data_pipeline_spark.operators.similarity import knn, pq_rerank
from etl_data_pipeline_spark.operators.ann_adaptive import pq_rerank_adaptive
import pyspark.sql.functions as F
e = load_table(spark, SF1, "embeddings")
exact = knn(spark, e, k=3).select("vec_id","neighbor")
exact = exact.persist(); exact.count()
for tag, fn in (("fixed16", pq_rerank), ("adaptive160", pq_rerank_adaptive)):
    t0=time.monotonic()
    ap = fn(spark, e, k=3, n_cand=50).select("vec_id","neighbor").withColumn("hit", F.lit(1))
    j = exact.join(ap, ["vec_id","neighbor"], "left").agg(F.count(F.lit(1)).alias("n"), F.count("hit").alias("h")).collect()[0]
    print("pq", tag, "recall@3", round(j["h"]/j["n"],4), f"{time.monotonic()-t0:.1f}s", flush=True)
    spark.catalog.clearCache(); exact.persist(); exact.count()
spark.stop()
