import os, sys, time
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
from etl_data_pipeline_spark.plans import QUERIES, load_all_plans
load_all_plans()
SF = "/root/testdata/sf0.01"
for name in ("neardup_clusters", "pagerank_neardup", "i4b_minhash_lsh", "cosine_topk"):
    t0 = time.perf_counter()
    n = len(QUERIES[name](spark, SF).collect())
    print(f"{name}: {time.perf_counter()-t0:.1f}s {n} rows", flush=True)
spark.stop()
