import sys, time
sys.path.insert(0, "/root/repo")
from etl_data_pipeline_spark.plans import QUERIES, load_all_plans
from etl_data_pipeline_spark.session import get_spark
load_all_plans()
spark = get_spark(app_name="langid")
spark.sparkContext.setLogLevel("ERROR")
for sf, d in (("sf1", "/root/repo/.scratch/sf1"), ("sf10", "/root/repo/.scratch/sf10")):
    QUERIES["lang_id"](spark, d).count()
    t0 = time.monotonic()
    n = QUERIES["lang_id"](spark, d).count()
    print("lang_id", sf, round(time.monotonic()-t0, 2), "rows", n, flush=True)
    spark.catalog.clearCache()
spark.stop()
