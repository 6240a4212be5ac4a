"""ivf2_ann under the calibrated probe budget: sf10 then sf100 (the
fourth measured decade, VERDICT r12 stretch 8)."""
import sys, time
sys.path.insert(0, "/root/repo")
from etl_data_pipeline_spark.plans import QUERIES, load_all_plans
from etl_data_pipeline_spark.session import get_spark
load_all_plans()
spark = get_spark(app_name="ivf2-decade")
spark.sparkContext.setLogLevel("ERROR")
for sf in ("/root/repo/.scratch/sf10", "/root/repo/.scratch/sf100"):
    t0 = time.monotonic()
    n = QUERIES["ivf2_ann"](spark, sf).count()
    print(f"RESULT {sf.split('/')[-1]}: {n} rows {time.monotonic()-t0:.1f}s",
          flush=True)
    spark.catalog.clearCache()
