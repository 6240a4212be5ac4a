"""Fourth-decade evidence for ivf2 via dense vec_id slices of the
sf100 embeddings (same generator/distribution; cost depends on n and
the parameter rules, not dataset identity): n = 200k and 600k under
the calibrated probe budget."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from etl_data_pipeline_spark.plans.ann_hier import ivf2_topk
from etl_data_pipeline_spark.session import get_spark

spark = get_spark(app_name="ivf2-slices")
spark.sparkContext.setLogLevel("ERROR")
emb = spark.read.parquet("/root/repo/.scratch/sf100/embeddings.parquet")
for n in (200_000, 600_000):
    e = emb.filter(F.col("vec_id") < n)
    t0 = time.monotonic()
    cnt = ivf2_topk(e, k=3).count()
    print(f"RESULT n={n}: {cnt} rows {time.monotonic()-t0:.1f}s", flush=True)
    spark.catalog.clearCache()
