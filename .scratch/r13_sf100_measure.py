"""Round-13 stretch (VERDICT r12 item 8): fourth measured decade for
the two ANN/dedup production paths — ivf2_ann and i4b_minhash_lsh at
sf100 (2M vectors / 5M docs)."""
import json, sys, time
sys.path.insert(0, "/root/repo")
from etl_data_pipeline_spark.plans import QUERIES, load_all_plans
from etl_data_pipeline_spark.session import get_spark

load_all_plans()
spark = get_spark(app_name="sf100-measure")
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/repo/.scratch/sf100"
out = {}
for name in sys.argv[1:]:
    t0 = time.monotonic()
    n = QUERIES[name](spark, sf).count()
    secs = time.monotonic() - t0
    out[name] = {"rows": n, "secs": round(secs, 1)}
    print(f"RESULT {name}: {n} rows {secs:.1f}s", flush=True)
    spark.catalog.clearCache()
print(json.dumps(out), flush=True)
