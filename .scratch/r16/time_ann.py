"""Time the four ANN queries from a given package root (old vs new tree
process-level A/B for the cell-bucketed kernel).

Usage: python time_ann.py <pkg_root> <sf_dir> [tag]
Prints per-query warm-min (3 runs, min of 2-3) and row counts.
"""
import sys
import time

root, sf = sys.argv[1], sys.argv[2]
tag = sys.argv[3] if len(sys.argv) > 3 else root
sys.path.insert(0, root)

from etl_data_pipeline_spark.plans import QUERIES, load_all_plans
from etl_data_pipeline_spark.session import get_spark

load_all_plans()
spark = get_spark(app_name=f"r16-ann-ab-{tag}")
spark.sparkContext.setLogLevel("ERROR")

for name in ("ann_lsh", "ann_multiprobe", "ivf_ann", "ivf2_ann"):
    fn = QUERIES[name]
    runs = []
    for i in range(3):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        n = fn(spark, sf).count()
        runs.append(time.monotonic() - t0)
    print(f"RESULT {tag} {name}: {min(runs[1:]):.3f}s rows={n} "
          f"(runs {['%.2f' % r for r in runs]})", flush=True)
spark.stop()
