"""Two-scale (sf0.01 vs sf0.1) wall-clock slopes for named queries.
Data grows 10x; a slope near or above 10 flags superlinear work."""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_data_pipeline_spark.plans import QUERIES, load_all_plans
from etl_data_pipeline_spark.session import get_spark

NAMES = sys.argv[1:]
load_all_plans()
spark = get_spark(app_name="slopes", master="local[32]",
                  shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

out = {}
for name in NAMES:
    secs = {}
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        QUERIES[name](spark, sf).count()  # warm
        t0 = time.monotonic()
        QUERIES[name](spark, sf).count()
        secs[sf.rsplit("/", 1)[1]] = round(time.monotonic() - t0, 2)
    out[name] = {**secs, "slope": round(secs["sf0.1"] / max(secs["sf0.01"], 0.01), 1)}
print(json.dumps(out, indent=1))
