"""Time every registered query at a given sf dir (default sf0.1), one
warm session, one run each; print JSON sorted slowest-first.  Finds
hidden quadratics / pathological plans among queries the headline bench
does not cover.

``i6b_cosine_topk_hof`` — the DELIBERATELY-naive per-pair comparator
kept as the measured cost model the blocked kernel is judged against —
is ~17 s of the sweep and proves nothing new per run, so it is skipped
unless ``SPARK_GRAFT_SWEEP_ALL=1`` (VERDICT r6 item 7; it stays
registered and driver-checkable either way).
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_data_pipeline_spark.plans import QUERIES, load_all_plans
from etl_data_pipeline_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

load_all_plans()
spark = get_spark(app_name="timing-sweep", master="local[32]",
                  shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

times = {}
fails = {}
SKIP_UNLESS_ALL = {"i6b_cosine_topk_hof"}
skipped = sorted(
    SKIP_UNLESS_ALL & set(QUERIES)
) if not os.environ.get("SPARK_GRAFT_SWEEP_ALL") else []

for name, fn in QUERIES.items():
    if name in skipped:
        continue
    t0 = time.monotonic()
    try:
        df = fn(spark, SF)
        n = df.count()
        times[name] = (round(time.monotonic() - t0, 2), n)
    except Exception as e:  # noqa: BLE001
        fails[name] = repr(e)[:200]
ranked = sorted(times.items(), key=lambda kv: -kv[1][0])
print(json.dumps({
    "sf": SF,
    "total_sec": round(sum(v[0] for v in times.values()), 1),
    "n_queries": len(times),
    "skipped": skipped,
    "fails": fails,
    "slowest_30": [
        {"name": k, "sec": v[0], "rows": v[1]} for k, v in ranked[:30]
    ],
}, indent=1))
