"""Capture .explain("formatted") for a set of queries into plans/r16/.

Usage: python .scratch/r16_capture_plans.py <suffix> [name ...]
Default names = the bench HEADLINE set.  suffix is "before" / "after".
"""
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

from etl_data_pipeline_spark.plans import QUERIES, load_all_plans
from etl_data_pipeline_spark.session import get_spark

SF = "/root/testdata/sf0.1"
OUT = Path("/root/repo/plans/r16")
OUT.mkdir(parents=True, exist_ok=True)

suffix = sys.argv[1]
names = sys.argv[2:]
if not names:
    names = [
        "q1_pricing_summary", "q3_topk_join", "q5_multi_join",
        "window_rank", "distinct_agg", "events_tumbling", "wordcount",
        "cosine_topk", "i6c_quantized_rerank", "i4b_minhash_lsh",
    ]

load_all_plans()
spark = get_spark(app_name="plan-capture")
spark.sparkContext.setLogLevel("ERROR")

for name in names:
    df = QUERIES[name](spark, SF)
    txt = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    p = OUT / f"{name}_{suffix}.txt"
    p.write_text(txt)
    print(f"wrote {p} ({len(txt)} chars)", flush=True)
spark.stop()
