"""Round-13 done-criterion: sf10 A/B of the chunked-broadcast IVF
build vs the pinned build at today's nlist (200k vectors -> nlist
1600), chunk_cells=256 to force 7 real chunks."""
import sys
import time

sys.path.insert(0, "/root/repo")

from etl_data_pipeline_spark.catalog import load_table  # noqa: E402
from etl_data_pipeline_spark.operators.ann_adaptive import (  # noqa: E402
    ivf_topk_adaptive,
)
from etl_data_pipeline_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="sf10-ab")
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/repo/.scratch/sf10"
out = {}
for mode, kw in (("pin", {}), ("chunked", {"chunk_cells": 800})):
    e = load_table(spark, sf, "embeddings")
    t0 = time.monotonic()
    cnt = ivf_topk_adaptive(e, k=3, assign_mode=mode, **kw).count()
    secs = time.monotonic() - t0
    out[mode] = secs
    print(f"{mode}: {cnt} rows {secs:.1f}s", flush=True)
    spark.catalog.clearCache()
print(f"ratio chunked/pin: {out['chunked']/out['pin']:.3f}", flush=True)
