"""Round-14 (VERDICT r13 item 4): sf10 A/B of the PIPELINED chunked
build vs the serial chunked-union build (chunk_cells=800 -> 2 chunks at
nlist 1600; also chunk 256 -> 7 chunks), pinned as the reference.
Also asserts the three modes' results are bit-identical at this scale.
"""
import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

from etl_data_pipeline_spark.catalog import load_table  # noqa: E402
from etl_data_pipeline_spark.operators.ann_adaptive import (  # noqa: E402
    ivf_topk_adaptive,
)
from etl_data_pipeline_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="sf10-ab-pipelined")
spark.sparkContext.setLogLevel("ERROR")
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf10"
chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 256
out, hashes = {}, {}
for mode in ("pin", "chunked", "pipelined"):
    kw = {} if mode == "pin" else {"chunk_cells": chunk}
    e = load_table(spark, sf, "embeddings")
    t0 = time.monotonic()
    rows = ivf_topk_adaptive(e, k=3, assign_mode=mode, **kw).collect()
    secs = time.monotonic() - t0
    h = hashlib.sha256(
        "\n".join(sorted(",".join(map(str, r)) for r in rows)).encode()
    ).hexdigest()[:16]
    out[mode], hashes[mode] = secs, h
    print(f"{mode}: {len(rows)} rows {secs:.1f}s hash={h}", flush=True)
    spark.catalog.clearCache()
assert hashes["pin"] == hashes["chunked"] == hashes["pipelined"], hashes
print(
    f"chunk_cells={chunk} ratio chunked/pin: {out['chunked']/out['pin']:.3f} "
    f"pipelined/pin: {out['pipelined']/out['pin']:.3f} "
    f"pipelined/chunked: {out['pipelined']/out['chunked']:.3f}",
    flush=True,
)
