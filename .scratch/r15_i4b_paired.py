"""Round-15 (VERDICT r14 item 3): pin the i4b fourth-decade band with
ONE PAIRED fix-vs-control session at sf100 (5M docs), 48g driver,
quiet host, interleaved control/fix/control/fix — the bench.py probe
discipline applied at the fourth decade.

Control = the PRE-FIX operators/text.py (global token .distinct() +
persisted token stream), loaded verbatim from git (ee7807c^) into a
shadow module so both variants run in the SAME session.  Fix = the
current tree's registered i4b_minhash_lsh.  Row counts must be
identical (2,024,047 at sf100); report the two paired ratios and the
within-session band.
"""
import json
import subprocess
import sys
import time
import types

sys.path.insert(0, "/root/repo")

import os
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from etl_data_pipeline_spark.session import get_spark
from etl_data_pipeline_spark.catalog import load_table

# --- shadow module: pre-fix text operators, verbatim from git ---
src = subprocess.check_output(
    ["git", "-C", "/root/repo", "show",
     "ee7807c^:etl_data_pipeline_spark/operators/text.py"],
    text=True,
)
old_text = types.ModuleType("old_text_prefix")
exec(compile(src, "old_text_prefix.py", "exec"), old_text.__dict__)

import etl_data_pipeline_spark.operators.text as new_text

spark = get_spark(app_name="i4b-paired-sf100")
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/repo/.scratch/sf100"
d = load_table(spark, sf, "documents")


def run(tag, mod):
    t0 = time.monotonic()
    n = mod.minhash_lsh_pairs(
        d, threshold=0.5, num_hashes=16, band_size=4
    ).count()
    secs = time.monotonic() - t0
    spark.catalog.clearCache()
    print(f"RESULT {tag}: {n} rows {secs:.1f}s", flush=True)
    return {"rows": n, "secs": round(secs, 1)}


out = {"pairs": []}
for i in range(2):
    c = run(f"control{i}", old_text)
    f = run(f"fix{i}", new_text)
    out["pairs"].append({
        "control": c, "fix": f,
        "ratio": round(f["secs"] / c["secs"], 3),
    })
print(json.dumps(out), flush=True)
