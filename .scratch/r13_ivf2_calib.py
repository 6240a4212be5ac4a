"""Round-13 directive 2: ivf2 psup/ncell recall-vs-cost calibration.

Sweeps probe-budget multipliers over the two-level IVF at a given sf
(the round-11 nlist-calibration methodology): psup' = pm * floor(log2
nsup) capped at nsup, ncell' = cm * (nlist // nsup).  Cost stays
O~(sqrt(n)) for constant multipliers; the sweep finds the knee that
clears recall@3 >= 0.5 at sf1.

Usage: python .scratch/r13_ivf2_calib.py /root/repo/.scratch/sf1
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import etl_data_pipeline_spark.plans.ann_hier as H  # noqa: E402
from etl_data_pipeline_spark.catalog import load_table  # noqa: E402
from etl_data_pipeline_spark.operators.similarity import knn  # noqa: E402
from etl_data_pipeline_spark.session import get_spark  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
spark = get_spark(app_name="ivf2-calib")
spark.sparkContext.setLogLevel("ERROR")

e = load_table(spark, sf_dir, "embeddings")
exact = knn(spark, e, k=3).select("vec_id", "neighbor")
exact.persist()
total = exact.count()
print(f"{sf_dir}: exact pairs {total}", flush=True)

orig_psup, orig_ncell = H.hier_psup, H.hier_ncell
rows = []
for pm in (1, 2, 3):
    for cm in (1, 2, 3):
        H.hier_psup = (
            lambda nsup, _pm=pm: min(nsup, max(2, _pm * max(1, nsup.bit_length() - 1)))
        )
        H.hier_ncell = (
            lambda nlist, nsup, _cm=cm: max(2, _cm * (nlist // nsup))
        )
        t0 = time.monotonic()
        approx = H.ivf2_topk(e, k=3).select("vec_id", "neighbor")
        hit = exact.join(approx, ["vec_id", "neighbor"], "inner").count()
        secs = time.monotonic() - t0
        rec = hit / total
        rows.append(
            {"pm": pm, "cm": cm, "recall": round(rec, 4), "secs": round(secs, 1)}
        )
        print(f"pm={pm} cm={cm}: recall@3={rec:.4f} {secs:.1f}s", flush=True)
        spark.catalog.clearCache()
        exact.persist().count()

H.hier_psup, H.hier_ncell = orig_psup, orig_ncell
out = Path("/root/repo/.scratch/r13_ivf2_calib_%s.json" % Path(sf_dir).name)
out.write_text(json.dumps({"sf_dir": sf_dir, "rows": rows}, indent=1))
print("wrote", out)
